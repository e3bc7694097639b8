"""Sequence/context parallelism: prefill with the sequence dim sharded.

New capability vs the reference (SURVEY.md §5 "long-context: not present" —
ring/Ulysses called out as the TPU-native justification). Two formulations:

- all-gather-KV (`make_sp_prefill`): K/V all-gathered along sp, each device
  attends its local query shard against the full sequence. Simple; KV memory
  O(T) per device.
- ring attention (`make_sp_prefill(..., ring=True)`): K/V blocks stream
  around the sp ring via `ppermute` while a log-sum-exp streaming-softmax
  merge accumulates each query shard's attention — KV memory stays O(T/sp)
  per device and the [Tl, T] score matrix never materializes beyond one
  block (Liu et al., Ring Attention; blockwise-parallel transformer math).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (LlamaConfig, LlamaParams, _nw, apply_rope, rmsnorm,
                            rope_cos_sin)
from ..ops.qmatmul import qmatmul


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:sp]).reshape(sp), ("sp",))


def _ring_attention(q, k, v, off_q, tl, scale, sp: int):
    """Causal ring attention over the "sp" axis.

    q [B, Tl, Hkv, G, D] local queries; k/v [B, Tl, Hkv, D] local block.
    Streams K/V blocks around the ring with a numerically-stable streaming
    softmax (running max m, denominator l, accumulator acc). Returns
    [B, Tl, Hkv, G, D] f32."""
    b, tl_, hkv, grp, d = q.shape
    me = jax.lax.axis_index("sp")
    qf = q.astype(jnp.float32)
    iq = off_q + jnp.arange(tl)                       # global query positions
    m0 = jnp.full((b, hkv, grp, tl), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, hkv, grp, tl), jnp.float32)
    a0 = jnp.zeros((b, hkv, grp, tl, d), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def step(i, carry):
        kb, vb, m, l, acc = carry
        src = (me - i) % sp                           # whose block this is
        jk = src * tl + jnp.arange(tl)                # global key positions
        s = jnp.einsum("bthgd,bshd->bhgts", qf,
                       kb.astype(jnp.float32)) * scale
        mask = jk[None, :] <= iq[:, None]             # [Tl_q, Tl_k]
        s = jnp.where(mask[None, None, None], s, -jnp.inf)
        bm = jnp.max(s, axis=-1)                      # [B, H, G, Tq]
        new_m = jnp.maximum(m, bm)
        # guard fully-masked blocks (all -inf rows)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(mask[None, None, None], p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhgts,bshd->bhgtd", p, vb.astype(jnp.float32))
        kb = jax.lax.ppermute(kb, "sp", perm)
        vb = jax.lax.ppermute(vb, "sp", perm)
        return kb, vb, new_m, l, acc

    _, _, m, l, acc = jax.lax.fori_loop(0, sp, step, (k, v, m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]      # [B, H, G, Tq, D]
    return out.transpose(0, 3, 1, 2, 4)               # [B, Tq, Hkv, G, D]


def make_sp_prefill(cfg: LlamaConfig, mesh: Mesh, ring: bool = False):
    """run(params, tokens [B, T], ) -> logits [B, T, V]; T % sp == 0.

    Weights replicated; sequence sharded. Returns full logits (gathered).
    ring=True streams K/V blocks via ppermute (O(T/sp) KV memory per device)
    instead of all-gathering the full sequence.
    """
    sp = mesh.shape["sp"]
    scale = 1.0 / np.sqrt(cfg.head_dim)

    def attention_cp(q, k_full, v_full, q_offset):
        """q [B, Tl, Hq, D] local; k/v [B, T, Hkv, D] full; causal w/ offset."""
        b, tl, hq, d = q.shape
        t = k_full.shape[1]
        hkv = k_full.shape[2]
        group = hq // hkv
        qg = q.reshape(b, tl, hkv, group, d).astype(jnp.float32)
        scores = jnp.einsum("bthgd,bshd->bhgts", qg,
                            k_full.astype(jnp.float32)) * scale
        i = q_offset + jnp.arange(tl)[:, None]
        j = jnp.arange(t)[None, :]
        scores = jnp.where((j <= i)[None, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgts,bshd->bthgd", probs, v_full.astype(jnp.float32))
        return out.reshape(b, tl, hq, d)

    def fwd(params, tokens):
        b, tl = tokens.shape                       # local shard length
        shard = jax.lax.axis_index("sp")
        off = shard * tl
        pos = off + jnp.arange(tl)                 # absolute positions
        cos, sin = rope_cos_sin(pos[None, :], cfg.head_dim, cfg.rope_theta,
                                cfg.rope_scale, cfg)
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
        x = params.tok_embd[tokens].astype(jnp.float32)
        if cfg.embd_scale != 1.0:
            x = x * cfg.embd_scale
        for layer in params.layers:
            h = rmsnorm(x, _nw(layer.attn_norm, cfg), cfg.rms_eps)
            h2d = h.reshape(b * tl, cfg.d_model)
            q = qmatmul(h2d, layer.wq)
            k = qmatmul(h2d, layer.wk)
            v = qmatmul(h2d, layer.wv)
            if layer.bq is not None:       # qwen2/stablelm qkv biases
                q, k, v = q + layer.bq, k + layer.bk, v + layer.bv
            q = q.reshape(b, tl, cfg.n_heads, cfg.head_dim)
            k = k.reshape(b, tl, cfg.n_kv_heads, cfg.head_dim)
            v = v.reshape(b, tl, cfg.n_kv_heads, cfg.head_dim)
            q = apply_rope(q, cos, sin, cfg.rope_neox)
            k = apply_rope(k, cos, sin, cfg.rope_neox)
            if ring:
                group = cfg.n_heads // cfg.n_kv_heads
                qg = q.reshape(b, tl, cfg.n_kv_heads, group, cfg.head_dim)
                attn = _ring_attention(qg, k, v, off, tl, scale, sp)
                attn = attn.reshape(b, tl, cfg.n_heads, cfg.head_dim)
            else:
                # context parallelism: full-sequence K/V all-gather over sp
                k_full = jax.lax.all_gather(k, "sp", axis=1, tiled=True)
                v_full = jax.lax.all_gather(v, "sp", axis=1, tiled=True)
                attn = attention_cp(q, k_full, v_full, off)
            x = x + qmatmul(attn.reshape(b * tl, cfg.n_heads * cfg.head_dim),
                            layer.wo).reshape(b, tl, cfg.d_model)
            h = rmsnorm(x, _nw(layer.ffn_norm, cfg), cfg.rms_eps)
            h2d = h.reshape(b * tl, cfg.d_model)
            g = qmatmul(h2d, layer.w_gate)
            u = qmatmul(h2d, layer.w_up)
            act = (jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu
                   else jax.nn.silu(g))
            f = qmatmul(act * u, layer.w_down)
            x = x + f.reshape(b, tl, cfg.d_model)
        x = rmsnorm(x, _nw(params.out_norm, cfg), cfg.rms_eps)
        logits = qmatmul(x.reshape(b * tl, cfg.d_model), params.output)
        return logits.reshape(b, tl, -1)

    def run(params, tokens):
        pspec = jax.tree.map(lambda x: None if x is None else P(), params,
                             is_leaf=lambda x: x is None)
        f = shard_map(fwd, mesh=mesh,
                      in_specs=(pspec, P(None, "sp")),
                      out_specs=P(None, "sp", None),
                      check_vma=False)
        return f(params, tokens)

    return jax.jit(run)
