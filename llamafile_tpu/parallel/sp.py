"""Sequence/context parallelism: prefill with the sequence dim sharded.

New capability vs the reference (SURVEY.md §5 "long-context: not present" —
ring/Ulysses called out as the TPU-native justification). v1 is the
all-gather-KV formulation: the prompt's sequence axis is sharded over the "sp"
mesh axis; every device embeds and projects its local tokens, K/V are
all-gathered along sp (full sequence), and each device computes causal
attention for its local query shard against the full K/V. FFN and norms stay
local (perfect sequence slicing); the KV cache's sequence axis is sp-sharded
so writes are local. Ring attention (streaming K/V via ppermute, no full
gather) is the round-2 bandwidth refinement.
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


def make_sp_prefill(cfg: LlamaConfig, mesh: Mesh):
    """run(params, tokens [B, T], ) -> logits [B, T, V]; T % sp == 0.

    Weights replicated; sequence sharded. Returns full logits (gathered).
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
            # context parallelism: full-sequence K/V via all-gather over sp
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
