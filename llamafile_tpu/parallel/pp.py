"""Pipeline parallelism: transformer stages sharded over a "pp" mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.10 — absent); this is a
new capability for models larger than one device's HBM. Design:

- all transformer layers are STACKED into leading-dim-L pytrees and sharded
  P("pp") on the layer axis: each device holds L/S consecutive layers (real
  HBM partitioning);
- inference runs the GPipe schedule: the batch splits into M microbatches that
  rotate through stages via `jax.lax.ppermute`; S + M - 1 pipeline steps, each
  step = one stage's local layers (a lax.scan over the local layer stack);
- embeddings/lm-head are replicated; stage 0 injects microbatches, the last
  stage's hidden states ride the ring back to close the rotation, and logits
  are computed after exit.

Composes with the KV cache by sharding its layer axis over "pp" as well, and
with Megatron tensor parallelism within each stage (make_pp_tp_mesh: 2D
("pp", "tp") mesh, column/row-sharded projections + psum). Inference-only
pipelining makes GPipe the natural schedule (1F1B exists to interleave
backward passes, which serving never runs).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (LlamaConfig, LlamaParams, _nw, apply_rope,
                            attention, rmsnorm, rope_cos_sin)
from ..ops.qmatmul import qmatmul
from ..ops.repack import QTensor


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    arr = np.asarray(devices[:pp]).reshape(pp)
    return Mesh(arr, ("pp",))


def make_pp_tp_mesh(pp: int, tp: int, devices=None) -> Mesh:
    """2D mesh for PP x TP composition: stages over "pp", Megatron tensor
    sharding within each stage over "tp"."""
    devices = devices if devices is not None else jax.devices()
    arr = np.asarray(devices[: pp * tp]).reshape(pp, tp)
    return Mesh(arr, ("pp", "tp"))


def _stack_qt(qts) -> QTensor:
    kind, shape, g = qts[0].kind, qts[0].shape, qts[0].g
    return QTensor(kind, shape, g,
                   jnp.stack([q.qs for q in qts]),
                   jnp.stack([q.scales for q in qts]) if qts[0].scales is not None else None,
                   jnp.stack([q.bias for q in qts]) if qts[0].bias is not None else None)


def _slice_qt(qt: QTensor, i) -> QTensor:
    return QTensor(qt.kind, qt.shape, qt.g, qt.qs[i],
                   None if qt.scales is None else qt.scales[i],
                   None if qt.bias is None else qt.bias[i])


def stack_layers(params: LlamaParams) -> dict:
    """Dense-llama layers -> stacked arrays with leading layer dim."""
    ls = params.layers
    assert all(l.experts is None and l.wqkv is None for l in ls), \
        "pp v1 supports dense unfused layers"
    stacked = {
        "attn_norm": jnp.stack([l.attn_norm for l in ls]),
        "ffn_norm": jnp.stack([l.ffn_norm for l in ls]),
        "wq": _stack_qt([l.wq for l in ls]),
        "wk": _stack_qt([l.wk for l in ls]),
        "wv": _stack_qt([l.wv for l in ls]),
        "wo": _stack_qt([l.wo for l in ls]),
        "w_gate": _stack_qt([l.w_gate for l in ls]),
        "w_up": _stack_qt([l.w_up for l in ls]),
        "w_down": _stack_qt([l.w_down for l in ls]),
    }
    if ls[0].bq is not None:       # qwen2/stablelm qkv biases
        for name in ("bq", "bk", "bv"):
            stacked[name] = jnp.stack([getattr(l, name) for l in ls])
    return stacked


# Megatron roles within a stage (PP x TP composition): shard N (storage
# axis 2) for column-parallel projections, K (axis 1) for row-parallel.
_TP_COL = {"wq", "wk", "wv", "w_gate", "w_up"}
_TP_ROW = {"wo", "w_down"}


def _stacked_spec(stacked: dict, tp: bool = False) -> dict:
    def qt_spec(name, qt):
        if tp and name in _TP_COL:
            s = P("pp", None, "tp")
        elif tp and name in _TP_ROW:
            s = P("pp", "tp", None)
        else:
            s = P("pp", None, None)
        return QTensor(qt.kind, qt.shape, qt.g, s,
                       None if qt.scales is None else s,
                       None if qt.bias is None else s)

    def vec_spec(name):
        if tp and name in ("bq", "bk", "bv"):
            return P("pp", "tp")
        return P("pp", None)

    return {k: (vec_spec(k) if not isinstance(v, QTensor) else qt_spec(k, v))
            for k, v in stacked.items()}


def shard_pp(params: LlamaParams, mesh: Mesh):
    """Returns (stacked_layers sharded over pp [x tp], replicated head)."""
    from .tp import strip_padding
    tp = "tp" in mesh.axis_names
    if tp:
        params = strip_padding(params)
    stacked = stack_layers(params)
    spec = _stacked_spec(stacked, tp)
    def put(leaf, s):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, s))

    stacked = jax.tree.map(put, stacked, spec, is_leaf=lambda x: x is None)
    rep = NamedSharding(mesh, P())
    head = {
        "tok_embd": jax.device_put(params.tok_embd, rep),
        "out_norm": jax.device_put(params.out_norm, rep),
        "output": jax.tree.map(lambda x: jax.device_put(x, rep), params.output),
    }
    return stacked, head


def make_pp_forward(cfg: LlamaConfig, mesh: Mesh, n_micro: int = 1):
    """Pipelined prefill/decode forward over pp stages, optionally composed
    with Megatron TP within each stage (mesh from make_pp_tp_mesh).

    Returns run(stacked, head, tokens [B, T], pos [B], cache) -> (logits, cache)
    with B % n_micro == 0. cache: layer axis P("pp") (+ kv heads P("tp")).
    """
    S = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    if tp > 1:
        import dataclasses
        assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0
        cfg = dataclasses.replace(cfg, n_heads=cfg.n_heads // tp,
                                  n_kv_heads=cfg.n_kv_heads // tp)
    assert cfg.n_layers % S == 0

    def layer_step(x, layer, cos, sin, kc, vc, pos, t_pos, scale):
        b, t, _ = x.shape
        h = rmsnorm(x, _nw(layer["attn_norm"], cfg), cfg.rms_eps)
        h2d = h.reshape(b * t, cfg.d_model)
        q = qmatmul(h2d, layer["wq"])
        k = qmatmul(h2d, layer["wk"])
        v = qmatmul(h2d, layer["wv"])
        if "bq" in layer:
            q, k, v = q + layer["bq"], k + layer["bk"], v + layer["bv"]
        q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin, cfg.rope_neox)
        k = apply_rope(k, cos, sin, cfg.rope_neox)
        idx = pos[:, None] + t_pos[None, :]
        bidx = jnp.arange(b)[:, None] * jnp.ones((1, t), jnp.int32)
        kc = kc.at[bidx, idx].set(k.astype(kc.dtype), mode="drop")
        vc = vc.at[bidx, idx].set(v.astype(vc.dtype), mode="drop")
        attn = attention(q, kc, vc, pos, t_pos, scale)
        o = qmatmul(attn.reshape(b * t, cfg.n_heads * cfg.head_dim),
                    layer["wo"])
        if tp > 1:
            o = jax.lax.psum(o, "tp")
        x = x + o.reshape(b, t, cfg.d_model)
        h = rmsnorm(x, _nw(layer["ffn_norm"], cfg), cfg.rms_eps)
        h2d = h.reshape(b * t, cfg.d_model)
        g = qmatmul(h2d, layer["w_gate"])
        u = qmatmul(h2d, layer["w_up"])
        act = (jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu
               else jax.nn.silu(g))
        f = qmatmul(act * u, layer["w_down"])
        if tp > 1:
            f = jax.lax.psum(f, "tp")
        return x + f.reshape(b, t, cfg.d_model), kc, vc

    def fwd(stacked, head, tokens, pos, cache):
        b, t = tokens.shape
        mb = b // n_micro
        stage = jax.lax.axis_index("pp")
        t_pos = jnp.arange(t)
        scale = 1.0 / np.sqrt(cfg.head_dim)
        l_local = cfg.n_layers // S
        x_all = head["tok_embd"][tokens].astype(jnp.float32)   # [B, T, d]
        if cfg.embd_scale != 1.0:       # gemma scales embeddings by sqrt(d)
            x_all = x_all * cfg.embd_scale
        micro = x_all.reshape(n_micro, mb, t, cfg.d_model)
        pos_mb = pos.reshape(n_micro, mb)
        kc, vc = cache.k, cache.v                               # [Ll, B, S, H, D]

        def stage_compute(x, p, kc, vc, boff):
            """Run local layers on one microbatch; cache rows [boff, boff+mb)."""
            cos, sin = rope_cos_sin(p[:, None] + t_pos[None, :], cfg.head_dim,
                                    cfg.rope_theta, cfg.rope_scale, cfg)
            cos = cos[:, :, None, :]
            sin = sin[:, :, None, :]
            kc_mb = jax.lax.dynamic_slice_in_dim(kc, boff, mb, axis=1)
            vc_mb = jax.lax.dynamic_slice_in_dim(vc, boff, mb, axis=1)

            def body(carry, li):
                xx, kcc, vcc = carry
                layer = {k: (_slice_qt(v, li) if isinstance(v, QTensor) else v[li])
                         for k, v in stacked.items()}
                xx, knew, vnew = layer_step(xx, layer, cos, sin, kcc[li], vcc[li],
                                            p, t_pos, scale)
                return (xx, kcc.at[li].set(knew), vcc.at[li].set(vnew)), None

            (x, kc_mb, vc_mb), _ = jax.lax.scan(body, (x, kc_mb, vc_mb),
                                                jnp.arange(l_local))
            kc = jax.lax.dynamic_update_slice_in_dim(kc, kc_mb, boff, axis=1)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, vc_mb, boff, axis=1)
            return x, kc, vc

        # GPipe rotation: at step s, this device processes the microbatch that
        # entered the pipe at (s - stage); out-of-range slots are padding.
        n_steps = S + n_micro - 1
        outputs = jnp.zeros_like(micro)
        buf = jnp.zeros((mb, t, cfg.d_model), jnp.float32)
        pbuf = jnp.zeros((mb,), jnp.int32)

        def pipe_step(carry, s):
            buf, pbuf, kc, vc, outputs = carry
            m_idx = s - stage                      # which microbatch I hold
            inject = jnp.clip(s, 0, n_micro - 1)
            buf = jnp.where(stage == 0,
                            jnp.where(s < n_micro, micro[inject], buf * 0), buf)
            pbuf = jnp.where(stage == 0,
                             jnp.where(s < n_micro, pos_mb[inject], pbuf), pbuf)
            slot0 = jnp.clip(m_idx, 0, n_micro - 1)
            y, kc2, vc2 = stage_compute(buf, pbuf, kc, vc, slot0 * mb)
            active = (m_idx >= 0) & (m_idx < n_micro)
            # only commit cache updates for active work
            kc = jnp.where(active, kc2, kc)
            vc = jnp.where(active, vc2, vc)
            y = jnp.where(active, y, buf)
            # last stage stores finished microbatch
            done = active & (stage == S - 1)
            slot = jnp.clip(m_idx, 0, n_micro - 1)
            outputs = jnp.where(done, outputs.at[slot].set(y), outputs)
            # rotate activations (and their positions) to the next stage
            perm = [(i, (i + 1) % S) for i in range(S)]
            buf = jax.lax.ppermute(y, "pp", perm)
            pbuf = jax.lax.ppermute(pbuf, "pp", perm)
            return (buf, pbuf, kc, vc, outputs), None

        (buf, pbuf, kc, vc, outputs), _ = jax.lax.scan(
            pipe_step, (buf, pbuf, kc, vc, outputs), jnp.arange(n_steps))
        # outputs live on the last stage; broadcast to all (psum of one-hot)
        outputs = jax.lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)), "pp")
        x = outputs.reshape(b, t, cfg.d_model)
        x = rmsnorm(x, _nw(head["out_norm"], cfg), cfg.rms_eps)
        logits = qmatmul(x.reshape(b * t, cfg.d_model), head["output"])
        from ..runtime.kvcache import KVCache
        return logits.reshape(b, t, -1), KVCache(kc, vc, cache.k_scale,
                                                 cache.v_scale)

    cache_sp = P("pp", None, None, "tp" if tp > 1 else None, None)
    from ..runtime.kvcache import KVCache
    cspec = KVCache(cache_sp, cache_sp, None, None)

    def run(stacked, head, tokens, pos, cache):
        sspec = _stacked_spec(stacked, tp > 1)
        hspec = {"tok_embd": P(None, None), "out_norm": P(None),
                 "output": jax.tree.map(lambda _: P(None, None), head["output"],
                                        is_leaf=lambda x: x is None)}
        f = shard_map(fwd, mesh=mesh,
                      in_specs=(sspec, hspec, P(None, None), P(None), cspec),
                      out_specs=(P(None, None, None), cspec),
                      check_vma=False)
        return f(stacked, head, tokens, pos, cache)

    return jax.jit(run)


def init_pp_cache(cfg: LlamaConfig, mesh: Mesh, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    from ..runtime.kvcache import KVCache, init_kv
    sp = NamedSharding(mesh, P("pp", None, None, None, None))
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    z = jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=sp)
    return KVCache(z(), z(), None, None)
