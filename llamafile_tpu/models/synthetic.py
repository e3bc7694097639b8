"""Synthetic model factories: build LlamaParams with random quantized weights
directly (no GGUF round-trip) — used by bench.py, __graft_entry__, and smoke
tooling. Block bytes are drawn randomly and repacked through the real
load path, so kernels see exactly the production data layout.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..gguf import quants as Q
from ..models.llama import LlamaConfig, LlamaLayer, LlamaParams
from ..ops.repack import repack

# named configs (shapes follow the public model cards; weights random)
PRESETS = {
    "tiny": dict(n_layers=2, d_model=256, n_heads=4, n_kv_heads=2, d_ff=512,
                 n_vocab=1024, max_context=2048),
    # shaped so Megatron TP up to 4 keeps whole 256-superblocks per K shard
    "tiny-tp": dict(n_layers=2, d_model=1024, n_heads=8, n_kv_heads=8,
                    d_ff=2048, n_vocab=2048, max_context=2048),
    "tinyllama-1.1b": dict(n_layers=22, d_model=2048, n_heads=32, n_kv_heads=4,
                           d_ff=5632, n_vocab=32000, max_context=2048),
    "llama3-8b": dict(n_layers=32, d_model=4096, n_heads=32, n_kv_heads=8,
                      d_ff=14336, n_vocab=128256, rope_theta=500000.0,
                      max_context=8192),
    # half-depth variant for isolating fixed per-step overheads in benchmarks
    "llama3-8b-16l": dict(n_layers=16, d_model=4096, n_heads=32, n_kv_heads=8,
                          d_ff=14336, n_vocab=128256, rope_theta=500000.0,
                          max_context=8192),
    # flagship per-layer shapes at dryrun cost: every sharding-divisibility
    # constraint (256-superblock K shards, head counts, vocab tiles) is
    # per-layer, so 2 layers exercise what 32 would
    "llama3-8b-2l": dict(n_layers=2, d_model=4096, n_heads=32, n_kv_heads=8,
                         d_ff=14336, n_vocab=128256, rope_theta=500000.0,
                         max_context=8192),
    # Mixtral-8x7B shapes (model card): top-2-of-8 routed MoE. The full 32
    # layers at Q4_K (~26 GB) exceed one v5e's HBM, so the bench preset
    # keeps 8 layers (~7 GB) — per-layer routed-decode behavior is
    # identical and the roofline accounts per-layer bytes anyway.
    # share_layers: every layer refs the SAME weight buffers — HBM traffic
    # per decode step is identical to distinct weights (VMEM can't cache
    # 0.8 GB between pallas calls, and differing activations defeat CSE)
    # but the on-device synthetic build drops from ~13 min to ~100 s on a
    # tethered chip
    "mixtral-8x7b-8l": dict(n_layers=8, d_model=4096, n_heads=32,
                            n_kv_heads=8, d_ff=14336, n_vocab=32000,
                            rope_theta=1e6, max_context=4096,
                            n_experts=8, n_experts_used=2,
                            moe_norm_topk=True, share_layers=True),
    "tiny-moe": dict(n_layers=2, d_model=256, n_heads=4, n_kv_heads=2,
                     d_ff=512, n_vocab=1024, max_context=2048,
                     n_experts=4, n_experts_used=2, moe_norm_topk=True),
}


def _rand_qtensor(rng: np.random.Generator, n: int, k: int, quant: str):
    """Random QTensor with the production device layout, built ON DEVICE.

    jax.random generates qs/scales directly in HBM — no multi-GB host->device
    transfer (which dominates build time on tethered devices). Layouts match
    ops/repack.py exactly; kernel compute/memory behavior is identical to a
    real checkpoint of the same format.
    """
    import jax
    import jax.numpy as jnp
    from ..ops.repack import QTensor
    seed = int(rng.integers(0, 2**31))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    ns = -(-n // 2048) * 2048      # storage N tile-padded (matches repack())
    if quant in ("F16", "BF16", "F32"):
        # dense storage is never tile-padded (matches repack())
        qs = jax.random.normal(k1, (k, n), jnp.bfloat16) * 0.02
        return QTensor("dense", (n, k), 0, qs, None, None)
    if quant in ("Q4_0", "Q4_1", "Q4_K"):
        qs = jax.random.randint(k1, (k // 2, ns), 0, 256, jnp.int32).astype(jnp.uint8)
        scales = jax.random.uniform(k2, (k // 32, ns), jnp.float32, 1e-3, 2e-2)
        bias = (None if quant == "Q4_0" else
                jax.random.uniform(k3, (k // 32, ns), jnp.float32, -0.1, 0.0))
        if quant == "Q4_0":
            bias = -8.0 * scales
        return QTensor("q4b", (n, k), 32, qs, scales.astype(jnp.bfloat16),
                       bias.astype(jnp.bfloat16))
    g = 16 if quant in ("Q2_K", "Q3_K", "Q6_K") else 32
    qs = jax.random.randint(k1, (k, ns), -127, 128, jnp.int32).astype(jnp.int8)
    scales = jax.random.uniform(k2, (k // g, ns), jnp.float32, 1e-3, 2e-2)
    bias = (jax.random.uniform(k3, (k // g, ns), jnp.float32, -0.1, 0.0)
            if quant in ("Q4_1", "Q5_1", "Q2_K", "Q5_K") else None)
    return QTensor("q8b", (n, k), g, qs, scales.astype(jnp.bfloat16),
                   None if bias is None else bias.astype(jnp.bfloat16))


def make_synthetic_llama(preset: str = "tiny", quant: str = "Q4_K",
                         seed: int = 0, fuse: bool = False) -> tuple:
    """Returns (cfg, params) with random quantized weights in device memory."""
    kw = dict(PRESETS[preset])
    rope_theta = kw.pop("rope_theta", 10000.0)
    share_layers = kw.pop("share_layers", False)
    cfg = LlamaConfig(head_dim=kw["d_model"] // kw["n_heads"],
                      rope_theta=rope_theta, **kw)
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    d, h, kvh, hd = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    layers = []
    for _ in range(1 if share_layers else cfg.n_layers):
        lkw = {}
        if cfg.n_experts > 0:
            # expert-stacked QTensors (the loader's layout after
            # repack.stack_experts) — the routed decode kernel's input
            from ..ops.repack import stack_experts
            ex = {}
            for e in range(cfg.n_experts):
                ex[f"gate.{e}"] = _rand_qtensor(rng, cfg.d_ff, d, quant)
                ex[f"up.{e}"] = _rand_qtensor(rng, cfg.d_ff, d, quant)
                ex[f"down.{e}"] = _rand_qtensor(rng, d, cfg.d_ff, quant)
            lkw["experts"] = stack_experts(ex, cfg.n_experts,
                                           fuse_gate_up=fuse)
            lkw["gate_inp"] = _rand_qtensor(rng, cfg.n_experts, d, "F16")
            lkw["w_gate"] = lkw["w_up"] = lkw["w_down"] = None
        else:
            lkw["w_gate"] = _rand_qtensor(rng, cfg.d_ff, d, quant)
            lkw["w_up"] = _rand_qtensor(rng, cfg.d_ff, d, quant)
            lkw["w_down"] = _rand_qtensor(rng, d, cfg.d_ff, quant)
        layers.append(LlamaLayer(
            attn_norm=jnp.ones(d, jnp.float32),
            wq=_rand_qtensor(rng, h * hd, d, quant),
            wk=_rand_qtensor(rng, kvh * hd, d, quant),
            wv=_rand_qtensor(rng, kvh * hd, d, quant),
            wo=_rand_qtensor(rng, d, h * hd, quant),
            ffn_norm=jnp.ones(d, jnp.float32),
            **lkw,
        ))
    if share_layers:
        layers = layers * cfg.n_layers       # same buffers, honest traffic
    import jax
    embd = (jax.random.normal(jax.random.PRNGKey(seed),
                              (cfg.n_vocab, d), jnp.bfloat16) * 0.02)
    params = LlamaParams(
        tok_embd=embd,
        layers=layers,
        out_norm=jnp.ones(d, jnp.float32),
        output=_rand_qtensor(rng, cfg.n_vocab, d, quant),
    )
    if fuse:
        from .loader import fuse_projections
        params = fuse_projections(params, cfg)
    return cfg, params


def param_bytes(params: LlamaParams) -> int:
    import jax
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.nbytes
    return total


def decode_read_bytes(params: LlamaParams, cfg: LlamaConfig) -> int:
    """Weight bytes a single decode step READS from HBM — the roofline
    denominator. Dense models read every byte except the embedding table
    (one row gather). Routed MoE (qmatmul_routed) reads only the top-k
    experts' bytes per MoE layer: k_used/E of the stacked expert leaves."""
    import jax
    total = param_bytes(params) - params.tok_embd.nbytes
    if cfg.n_experts and cfg.n_experts_used:
        frac = 1.0 - cfg.n_experts_used / cfg.n_experts
        for layer in params.layers:
            ex = getattr(layer, "experts", None)
            if ex and any(r in ex for r in ("gate", "gateup", "gateup_il")):
                gu = next(r for r in ("gateup_il", "gateup", "gate")
                          if r in ex)
                roles = (gu, "down") if gu != "gate" else ("gate", "up",
                                                           "down")
                routed = sum(ex[r].nbytes for r in roles)
                total -= int(routed * frac)
    return total
