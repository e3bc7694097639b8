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
}


def _rand_qtensor(rng: np.random.Generator, n: int, k: int, quant: str):
    spec = Q.TYPE_BY_NAME[quant]
    nblocks = n * k // spec.block_elems
    raw = rng.integers(0, 256, size=nblocks * spec.block_bytes, dtype=np.uint8)
    raw = raw.reshape(nblocks, spec.block_bytes)
    # tame the f16 scale fields so dequant values are sane (~N(0, small))
    d_hi = {"Q2_K": [81, 83], "Q3_K": [109], "Q6_K": [209]}.get(quant, [1, 3])
    for off in d_hi:
        if off < spec.block_bytes:
            raw[:, off] &= 0x07   # tiny exponent -> small scales
    return repack(raw, quant, (n, k))


def make_synthetic_llama(preset: str = "tiny", quant: str = "Q4_K",
                         seed: int = 0) -> tuple:
    """Returns (cfg, params) with random quantized weights in device memory."""
    kw = dict(PRESETS[preset])
    rope_theta = kw.pop("rope_theta", 10000.0)
    cfg = LlamaConfig(head_dim=kw["d_model"] // kw["n_heads"],
                      rope_theta=rope_theta, **kw)
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    d, h, kvh, hd = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    layers = []
    for _ in range(cfg.n_layers):
        layers.append(LlamaLayer(
            attn_norm=jnp.ones(d, jnp.float32),
            wq=_rand_qtensor(rng, h * hd, d, quant),
            wk=_rand_qtensor(rng, kvh * hd, d, quant),
            wv=_rand_qtensor(rng, kvh * hd, d, quant),
            wo=_rand_qtensor(rng, d, h * hd, quant),
            ffn_norm=jnp.ones(d, jnp.float32),
            w_gate=_rand_qtensor(rng, cfg.d_ff, d, quant),
            w_up=_rand_qtensor(rng, cfg.d_ff, d, quant),
            w_down=_rand_qtensor(rng, d, cfg.d_ff, quant),
        ))
    embd = (rng.standard_normal((cfg.n_vocab, d)).astype(np.float32) * 0.02)
    params = LlamaParams(
        tok_embd=jnp.asarray(embd).astype(jnp.bfloat16),
        layers=layers,
        out_norm=jnp.ones(d, jnp.float32),
        output=_rand_qtensor(rng, cfg.n_vocab, d, quant),
    )
    return cfg, params


def param_bytes(params: LlamaParams) -> int:
    import jax
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.nbytes
    return total
