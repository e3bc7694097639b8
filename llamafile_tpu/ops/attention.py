"""Attention paths: flash (prefill) and cache-masked (decode).

The reference's attention is ggml's soft-max attention with optional flash-attn
flag (SURVEY.md §5 long-context notes). TPU-native: full prompts run through
the Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu) so the
[T, S] score matrix never hits HBM; incremental decode attends to the padded KV
cache with a position mask (the cache read is the bandwidth floor either way).

GQA: KV heads are broadcast to query heads for the flash path; the decode path
keeps grouped heads and never materializes the expansion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _use_flash(t: int, head_dim: int) -> bool:
    if jax.default_backend() != "tpu":
        return False               # pallas op is TPU-only; tests run einsum path
    return t >= 128 and t % 128 == 0 and head_dim in (64, 128, 256)


def flash_prefill(q, k, v, scale: float):
    """Causal self-attention over fresh prompt tokens.

    q: [B, T, Hq, D]; k, v: [B, T, Hkv, D]. Returns [B, T, Hq, D] f32.
    """
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    if _use_flash(t, d):
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
        qT = q.transpose(0, 2, 1, 3).astype(jnp.bfloat16)       # [B, H, T, D]
        kT = k.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
        vT = v.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
        if hkv != hq:
            rep = hq // hkv
            kT = jnp.repeat(kT, rep, axis=1)
            vT = jnp.repeat(vT, rep, axis=1)
        out = flash_attention(qT, kT, vT, causal=True, sm_scale=scale)
        return out.transpose(0, 2, 1, 3).astype(jnp.float32)
    # einsum fallback (CPU tests, odd shapes): causal mask within the window
    group = hq // hkv
    qg = q.reshape(b, t, hkv, group, d).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k.astype(jnp.float32)) * scale
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    scores = jnp.where((j <= i)[None, None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, hq, d)
