"""KV cache representations: bf16/f32 dense and INT8 block-quantized.

The north-star config calls for paged F16/INT8 KV-cache attention
(BASELINE.json; reference keeps F16 KV per slot, server/slot.cpp:100-126).
TPU-native int8 KV: values are quantized per (batch, position, head) with an
absmax scale over the head dim — decode reads half the bytes, which matters
because long-context decode is KV-bandwidth-bound. The cache is a pytree
(works inside jit/scan/shard_map).

Layouts: dense bf16/f16/f32 caches are stored FLAT as [L, B, S, H*D] — the
flash-decode kernel streams (positions, H*D) tiles, and the 5-D
[L, B, S, H, D] tiling (H on sublanes) would force a physical relayout of the
whole cache at every read (measured 0.5 ms/layer on an 8B decode step).
Head structure is imposed by callers (reshape of a per-layer slice at most).
INT8 caches keep [L, B, S, H, D] codes + [L, B, S, H] scales: their reads go
through a dequantizing slice anyway.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass
class KVCache:
    k: jax.Array                      # [L, B, S, H*D] dense | [L,B,S,H,D] int8
    v: jax.Array
    k_scale: Optional[jax.Array]      # [L, B, S, H] f32 when int8
    v_scale: Optional[jax.Array]

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def __getitem__(self, i):      # legacy (k, v) tuple compatibility
        return (self.k, self.v)[i]


jax.tree_util.register_pytree_node(
    KVCache, KVCache.tree_flatten, KVCache.tree_unflatten)


def init_kv(n_layers: int, batch: int, max_len: int, n_kv: int, head_dim: int,
            dtype=jnp.bfloat16, v_head_dim: int = 0) -> KVCache:
    vd = v_head_dim or head_dim
    shape = (n_layers, batch, max_len, n_kv, head_dim)
    vshape = (n_layers, batch, max_len, n_kv, vd)
    if dtype in (jnp.int8, "i8", "int8"):
        return KVCache(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(vshape, jnp.int8),
                       jnp.zeros(shape[:-1], jnp.float32),
                       jnp.zeros(vshape[:-1], jnp.float32))
    flat = (n_layers, batch, max_len, n_kv * head_dim)
    vflat = (n_layers, batch, max_len, n_kv * vd)
    return KVCache(jnp.zeros(flat, dtype), jnp.zeros(vflat, dtype),
                   None, None)


def _quant_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., D] -> int8 codes + f32 absmax scale over D."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(x * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def update_layer(cache: KVCache, li: int, bidx, idx, k_new, v_new) -> KVCache:
    """Scatter new K/V rows (k_new [B, T, H, D]) at positions idx [B, T]."""
    if cache.quantized:
        qk, sk = _quant_rows(k_new.astype(jnp.float32))
        qv, sv = _quant_rows(v_new.astype(jnp.float32))
        return KVCache(
            cache.k.at[li, bidx, idx].set(qk, mode="drop"),
            cache.v.at[li, bidx, idx].set(qv, mode="drop"),
            cache.k_scale.at[li, bidx, idx].set(sk, mode="drop"),
            cache.v_scale.at[li, bidx, idx].set(sv, mode="drop"),
        )
    b, t = k_new.shape[:2]
    kf = k_new.reshape(b, t, -1)                         # flat [B, T, H*D]
    vf = v_new.reshape(b, t, -1)
    return KVCache(
        cache.k.at[li, bidx, idx].set(kf.astype(cache.k.dtype), mode="drop"),
        cache.v.at[li, bidx, idx].set(vf.astype(cache.v.dtype), mode="drop"),
        None, None,
    )


def read_layer(cache: KVCache, li: int, n_kv: int = 0):
    """Dequantized K/V for one layer as [B, S, H, D] (pass n_kv to unflatten
    a dense cache; int8 carries head structure already).

    For int8, the convert+scale fuses into the attention matmuls (XLA); HBM
    traffic stays at the int8 byte-rate.
    """
    if cache.quantized:
        k = cache.k[li].astype(jnp.float32) * cache.k_scale[li][..., None]
        v = cache.v[li].astype(jnp.float32) * cache.v_scale[li][..., None]
        return k, v
    k, v = cache.k[li], cache.v[li]
    if n_kv:
        b, s, hd = k.shape
        k = k.reshape(b, s, n_kv, hd // n_kv)
        # v may be narrower than k (deepseek2 MLA: v_head_dim != qk head)
        v = v.reshape(b, s, n_kv, v.shape[-1] // n_kv)
    return k, v
