"""Repack GGUF block formats into TPU-friendly quantized tensors (QTensor).

This is the load-time bridge between the GGUF wire formats and the Pallas fused
dequant-GEMM kernels — the TPU-native replacement for llamafile's per-format
kernel templates (reference: llamafile/tinyblas_cpu_sgemm.inc:46-240 type dispatch,
llamafile/iqk_mul_mat.inc:417-599 K-quant decoders).

Every GGML block format decomposes *exactly* as

    w[n, k] = a[n, k//g] * q[n, k] + b[n, k//g]

with integer codes q, per-group scale a, optional per-group bias b, group size
g in {8, 16, 32}. We extract (q, a, b) once on host (numpy, vectorized) and ship:

  kind "q8b":  qs int8 [N, K]            — all 5/6/8-bit & grid formats
  kind "q4b":  qs uint8 [N, K//2]        — 4-bit formats, nibble-planar per
               256-superblock: byte 128*sb+i = q[256sb+i] | q[256sb+128+i]<<4
               (lane-aligned unpack: lo/hi halves concatenate at 128 elements)
  kind "dense": w bf16 [N, K]            — fallback (F16/F32/BF16, exotic)

a (and b when present) are float32 at the format's natural granularity so the
dequantized values match the reference's f32 dequant bit-for-bit; the bias term
is applied OUTSIDE the matmul kernel via activation block-sums:
    y = x @ (a*q).T + blocksum_g(x) @ b.T
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..gguf import quants as Q

try:  # allow host-only use (tests of repack math) without jax
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None


@dataclass
class QTensor:
    """Device-resident quantized weight. Behaves as a pytree leaf bundle."""
    kind: str                    # "q8b" | "q4b" | "dense"
    shape: tuple                 # logical (N, K) — GGML convention; storage is K-major
    g: int                       # scale group size along K
    qs: object                   # int8 [K,N] | uint8 [K/2,N] | bf16 [K,N]
    scales: Optional[object]     # f32 [K/g, N] or None for dense
    bias: Optional[object]       # f32 [K/g, N] or None
    # il: N columns are GU_STRIPE-interleaved gate|up pairs (the fused FFN
    # kernel's layout, ops.qmatmul); consumers split outputs with split_gu
    il: bool = False

    def tree_flatten(self):
        return ((self.qs, self.scales, self.bias),
                (self.kind, self.shape, self.g, self.il))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, g, il = aux
        qs, scales, bias = children
        return cls(kind, shape, g, qs, scales, bias, il)

    @property
    def nbytes(self) -> int:
        total = 0
        for leaf in (self.qs, self.scales, self.bias):
            if leaf is not None:
                total += leaf.nbytes
        return total


if jax is not None:
    jax.tree_util.register_pytree_node(
        QTensor, QTensor.tree_flatten, QTensor.tree_unflatten)


@dataclass
class I8PQTensor(QTensor):
    """QTensor carrying an int8-g256 prefill companion (two-level scheme,
    docs/prefill_analysis.md §2): the Q4_K/Q6_K base tensor is fully
    dequantized once at attach time and REQUANTIZED to symmetric int8 with
    per-256-deep-K scales. Prefill matmuls then run int8xint8->int32 dots
    on the MXU (394 TOPS on v5e vs 197 bf16) with one f32 scale-multiply
    per 256-K block; decode keeps streaming the 4.5-bit base (bandwidth-
    bound, the companion is never read there). Costs ~1 extra HBM byte per
    weight — prefill is compute-bound, so the extra residency buys MXU
    rate, not bandwidth. qs8 int8 [K, Ns]; s8 f32 [K/256, Ns]."""
    qs8: object = None
    s8: object = None

    def tree_flatten(self):
        return ((self.qs, self.scales, self.bias, self.qs8, self.s8),
                (self.kind, self.shape, self.g, self.il))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, g, il = aux
        qs, scales, bias, qs8, s8 = children
        return cls(kind, shape, g, qs, scales, bias, il, qs8=qs8, s8=s8)


I8P_BLOCK = 256


def attach_int8_prefill(qt):
    """Return an I8PQTensor with the int8-g256 companion built on device;
    pass-through for shapes/kinds the prefill kernel can't take (dense,
    LoRA-carrying, expert/layer-stacked, K not a multiple of 256)."""
    if jax is None or not isinstance(qt, QTensor):
        return qt
    if (getattr(qt, "qs8", None) is not None
            or isinstance(qt, LoraQTensor)
            or qt.kind not in ("q4b", "q8b")
            or qt.shape[1] % I8P_BLOCK
            or getattr(qt.qs, "ndim", 0) != 2):   # stacked leaves: no i8p
        return qt
    k = qt.shape[1]
    ns = qt.qs.shape[-1]

    @jax.jit
    def build(qs, scales, bias):
        if qt.kind == "q4b":
            p = qs
            lo = (p & 0x0F).astype(jnp.int8).reshape(-1, 1, 128, ns)
            hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).reshape(-1, 1, 128,
                                                              ns)
            q = jnp.concatenate([lo, hi], axis=1).reshape(k, ns).astype(
                jnp.float32)
        else:
            q = qs.astype(jnp.float32)
        w = (q.reshape(k // qt.g, qt.g, ns)
             * scales[:, None, :].astype(jnp.float32)).reshape(k, ns)
        if bias is not None:
            w = w + jnp.repeat(bias.astype(jnp.float32), qt.g, axis=0)
        wb = w.reshape(k // I8P_BLOCK, I8P_BLOCK, ns)
        s = jnp.maximum(jnp.max(jnp.abs(wb), axis=1), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(wb / s[:, None, :]), -127, 127).astype(
            jnp.int8).reshape(k, ns)
        return q8, s.astype(jnp.float32)

    q8, s = build(qt.qs, qt.scales, qt.bias)
    return I8PQTensor(qt.kind, qt.shape, qt.g, qt.qs, qt.scales, qt.bias,
                      qt.il, qs8=q8, s8=s)


if jax is not None:
    jax.tree_util.register_pytree_node(
        I8PQTensor, I8PQTensor.tree_flatten, I8PQTensor.tree_unflatten)


@dataclass
class LoraQTensor(QTensor):
    """QTensor carrying LoRA low-rank deltas: y = x @ W.T + scale*(x@A.T)@B.T.

    The adapter stays UNMERGED (the reference's --lora merges into f16/f32
    tensors and refuses true-quantized bases without --lora-base,
    llama.cpp llama_apply_lora_from_file; keeping A/B as a runtime
    side-matmul preserves the quantized base exactly, costs only
    2*r*(K+N) flops per token, and lets --lora-scaled stack adapters).
    lora_a [r, K] bf16, lora_b [N, r] bf16, lora_scale f32 scalar."""
    lora_a: object = None
    lora_b: object = None
    lora_scale: float = 1.0

    def tree_flatten(self):
        return ((self.qs, self.scales, self.bias, self.lora_a, self.lora_b),
                (self.kind, self.shape, self.g, self.il, self.lora_scale))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, g, il, ls = aux
        qs, scales, bias, la, lb = children
        return cls(kind, shape, g, qs, scales, bias, il,
                   lora_a=la, lora_b=lb, lora_scale=ls)


if jax is not None:
    jax.tree_util.register_pytree_node(
        LoraQTensor, LoraQTensor.tree_flatten, LoraQTensor.tree_unflatten)


# ---------------------------------------------------------------------------
# Per-format (q, a, b) extraction. Layout refs in llamafile_tpu/gguf/quants.py.
# ---------------------------------------------------------------------------

def _pack_nibbles_sb128(qT: np.ndarray) -> np.ndarray:
    """int (K, N) values 0..15 -> uint8 (K/2, N), planar per 256-superblock on K."""
    k, n = qT.shape
    assert k % 256 == 0
    sb = qT.reshape(k // 256, 2, 128, n).astype(np.uint8)
    return (sb[:, 0] | (sb[:, 1] << 4)).reshape(k // 2, n)


def unpack_nibbles_sb128(p: np.ndarray) -> np.ndarray:
    """Inverse of _pack_nibbles_sb128 (host-side reference)."""
    k2, n = p.shape
    lo = (p & 0xF).reshape(k2 // 128, 1, 128, n)
    hi = (p >> 4).reshape(k2 // 128, 1, 128, n)
    return np.concatenate([lo, hi], axis=1).reshape(k2 * 2, n)


def _fold_hi_plane(a: np.ndarray, b: Optional[np.ndarray], g: int):
    """q4b kernel convention: the device kernel unpacks the hi nibble as
    int8((p ^ 0x80) & 0xF0) = 16*q_hi - 128 — two VPU ops, no shift (shifts
    don't legalize on int8 vectors). Fold the 16x and -128 into the group
    metadata: for hi-plane groups a' = a/16, b' = b + 8a, so
    a'*(16q - 128) + b' = a*q + b exactly (a is bf16-bound; /16 is exact)."""
    kg, n = a.shape
    rows_per_sb = 256 // g                 # groups per superblock
    hi = (np.arange(kg) % rows_per_sb) >= rows_per_sb // 2
    if b is None:
        b = np.zeros_like(a)
    b = b + np.where(hi[:, None], 8.0 * a, 0.0)
    a = np.where(hi[:, None], a / 16.0, a)
    return a.astype(np.float32), b.astype(np.float32)


def _extract_q4_0(b):
    d = Q._f16(b[:, 0:2])
    qs = b[:, 2:18]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1)          # (nb, 32) 0..15
    return q, d.astype(np.float32), (-8.0 * d).astype(np.float32), 32


def _extract_q4_1(b):
    d = Q._f16(b[:, 0:2])
    m = Q._f16(b[:, 2:4])
    qs = b[:, 4:20]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    return q, d, m, 32


def _extract_q5_0(b):
    d = Q._f16(b[:, 0:2])
    qh = Q._u32(b[:, 2:6]).reshape(-1, 1)
    qs = b[:, 6:22]
    j = np.arange(16, dtype=np.uint32)
    lo = (qs & 0xF) | (((qh >> j) & 1) << 4).astype(np.uint8)
    hi = (qs >> 4) | (((qh >> (j + 16)) & 1) << 4).astype(np.uint8)
    q = np.concatenate([lo, hi], axis=1)                      # 0..31
    return q, d, -16.0 * d, 32


def _extract_q5_1(b):
    d = Q._f16(b[:, 0:2])
    m = Q._f16(b[:, 2:4])
    qh = Q._u32(b[:, 4:8]).reshape(-1, 1)
    qs = b[:, 8:24]
    j = np.arange(16, dtype=np.uint32)
    lo = (qs & 0xF) | (((qh >> j) & 1) << 4).astype(np.uint8)
    hi = (qs >> 4) | (((qh >> (j + 16)) & 1) << 4).astype(np.uint8)
    return np.concatenate([lo, hi], axis=1), d, m, 32


def _extract_q8_0(b):
    d = Q._f16(b[:, 0:2])
    q = b[:, 2:34].view(np.int8)
    return q, d, None, 32


def _extract_q2_k(b):
    nb = b.shape[0]
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = Q._f16(b[:, 80:82])
    dmin = Q._f16(b[:, 82:84])
    q = np.empty((nb, 256), np.uint8)
    a = np.empty((nb, 16), np.float32)
    bb = np.empty((nb, 16), np.float32)
    for half in range(2):
        blkq = qs[:, 32 * half:32 * half + 32]
        for shift_i in range(4):
            qv = (blkq >> (2 * shift_i)) & 3
            for sub in range(2):
                is_ = 8 * half + sub + 2 * shift_i
                gidx = (128 * half + 32 * shift_i + 16 * sub) // 16
                q[:, 16 * gidx:16 * gidx + 16] = qv[:, 16 * sub:16 * sub + 16]
                a[:, gidx] = d[:, 0] * (scales[:, is_] & 0xF)
                bb[:, gidx] = -dmin[:, 0] * (scales[:, is_] >> 4).astype(np.float32)
    return q, a, bb, 16


def _extract_q3_k(b):
    nb = b.shape[0]
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    us = Q._q3k_scales(b[:, 96:108]).astype(np.float32)
    d = Q._f16(b[:, 108:110])
    q = np.empty((nb, 256), np.int8)
    a = np.empty((nb, 16), np.float32)
    for half in range(2):
        blkq = qs[:, 32 * half:32 * half + 32]
        for j in range(4):
            m = np.uint8(1 << (4 * half + j))
            qv = ((blkq >> (2 * j)) & 3).astype(np.int8)
            qv = qv - np.where((hmask & m) != 0, 0, 4).astype(np.int8)
            for sub in range(2):
                is_ = 8 * half + 2 * j + sub
                gidx = (128 * half + 32 * j + 16 * sub) // 16
                q[:, 16 * gidx:16 * gidx + 16] = qv[:, 16 * sub:16 * sub + 16]
                a[:, gidx] = d[:, 0] * (us[:, is_] - 32)
    return q, a, None, 16


def _extract_q4_k(b):
    d = Q._f16(b[:, 0:2])[:, 0]
    dmin = Q._f16(b[:, 2:4])[:, 0]
    sc, mn = Q._scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    nb = b.shape[0]
    q = np.empty((nb, 256), np.uint8)
    for blk in range(4):
        g = qs[:, 32 * blk:32 * blk + 32]
        q[:, 64 * blk:64 * blk + 32] = g & 0xF
        q[:, 64 * blk + 32:64 * blk + 64] = g >> 4
    a = d[:, None] * sc
    bb = -dmin[:, None] * mn
    return q, a, bb, 32


def _extract_q5_k(b):
    d = Q._f16(b[:, 0:2])[:, 0]
    dmin = Q._f16(b[:, 2:4])[:, 0]
    sc, mn = Q._scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    nb = b.shape[0]
    q = np.empty((nb, 256), np.uint8)
    for blk in range(4):
        g = qs[:, 32 * blk:32 * blk + 32]
        h1 = ((qh >> (2 * blk)) & 1) << 4
        h2 = ((qh >> (2 * blk + 1)) & 1) << 4
        q[:, 64 * blk:64 * blk + 32] = (g & 0xF) | h1
        q[:, 64 * blk + 32:64 * blk + 64] = (g >> 4) | h2
    return q, d[:, None] * sc, -dmin[:, None] * mn, 32


def _extract_q6_k(b):
    nb = b.shape[0]
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8).astype(np.float32)
    d = Q._f16(b[:, 208:210])[:, 0]
    q = np.empty((nb, 256), np.int8)
    for half in range(2):
        lq = ql[:, 64 * half:64 * half + 64]
        hq = qh[:, 32 * half:32 * half + 32]
        q[:, 128 * half + 0:128 * half + 32] = (
            ((lq[:, 0:32] & 0xF) | (((hq >> 0) & 3) << 4)).astype(np.int16) - 32)
        q[:, 128 * half + 32:128 * half + 64] = (
            ((lq[:, 32:64] & 0xF) | (((hq >> 2) & 3) << 4)).astype(np.int16) - 32)
        q[:, 128 * half + 64:128 * half + 96] = (
            ((lq[:, 0:32] >> 4) | (((hq >> 4) & 3) << 4)).astype(np.int16) - 32)
        q[:, 128 * half + 96:128 * half + 128] = (
            ((lq[:, 32:64] >> 4) | (((hq >> 6) & 3) << 4)).astype(np.int16) - 32)
    a = d[:, None] * scales
    return q, a, None, 16


def _extract_iq4_nl(b):
    d = Q._f16(b[:, 0:2])
    qs = b[:, 2:18]
    idx = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int64)
    return Q.KVALUES_IQ4NL[idx], d, None, 32


def _extract_iq4_xs(b):
    nb = b.shape[0]
    d = Q._f16(b[:, 0:2])[:, 0]
    scales_h = Q._u16(b[:, 2:4]).reshape(nb)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136].reshape(nb, 8, 16)
    ib = np.arange(8)
    ls = (((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF).astype(np.int32)
          | (((scales_h[:, None].astype(np.int32) >> (2 * ib)) & 3) << 4)) - 32
    a = d[:, None] * ls.astype(np.float32)
    idx_lo = (qs & 0xF).astype(np.int64)
    idx_hi = (qs >> 4).astype(np.int64)
    q = np.concatenate([Q.KVALUES_IQ4NL[idx_lo], Q.KVALUES_IQ4NL[idx_hi]], axis=2)
    return q.reshape(nb, 256), a, None, 32


def _extract_via_dequant_grid(name):
    """IQ2/IQ3/IQ1 formats: q = grid*sign int8 codes, a/b from the scale structure.

    We recover (q, a, b) from the vectorized dequantizers' internals rather than
    duplicating the bit plumbing: dequant y = a*q + b where a > 0 per group, and
    q is integral, so q = (y - b)/a computed in float is exact for these ranges.
    """
    spec = Q.TYPE_BY_NAME[name]

    def extract(b):
        nb = b.shape[0]
        y = spec.dequant(b)                              # (nb, 256) = a*q + b
        if name in ("IQ2_XXS", "IQ3_XXS"):
            g = 32
            if name == "IQ2_XXS":
                d = Q._f16(b[:, 0:2])[:, 0]
                q2 = Q._u16(b[:, 2:66]).reshape(nb, 8, 4)
                aux32 = (q2[:, :, 2].astype(np.uint32)
                         | (q2[:, :, 3].astype(np.uint32) << 16))
                a = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.25
            else:
                d = Q._f16(b[:, 0:2])[:, 0]
                aux32 = Q._u32(b[:, 66:98]).reshape(nb, 8)
                a = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.5
            bias = None
        elif name in ("IQ2_XS", "IQ2_S"):
            g = 16
            d = Q._f16(b[:, 0:2])[:, 0]
            scales = b[:, 66:74] if name == "IQ2_XS" else b[:, 74:82]
            sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)
            a = (d[:, None, None] * (0.5 + sc) * 0.25).reshape(nb, 16)
            bias = None
        elif name == "IQ3_S":
            g = 32
            d = Q._f16(b[:, 0:2])[:, 0]
            scales = b[:, 106:110]
            ls = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(nb, 8)
            a = d[:, None] * (1 + 2 * ls.astype(np.float32))
            bias = None
        elif name == "IQ1_S":
            g = 32
            d = Q._f16(b[:, 0:2])[:, 0]
            qh = Q._u16(b[:, 34:50]).reshape(nb, 8)
            a = d[:, None] * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)
            delta = np.where((qh & 0x8000) != 0, -Q.IQ1S_DELTA, Q.IQ1S_DELTA)
            bias = (a * delta).astype(np.float32)
        else:
            raise NotImplementedError(name)
        safe_a = np.where(a == 0, 1.0, a)
        rep = 256 // g
        a_full = np.repeat(a, g, axis=1)
        b_full = np.repeat(bias, g, axis=1) if bias is not None else 0.0
        q = np.rint((y - b_full) / np.repeat(np.where(a_full == 0, 1, a_full), 1, axis=1))
        q = np.where(a_full == 0, 0, q)
        assert np.abs(q).max() <= 127, name
        return q.astype(np.int8), a.astype(np.float32), bias, g

    return extract


def _extract_iq1_m(b):
    """IQ1_M: 1.75-bit grid codes with per-8 scales and +-delta offsets.
    Decomposes exactly at g=8: y = dl*(grid + delta) = a*q + bias with
    a = dl, q = grid (in -1/0/1), bias = dl*delta
    (layout: gguf/quants.py dequant_iq1_m)."""
    n = b.shape[0]
    qs = b[:, 0:32].reshape(n, 8, 4)
    qh = b[:, 32:48].reshape(n, 8, 2)
    sc16 = Q._u16(b[:, 48:56]).reshape(n, 4)
    d = ((sc16[:, 0] >> 12) | ((sc16[:, 1] >> 8) & 0x00F0)
         | ((sc16[:, 2] >> 4) & 0x0F00) | (sc16[:, 3] & 0xF000)
         ).astype(np.uint16)
    d = d[:, None].view(np.float16).astype(np.float32)[:, 0]
    il = np.arange(4)
    qh4 = qh[:, :, il // 2]
    hbits = (qh4.astype(np.int64) >> (4 * (il % 2))) & 0xF
    gidx = qs.astype(np.int64) | ((hbits & 7) << 8)
    grid = Q._grids()["iq1s_grid"][gidx]                 # (n, 8, 4, 8) int8
    ib = np.arange(8)
    ib16 = 2 * ib[:, None] + il[None, :] // 2
    sl = (sc16[:, ib16 // 4] >> (3 * (ib16 % 4)).astype(np.uint16)) & 7
    dl = d[:, None, None] * (2 * sl.astype(np.float32) + 1)
    delta = np.where((hbits & 8) != 0, -Q.IQ1M_DELTA,
                     Q.IQ1M_DELTA).astype(np.float32)
    q = grid.reshape(n, 256).astype(np.int8)
    a = dl.reshape(n, 32).astype(np.float32)
    bias = (dl * delta).reshape(n, 32).astype(np.float32)
    return q, a, bias, 8


_EXTRACTORS = {
    "Q4_0": _extract_q4_0, "Q4_1": _extract_q4_1,
    "Q5_0": _extract_q5_0, "Q5_1": _extract_q5_1,
    "Q8_0": _extract_q8_0,
    "Q2_K": _extract_q2_k, "Q3_K": _extract_q3_k, "Q4_K": _extract_q4_k,
    "Q5_K": _extract_q5_k, "Q6_K": _extract_q6_k,
    "IQ4_NL": _extract_iq4_nl, "IQ4_XS": _extract_iq4_xs,
    "IQ2_XXS": _extract_via_dequant_grid("IQ2_XXS"),
    "IQ2_XS": _extract_via_dequant_grid("IQ2_XS"),
    "IQ2_S": _extract_via_dequant_grid("IQ2_S"),
    "IQ3_XXS": _extract_via_dequant_grid("IQ3_XXS"),
    "IQ3_S": _extract_via_dequant_grid("IQ3_S"),
    "IQ1_S": _extract_via_dequant_grid("IQ1_S"),
    "IQ1_M": _extract_iq1_m,
}

# formats packed to 4-bit nibbles on device (others stay int8)
_NIBBLE_FORMATS = {"Q4_0", "Q4_1", "Q4_K"}


def repack_numpy(raw: np.ndarray, type_name: str, shape: tuple):
    """Host-side repack: raw block bytes -> (kind, qs, scales, bias, g) numpy arrays.

    shape = (N, K) with K contiguous (GGML mul_mat weight convention:
    W[rows=N, cols=K], y = x @ W.T).
    """
    n, k = int(np.prod(shape[:-1])), shape[-1]
    spec = Q.TYPE_BY_NAME[type_name]
    if type_name in ("F32", "F16", "BF16") or type_name not in _EXTRACTORS:
        w = Q.dequantize(raw, spec.type_id, (n, k))
        return "dense", np.ascontiguousarray(w.T), None, None, 0
    from ..native import native_repack
    nat = native_repack(raw, type_name, n, k)
    if nat is not None:
        return nat
    nblocks = n * k // spec.block_elems
    blocks = np.frombuffer(raw, np.uint8) if not isinstance(raw, np.ndarray) else raw
    blocks = blocks.reshape(nblocks, spec.block_bytes)
    q, a, b, g = _EXTRACTORS[type_name](blocks)
    qT = np.ascontiguousarray(q.reshape(n, k).T)                  # (K, N)
    a = np.ascontiguousarray(a.reshape(n, k // g).T, dtype=np.float32)
    if b is not None:
        b = np.ascontiguousarray(b.reshape(n, k // g).T, dtype=np.float32)
    if type_name in _NIBBLE_FORMATS and k % 256 == 0:
        a, b = _fold_hi_plane(a, b, g)
        return "q4b", _pack_nibbles_sb128(qT), a, b, g
    return "q8b", np.ascontiguousarray(qT.astype(np.int8)), a, b, g


def _pad_n(arrs, n: int, multiple: int = 2048):
    """Pad the N (last) axis of K-major arrays to a tile-friendly multiple —
    odd output dims (e.g. llama3's 128256 vocab) otherwise force small lane
    tiles and ~2x the grid steps in the matmul kernel. Logical N stays in
    QTensor.shape; qmatmul slices the output."""
    pad = (-n) % multiple
    if pad == 0:
        return arrs
    return [None if a is None else
            np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]) for a in arrs]


def repack(raw: np.ndarray, type_name: str, shape: tuple,
           device_put=None) -> QTensor:
    """Repack to a device QTensor. device_put maps np arrays to jax arrays
    (default jnp.asarray; pass a sharded putter for multi-chip loads).

    Scales/bias are stored bf16 on device: the kernel multiplies in bf16
    regardless (the weight is rounded to bf16 for the MXU), and f32 group
    metadata would add ~25% HBM traffic on 4-bit formats.
    """
    kind, qs, a, b, g = repack_numpy(raw, type_name, shape)
    n, k = int(np.prod(shape[:-1])), shape[-1]
    put = device_put or (lambda x: jnp.asarray(x))
    if kind == "dense":
        return QTensor("dense", (n, k), 0, put(qs.astype(np.float32)).astype(jnp.bfloat16), None, None)
    qs, a, b = _pad_n([qs, a, b], n)
    return QTensor(kind, (n, k), g, put(qs),
                   put(a.astype(np.float32)).astype(jnp.bfloat16),
                   put(b.astype(np.float32)).astype(jnp.bfloat16)
                   if b is not None else None)


def dequant_qtensor_numpy(kind, qs, a, b, g, shape) -> np.ndarray:
    """Host reference: reconstruct f32 [N, K] weights from repacked arrays
    (q4b uses the folded-hi-plane kernel convention: see _fold_hi_plane)."""
    n, k = shape
    if kind == "dense":
        return np.asarray(qs, np.float32).T
    if kind == "q4b":
        p = np.asarray(qs)
        k2 = p.shape[0]
        lo = (p & 0x0F).astype(np.int8).reshape(k2 // 128, 1, 128, n)
        hi = ((p ^ 0x80) & 0xF0).astype(np.int8).reshape(k2 // 128, 1, 128, n)
        q = np.concatenate([lo, hi], axis=1).reshape(k, n).astype(np.float32)
    else:
        q = np.asarray(qs, np.int8).reshape(k, n).astype(np.float32)
    w = q * np.repeat(np.asarray(a, np.float32), g, axis=0)
    if b is not None:
        w = w + np.repeat(np.asarray(b, np.float32), g, axis=0)
    return w.T


def slice_qtensor_cols(qt: QTensor, a: int, b: int) -> QTensor:
    """Exact column slice [a, b) of the logical N axis (K-major storage axis
    -1): splits fused projections (e.g. phi3's attn_qkv / gate_up wire
    tensors) without requantization."""
    return QTensor(qt.kind, (b - a, qt.shape[1]), qt.g,
                   qt.qs[..., a:b],
                   None if qt.scales is None else qt.scales[..., a:b],
                   None if qt.bias is None else qt.bias[..., a:b])


def concat_qtensors(qts):
    """Fuse column-parallel projections: concatenate along N (axis 1 of the
    K-major storage). Requires identical kind/g/K; missing biases become
    zeros so the fused tensor has one uniform bias path. Storage may carry
    N tile padding — strip to each tensor's logical N before concatenating
    (the fused result is repadded by construction of its own slices)."""
    kind, g = qts[0].kind, qts[0].g
    k = qts[0].shape[1]
    assert all(q.kind == kind and q.g == g and q.shape[1] == k for q in qts)
    n_total = sum(q.shape[0] for q in qts)

    def logical(arr, qt):
        return None if arr is None else arr[..., : qt.shape[0]]

    qs = jnp.concatenate([logical(q.qs, q) for q in qts], axis=1)
    if kind == "dense":
        return QTensor(kind, (n_total, k), g, qs, None, None)
    scales = jnp.concatenate([logical(q.scales, q) for q in qts], axis=1)
    if any(q.bias is not None for q in qts):
        bias = jnp.concatenate(
            [logical(q.bias if q.bias is not None else jnp.zeros_like(q.scales), q)
             for q in qts], axis=1)
    else:
        bias = None
    return QTensor(kind, (n_total, k), g, qs, scales, bias)


def interleave_gateup(g_qt: QTensor, u_qt: QTensor) -> QTensor:
    """Fuse a dense-FFN gate/up pair into ONE il-layout QTensor: columns
    hold [g0|u0|g1|u1|...] in GU_STRIPE-wide stripes — the fused FFN
    kernel's weight layout (ops.qmatmul._qmm_kernel_moe_m1: each 2048-wide
    output tile holds a g/u stripe pair so silu(g)*u runs in the tile
    epilogue). Matmul outputs de-interleave with qmatmul.split_gu.
    Caller guarantees: same kind/g/K, q4b, dff % GU_STRIPE == 0."""
    from .qmatmul import GU_STRIPE
    dff = g_qt.shape[0]
    assert g_qt.kind == u_qt.kind and g_qt.g == u_qt.g \
        and g_qt.shape == u_qt.shape and dff % GU_STRIPE == 0

    def cat(a, b):
        if a is None:
            return None
        lead = a.shape[:-1]
        p = jnp.stack(
            [a[..., :dff].reshape(*lead, dff // GU_STRIPE, GU_STRIPE),
             b[..., :dff].reshape(*lead, dff // GU_STRIPE, GU_STRIPE)],
            axis=-2)
        return p.reshape(*lead, 2 * dff)

    return QTensor(g_qt.kind, (2 * dff, g_qt.shape[1]), g_qt.g,
                   cat(g_qt.qs, u_qt.qs), cat(g_qt.scales, u_qt.scales),
                   cat(g_qt.bias, u_qt.bias), True)


def stack_experts(experts: dict, n_experts: int,
                  fuse_gate_up: bool = False,
                  interleave: bool = True) -> dict:
    """Per-expert QTensors ("gate.{e}"...) -> one QTensor per role with a
    leading expert dim: qs [E, K(/2), N], scales/bias [E, K/g, N].

    The expert-stacked layout is what qmatmul_routed's scalar-prefetch
    indexing needs on a single chip AND what EP shards over the mesh (axis 0)
    — replaces the reference MixMul's per-expert row-pointer lists
    (tinyblas_cpu_mixmul.inc:100-111). Raises KeyError/ValueError on
    heterogeneous expert sets (caller keeps the per-expert dict then).

    fuse_gate_up: concatenate gate and up along N into one "gateup" tensor —
    one routed/grouped kernel call (and one activation-quantize prep) serves
    both projections per layer, halving fixed per-pallas-call overheads at
    decode. Applied only when gate's storage N is unpadded (the split point
    must be the logical d_ff); falls back to separate gate/up otherwise."""
    out = {}
    for role in ("gate", "up", "down"):
        qts = [experts[f"{role}.{e}"] for e in range(n_experts)]
        kind, shape, g = qts[0].kind, qts[0].shape, qts[0].g
        if any(q.kind != kind or q.shape != shape or q.g != g for q in qts):
            raise ValueError(f"heterogeneous experts for {role}")
        qs = jnp.stack([q.qs for q in qts])
        scales = (jnp.stack([q.scales for q in qts])
                  if qts[0].scales is not None else None)
        bias = (jnp.stack([q.bias for q in qts])
                if qts[0].bias is not None else None)
        out[role] = QTensor(kind, shape, g, qs, scales, bias)
    g_qt, u_qt = out["gate"], out["up"]
    dff = g_qt.shape[0]
    if (fuse_gate_up and g_qt.kind != "dense" and dff % 128 == 0
            and g_qt.shape == u_qt.shape and g_qt.kind == u_qt.kind
            and g_qt.g == u_qt.g      # mismatched group sizes can't concat
            and (g_qt.bias is None) == (u_qt.bias is None)):
        # storage may be tile-padded past the logical d_ff; strip it so the
        # concat boundary IS d_ff (the split point moe_ffn uses)
        from .qmatmul import GU_STRIPE
        if interleave and g_qt.kind == "q4b" and dff % GU_STRIPE == 0:
            # 1024-stripe interleave [g0|u0|g1|u1|...]: the fused routed-FFN
            # kernel's layout (each 2048-wide output tile holds a g/u pair
            # so silu(g)*u happens in the tile epilogue — ops.qmatmul
            # _qmm_kernel_moe_m1). Consumers de-interleave matmul OUTPUTS
            # with qmatmul.split_gu; the key name is the layout marker.
            def cat(a, b):
                if a is None:
                    return None
                lead = a.shape[:-1]
                p = jnp.stack(
                    [a[..., :dff].reshape(*lead, dff // GU_STRIPE, GU_STRIPE),
                     b[..., :dff].reshape(*lead, dff // GU_STRIPE, GU_STRIPE)],
                    axis=-2)
                return p.reshape(*lead, 2 * dff)
            key = "gateup_il"
        else:
            cat = lambda a, b: (None if a is None else
                                jnp.concatenate([a[..., :dff], b[..., :dff]],
                                                axis=-1))
            key = "gateup"
        out[key] = QTensor(
            g_qt.kind, (2 * dff, g_qt.shape[1]), g_qt.g,
            cat(g_qt.qs, u_qt.qs), cat(g_qt.scales, u_qt.scales),
            cat(g_qt.bias, u_qt.bias), key == "gateup_il")
        del out["gate"], out["up"]
    for k, v in experts.items():     # qwen2moe/deepseek2 shared expert
        if k.startswith("shexp."):
            out[k] = v
    return out


def expert_slice(qt: QTensor, e) -> QTensor:
    """View of expert e from an expert-stacked QTensor (static or traced e)."""
    if isinstance(e, int):
        return QTensor(qt.kind, qt.shape, qt.g, qt.qs[e],
                       None if qt.scales is None else qt.scales[e],
                       None if qt.bias is None else qt.bias[e], qt.il)
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, e, 0, keepdims=False)
    return QTensor(qt.kind, qt.shape, qt.g, idx(qt.qs),
                   None if qt.scales is None else idx(qt.scales),
                   None if qt.bias is None else idx(qt.bias), qt.il)
