"""GGML/GGUF quantization block formats: registry + vectorized reference (de)quantization.

This is the TPU framework's analog of llamafile's ggml-quants layer
(reference: llama.cpp.patches/llamafile-files/ggml-quants.cpp and the dequantize_block_*
kernels in llama.cpp.patches/patches/ggml-cuda.cu.patch:3150-3700). Unlike the reference,
which hand-vectorizes per µarch, we keep a single vectorized numpy implementation: it is
the *golden semantics* used (a) to validate the Pallas fused dequant-matmul kernels
bit-for-bit, (b) as the load-time dequant path for formats that are repacked to a
TPU-friendly layout rather than decoded on-chip.

All dequantizers take raw little-endian block bytes shaped (nblocks, block_bytes) as
uint8 and return float32 (nblocks, block_elems). Layouts follow ggml-common.h exactly
(QK_K = 256 superblocks for K/IQ quants, 32-element blocks for the Q*_0/1 family).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import numpy as np

QK = 32       # simple-quant block size
QK_K = 256    # K-quant / IQ-quant superblock size

# Non-linear 4-bit codebook for IQ4_NL / IQ4_XS
# (reference: ggml-cuda.cu.patch:1128)
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.int8,
)

_GRIDS: Optional[dict] = None


def _grids() -> dict:
    """Lazily load IQ codebook grids extracted from the reference format definition."""
    global _GRIDS
    if _GRIDS is None:
        path = os.path.join(os.path.dirname(__file__), "iq_grids.npz")
        _GRIDS = dict(np.load(path))
    return _GRIDS


def _f16(u8pair: np.ndarray) -> np.ndarray:
    """View little-endian byte pairs as float16 -> float32."""
    return np.ascontiguousarray(u8pair).view(np.float16).astype(np.float32)


def _u16(b: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(b).view(np.uint16)


def _u32(b: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(b).view(np.uint32)


# ---------------------------------------------------------------------------
# Simple 32-element block formats
# ---------------------------------------------------------------------------

def dequant_q4_0(b: np.ndarray) -> np.ndarray:
    # block: ggml_half d; uint8 qs[16]; w[j] = d*((qs[j]&0xF)-8), w[j+16] = d*((qs[j]>>4)-8)
    n = b.shape[0]
    d = _f16(b[:, 0:2])                      # (n,1)
    qs = b[:, 2:18]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    return d * np.concatenate([lo, hi], axis=1).astype(np.float32)


def dequant_q4_1(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qs = b[:, 4:20]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    return d * np.concatenate([lo, hi], axis=1) + m


def dequant_q5_0(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, 0:2])
    qh = _u32(b[:, 2:6]).reshape(-1, 1)      # (n,1)
    qs = b[:, 6:22]
    j = np.arange(16, dtype=np.uint32)
    hlo = ((qh >> j) & 1).astype(np.uint8) << 4
    hhi = ((qh >> (j + 16)) & 1).astype(np.uint8) << 4
    lo = ((qs & 0x0F) | hlo).astype(np.int16) - 16
    hi = ((qs >> 4) | hhi).astype(np.int16) - 16
    return d * np.concatenate([lo, hi], axis=1).astype(np.float32)


def dequant_q5_1(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qh = _u32(b[:, 4:8]).reshape(-1, 1)
    qs = b[:, 8:24]
    j = np.arange(16, dtype=np.uint32)
    hlo = ((qh >> j) & 1).astype(np.uint8) << 4
    hhi = ((qh >> (j + 16)) & 1).astype(np.uint8) << 4
    lo = ((qs & 0x0F) | hlo).astype(np.float32)
    hi = ((qs >> 4) | hhi).astype(np.float32)
    return d * np.concatenate([lo, hi], axis=1) + m


def dequant_q8_0(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].view(np.int8)
    return d * qs.astype(np.float32)


def dequant_q8_1(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, 0:2])
    qs = b[:, 4:36].view(np.int8)
    return d * qs.astype(np.float32)


# ---------------------------------------------------------------------------
# K-quant superblocks (QK_K = 256)
# ---------------------------------------------------------------------------

def dequant_q2_k(b: np.ndarray) -> np.ndarray:
    # block: uint8 scales[16]; uint8 qs[64]; half d; half dmin
    # (reference semantics: ggml-cuda.cu.patch dequantize_block_q2_K)
    n = b.shape[0]
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    y = np.empty((n, QK_K), dtype=np.float32)
    for half in range(2):               # n = 0,1 -> elements 128*half ...
        q = qs[:, 32 * half:32 * half + 32]            # (n,32)
        for shift_i in range(4):        # rows of 32 within the 128-half
            qv = ((q >> (2 * shift_i)) & 3).astype(np.float32)
            # scale index: is = 8*half + l/16 + 2*shift_i  (l in 0..32)
            for sub in range(2):        # l/16
                is_ = 8 * half + sub + 2 * shift_i
                sc = scales[:, is_:is_ + 1]
                dl = d * (sc & 0xF).astype(np.float32)
                ml = dmin * (sc >> 4).astype(np.float32)
                cols = slice(128 * half + 32 * shift_i + 16 * sub,
                             128 * half + 32 * shift_i + 16 * sub + 16)
                y[:, cols] = dl * qv[:, 16 * sub:16 * sub + 16] - ml
    return y


def _q3k_scales(scales: np.ndarray) -> np.ndarray:
    """Unpack 12 bytes -> 16 signed 6-bit scales (already -32 applied? No: raw 0..63)."""
    # us[is] per ggml-cuda.cu.patch:3290-3295
    n = scales.shape[0]
    us = np.empty((n, 16), dtype=np.int8)
    s = scales.astype(np.uint8)
    for is_ in range(16):
        if is_ < 4:
            v = (s[:, is_] & 0xF) | (((s[:, is_ + 8] >> 0) & 3) << 4)
        elif is_ < 8:
            v = (s[:, is_] & 0xF) | (((s[:, is_ + 4] >> 2) & 3) << 4)
        elif is_ < 12:
            v = (s[:, is_ - 8] >> 4) | (((s[:, is_] >> 4) & 3) << 4)
        else:
            v = (s[:, is_ - 8] >> 4) | (((s[:, is_ - 4] >> 6) & 3) << 4)
        us[:, is_] = v.astype(np.int8)
    return us


def dequant_q3_k(b: np.ndarray) -> np.ndarray:
    # block: uint8 hmask[32]; uint8 qs[64]; uint8 scales[12]; half d
    n = b.shape[0]
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    us = _q3k_scales(b[:, 96:108])
    d = _f16(b[:, 108:110])
    y = np.empty((n, QK_K), dtype=np.float32)
    for half in range(2):
        q = qs[:, 32 * half:32 * half + 32]
        for j in range(4):
            m = np.uint8(1 << (4 * half + j))
            qv = ((q >> (2 * j)) & 3).astype(np.int8)
            hm = hmask[:, 32 * half * 0:]  # hmask covers all 256 via l index 0..32
            # hmask index = l (0..31) within this half? No: hm[l] where l spans the
            # same 32 bytes for all shifts; bit selects (4*half + j).
            hbits = (hmask & m) != 0       # (n,32) — applies to q columns l=0..31
            qv = qv - np.where(hbits, 0, 4).astype(np.int8)
            for sub in range(2):
                is_ = 8 * half + 2 * j + sub
                dl = d[:, 0] * (us[:, is_].astype(np.float32) - 32)
                cols = slice(128 * half + 32 * j + 16 * sub,
                             128 * half + 32 * j + 16 * sub + 16)
                y[:, cols] = dl[:, None] * qv[:, 16 * sub:16 * sub + 16].astype(np.float32)
    return y


def _scale_min_k4(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack 12-byte K-quant scales into 8 (scale, min) 6-bit pairs.

    Reference: get_scale_min_k4 in ggml-cuda.cu.patch.
    """
    n = scales.shape[0]
    sc = np.empty((n, 8), dtype=np.float32)
    mn = np.empty((n, 8), dtype=np.float32)
    q = scales
    for j in range(8):
        if j < 4:
            sc[:, j] = (q[:, j] & 63).astype(np.float32)
            mn[:, j] = (q[:, j + 4] & 63).astype(np.float32)
        else:
            sc[:, j] = ((q[:, j + 4] & 0xF) | ((q[:, j - 4] >> 6) << 4)).astype(np.float32)
            mn[:, j] = ((q[:, j + 4] >> 4) | ((q[:, j] >> 6) << 4)).astype(np.float32)
    return sc, mn


def dequant_q4_k(b: np.ndarray) -> np.ndarray:
    # block: half d; half dmin; uint8 scales[12]; uint8 qs[128]
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    dmin = _f16(b[:, 2:4])[:, 0]
    sc, mn = _scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    y = np.empty((n, QK_K), dtype=np.float32)
    for blk in range(4):                 # 64-element chunks, each with 2 sub-scales
        q = qs[:, 32 * blk:32 * blk + 32]
        d1 = (d * sc[:, 2 * blk])[:, None]
        m1 = (dmin * mn[:, 2 * blk])[:, None]
        d2 = (d * sc[:, 2 * blk + 1])[:, None]
        m2 = (dmin * mn[:, 2 * blk + 1])[:, None]
        y[:, 64 * blk:64 * blk + 32] = d1 * (q & 0xF).astype(np.float32) - m1
        y[:, 64 * blk + 32:64 * blk + 64] = d2 * (q >> 4).astype(np.float32) - m2
    return y


def dequant_q5_k(b: np.ndarray) -> np.ndarray:
    # block: half d; half dmin; uint8 scales[12]; uint8 qh[32]; uint8 qs[128]
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    dmin = _f16(b[:, 2:4])[:, 0]
    sc, mn = _scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    y = np.empty((n, QK_K), dtype=np.float32)
    for blk in range(4):
        q = qs[:, 32 * blk:32 * blk + 32]
        h1 = ((qh >> (2 * blk)) & 1).astype(np.float32) * 16.0
        h2 = ((qh >> (2 * blk + 1)) & 1).astype(np.float32) * 16.0
        d1 = (d * sc[:, 2 * blk])[:, None]
        m1 = (dmin * mn[:, 2 * blk])[:, None]
        d2 = (d * sc[:, 2 * blk + 1])[:, None]
        m2 = (dmin * mn[:, 2 * blk + 1])[:, None]
        y[:, 64 * blk:64 * blk + 32] = d1 * ((q & 0xF).astype(np.float32) + h1) - m1
        y[:, 64 * blk + 32:64 * blk + 64] = d2 * ((q >> 4).astype(np.float32) + h2) - m2
    return y


def dequant_q6_k(b: np.ndarray) -> np.ndarray:
    # block: uint8 ql[128]; uint8 qh[64]; int8 scales[16]; half d
    n = b.shape[0]
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8).astype(np.float32)
    d = _f16(b[:, 208:210])[:, 0]
    y = np.empty((n, QK_K), dtype=np.float32)
    for half in range(2):                # 128-element halves
        lq = ql[:, 64 * half:64 * half + 64]
        hq = qh[:, 32 * half:32 * half + 32]
        # l in 0..32 -> 4 output rows at offsets 0,32,64,96 within the half
        q1 = ((lq[:, 0:32] & 0xF) | (((hq >> 0) & 3) << 4)).astype(np.int16) - 32
        q2 = ((lq[:, 32:64] & 0xF) | (((hq >> 2) & 3) << 4)).astype(np.int16) - 32
        q3 = ((lq[:, 0:32] >> 4) | (((hq >> 4) & 3) << 4)).astype(np.int16) - 32
        q4 = ((lq[:, 32:64] >> 4) | (((hq >> 6) & 3) << 4)).astype(np.int16) - 32
        for row, q in enumerate((q1, q2, q3, q4)):
            for sub in range(2):         # is = 8*half + row*2 + l/16
                is_ = 8 * half + 2 * row + sub
                dl = (d * scales[:, is_])[:, None]
                cols = slice(128 * half + 32 * row + 16 * sub,
                             128 * half + 32 * row + 16 * sub + 16)
                y[:, cols] = dl * q[:, 16 * sub:16 * sub + 16].astype(np.float32)
    return y


def dequant_q8_k(b: np.ndarray) -> np.ndarray:
    # block: float d; int8 qs[256]; int16 bsums[16]
    d = _u32(b[:, 0:4]).view(np.float32)
    qs = b[:, 4:260].view(np.int8)
    return d * qs.astype(np.float32)


# ---------------------------------------------------------------------------
# IQ (importance-quant) formats — codebook grids from iq_grids.npz
# ---------------------------------------------------------------------------

def _signs_from_ksigns(idx: np.ndarray) -> np.ndarray:
    """ksigns index (n,g) -> sign multipliers (n,g,8) of ±1 float32."""
    ks = _grids()["ksigns_iq2xs"][idx]          # (n,g) uint8
    bits = (ks[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 1, -1.0, 1.0).astype(np.float32)


def _signs_from_bytes(sb: np.ndarray) -> np.ndarray:
    bits = (sb[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 1, -1.0, 1.0).astype(np.float32)


def dequant_iq2_xxs(b: np.ndarray) -> np.ndarray:
    # block: half d; uint16 qs[32]  (per 32 elems: 4 grid-index bytes + u32 signs/scale)
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    q2 = _u16(b[:, 2:66]).reshape(n, 8, 4)       # (n, ib32, 4 u16)
    aux8 = np.ascontiguousarray(q2[:, :, 0:2]).view(np.uint8).reshape(n, 8, 4)
    aux32 = (q2[:, :, 2].astype(np.uint32) | (q2[:, :, 3].astype(np.uint32) << 16))
    db = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.25   # (n,8)
    grid = _grids()["iq2xxs_grid"][aux8]         # (n,8,4,8) uint8
    signs = _signs_from_ksigns(
        ((aux32[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127).astype(np.int64)
    )                                            # (n,8,4,8)
    y = db[:, :, None, None] * grid.astype(np.float32) * signs
    return y.reshape(n, QK_K)


def dequant_iq2_xs(b: np.ndarray) -> np.ndarray:
    # block: half d; uint16 qs[32]; uint8 scales[8]
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    q2 = _u16(b[:, 2:66]).reshape(n, 8, 4)
    scales = b[:, 66:74]
    grid = _grids()["iq2xs_grid"][(q2 & 511).astype(np.int64)]     # (n,8,4,8)
    signs = _signs_from_ksigns((q2 >> 9).astype(np.int64))
    sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)  # (n,8,2)
    db = d[:, None, None] * (0.5 + sc) * 0.25                       # (n,8,2)
    db4 = np.repeat(db, 2, axis=2)                                  # (n,8,4) il/2
    y = db4[..., None] * grid.astype(np.float32) * signs
    return y.reshape(n, QK_K)


def dequant_iq2_s(b: np.ndarray) -> np.ndarray:
    # block: half d; uint8 qs[64]; uint8 qh[8]; uint8 scales[8]
    # qs[0:32] grid low bytes, qs[32:64] sign bytes
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    qs = b[:, 2:34].reshape(n, 8, 4)
    sgn = b[:, 34:66].reshape(n, 8, 4)
    qh = b[:, 66:74]
    scales = b[:, 74:82]
    il = np.arange(4)
    gidx = qs.astype(np.int64) | (
        ((qh[:, :, None].astype(np.int64) << (8 - 2 * il)) & 0x300)
    )
    grid = _grids()["iq2s_grid"][gidx]
    signs = _signs_from_bytes(sgn)
    sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)
    db4 = np.repeat(d[:, None, None] * (0.5 + sc) * 0.25, 2, axis=2)
    y = db4[..., None] * grid.astype(np.float32) * signs
    return y.reshape(n, QK_K)


def dequant_iq3_xxs(b: np.ndarray) -> np.ndarray:
    # block: half d; uint8 qs[96]  (64 grid bytes + 32 bytes of sign/scale u32 per ib32)
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    q3 = b[:, 2:66].reshape(n, 8, 8)             # 8 grid indices per 32 elems
    aux32 = _u32(b[:, 66:98]).reshape(n, 8)
    db = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.5
    grid = _grids()["iq3xxs_grid"][q3.astype(np.int64)]      # (n,8,8,4)
    signs = _signs_from_ksigns(
        ((aux32[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127).astype(np.int64)
    )                                            # (n,8,4,8)
    vals = grid.astype(np.float32).reshape(n, 8, 4, 8)       # 2 grids of 4 per sign grp
    y = db[:, :, None, None] * vals * signs
    return y.reshape(n, QK_K)


def dequant_iq3_s(b: np.ndarray) -> np.ndarray:
    # block: half d; uint8 qs[64]; uint8 qh[8]; uint8 signs[32]; uint8 scales[4]
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    qs = b[:, 2:66].reshape(n, 8, 8)
    qh = b[:, 66:74]
    sgn = b[:, 74:106].reshape(n, 8, 4)
    scales = b[:, 106:110]
    j = np.arange(8)
    gidx = qs.astype(np.int64) | (((qh[:, :, None].astype(np.int64) << (8 - j)) & 256))
    grid = _grids()["iq3s_grid"][gidx]           # (n,8,8,4)
    signs = _signs_from_bytes(sgn)               # (n,8,4,8)
    ls = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(n, 8)  # per ib32
    db = d[:, None] * (1 + 2 * ls.astype(np.float32))
    vals = grid.astype(np.float32).reshape(n, 8, 4, 8)
    y = db[:, :, None, None] * vals * signs
    return y.reshape(n, QK_K)


IQ1S_DELTA = 0.125


def dequant_iq1_s(b: np.ndarray) -> np.ndarray:
    # block: half d; uint8 qs[32]; uint16 qh[8]
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    qs = b[:, 2:34].reshape(n, 8, 4)
    qh = _u16(b[:, 34:50]).reshape(n, 8)
    il = np.arange(4)
    gidx = qs.astype(np.int64) | (
        (((qh[:, :, None].astype(np.int64) >> (3 * il)) & 7) << 8)
    )
    grid = _grids()["iq1s_grid"][gidx].astype(np.float32)    # (n,8,4,8)
    dl = d[:, None] * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)
    delta = np.where((qh & 0x8000) != 0, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
    y = dl[:, :, None, None] * (grid + delta[:, :, None, None])
    return y.reshape(n, QK_K)


IQ1M_DELTA = 0.125


def dequant_iq1_m(b: np.ndarray) -> np.ndarray:
    # block: uint8 qs[32]; uint8 qh[16]; uint8 scales[8] — d is hidden in scales nibbles
    n = b.shape[0]
    qs = b[:, 0:32].reshape(n, 8, 4)
    qh = b[:, 32:48].reshape(n, 8, 2)            # per ib32: 2 bytes, nibble per il-pair
    sc16 = _u16(b[:, 48:56]).reshape(n, 4)
    d = ((sc16[:, 0] >> 12) | ((sc16[:, 1] >> 8) & 0x00F0)
         | ((sc16[:, 2] >> 4) & 0x0F00) | (sc16[:, 3] & 0xF000)).astype(np.uint16)
    d = d[:, None].view(np.float16).astype(np.float32)[:, 0]
    il = np.arange(4)
    qh4 = qh[:, :, il // 2]                      # (n,8,4)
    hbits = (qh4.astype(np.int64) >> (4 * (il % 2))) & 0xF
    gidx = qs.astype(np.int64) | ((hbits & 7) << 8)
    grid = _grids()["iq1s_grid"][gidx].astype(np.float32)
    # scale: ib16 = 2*ib + il/2; sc[ib16/4] >> 3*(ib16%4) & 7
    ib = np.arange(8)
    ib16 = 2 * ib[:, None] + il[None, :] // 2    # (8,4)
    sl = (sc16[:, ib16 // 4] >> (3 * (ib16 % 4)).astype(np.uint16)) & 7   # (n,8,4)
    dl = d[:, None, None] * (2 * sl.astype(np.float32) + 1)
    delta = np.where((hbits & 8) != 0, -IQ1M_DELTA, IQ1M_DELTA).astype(np.float32)
    y = dl[..., None] * (grid + delta[..., None])
    return y.reshape(n, QK_K)


def dequant_iq4_nl(b: np.ndarray) -> np.ndarray:
    # block (32 elems): half d; uint8 qs[16]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:18]
    lo = KVALUES_IQ4NL[(qs & 0xF).astype(np.int64)].astype(np.float32)
    hi = KVALUES_IQ4NL[(qs >> 4).astype(np.int64)].astype(np.float32)
    return d * np.concatenate([lo, hi], axis=1)


def dequant_iq4_xs(b: np.ndarray) -> np.ndarray:
    # block: half d; uint16 scales_h; uint8 scales_l[4]; uint8 qs[128]
    n = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    scales_h = _u16(b[:, 2:4]).reshape(n)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136].reshape(n, 8, 16)
    ib = np.arange(8)
    ls = (((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF).astype(np.int32)
          | (((scales_h[:, None].astype(np.int32) >> (2 * ib)) & 3) << 4)) - 32
    dl = d[:, None] * ls.astype(np.float32)      # (n,8)
    lo = KVALUES_IQ4NL[(qs & 0xF).astype(np.int64)].astype(np.float32)
    hi = KVALUES_IQ4NL[(qs >> 4).astype(np.int64)].astype(np.float32)
    y = dl[:, :, None] * np.concatenate([lo, hi], axis=2)    # (n,8,32)
    return y.reshape(n, QK_K)


# ---------------------------------------------------------------------------
# Reference quantizers (for the quantize tool, writer, and round-trip tests)
# ---------------------------------------------------------------------------

def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    """float32 (n, 32) -> raw q8_0 blocks (n, 34). Mirrors quantize_row_q8_0_ref."""
    x = x.astype(np.float32).reshape(-1, QK)
    amax = np.abs(x).max(axis=1)
    d = amax / 127.0
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    qs = np.round(x * id_[:, None]).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:34] = qs.view(np.uint8)
    return out


def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    """float32 (n, 32) -> raw q4_0 blocks (n, 18). Mirrors quantize_row_q4_0_ref."""
    x = x.astype(np.float32).reshape(-1, QK)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = maxv / -8.0
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    xi = np.clip((x * id_[:, None] + 8.5).astype(np.int32), 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:18] = xi[:, 0:16] | (xi[:, 16:32] << 4)
    return out


def _make_qkx2_quants(x: np.ndarray, nmax: int, weights: np.ndarray,
                      rmin: float = -1.0, rdelta: float = 0.1,
                      nstep: int = 20, use_mad: bool = False):
    """Vectorized make_qkx2_quants (llama.cpp K-quant scale/min search).

    x: (nb, 32) float32 groups. Returns (scale, min) per group, both float32 >= 0 min.
    """
    nb = x.shape[0]
    minv = np.minimum(x.min(axis=1), 0.0)
    maxv = x.max(axis=1)
    flat = maxv == minv
    sum_w = weights.sum(axis=1)
    sum_x = (weights * x).sum(axis=1)
    iscale = nmax / (maxv - np.where(flat, minv - 1, minv))
    scale = 1.0 / iscale

    def quant_err(iscale, minv):
        l = np.clip(np.round(iscale[:, None] * (x - minv[:, None])), 0, nmax)
        sum_l = (weights * l).sum(axis=1)
        sum_l2 = (weights * l * l).sum(axis=1)
        sum_xl = (weights * l * x).sum(axis=1)
        D = sum_w * sum_l2 - sum_l * sum_l
        this_scale = np.where(D > 0, (sum_w * sum_xl - sum_x * sum_l) / np.where(D > 0, D, 1), scale)
        this_min = np.where(D > 0, (sum_l2 * sum_x - sum_l * sum_xl) / np.where(D > 0, D, 1), minv)
        pos_min = this_min > 0
        this_min = np.where(pos_min, 0.0, this_min)
        this_scale = np.where(pos_min & (sum_l > 0), sum_xl / np.where(sum_l > 0, sum_l, 1), this_scale)
        diff = this_scale[:, None] * l + this_min[:, None] - x
        err = (weights * diff * diff).sum(axis=1)
        return this_scale, this_min, err

    best_scale, best_min, best_err = quant_err(iscale, minv)
    for is_ in range(nstep + 1):
        iscale_try = (rmin + rdelta * is_ + nmax) / (maxv - np.where(flat, minv - 1, minv))
        s, m, e = quant_err(iscale_try, minv)
        better = e < best_err
        best_scale = np.where(better, s, best_scale)
        best_min = np.where(better, m, best_min)
        best_err = np.where(better, e, best_err)
    best_min = np.minimum(best_min, 0.0)
    return best_scale, -best_min


def quantize_q4_k(x: np.ndarray, qweights: Optional[np.ndarray] = None) -> np.ndarray:
    """float32 (n, 256) -> raw q4_K blocks (n, 144).

    Follows quantize_row_q4_K_ref: per-32 group scale/min search (make_qkx2_quants with
    sum-x^2 weights), 6-bit global-normalized scales, then nibble packing.
    qweights: optional importance weights (imatrix), same shape as x flattened —
    biases the scale search toward columns that matter at runtime.
    """
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    g = x.reshape(nb * 8, 32)
    av_x = np.sqrt((g * g).mean(axis=1))
    weights = av_x[:, None] + np.abs(g)
    if qweights is not None:
        qw = np.asarray(qweights, np.float32).reshape(nb * 8, 32)
        weights = weights * np.maximum(qw, 1e-8)
    scales, mins = _make_qkx2_quants(g, 15, weights)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.clip(np.round(inv_scale[:, None] * scales), 0, 63).astype(np.uint8)
    lm = np.clip(np.round(inv_min[:, None] * mins), 0, 63).astype(np.uint8)
    d = (max_scale / 63.0).astype(np.float16)
    dmin = (max_min / 63.0).astype(np.float16)
    # pack 6-bit scales into 12 bytes (inverse of get_scale_min_k4)
    sbytes = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(8):
        if j < 4:
            sbytes[:, j] |= ls[:, j]
            sbytes[:, j + 4] |= lm[:, j]
        else:
            sbytes[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
            sbytes[:, j - 4] |= (ls[:, j] >> 4) << 6
            sbytes[:, j] |= (lm[:, j] >> 4) << 6
    # quantize values with the coded scales
    dd = d.astype(np.float32)[:, None] * ls.astype(np.float32)        # (nb,8)
    mm = dmin.astype(np.float32)[:, None] * lm.astype(np.float32)
    gq = x.reshape(nb, 8, 32)
    safe_dd = np.where(dd == 0, 1, dd)
    l = np.clip(np.round((gq + mm[:, :, None]) / safe_dd[:, :, None]), 0, 15)
    l = np.where((dd == 0)[:, :, None], 0, l).astype(np.uint8)
    l = l.reshape(nb, 4, 64)
    packed = l[:, :, 0:32] | (l[:, :, 32:64] << 4)
    out = np.empty((nb, 144), dtype=np.uint8)
    out[:, 0:2] = d[:, None].view(np.uint8)
    out[:, 2:4] = dmin[:, None].view(np.uint8)
    out[:, 4:16] = sbytes
    out[:, 16:144] = packed.reshape(nb, 128)
    return out


def quantize_q6_k(x: np.ndarray) -> np.ndarray:
    """float32 (n, 256) -> raw q6_K blocks (n, 210). Simplified make_qx_quants:
    per-16 group max-abs scales (no RMSE refinement), 8-bit normalized."""
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    idx = np.abs(g).argmax(axis=2)
    maxv = np.take_along_axis(g, idx[:, :, None], axis=2)[:, :, 0]
    scales = maxv / -32.0                              # (nb,16)
    max_abs_scale_idx = np.abs(scales).argmax(axis=1)
    max_scale = scales[np.arange(nb), max_abs_scale_idx]
    iscale = np.where(max_scale != 0, -128.0 / np.where(max_scale != 0, max_scale, 1), 0.0)
    d = np.where(iscale != 0, 1.0 / np.where(iscale != 0, iscale, 1), 0.0).astype(np.float16)
    sc8 = np.clip(np.round(iscale[:, None] * scales), -128, 127).astype(np.int8)
    dsc = d.astype(np.float32)[:, None] * sc8.astype(np.float32)      # (nb,16)
    safe = np.where(dsc == 0, 1, dsc)
    l = np.clip(np.round(g / safe[:, :, None]), -32, 31)
    l = np.where((dsc == 0)[:, :, None], 0, l).astype(np.int8) + 32   # 0..63
    l = l.reshape(nb, QK_K).astype(np.uint8)
    out = np.empty((nb, 210), dtype=np.uint8)
    for half in range(2):
        seg = l[:, 128 * half:128 * half + 128]
        q1, q2, q3, q4 = seg[:, 0:32], seg[:, 32:64], seg[:, 64:96], seg[:, 96:128]
        out[:, 64 * half:64 * half + 32] = (q1 & 0xF) | ((q3 & 0xF) << 4)
        out[:, 64 * half + 32:64 * half + 64] = (q2 & 0xF) | ((q4 & 0xF) << 4)
        out[:, 128 + 32 * half:128 + 32 * half + 32] = (
            (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6))
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = d[:, None].view(np.uint8)
    return out


def quantize_q5_k(x: np.ndarray) -> np.ndarray:
    """float32 (n,256) -> raw q5_K blocks (n,176), same scale search as q4_K."""
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    g = x.reshape(nb * 8, 32)
    av_x = np.sqrt((g * g).mean(axis=1))
    weights = av_x[:, None] + np.abs(g)
    scales, mins = _make_qkx2_quants(g, 31, weights)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.clip(np.round(inv_scale[:, None] * scales), 0, 63).astype(np.uint8)
    lm = np.clip(np.round(inv_min[:, None] * mins), 0, 63).astype(np.uint8)
    d = (max_scale / 63.0).astype(np.float16)
    dmin = (max_min / 63.0).astype(np.float16)
    sbytes = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(8):
        if j < 4:
            sbytes[:, j] |= ls[:, j]
            sbytes[:, j + 4] |= lm[:, j]
        else:
            sbytes[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
            sbytes[:, j - 4] |= (ls[:, j] >> 4) << 6
            sbytes[:, j] |= (lm[:, j] >> 4) << 6
    dd = d.astype(np.float32)[:, None] * ls.astype(np.float32)
    mm = dmin.astype(np.float32)[:, None] * lm.astype(np.float32)
    gq = x.reshape(nb, 8, 32)
    safe_dd = np.where(dd == 0, 1, dd)
    l = np.clip(np.round((gq + mm[:, :, None]) / safe_dd[:, :, None]), 0, 31)
    l = np.where((dd == 0)[:, :, None], 0, l).astype(np.uint8)        # (nb,8,32) 0..31
    qh = np.zeros((nb, 32), dtype=np.uint8)
    qs = np.zeros((nb, 128), dtype=np.uint8)
    for blk in range(4):
        l1 = l[:, 2 * blk]
        l2 = l[:, 2 * blk + 1]
        qs[:, 32 * blk:32 * blk + 32] = (l1 & 0xF) | ((l2 & 0xF) << 4)
        qh |= ((l1 >> 4) << (2 * blk)) | ((l2 >> 4) << (2 * blk + 1))
    out = np.empty((nb, 176), dtype=np.uint8)
    out[:, 0:2] = d[:, None].view(np.uint8)
    out[:, 2:4] = dmin[:, None].view(np.uint8)
    out[:, 4:16] = sbytes
    out[:, 16:48] = qh
    out[:, 48:176] = qs
    return out


def _iq4_best_index(x_scaled: np.ndarray) -> np.ndarray:
    """Nearest-codeword indices into KVALUES_IQ4NL (vectorized)."""
    kv = KVALUES_IQ4NL.astype(np.float32)           # sorted ascending
    mid = (kv[1:] + kv[:-1]) / 2.0
    return np.searchsorted(mid, x_scaled).astype(np.uint8)


def _iq4_fit_scale(g: np.ndarray, w: np.ndarray, ntry: int = 7):
    """Per-group non-linear-grid scale fit (quantize_row_iq4_nl-style search).

    g: (nb, 32) values; w: (nb, 32) weights. Returns (d, idx) with idx (nb,32).
    """
    kv = KVALUES_IQ4NL.astype(np.float32)
    idx_max = np.abs(g).argmax(axis=1)
    maxv = g[np.arange(g.shape[0]), idx_max]
    d0 = np.where(maxv != 0, maxv / kv[0], 1e-9)    # kv[0] = -127
    best_d = d0.copy()
    best_err = np.full(g.shape[0], np.inf, np.float32)
    for itry in range(-ntry, ntry + 1):
        d = d0 * (1.0 + 0.05 * itry)
        safe = np.where(d == 0, 1e-9, d)
        idx = _iq4_best_index(g / safe[:, None])
        q = kv[idx]
        # weighted least squares rescale, then error
        sumqx = (w * q * g).sum(axis=1)
        sumq2 = (w * q * q).sum(axis=1)
        d_ls = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d)
        err = (w * (d_ls[:, None] * q - g) ** 2).sum(axis=1)
        better = err < best_err
        best_d = np.where(better, d_ls, best_d)
        best_err = np.where(better, err, best_err)
    safe = np.where(best_d == 0, 1e-9, best_d)
    idx = _iq4_best_index(g / safe[:, None])
    return best_d, idx


def quantize_iq4_nl(x: np.ndarray) -> np.ndarray:
    """float32 (n, 32) -> raw iq4_nl blocks (n, 18): per-32 non-linear 4-bit."""
    x = x.astype(np.float32).reshape(-1, QK)
    w = 1.0 + np.abs(x)                              # mild importance weighting
    d, idx = _iq4_fit_scale(x, w)
    out = np.empty((x.shape[0], 18), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:18] = idx[:, 0:16] | (idx[:, 16:32] << 4)
    return out


def quantize_iq4_xs(x: np.ndarray) -> np.ndarray:
    """float32 (n, 256) -> raw iq4_xs blocks (n, 136): superblock with 6-bit
    per-32 scales over the non-linear grid."""
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    g = x.reshape(nb * 8, 32)
    w = 1.0 + np.abs(g)
    d32, _ = _iq4_fit_scale(g, w)
    d32 = d32.reshape(nb, 8)
    amax = np.abs(d32).max(axis=1)
    sb_idx = np.abs(d32).argmax(axis=1)
    d_sign = np.sign(d32[np.arange(nb), sb_idx])
    d_sign = np.where(d_sign == 0, 1.0, d_sign)
    d = (amax * d_sign / 31.0)
    safe_d = np.where(d == 0, 1e-9, d)
    ls = np.clip(np.round(d32 / safe_d[:, None]), -32, 31).astype(np.int32) + 32
    # re-quantize values with the coded per-group scales
    dl = safe_d[:, None] * (ls - 32)                 # (nb, 8)
    gq = x.reshape(nb, 8, 32)
    safe_dl = np.where(dl == 0, 1e-9, dl)
    idx = _iq4_best_index(gq / safe_dl[:, :, None])  # (nb, 8, 32)
    out = np.empty((nb, 136), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    lsu = ls.astype(np.uint16)
    scales_h = np.zeros(nb, np.uint16)
    for ib in range(8):
        scales_h |= ((lsu[:, ib] >> 4) & 3) << (2 * ib)
    out[:, 2:4] = scales_h[:, None].view(np.uint8)
    lo = lsu & 0xF
    for i in range(4):
        out[:, 4 + i] = (lo[:, 2 * i] | (lo[:, 2 * i + 1] << 4)).astype(np.uint8)
    packed = (idx[:, :, 0:16] | (idx[:, :, 16:32] << 4)).astype(np.uint8)
    out[:, 8:136] = packed.reshape(nb, 128)
    return out


# ---------------------------------------------------------------------------
# IQ2/IQ3 grid encoders (quantize side).
#
# Reference parity: llama.cpp's quantize_row_iq2_*/iq3_* (reached through
# /root/reference/llama.cpp.patches/patches/quantize_quantize.cpp.patch:59-65,
# which gates the IQ targets on --imatrix). Encoders are not bit-prescriptive —
# any block whose *decode* matches is valid — so this is an original
# vectorized design: per scale-group alternating fit (weighted NN over the
# published codebook + least-squares scale refit), ksigns parity handled by
# flipping the least-important element, then exact layout packing (inverse of
# the dequant_* functions above, which ARE format-prescriptive).
# ---------------------------------------------------------------------------

def _iq_weights(x: np.ndarray, qweights) -> np.ndarray:
    """Per-element importance: qw * sqrt(sigma2 + x^2) (llama.cpp convention),
    qw = 1 without an imatrix."""
    sigma2 = np.mean(x * x, axis=-1, keepdims=True)
    w = np.sqrt(sigma2 + x * x)
    if qweights is not None:
        w = w * qweights.reshape(x.shape)
    return w


def _iq_signs_parity(x: np.ndarray):
    """Sign bits per element for ksigns formats (n8, 8): the stored pattern
    must have EVEN negative-parity per 8 (bit7 of ksigns is the XOR of bits
    0..6); flip the least-|x| element's sign when odd."""
    neg = (x < 0).astype(np.uint8)            # (n8, 8)
    odd = neg.sum(axis=1) & 1
    imin = np.abs(x).argmin(axis=1)
    flip = np.zeros_like(neg)
    flip[np.arange(len(x)), imin] = odd
    return neg ^ flip                          # even parity per row


def _iq_sign_index7(bits: np.ndarray) -> np.ndarray:
    """(n8, 8) even-parity sign bits -> 7-bit ksigns index (bits 0..6)."""
    return (bits[:, :7] << np.arange(7, dtype=np.uint8)).sum(
        axis=1).astype(np.uint32)


def _iq_nn(t: np.ndarray, w: np.ndarray, a: np.ndarray,
           grid: np.ndarray) -> np.ndarray:
    """Weighted nearest-codeword: argmin_e sum w (t - a*G[e])^2.
    t/w (N, sub), a (N,), grid (E, sub) float32. Chunked over N."""
    idx = np.empty(len(t), np.int64)
    gt = grid.T                                          # (sub, E)
    g2 = (grid * grid).T
    for s in range(0, len(t), 65536):
        e = slice(s, s + 65536)
        c = (w[e] * t[e]) @ gt                           # (n, E)
        q = w[e] @ g2
        score = 2.0 * a[e, None] * c - (a[e, None] ** 2) * q
        idx[e] = score.argmax(axis=1)
    return idx


def _iq_fit_groups(t, w, grid, sub: int, sgroup: int, nsteps: int = 2):
    """Alternating scale/codeword fit. t/w: (nsb, sub) magnitudes/weights for
    nsb sub-blocks; scale shared per (sgroup // sub) consecutive sub-blocks.
    Returns (idx (nsb,), a (ngroups,))."""
    per = sgroup // sub
    gmax = float(grid.max())
    tg = t.reshape(-1, sgroup)
    a = tg.max(axis=1) / gmax                            # (ngroups,)
    idx = None
    for _ in range(nsteps):
        a_sb = np.repeat(a, per)
        idx = _iq_nn(t, w, a_sb, grid)
        gv = grid[idx]                                   # (nsb, sub)
        num = (w * t * gv).reshape(-1, sgroup).sum(axis=1)
        den = (w * gv * gv).reshape(-1, sgroup).sum(axis=1)
        a = np.where(den > 0, num / np.where(den > 0, den, 1), 0.0)
        a = np.maximum(a, 0.0)
    return idx, a


def _iq_quantize_scales(a: np.ndarray, ngroups: int, unit: float,
                        offset: float, smax: int):
    """Per-256-block global d + integer per-group scales:
    a ~ d * (offset + s) * unit, s in [0, smax]."""
    ab = a.reshape(-1, ngroups)
    d = ab.max(axis=1) / ((offset + smax) * unit)        # (nb,)
    safe_d = np.where(d > 0, d, 1.0)
    s = np.clip(np.round(ab / (safe_d[:, None] * unit) - offset),
                0, smax).astype(np.uint32)
    aq = d[:, None] * (offset + s) * unit
    return d.astype(np.float32), s, aq.astype(np.float32)


def _iq_encode_common(x, qweights, grid, sub, sgroup, unit, offset,
                      parity: bool):
    """Shared fit pipeline. Returns (d (nb,), s4 (nb, 256//sgroup),
    idx (nb, 256//sub), signbits (nb, 32) packed-per-8)."""
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    w = _iq_weights(x, qweights)
    x8 = x.reshape(-1, 8)
    signs = (_iq_signs_parity(x8) if parity
             else (x8 < 0).astype(np.uint8))             # (nb*32, 8)
    t = np.abs(x).reshape(-1, sub)
    ws = w.reshape(-1, sub)
    idx, a = _iq_fit_groups(t, ws, grid.astype(np.float32), sub, sgroup)
    d, s, aq = _iq_quantize_scales(a, QK_K // sgroup, unit, offset, 15)
    # final codeword pass under the coded scales
    a_sb = np.repeat(aq.reshape(-1), sgroup // sub)
    idx = _iq_nn(t, ws, a_sb, grid.astype(np.float32))
    return (x, nb, d, s, idx.reshape(nb, QK_K // sub),
            signs.reshape(nb, 32, 8))


def quantize_iq2_xxs(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq2_xxs blocks (n, 66)."""
    g = _grids()["iq2xxs_grid"]
    x, nb, d, s4, idx, signs = _iq_encode_common(
        x, qweights, g, 8, 32, 0.25, 0.5, parity=True)
    k7 = _iq_sign_index7(signs.reshape(-1, 8)).reshape(nb, 8, 4)
    aux32 = (k7 * (1 << (7 * np.arange(4, dtype=np.uint32)))).sum(
        axis=2).astype(np.uint32) | (s4.astype(np.uint32) << 28)
    idx8 = idx.reshape(nb, 8, 4).astype(np.uint8)
    out = np.empty((nb, 66), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    q2 = np.empty((nb, 8, 4), np.uint16)
    q2[:, :, 0:2] = idx8.view(np.uint16).reshape(nb, 8, 2)
    q2[:, :, 2] = (aux32 & 0xFFFF).astype(np.uint16)
    q2[:, :, 3] = (aux32 >> 16).astype(np.uint16)
    out[:, 2:66] = q2.reshape(nb, 32).view(np.uint8)
    return out


def _pack_nib_pairs(s: np.ndarray) -> np.ndarray:
    """(nb, 2k) 4-bit values -> (nb, k) bytes lo|hi<<4."""
    return (s[:, 0::2] | (s[:, 1::2] << 4)).astype(np.uint8)


def quantize_iq2_xs(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq2_xs blocks (n, 74) (per-16 scales)."""
    g = _grids()["iq2xs_grid"]
    x, nb, d, s4, idx, signs = _iq_encode_common(
        x, qweights, g, 8, 16, 0.25, 0.5, parity=True)
    k7 = _iq_sign_index7(signs.reshape(-1, 8)).reshape(nb, 32)
    q2 = (idx.reshape(nb, 32).astype(np.uint16)
          | (k7.astype(np.uint16) << 9))
    out = np.empty((nb, 74), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:66] = q2.view(np.uint8).reshape(nb, 64)
    out[:, 66:74] = _pack_nib_pairs(s4.astype(np.uint8))
    return out


def quantize_iq2_s(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq2_s blocks (n, 82) (free signs, 10-bit grid)."""
    g = _grids()["iq2s_grid"]
    x, nb, d, s4, idx, signs = _iq_encode_common(
        x, qweights, g, 8, 16, 0.25, 0.5, parity=False)
    sbytes = (signs << np.arange(8, dtype=np.uint8)).sum(
        axis=2).astype(np.uint8)                         # (nb, 32)
    idx32 = idx.reshape(nb, 8, 4)
    qh = ((idx32 >> 8) << (2 * np.arange(4))).sum(axis=2).astype(np.uint8)
    out = np.empty((nb, 82), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:34] = (idx32 & 0xFF).astype(np.uint8).reshape(nb, 32)
    out[:, 34:66] = sbytes
    out[:, 66:74] = qh
    out[:, 74:82] = _pack_nib_pairs(s4.astype(np.uint8))
    return out


def quantize_iq3_xxs(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq3_xxs blocks (n, 98)."""
    g = _grids()["iq3xxs_grid"]
    x, nb, d, s4, idx, signs = _iq_encode_common(
        x, qweights, g, 4, 32, 0.5, 0.5, parity=True)
    k7 = _iq_sign_index7(signs.reshape(-1, 8)).reshape(nb, 8, 4)
    aux32 = (k7 * (1 << (7 * np.arange(4, dtype=np.uint32)))).sum(
        axis=2).astype(np.uint32) | (s4.astype(np.uint32) << 28)
    out = np.empty((nb, 98), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:66] = idx.astype(np.uint8).reshape(nb, 64)
    out[:, 66:98] = aux32[:, :, None].view(np.uint8).reshape(nb, 32) \
        if aux32.dtype == np.uint32 else aux32
    return out


def quantize_iq3_s(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq3_s blocks (n, 110) (free signs, 9-bit grid,
    scales d*(1+2s))."""
    g = _grids()["iq3s_grid"]
    x, nb, d, s4, idx, signs = _iq_encode_common(
        x, qweights, g, 4, 32, 2.0, 0.5, parity=False)
    sbytes = (signs << np.arange(8, dtype=np.uint8)).sum(
        axis=2).astype(np.uint8)                         # (nb, 32)
    idx8 = idx.reshape(nb, 8, 8)
    qh = ((idx8 >> 8) << np.arange(8)).sum(axis=2).astype(np.uint8)
    out = np.empty((nb, 110), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:66] = (idx8 & 0xFF).astype(np.uint8).reshape(nb, 64)
    out[:, 66:74] = qh
    out[:, 74:106] = sbytes
    out[:, 106:110] = _pack_nib_pairs(s4.astype(np.uint8))
    return out


def quantize_iq1_s(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq1_s blocks (n, 50): 1.56-bit ternary grid
    with per-32 3-bit scales and a per-32 +-delta (reference
    quantize_row_iq1_s semantics: both delta signs tried, better kept)."""
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    w = _iq_weights(x, qweights)
    grid = _grids()["iq1s_grid"].astype(np.float32)       # (2048, 8) in -1/0/1
    t = x.reshape(-1, 8)
    ws = w.reshape(-1, 8)
    # two candidate deltas; the sign is a PER-32-GROUP bit (qh bit 15)
    cand = []
    for delta in (IQ1S_DELTA, -IQ1S_DELTA):
        gd = grid + delta
        _, a = _iq_fit_groups(t, ws, gd, 8, 32)
        d, s, aq = _iq_quantize_scales(a, QK_K // 32, 2.0, 0.5, 7)
        a_sb = np.repeat(aq.reshape(-1), 4)               # per sub-block of 8
        idx = _iq_nn(t, ws, a_sb, gd)
        gv = gd[idx]
        err = (ws * (t - a_sb[:, None] * gv) ** 2).reshape(-1, 32).sum(axis=1)
        cand.append((err, idx.reshape(nb, 8, 4), d, s, aq))
    use_neg = (cand[1][0] < cand[0][0]).reshape(nb, 8)    # per 32-group
    idx = np.where(use_neg[:, :, None], cand[1][1], cand[0][1]).astype(np.uint32)
    # one d per block: take it from the pass minimizing total error; its
    # 3-bit group scales are compatible across passes only approximately, so
    # refit s against the chosen d per group
    tot_neg = cand[1][0].reshape(nb, 8).sum(1) < cand[0][0].reshape(nb, 8).sum(1)
    d = np.where(tot_neg, cand[1][2], cand[0][2])
    aq_pick = np.where(use_neg, cand[1][4], cand[0][4])   # (nb, 8) fitted a
    safe_d = np.where(d > 0, d, 1.0)
    s = np.clip(np.round((aq_pick / (safe_d[:, None] * 2.0)) - 0.5),
                0, 7).astype(np.uint32)
    out = np.empty((nb, 50), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:34] = (idx & 0xFF).astype(np.uint8).reshape(nb, 32)
    hi = (idx >> 8) & 7                                   # (nb, 8, 4)
    qh = (hi * (1 << (3 * np.arange(4, dtype=np.uint32)))).sum(axis=2)
    qh = qh.astype(np.uint16) | (s.astype(np.uint16) << 12)
    qh = qh | (np.uint16(0x8000) * use_neg.astype(np.uint16))
    out[:, 34:50] = qh[:, :, None].view(np.uint8).reshape(nb, 16)
    return out


def quantize_iq1_m(x: np.ndarray, qweights=None) -> np.ndarray:
    """float32 (n, 256) -> raw iq1_m blocks (n, 56): ternary grid with
    per-16 3-bit scales dl = d*(2s+1) and a PER-8 +-delta sign (qh bit 3) —
    the finer-grained sibling of IQ1_S (reference quantize_row_iq1_m: same
    grid, per-16 scales, per-8 shift selection; d's f16 bits hide in the
    scale words' top nibbles)."""
    x = x.astype(np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    w = _iq_weights(x, qweights)
    grid = _grids()["iq1s_grid"].astype(np.float32)
    t = x.reshape(-1, 8)
    ws = w.reshape(-1, 8)
    # per-16 scale: fit under each delta, keep the better per group
    fits = []
    for delta in (IQ1M_DELTA, -IQ1M_DELTA):
        gd = grid + delta
        idx, a = _iq_fit_groups(t, ws, gd, 8, 16)
        a_sb = np.repeat(a, 2)
        gv = gd[idx]
        err = (ws * (t - a_sb[:, None] * gv) ** 2).reshape(-1, 16).sum(axis=1)
        fits.append((err, a))
    a16 = np.where(fits[1][0] < fits[0][0], fits[1][1], fits[0][1])
    d, s, aq = _iq_quantize_scales(a16, QK_K // 16, 2.0, 0.5, 7)
    # per-8 delta + codeword at the QUANTIZED scale
    a_sb = np.repeat(aq.reshape(-1), 2)
    best_err = None
    idx = neg = None
    for j, delta in enumerate((IQ1M_DELTA, -IQ1M_DELTA)):
        gd = grid + delta
        cand = _iq_nn(t, ws, a_sb, gd)
        err = (ws * (t - a_sb[:, None] * gd[cand]) ** 2).sum(axis=1)
        if j == 0:
            idx, neg, best_err = cand, np.zeros(len(t), bool), err
        else:
            take = err < best_err
            idx = np.where(take, cand, idx)
            neg = take
    idx = idx.reshape(nb, 8, 4).astype(np.uint32)
    neg = neg.reshape(nb, 8, 4)
    out = np.empty((nb, 56), np.uint8)
    out[:, 0:32] = (idx & 0xFF).astype(np.uint8).reshape(nb, 32)
    nib = ((idx >> 8) & 7).astype(np.uint8) | (neg.astype(np.uint8) << 3)
    out[:, 32:48] = (nib[:, :, 0::2] | (nib[:, :, 1::2] << 4)).reshape(nb, 16)
    s16 = s.reshape(nb, 4, 4).astype(np.uint16)
    sc16 = (s16 * (1 << (3 * np.arange(4, dtype=np.uint16)))).sum(
        axis=2).astype(np.uint16)                         # (nb, 4)
    du = d.astype(np.float16)[:, None].view(np.uint16)[:, 0]
    for j in range(4):
        sc16[:, j] |= (((du >> (4 * j)) & 0xF) << 12).astype(np.uint16)
    out[:, 48:56] = sc16[:, :, None].view(np.uint8).reshape(nb, 8)
    return out


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class QuantSpec:
    name: str
    type_id: int
    block_elems: int
    block_bytes: int
    dequant: Optional[Callable[[np.ndarray], np.ndarray]]
    quantize: Optional[Callable[[np.ndarray], np.ndarray]] = None


def _spec(name, tid, be, bb, dq, qz=None):
    return QuantSpec(name, tid, be, bb, dq, qz)


GGML_TYPES = [
    _spec("F32", 0, 1, 4, None),
    _spec("F16", 1, 1, 2, None),
    _spec("Q4_0", 2, QK, 18, dequant_q4_0, quantize_q4_0),
    _spec("Q4_1", 3, QK, 20, dequant_q4_1),
    _spec("Q5_0", 6, QK, 22, dequant_q5_0),
    _spec("Q5_1", 7, QK, 24, dequant_q5_1),
    _spec("Q8_0", 8, QK, 34, dequant_q8_0, quantize_q8_0),
    _spec("Q8_1", 9, QK, 36, dequant_q8_1),
    _spec("Q2_K", 10, QK_K, 84, dequant_q2_k),
    _spec("Q3_K", 11, QK_K, 110, dequant_q3_k),
    _spec("Q4_K", 12, QK_K, 144, dequant_q4_k, quantize_q4_k),
    _spec("Q5_K", 13, QK_K, 176, dequant_q5_k, quantize_q5_k),
    _spec("Q6_K", 14, QK_K, 210, dequant_q6_k, quantize_q6_k),
    _spec("Q8_K", 15, QK_K, 292, dequant_q8_k),
    _spec("IQ2_XXS", 16, QK_K, 66, dequant_iq2_xxs, quantize_iq2_xxs),
    _spec("IQ2_XS", 17, QK_K, 74, dequant_iq2_xs, quantize_iq2_xs),
    _spec("IQ3_XXS", 18, QK_K, 98, dequant_iq3_xxs, quantize_iq3_xxs),
    _spec("IQ1_S", 19, QK_K, 50, dequant_iq1_s, quantize_iq1_s),
    _spec("IQ4_NL", 20, QK, 18, dequant_iq4_nl, quantize_iq4_nl),
    _spec("IQ3_S", 21, QK_K, 110, dequant_iq3_s, quantize_iq3_s),
    _spec("IQ2_S", 22, QK_K, 82, dequant_iq2_s, quantize_iq2_s),
    _spec("IQ4_XS", 23, QK_K, 136, dequant_iq4_xs, quantize_iq4_xs),
    _spec("I8", 24, 1, 1, None),
    _spec("I16", 25, 1, 2, None),
    _spec("I32", 26, 1, 4, None),
    _spec("I64", 27, 1, 8, None),
    _spec("F64", 28, 1, 8, None),
    _spec("IQ1_M", 29, QK_K, 56, dequant_iq1_m, quantize_iq1_m),
    _spec("BF16", 30, 1, 2, None),
]

TYPE_BY_ID: Dict[int, QuantSpec] = {s.type_id: s for s in GGML_TYPES}
TYPE_BY_NAME: Dict[str, QuantSpec] = {s.name: s for s in GGML_TYPES}


def type_size(n_elems: int, spec: QuantSpec) -> int:
    assert n_elems % spec.block_elems == 0, (n_elems, spec.name)
    return n_elems // spec.block_elems * spec.block_bytes


def dequantize(raw: np.ndarray, type_id: int, shape: tuple) -> np.ndarray:
    """Dequantize raw tensor bytes to float32 with the given logical shape.

    shape follows numpy convention (row-major, innermost/contiguous dim last —
    i.e. reversed GGUF ne[] order). Blocks run along the last dimension.
    """
    spec = TYPE_BY_ID[type_id]
    n = int(np.prod(shape))
    raw = np.frombuffer(raw, dtype=np.uint8) if not isinstance(raw, np.ndarray) else raw
    raw = raw.reshape(-1)
    if spec.name == "F32":
        return raw[: n * 4].view(np.float32).reshape(shape).astype(np.float32)
    if spec.name == "F16":
        return raw[: n * 2].view(np.float16).reshape(shape).astype(np.float32)
    if spec.name == "BF16":
        u = raw[: n * 2].view(np.uint16).astype(np.uint32) << 16
        return u.view(np.float32).reshape(shape)
    if spec.name == "F64":
        return raw[: n * 8].view(np.float64).reshape(shape).astype(np.float32)
    if spec.name in ("I8", "I16", "I32", "I64"):
        dt = {"I8": np.int8, "I16": np.int16, "I32": np.int32, "I64": np.int64}[spec.name]
        return raw[: n * np.dtype(dt).itemsize].view(dt).reshape(shape).astype(np.float32)
    if spec.dequant is None:
        raise NotImplementedError(f"dequant for {spec.name}")
    nblocks = n // spec.block_elems
    blocks = raw[: nblocks * spec.block_bytes].reshape(nblocks, spec.block_bytes)
    return spec.dequant(blocks).reshape(shape)
