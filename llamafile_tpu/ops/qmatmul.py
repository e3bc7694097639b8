"""Fused dequant-GEMM Pallas kernels — the MXU heart of the framework.

TPU-native replacement for llamafile's tinyBLAS/iqk_mul_mat GEMM layer
(reference: llamafile/sgemm.cpp:128 `llamafile_sgemm`, tinyblas_cpu.h:432-602,
iqk_mul_mat.inc:182). Where the reference fuses block-dequantization into
per-µarch SIMD dot products, we fuse it at the HBM->VMEM->MXU boundary:
packed integer codes + per-group f32 scales stream from HBM, are expanded to a
bf16 weight tile in VMEM (VPU), and fed to the MXU — so HBM traffic stays at
the quantized byte-rate, which is what the decode bandwidth roofline requires.

Weights are stored K-major ([K, N]): per-group scales broadcast along the TPU
sublane axis, where Mosaic handles the (K/g, 1, N)->(K/g, g, N)->(K, N) expand
for free; the matmul is the natural y[M,N] = x[M,K] @ w[K,N].

Public entry: `qmatmul(x, qt)` for any QTensor kind ("q8b" int8 codes,
"q4b" packed nibbles, "dense" bf16). The per-group bias term (formats with
mins: Q4_1/Q5_1/Q2_K/Q4_K/Q5_K/IQ1) is factored out of the kernel exactly:
    y = qmm_kernel(x, qs, scales) + blocksum_g(x) @ bias
because sum_k x[m,k]*b[k//g,n] = sum_G (sum_{k in G} x[m,k]) * b[G,n].
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .repack import QTensor

# q4b kernel flavor: "txn" (default — natural-order int8-MXU with on-the-fly
# per-32 activation quantization and no in-kernel concats/plane splits; the
# Q8_K-analog fast path, NLL-parity gated), "int8" (round-2 even/odd-plane
# od kernel), "planes" (bf16 dequant, two plane-wise dots), or "concat"
# (round-1 kernel, kept for A/B measurement).
Q4B_KERNEL = os.environ.get("LLAMAFILE_TPU_Q4B", "txn")
# tile-shape experiment overrides (perf probes): e.g. LLAMAFILE_TPU_TN=4096
_TN_OVERRIDE = int(os.environ.get("LLAMAFILE_TPU_TN", "0") or 0)
_TK_OVERRIDE = int(os.environ.get("LLAMAFILE_TPU_TK", "0") or 0)
_INT8_DOT_T = None  # set below (import-time): int8 partial-sum accumulator


_INT8_DOT_T = (jnp.float32 if os.environ.get("LLAMAFILE_TPU_INT8_DOT",
                                             "i32") == "f32" else jnp.int32)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _choose_tiles(m: int, n: int, k: int):
    def pick(dim, prefs):
        for p in prefs:
            if dim % p == 0:
                return p
        return dim
    # prefer one M tile at prefill sizes: every extra m-tile re-runs the
    # weight-tile dequant chain (planes kernel is VPU-bound there); tm*tn
    # stays <= 512*1024 so the f32 accumulator + buffers fit VMEM
    tm = pick(m, (512, 256, 128, 64, 32, 16, 8))
    tn_prefs = (2048, 1024, 512, 256, 128)
    if _TN_OVERRIDE:
        tn_prefs = (_TN_OVERRIDE,) + tn_prefs
    tn = pick(n, tn_prefs)
    while tm * tn > 512 * 1024 and tn > 256:
        tn //= 2
    tk_prefs = (2048, 1024, 512, 256)          # bigger K tiles amortize better
    if _TK_OVERRIDE:
        tk_prefs = (_TK_OVERRIDE,) + tk_prefs
    tk = pick(k, tk_prefs)
    while tn * tk > 2048 * 1024 and tk > 256 and not _TK_OVERRIDE:
        tk //= 2
    return tm, tn, tk


def _choose_tiles_txn(m: int, n: int, k: int):
    """txn decode kernel tile choice: deeper K tiles win (fewer grid steps —
    TK 1024 -> 2048 measured 129.1 -> 132.3 tok/s end-to-end on 8B decode);
    VMEM stays bounded because the partial tensors scale with TK/TN and
    M <= 32 on this path."""
    tm, tn, tk = _choose_tiles(m, n, k)
    if _TK_OVERRIDE:
        return tm, tn, tk
    for cand in (2048, 1024, 512, 256):
        if k % cand == 0 and tn * cand <= 2048 * 2048:
            return tm, tn, cand
    return tm, tn, tk


def _dequant_tile(qs_ref, sc_ref, g: int, kind: str):
    """Expand a quantized tile to bf16 (TK, TN) inside VMEM.

    The multiply runs in bf16: the dequantized weight is rounded to bf16 for
    the MXU regardless, and bf16 VPU throughput is ~2x f32 (profiled on v5e).
    """
    if kind == "q8b":
        q = qs_ref[...].astype(jnp.bfloat16)           # (TK, TN)
        tk, tn = q.shape
    else:  # q4b packed nibbles, planar per 256-superblock along K.
        # Shift-free unpack (shrui doesn't legalize on i8 vectors, and i32
        # widening is VPU-expensive): hi plane reads as int8((p^0x80) & 0xF0)
        # = 16*q - 128, with the 16x/-128 pre-folded into scales/bias at
        # repack time (ops/repack.py:_fold_hi_plane).
        p = qs_ref[...]                                # (TK/2, TN) uint8
        tk2, tn = p.shape
        tk = tk2 * 2
        lo = (p & 0x0F).astype(jnp.int8).reshape(tk2 // 128, 1, 128, tn)
        hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).reshape(tk2 // 128, 1, 128, tn)
        q = jnp.concatenate([lo, hi], axis=1).reshape(tk, tn).astype(jnp.bfloat16)
    sc = sc_ref[...].astype(jnp.bfloat16)              # (TK/g, TN)
    return (q.reshape(tk // g, g, tn) * sc[:, None, :]).reshape(tk, tn)


def _qmm_kernel_planes(xe_ref, xo_ref, qs_ref, slo_ref, shi_ref, o_ref,
                       acc_ref, *, n_k: int, unsigned_hi: bool = False):
    """q4b fast path: one dot per nibble plane, zero weight-tile relayouts.

    o_ref dtype may be bf16 for large-M prefill (f32 outputs cost ~87MB of
    extra HBM write+read per 8B layer at T=512); accumulation stays f32.

    The packed byte row r (superblock sb = r//128, i = r%128) holds
    lo = q[256sb + i] and hi = q[256sb + 128 + i].  Splitting the *activation*
    K axis into even/odd 128-chunks (done outside, on the tiny x) turns the
    matmul into two plane-wise dots:

        y = x_even @ dequant(lo)  +  x_odd @ dequant(hi)

    so the kernel never concatenates or reshapes the big (TK, TN) weight tile
    across sublane tiles — the round-1 kernel's concat+4D-reshape chain was a
    Mosaic relayout costing ~2x the HBM streaming time per layer.
    Scale rows interleave per superblock ([8, TN] chunks: rows 0-3 lo,
    4-7 hi, pre-folded for the hi plane by repack._fold_hi_plane).
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qs_ref[...]                                    # (TK/2, TN) uint8
    tk2, tn = p.shape
    slo = slo_ref[...].astype(jnp.bfloat16)            # (TK/64, TN)
    shi = shi_ref[...].astype(jnp.bfloat16)
    if unsigned_hi:
        # cheapest chain: 1 mask + 1 unsigned widen per plane. hi reads as
        # 16*q (0..240); repack folds 1/16 into hi scales and keeps bias as-is
        # (_fold_hi_plane unsigned convention).
        lo = (p & 0x0F).astype(jnp.bfloat16)
        hi = (p & 0xF0).astype(jnp.bfloat16)
    else:
        lo = (p & 0x0F).astype(jnp.int8).astype(jnp.bfloat16)
        hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).astype(jnp.bfloat16)
    wlo = (lo.reshape(tk2 // 32, 32, tn) * slo[:, None, :]).reshape(tk2, tn)
    whi = (hi.reshape(tk2 // 32, 32, tn) * shi[:, None, :]).reshape(tk2, tn)
    acc_ref[...] += (
        jnp.dot(xe_ref[...], wlo, preferred_element_type=jnp.float32)
        + jnp.dot(xo_ref[...], whi, preferred_element_type=jnp.float32))

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "unsigned_hi"))
def _qmm_call_planes(x, qs, scales, *, interpret: bool,
                     unsigned_hi: bool = False):
    """q4b (g=32) matmul via the two-plane kernel. x [M, K] with K % 256 == 0."""
    m, k = x.shape
    n = qs.shape[1]
    tm, tn, tk = _choose_tiles(m, n, k)
    if tk % 256:
        tk = 256
    if (tk // 64) % 8 and tk != k:
        # the slo/shi scale-plane blocks are (TK/64, TN); Mosaic needs the
        # sublane dim divisible by 8 OR equal to the array dim — for K not
        # a multiple of 512 (e.g. d=1280 models) fall back to one K step
        tk = k
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xb = x.astype(jnp.bfloat16)
    # even/odd 128-chunk planes of the activation K axis (tiny: M x K/2 each),
    # and the matching scale-row planes (rows r with r%8 in [0,4) are lo —
    # split here in XLA so the kernel stays pure 2D/3D (Mosaic-legal).
    x4 = xb.reshape(m, k // 256, 2, 128)
    xe = x4[:, :, 0, :].reshape(m, k // 2)
    xo = x4[:, :, 1, :].reshape(m, k // 2)
    sc3 = scales.reshape(k // 256, 8, -1)
    slo = sc3[:, :4].reshape(k // 64, -1)
    shi = sc3[:, 4:].reshape(k // 64, -1)
    out_t = jnp.bfloat16 if m >= 256 else jnp.float32
    return pl.pallas_call(
        functools.partial(_qmm_kernel_planes, n_k=n_k,
                          unsigned_hi=unsigned_hi),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk // 2), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk // 2), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs.size + scales.size * 2 + x.size * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, qs, slo, shi)


def _qmm_kernel_int8(xqe_ref, xqo_ref, sxe_ref, sxo_ref, qs_ref, slo_ref,
                     shi_ref, o_ref, acc_ref, *, n_k: int):
    """q4b int8-MXU path: activations quantized per 32-group (Q8_K analog —
    reference quantizes activations on the fly and dots int8*int8,
    tinyblas_cpu_sgemm.inc:286-322, iqk_mul_mat.inc:182). The MXU consumes the
    int8 codes directly (no per-weight dequant multiply); group scales apply
    to the int32 partial sums, so VPU work per weight drops to one mask op.

        y[m,n] = sum_g sx[m,g] * a[g,n] * sum_{k in g} xq[m,k] * wq[k,n]

    Both nibble planes run in ONE 2g-batch dot_general with a single
    postprocess chain: measured 0.197 ms/layer (692 GB/s, 85% of v5e HBM — at
    the dense-bf16 ceiling) vs 0.28 for two per-plane dots + in-kernel bias
    dots (per-grid-step dot launches dominate at decode M). The per-group
    bias term (formats with mins) stays OUTSIDE as one XLA dot on the
    bf16-stored bias (see qmatmul).
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qs_ref[...]                                    # (TK/2, TN) uint8
    tk2, tn = p.shape
    g = tk2 // 32
    # x-scales ride transposed ([K/64, M]): the per-K-step slice is then on
    # the SUBLANE axis (32-row offsets are legal; lane-axis dynamic slices
    # must be 128-multiples, which K/64-group columns are not)
    sxe = sxe_ref[pl.ds(pl.program_id(2) * g, g), :]   # (g, TM)
    sxo = sxo_ref[pl.ds(pl.program_id(2) * g, g), :]
    lo = (p & 0x0F).astype(jnp.int8)                   # q in 0..15
    hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8)          # 16q - 128 (fold: repack)

    # xg arrives group-major (g, tm, 32) — restructured OUTSIDE the kernel
    # (in-kernel lane-axis splits don't legalize in Mosaic); batch dims lead
    # on both operands of the batched int8 matmul
    xg2 = jnp.concatenate([xqe_ref[...], xqo_ref[...]], axis=0)
    w2 = jnp.concatenate([lo.reshape(g, 32, tn), hi.reshape(g, 32, tn)],
                         axis=0)
    part = jax.lax.dot_general(                         # (2g, tm, tn) int32
        xg2, w2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_INT8_DOT_T)
    sc2 = jnp.concatenate([slo_ref[...], shi_ref[...]], axis=0)
    sx2 = jnp.concatenate([sxe, sxo], axis=0)
    pf = part.astype(jnp.float32) * sc2.astype(jnp.float32).reshape(
        2 * g, 1, tn)
    acc_ref[...] += jnp.sum(pf * sx2[:, :, None], axis=0)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...]


def _qmm_kernel_txn(xq_ref, sx_ref, qs_ref, sc_ref, *rest, n_k: int,
                    fused_bias: bool = False):
    """Natural-order int8-MXU q4b kernel — the minimal-glue formulation.

    Measured (scripts/probe_int8.py qonce): the int8 group-dot kernel streams
    at ~90% of HBM when fed pre-built operands; the per-matmul cost of the
    od kernel's host-side even/odd plane splits (+2 transposes +2 slices) and
    its per-grid-step concats is what separates production from that floor.
    This kernel takes activations in NATURAL K-group order — one reshape and
    one transpose of prep — and never concatenates: the stored qs layout is
    per-superblock planar ([lo 128 | hi 128], ops/repack._pack_nibbles_sb128)
    and the stored scale rows are already [4 lo-groups; 4 hi-groups] per sb,
    so slicing leading axes lines both planes up with the natural x groups.

    xq_ref (tk/32, TM, 32) int8   natural-order activation groups
    sx_ref (K/32, TM) f32         per-group activation scales (sublane-sliced)
    qs_ref (tk/2, TN) u8          packed nibbles (per-sb planar)
    sc_ref (tk/32, TN) f32        group scales, natural order (as stored)
    b_ref  (tk/32, TN) bf16       per-group bias rows (fused_bias: formats
                                  with mins) — the bias term rides as ONE
                                  contract-over-groups dot on in-kernel
                                  activation group-sums, replacing the
                                  external XLA bias dot (and, stacked, its
                                  per-layer slice copy)
    """
    if fused_bias:
        b_ref = rest[0]
        o_ref, acc_ref = rest[1], rest[2]
    else:
        b_ref = None
        o_ref, acc_ref = rest[0], rest[1]

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qs_ref[...]                                    # (tk/2, TN) uint8
    tk2, tn = p.shape
    nsb = tk2 // 128
    gs = tk2 // 16                                     # groups per K step
    lo = (p & 0x0F).astype(jnp.int8).reshape(nsb * 4, 32, tn)
    hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).reshape(nsb * 4, 32, tn)
    sx = sx_ref[pl.ds(pl.program_id(2) * gs, gs), :]   # (gs, TM)
    xq = xq_ref[...]                                   # (gs, TM, 32)
    tm = xq.shape[1]
    x4 = xq.reshape(nsb, 8, tm, 32)
    xlo = x4[:, :4].reshape(nsb * 4, tm, 32)
    xhi = x4[:, 4:].reshape(nsb * 4, tm, 32)
    dn = (((2,), (1,)), ((0,), (0,)))
    plo = jax.lax.dot_general(xlo, lo, dn, preferred_element_type=jnp.int32)
    phi = jax.lax.dot_general(xhi, hi, dn, preferred_element_type=jnp.int32)
    sc = sc_ref[...]                                   # (gs, TN)
    sc4 = sc.reshape(nsb, 8, tn)
    sx4 = sx.reshape(nsb, 8, tm)
    def post(part, scp, sxp):
        pf = part.astype(jnp.float32) * scp.reshape(nsb * 4, 1, tn)
        return jnp.sum(pf * sxp.reshape(nsb * 4, tm, 1), axis=0)
    acc = post(plo, sc4[:, :4], sx4[:, :4]) + post(phi, sc4[:, 4:], sx4[:, 4:])
    if fused_bias:
        # bias term: sum_g (sx * sum_k xq)[g,m] * b[g,n] — the group sums of
        # the QUANTIZED activations (same approximation class as the main
        # dot; NLL-parity gated), contracted over groups in one MXU dot
        xsum = jnp.sum(xq.astype(jnp.float32), axis=2) * sx   # (gs, TM)
        acc = acc + jax.lax.dot_general(
            xsum.astype(jnp.bfloat16), b_ref[...],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _qmm_call_txn(x, qs, scales, bias=None, nrm=None, *, eps: float = 0.0,
                  interpret: bool):
    """q4b matmul via the natural-order int8 kernel (minimal host prep:
    one quantize fusion + one transpose; scales pass through as stored).
    bias (formats with mins) fuses into the kernel as a group-sum dot;
    nrm folds a pre-matmul RMSNorm into the quantize fusion (exact)."""
    m, k = x.shape
    n = qs.shape[1]
    tm, tn, tk = _choose_tiles_txn(m, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xq, sx = quantize_activations_g32(x, nrm, eps)
    xqg = xq.reshape(m, k // 32, 32).transpose(1, 0, 2)   # (K/32, M, 32)
    sxg = sx.T                                            # (K/32, M)
    in_specs = [
        pl.BlockSpec((tk // 32, tm, 32), lambda i, j, kk: (kk, i, 0)),
        pl.BlockSpec((k // 32, tm), lambda i, j, kk: (0, i)),
        pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((tk // 32, tn), lambda i, j, kk: (kk, j)),
    ]
    operands = [xqg, sxg, qs, scales]
    if bias is not None:
        in_specs.append(pl.BlockSpec((tk // 32, tn), lambda i, j, kk: (kk, j)))
        operands.append(bias)
    return pl.pallas_call(
        functools.partial(_qmm_kernel_txn, n_k=n_k,
                          fused_bias=bias is not None),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs.size + scales.size * 2 + x.size + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _qmm_kernel_txn_l(li_ref, xq_ref, sx_ref, qs_ref, sc_ref, *rest,
                      n_k: int, fused_bias: bool = False):
    """Scalar-prefetch (layer-stacked) txn: the codes, group scales AND the
    fused bias rows index the stacked arrays inside the block specs — the
    int8_l variant slice-copied scales3[li] and bias3[li] in XLA (~12% of
    layer bytes re-read per layer)."""
    _qmm_kernel_txn(xq_ref, sx_ref, qs_ref, sc_ref, *rest, n_k=n_k,
                    fused_bias=fused_bias)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _qmm_call_txn_stacked(x, qs3, scales3, li, bias3=None, nrm=None, *,
                          eps: float = 0.0, interpret: bool):
    """Natural-order int8 matmul against layer li of stacked weights."""
    m, k = x.shape
    n = qs3.shape[2]
    tm, tn, tk = _choose_tiles_txn(m, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xq, sx = quantize_activations_g32(x, nrm, eps)
    xqg = xq.reshape(m, k // 32, 32).transpose(1, 0, 2)
    sxg = sx.T
    in_specs = [
        pl.BlockSpec((tk // 32, tm, 32), lambda i, j, kk, li_r: (kk, i, 0)),
        pl.BlockSpec((k // 32, tm), lambda i, j, kk, li_r: (0, i)),
        pl.BlockSpec((None, tk // 2, tn),
                     lambda i, j, kk, li_r: (li_r[0], kk, j)),
        pl.BlockSpec((None, tk // 32, tn),
                     lambda i, j, kk, li_r: (li_r[0], kk, j)),
    ]
    operands = [xqg, sxg, qs3, scales3]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk // 32, tn), lambda i, j, kk, li_r: (li_r[0], kk, j)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, li_r: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_txn_l, n_k=n_k,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs3.size // qs3.shape[0] + x.size + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([li], jnp.int32), *operands)


def _qmm_kernel_txn_m1(xlo_ref, xhi_ref, sx_ref, qs_ref, sc_ref,
                       *rest, n_k: int, fused_bias: bool = False,
                       kk_dim: int = 1):
    """Single-row (decode M=1) block-diagonal int8 kernel.

    The general txn kernel pads M to 8 and batch-dots (G, 8, 32) x
    (G, 32, TN): at real M=1 the MXU contracts only 32 of 128 rows (4x
    idle) and the (G, 8, TN) f32 partial post-processing is 8x wasted VPU
    work — the 8B matmul chain measured COMPUTE-bound at 71% of HBM
    (scripts/probe_decode.py --exp kern). Here the activation row is laid
    out BLOCK-DIAGONALLY over each superblock's plane: lhs (nsb, 8, 128)
    whose row r holds group r's 32 codes at lane offset 32r (rows of the
    other plane zero), so one batched dot per plane contracts the FULL
    128 lanes and lands per-group partials (nsb, 8, TN) with all 8
    sublanes packed — full MXU utilization and 8x fewer VPU ops, with no
    Mosaic-illegal squeeze (the m slot now carries the group index).

    xlo_ref (tk/256, 8, 128) i8  lo-plane block-diagonal activations
                                 (rows 0-3 = groups 0-3, rows 4-7 zero)
    xhi_ref (tk/256, 8, 128) i8  hi-plane (rows 4-7 = groups 4-7)
    sx_ref  (K/32, 1) f32        per-group activation scales
    qs_ref  (tk/2, TN) u8        packed nibbles (per-sb planar, see repack)
    sc_ref  (tk/32, TN) f32      group scales, natural order (hi rows
                                 pre-divided by 16 at repack)
    b_ref   (tk/32, TN) bf16     per-group bias rows (fused_bias; hi rows
                                 carry the folded -128 offset)
    """
    if fused_bias:
        b_ref = rest[0]
        o_ref, acc_ref = rest[1], rest[2]
    else:
        b_ref = None
        o_ref, acc_ref = rest[0], rest[1]
    kk = pl.program_id(kk_dim)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qs_ref[...]                                    # (tk/2, TN) uint8
    tk2, tn = p.shape
    nsb = tk2 // 128
    gs = tk2 // 16                                     # groups per K step
    lo = (p & 0x0F).astype(jnp.int8).reshape(nsb, 128, tn)
    hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).reshape(nsb, 128, tn)
    sx = sx_ref[pl.ds(kk * gs, gs), :]                 # (gs, 1)
    dn = (((2,), (1,)), ((0,), (0,)))
    slo = jax.lax.dot_general(xlo_ref[...], lo, dn,
                              preferred_element_type=jnp.int32)
    shi = jax.lax.dot_general(xhi_ref[...], hi, dn,
                              preferred_element_type=jnp.int32)
    # row r of (slo + shi)[sb] is group r's partial sum (lo fills rows 0-3,
    # hi rows 4-7); scales are stored in the same natural group order
    pf = ((slo + shi).astype(jnp.float32)
          * sc_ref[...].reshape(nsb, 8, tn)
          * sx.reshape(nsb, 8, 1))
    acc = jnp.sum(pf.reshape(gs, tn), axis=0, keepdims=True)   # (1, TN)
    if fused_bias:
        # per-group activation sums fall out of the block-diagonal layout
        # for free: row r's off-group lanes are zero, so a full-lane sum IS
        # the group sum — no prep-side reduce needed
        xsum = (jnp.sum(xlo_ref[...].astype(jnp.float32), axis=2)
                + jnp.sum(xhi_ref[...].astype(jnp.float32), axis=2))
        bsx = (xsum.reshape(nsb, 8, 1) * sx.reshape(nsb, 8, 1)).reshape(
            gs, 1).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            bsx, b_ref[...],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...]


_M1_EYE_LO = (np.arange(8)[:, None] == np.arange(4)[None, :]).astype(np.int8)
_M1_EYE_HI = (np.arange(8)[:, None]
              == np.arange(4)[None, :] + 4).astype(np.int8)


def _m1_masks():
    """(8, 4) slot masks for the block-diagonal activation layout."""
    return _M1_EYE_LO, _M1_EYE_HI


def _m1_prep(x, nrm, eps):
    """Quantize one activation row and lay it out block-diagonally per
    superblock plane: (1, K) -> xlo/xhi (K/256, 8, 128) int8, sx (K/32, 1)
    f32. The fused-bias group sums are recovered in-kernel from the
    zero-padded block-diagonal rows."""
    _, k = x.shape
    xq, sx = quantize_activations_g32(x, nrm, eps)
    xg = xq.reshape(k // 256, 8, 32)
    mlo, mhi = _m1_masks()
    xlo = (xg[:, None, :4, :] * mlo[None, :, :, None]).reshape(
        k // 256, 8, 128)
    xhi = (xg[:, None, 4:, :] * mhi[None, :, :, None]).reshape(
        k // 256, 8, 128)
    return xlo, xhi, sx.reshape(k // 32, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _qmm_call_txn_m1(x, qs, scales, bias=None, nrm=None, *,
                     eps: float = 0.0, interpret: bool):
    """q4b matmul for the single-row decode case (x [1, K]) — block-diagonal
    activation layout, packed per-group partials (see _qmm_kernel_txn_m1)."""
    return _m1_pallas(_m1_prep(x, nrm, eps), qs, scales, bias,
                      interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _m1_pallas(prep, qs, scales, bias=None, *, interpret: bool):
    xlo, xhi, sxg = prep
    k = sxg.shape[0] * 32
    n = qs.shape[1]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (n // tn, n_k)
    in_specs = [
        pl.BlockSpec((tk // 256, 8, 128), lambda j, kk: (kk, 0, 0)),
        pl.BlockSpec((tk // 256, 8, 128), lambda j, kk: (kk, 0, 0)),
        pl.BlockSpec((k // 32, 1), lambda j, kk: (0, 0)),
        pl.BlockSpec((tk // 2, tn), lambda j, kk: (kk, j)),
        pl.BlockSpec((tk // 32, tn), lambda j, kk: (kk, j)),
    ]
    operands = [xlo, xhi, sxg, qs, scales]
    if bias is not None:
        in_specs.append(pl.BlockSpec((tk // 32, tn), lambda j, kk: (kk, j)))
        operands.append(bias)
    return pl.pallas_call(
        functools.partial(_qmm_kernel_txn_m1, n_k=n_k,
                          fused_bias=bias is not None),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda j, kk: (0, j)),
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=qs.size + scales.size * 2 + k + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _qmm_kernel_txn_m1_l(li_ref, xlo_ref, xhi_ref, sx_ref, qs_ref, sc_ref,
                         *rest, n_k: int, fused_bias: bool = False):
    """Scalar-prefetch (layer-stacked) single-row txn kernel."""
    _qmm_kernel_txn_m1(xlo_ref, xhi_ref, sx_ref, qs_ref, sc_ref, *rest,
                       n_k=n_k, fused_bias=fused_bias)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _qmm_call_txn_m1_stacked(x, qs3, scales3, li, bias3=None, nrm=None, *,
                             eps: float = 0.0, interpret: bool):
    """Single-row natural-order int8 matmul against layer li of stacked
    weights (codes/scales/bias indexed inside the block specs)."""
    _, k = x.shape
    n = qs3.shape[2]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (n // tn, n_k)
    xlo, xhi, sxg = _m1_prep(x, nrm, eps)
    in_specs = [
        pl.BlockSpec((tk // 256, 8, 128), lambda j, kk, li_r: (kk, 0, 0)),
        pl.BlockSpec((tk // 256, 8, 128), lambda j, kk, li_r: (kk, 0, 0)),
        pl.BlockSpec((k // 32, 1), lambda j, kk, li_r: (0, 0)),
        pl.BlockSpec((None, tk // 2, tn),
                     lambda j, kk, li_r: (li_r[0], kk, j)),
        pl.BlockSpec((None, tk // 32, tn),
                     lambda j, kk, li_r: (li_r[0], kk, j)),
    ]
    operands = [xlo, xhi, sxg, qs3, scales3]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk // 32, tn), lambda j, kk, li_r: (li_r[0], kk, j)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda j, kk, li_r: (0, j)),
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_txn_m1_l, n_k=n_k,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=qs3.size // qs3.shape[0] + x.size + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([li], jnp.int32), *operands)


_M1_EYE8 = np.eye(8, dtype=np.int8)


def _m1_prep_q8(x, g, nrm, eps):
    """Block-diagonal single-row prep for q8b (int8 [K, N]) weights: groups
    of g pack 8-at-a-time into w = 8g windows — lhs (K/w, 8, w) whose row r
    holds group r's g codes at lane offset g*r. One batched dot per window
    then contracts the full w lanes and lands per-group partials with all 8
    sublanes packed (same trick as the q4b planes, minus the planes)."""
    _, k = x.shape
    xq, sx = quantize_activations_g32(x, nrm, eps)
    w = 8 * g
    xg = xq.reshape(k // w, 8, g)
    xblk = (xg[:, None, :, :] * _M1_EYE8[None, :, :, None]).reshape(
        k // w, 8, w)
    return xblk, sx.reshape(k // 32, 1)


def _qmm_kernel_q8_m1(xblk_ref, sx_ref, qs_ref, sc_ref, *rest, n_k: int,
                      g: int, fused_bias: bool = False, kk_dim: int = 1):
    """Single-row block-diagonal kernel for q8b formats (Q8_0/Q5_x/Q2_K/
    Q3_K/Q6_K/IQ*): the M=1 analog of the bf16-dequant path, but the MXU
    consumes the stored int8 codes directly (no per-weight dequant multiply)
    and the per-group scales apply to packed 2-D-shaped partials.

    xblk_ref (tk/(8g), 8, 8g) i8  block-diagonal activation groups
    sx_ref   (K/32, 1) f32        per-32 activation scales
    qs_ref   (tk, TN) i8          stored codes (K-major)
    sc_ref   (tk/g, TN) f32       per-group weight scales
    b_ref    (tk/g, TN) bf16      per-group bias rows (formats with mins)
    """
    if fused_bias:
        b_ref = rest[0]
        o_ref, acc_ref = rest[1], rest[2]
    else:
        b_ref = None
        o_ref, acc_ref = rest[0], rest[1]
    kk = pl.program_id(kk_dim)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = qs_ref[...]                                    # (tk, TN) int8
    tk, tn = q.shape
    w = 8 * g
    nb = tk // w
    rhs = q.reshape(nb, w, tn)
    xblk = xblk_ref[...]                               # (nb, 8, w)
    s = jax.lax.dot_general(xblk, rhs, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32)
    sx32 = sx_ref[pl.ds(kk * (tk // 32), tk // 32), :]
    # g=16 formats: each per-32 activation scale covers two weight groups
    sxg = sx32 if g == 32 else jnp.repeat(sx32, 2, axis=0)
    pf = (s.astype(jnp.float32)
          * sc_ref[...].reshape(nb, 8, tn)
          * sxg.reshape(nb, 8, 1))
    acc = jnp.sum(pf.reshape(nb * 8, tn), axis=0, keepdims=True)
    if fused_bias:
        xsum = jnp.sum(xblk.astype(jnp.float32), axis=2)       # (nb, 8)
        bsx = (xsum.reshape(nb, 8, 1) * sxg.reshape(nb, 8, 1)).reshape(
            nb * 8, 1).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            bsx, b_ref[...],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret", "eps", "g"))
def _qmm_call_q8_m1(x, qs, scales, bias=None, nrm=None, *, g: int,
                    eps: float = 0.0, interpret: bool):
    _, k = x.shape
    n = qs.shape[1]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    w = 8 * g
    if tk % w:
        tk = w
    n_k = k // tk
    grid = (n // tn, n_k)
    xblk, sxg = _m1_prep_q8(x, g, nrm, eps)
    in_specs = [
        pl.BlockSpec((tk // w, 8, w), lambda j, kk: (kk, 0, 0)),
        pl.BlockSpec((k // 32, 1), lambda j, kk: (0, 0)),
        pl.BlockSpec((tk, tn), lambda j, kk: (kk, j)),
        pl.BlockSpec((tk // g, tn), lambda j, kk: (kk, j)),
    ]
    operands = [xblk, sxg, qs, scales]
    if bias is not None:
        in_specs.append(pl.BlockSpec((tk // g, tn), lambda j, kk: (kk, j)))
        operands.append(bias)
    return pl.pallas_call(
        functools.partial(_qmm_kernel_q8_m1, n_k=n_k, g=g,
                          fused_bias=bias is not None),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda j, kk: (0, j)),
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=qs.size + scales.size * 2 + k + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _qmm_kernel_q8_m1_l(li_ref, xblk_ref, sx_ref, qs_ref, sc_ref, *rest,
                        n_k: int, g: int, fused_bias: bool = False):
    """Scalar-prefetch (layer-stacked) single-row q8b kernel."""
    _qmm_kernel_q8_m1(xblk_ref, sx_ref, qs_ref, sc_ref, *rest, n_k=n_k,
                      g=g, fused_bias=fused_bias)


@functools.partial(jax.jit, static_argnames=("interpret", "eps", "g"))
def _qmm_call_q8_m1_stacked(x, qs3, scales3, li, bias3=None, nrm=None, *,
                            g: int, eps: float = 0.0, interpret: bool):
    """Single-row q8b matmul against layer li of stacked weights — replaces
    the slice-copy fallback (which re-read every layer byte once more) for
    stacked q8b serving at batch 1."""
    _, k = x.shape
    n = qs3.shape[2]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    w = 8 * g
    if tk % w:
        tk = w
    n_k = k // tk
    grid = (n // tn, n_k)
    xblk, sxg = _m1_prep_q8(x, g, nrm, eps)
    in_specs = [
        pl.BlockSpec((tk // w, 8, w), lambda j, kk, li_r: (kk, 0, 0)),
        pl.BlockSpec((k // 32, 1), lambda j, kk, li_r: (0, 0)),
        pl.BlockSpec((None, tk, tn), lambda j, kk, li_r: (li_r[0], kk, j)),
        pl.BlockSpec((None, tk // g, tn),
                     lambda j, kk, li_r: (li_r[0], kk, j)),
    ]
    operands = [xblk, sxg, qs3, scales3]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk // g, tn), lambda j, kk, li_r: (li_r[0], kk, j)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda j, kk, li_r: (0, j)),
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_q8_m1_l, n_k=n_k, g=g,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k,
            bytes_accessed=qs3.size // qs3.shape[0] + k + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([li], jnp.int32), *operands)


# ---------------------------------------------------------------------------
# Expert-routed (MoE) single-row matmuls — the TPU MixMul.
#
# The reference's llamafile_mixmul builds per-expert row-pointer lists and
# runs per-expert GEMMs over just the routed rows
# (tinyblas_cpu_mixmul.inc:100-111). Here each routed (token, expert) slot is
# one grid step of the m1 block-diagonal kernel whose BlockSpec index maps
# read the expert id and token row from scalar-prefetch arrays — so ONLY the
# routed experts' quantized bytes stream from HBM (decode HBM traffic =
# k_used/E of the dense-compute formulation; Mixtral top-2-of-8 reads 4x
# fewer expert bytes).
# ---------------------------------------------------------------------------


def _m1_prep_rows(x, nrm, eps):
    """_m1_prep for B rows: (B, K) -> xlo/xhi (B, K/256, 8, 128) int8,
    sx (B, K/32, 1) f32 — leading row dim indexed by the routed kernels'
    token prefetch array."""
    m, k = x.shape
    xq, sx = quantize_activations_g32(x, nrm, eps)
    xg = xq.reshape(m, k // 256, 8, 32)
    mlo, mhi = _m1_masks()
    xlo = (xg[:, :, None, :4, :] * mlo[None, None, :, :, None]).reshape(
        m, k // 256, 8, 128)
    xhi = (xg[:, :, None, 4:, :] * mhi[None, None, :, :, None]).reshape(
        m, k // 256, 8, 128)
    return xlo, xhi, sx.reshape(m, k // 32, 1)


def _qmm_kernel_txn_m1_r(ei_ref, ti_ref, xlo_ref, xhi_ref, sx_ref, qs_ref,
                         sc_ref, *rest, n_k: int, fused_bias: bool = False):
    """Routed (expert-indexed) single-row txn kernel: grid (slot, j, kk)."""
    _qmm_kernel_txn_m1(xlo_ref, xhi_ref, sx_ref, qs_ref, sc_ref, *rest,
                       n_k=n_k, fused_bias=fused_bias, kk_dim=2)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _qmm_call_txn_m1_routed(x, qs3, scales3, ei, ti, bias3=None, nrm=None, *,
                            eps: float = 0.0, interpret: bool):
    """Routed q4b matmul: out[s] = x[ti[s]] @ W[ei[s]].T.

    qs3/scales3/bias3 are EXPERT-stacked (leading dim E); ei/ti are int32
    [S] slot -> expert / slot -> token-row maps riding scalar prefetch. Each
    slot's grid steps stream exactly one expert's bytes (slot-major order:
    expert weights are contiguous in the stream)."""
    m, k = x.shape
    s_n = ei.shape[0]
    n = qs3.shape[2]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (s_n, n // tn, n_k)
    xlo, xhi, sxg = _m1_prep_rows(x, nrm, eps)
    in_specs = [
        pl.BlockSpec((None, tk // 256, 8, 128),
                     lambda s, j, kk, er, tr: (tr[s], kk, 0, 0)),
        pl.BlockSpec((None, tk // 256, 8, 128),
                     lambda s, j, kk, er, tr: (tr[s], kk, 0, 0)),
        pl.BlockSpec((None, k // 32, 1),
                     lambda s, j, kk, er, tr: (tr[s], 0, 0)),
        pl.BlockSpec((None, tk // 2, tn),
                     lambda s, j, kk, er, tr: (er[s], kk, j)),
        pl.BlockSpec((None, tk // 32, tn),
                     lambda s, j, kk, er, tr: (er[s], kk, j)),
    ]
    operands = [xlo, xhi, sxg, qs3, scales3]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk // 32, tn), lambda s, j, kk, er, tr: (er[s], kk, j)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, 1, tn),
                               lambda s, j, kk, er, tr: (s, 0, j)),
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_qmm_kernel_txn_m1_r, n_k=n_k,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((s_n, 1, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_n * n * k,
            bytes_accessed=(s_n * (qs3.size // qs3.shape[0]) + x.size
                            + s_n * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ei.astype(jnp.int32), ti.astype(jnp.int32), *operands)
    return y.reshape(s_n, n)


def _m1_prep_q8_rows(x, g, nrm, eps):
    """_m1_prep_q8 for B rows: (B, K) -> xblk (B, K/(8g), 8, 8g) int8,
    sx (B, K/32, 1) f32."""
    m, k = x.shape
    xq, sx = quantize_activations_g32(x, nrm, eps)
    w = 8 * g
    xg = xq.reshape(m, k // w, 8, g)
    xblk = (xg[:, :, None, :, :] * _M1_EYE8[None, None, :, :, None]).reshape(
        m, k // w, 8, w)
    return xblk, sx.reshape(m, k // 32, 1)


def _qmm_kernel_q8_m1_r(ei_ref, ti_ref, xblk_ref, sx_ref, qs_ref, sc_ref,
                        *rest, n_k: int, g: int, fused_bias: bool = False):
    """Routed (expert-indexed) single-row q8b kernel: grid (slot, j, kk)."""
    _qmm_kernel_q8_m1(xblk_ref, sx_ref, qs_ref, sc_ref, *rest, n_k=n_k,
                      g=g, fused_bias=fused_bias, kk_dim=2)


@functools.partial(jax.jit, static_argnames=("interpret", "eps", "g"))
def _qmm_call_q8_m1_routed(x, qs3, scales3, ei, ti, bias3=None, nrm=None, *,
                           g: int, eps: float = 0.0, interpret: bool):
    """Routed q8b matmul: out[s] = x[ti[s]] @ W[ei[s]].T (see txn variant)."""
    m, k = x.shape
    s_n = ei.shape[0]
    n = qs3.shape[2]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    w = 8 * g
    if tk % w:
        tk = w
    n_k = k // tk
    grid = (s_n, n // tn, n_k)
    xblk, sxg = _m1_prep_q8_rows(x, g, nrm, eps)
    in_specs = [
        pl.BlockSpec((None, tk // w, 8, w),
                     lambda s, j, kk, er, tr: (tr[s], kk, 0, 0)),
        pl.BlockSpec((None, k // 32, 1),
                     lambda s, j, kk, er, tr: (tr[s], 0, 0)),
        pl.BlockSpec((None, tk, tn),
                     lambda s, j, kk, er, tr: (er[s], kk, j)),
        pl.BlockSpec((None, tk // g, tn),
                     lambda s, j, kk, er, tr: (er[s], kk, j)),
    ]
    operands = [xblk, sxg, qs3, scales3]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk // g, tn), lambda s, j, kk, er, tr: (er[s], kk, j)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, 1, tn),
                               lambda s, j, kk, er, tr: (s, 0, j)),
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_qmm_kernel_q8_m1_r, n_k=n_k, g=g,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((s_n, 1, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_n * n * k,
            bytes_accessed=(s_n * (qs3.size // qs3.shape[0]) + x.size
                            + s_n * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ei.astype(jnp.int32), ti.astype(jnp.int32), *operands)
    return y.reshape(s_n, n)


# ---------------------------------------------------------------------------
# Fused routed FFN (MoE) kernel — gateup, silu*up, requantize, and down in ONE
# pallas call per layer.
#
# The two-call formulation (qmatmul_routed gateup -> XLA glue -> qmatmul_routed
# down) pays ~40 us/layer of XLA op-boundary latency between the kernels on
# Mixtral decode (probe_moe_phases: isolated kernels 315 us/layer vs 355
# in-model) — every boundary is an HBM round-trip plus launch latency that
# cannot overlap the weight streams. Here ONE grid walks both matmuls:
# phase A (gateup tiles) accumulates gate|up partials, and on each output
# tile's last K step quantizes silu(g)*u to int8 per-32 groups IN-KERNEL,
# writing the block-diagonal activation planes for phase B into VMEM scratch
# (the router weight topw folds into the activation scales — exact, since
# codes are invariant to a positive per-row scale). Phase B (down tiles)
# contracts the scratch activations against the down expert's tiles. The
# down expert's first weight block prefetches DURING phase A (its index map
# pins to block 0 there), so the phase boundary costs no pipeline bubble.
#
# Weight layout: phase A requires the gate|up expert stack INTERLEAVED in
# 1024-wide stripes ([g0|u0|g1|u1|...], repack.stack_experts interleave=True)
# so each 2048-wide output tile holds a g/u pair and the epilogue never
# crosses tiles. Reference capability: llamafile_mixmul
# (tinyblas_cpu_mixmul.inc:100-111) — one fused expert-FFN pass per layer.
# ---------------------------------------------------------------------------


def _qmm_kernel_moe_m1(ei_ref, ti_ref, tw_ref, xlo_ref, xhi_ref, sx_ref,
                       guq_ref, gusc_ref, *rest, t_a: int, n_k_a: int,
                       n_k_b: int, gu_bias: bool, dn_bias: bool):
    i = 0
    gub_ref = rest[i] if gu_bias else None
    i += 1 if gu_bias else 0
    dnq_ref, dnsc_ref = rest[i], rest[i + 1]
    i += 2
    dnb_ref = rest[i] if dn_bias else None
    i += 1 if dn_bias else 0
    o_ref = rest[i]
    accA_ref, accB_ref, ylo_s, yhi_s, sy_s = rest[i + 1:i + 6]
    s = pl.program_id(0)       # hoisted: program_id inside a pl.when body
    t = pl.program_id(1)        # does not lower under the CPU interpreter
    dn_dims = (((2,), (1,)), ((0,), (0,)))

    def qdot(p, xlo, xhi, sxs, sc_ref, b_ref):
        """Block-diagonal int8 dot + per-group scaling (the txn m1 math)."""
        tk2, tn = p.shape
        nsb = tk2 // 128
        gs = tk2 // 16
        lo = (p & 0x0F).astype(jnp.int8).reshape(nsb, 128, tn)
        hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).reshape(nsb, 128, tn)
        slo = jax.lax.dot_general(xlo, lo, dn_dims,
                                  preferred_element_type=jnp.int32)
        shi = jax.lax.dot_general(xhi, hi, dn_dims,
                                  preferred_element_type=jnp.int32)
        pf = ((slo + shi).astype(jnp.float32)
              * sc_ref[...].reshape(nsb, 8, tn)
              * sxs.reshape(nsb, 8, 1))
        acc = jnp.sum(pf.reshape(gs, tn), axis=0, keepdims=True)
        if b_ref is not None:
            xsum = (jnp.sum(xlo.astype(jnp.float32), axis=2)
                    + jnp.sum(xhi.astype(jnp.float32), axis=2))
            bsx = (xsum.reshape(nsb, 8, 1)
                   * sxs.reshape(nsb, 8, 1)).reshape(gs, 1).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                bsx, b_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    @pl.when(t < t_a)
    def _phase_a():
        kk = t % n_k_a

        @pl.when(kk == 0)
        def _init():
            accA_ref[...] = jnp.zeros_like(accA_ref)

        gs = guq_ref.shape[0] // 16
        sxs = sx_ref[pl.ds(kk * gs, gs), :]
        accA_ref[...] += qdot(guq_ref[...], xlo_ref[...], xhi_ref[...],
                              sxs, gusc_ref, gub_ref)

        @pl.when(kk == n_k_a - 1)
        def _epilogue():
            # quantize y = silu(g)*u per-32 (quantize_activations_g32
            # semantics) and lay it out block-diagonally for phase B; the
            # routing weight rides the activation scales (exact)
            tn_gu = accA_ref.shape[1]
            stripe = tn_gu // 2
            nsb4 = stripe // 256
            accv = accA_ref[...]
            g_, u_ = accv[:, :stripe], accv[:, stripe:]
            y = (g_ * jax.lax.logistic(g_)) * u_               # (1, stripe)
            y4 = y.reshape(nsb4, 256)
            ab = jnp.abs(y4)
            lane = jax.lax.broadcasted_iota(jnp.int32, (nsb4, 256), 1)
            r32 = jax.lax.broadcasted_iota(jnp.int32, (stripe // 32, 1), 0)
            inv = jnp.zeros((nsb4, 256), jnp.float32)
            sy_col = jnp.zeros((stripe // 32, 1), jnp.float32)
            for gi in range(8):                      # 8 groups per 256 lanes
                in_g = lane // 32 == gi
                mg = jnp.max(jnp.where(in_g, ab, 0.0), axis=1, keepdims=True)
                invg = jnp.where(mg > 0, 127.0 / jnp.where(mg > 0, mg, 1.0),
                                 0.0)
                inv = inv + jnp.where(in_g,
                                      jnp.broadcast_to(invg, (nsb4, 256)), 0.0)
                srep = jnp.repeat(mg / 127.0, 8, axis=0)   # (nsb4*8, 1)
                sy_col = sy_col + jnp.where(r32 % 8 == gi, srep, 0.0)
            yq = jnp.clip(jnp.round(y4 * inv), -127, 127).astype(jnp.int32)
            loq, hiq = yq[:, :128], yq[:, 128:]
            rr = jax.lax.broadcasted_iota(jnp.int32, (nsb4, 8, 128), 1)
            ll = jax.lax.broadcasted_iota(jnp.int32, (nsb4, 8, 128), 2)
            j_a = t // n_k_a
            ylo_s[pl.ds(j_a * nsb4, nsb4)] = jnp.where(
                ll // 32 == rr, loq[:, None, :], 0).astype(jnp.int8)
            yhi_s[pl.ds(j_a * nsb4, nsb4)] = jnp.where(
                ll // 32 == rr - 4, hiq[:, None, :], 0).astype(jnp.int8)
            sy_s[pl.ds(j_a * (stripe // 32), stripe // 32)] = (
                sy_col * tw_ref[s])

    @pl.when(t >= t_a)
    def _phase_b():
        kk = (t - t_a) % n_k_b

        @pl.when(kk == 0)
        def _init():
            accB_ref[...] = jnp.zeros_like(accB_ref)

        nsb = dnq_ref.shape[0] // 128
        gs = dnq_ref.shape[0] // 16
        xlo = ylo_s[pl.ds(kk * nsb, nsb)]
        xhi = yhi_s[pl.ds(kk * nsb, nsb)]
        sxs = sy_s[pl.ds(kk * gs, gs), :]
        accB_ref[...] += qdot(dnq_ref[...], xlo, xhi, sxs, dnsc_ref, dnb_ref)

        @pl.when(kk == n_k_b - 1)
        def _done():
            o_ref[...] = accB_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _qmm_call_moe_m1(x, guq3, gusc3, gub3, dnq3, dnsc3, dnb3, ei, ti, topw,
                     nrm=None, *, eps: float = 0.0, interpret: bool):
    """Fused routed FFN: out[s] = (silu(g)*u*topw[s]) @ Wdn[ei[s]].T where
    [g|u] = x[ti[s]] @ Wgu[ei[s]].T on the 1024-stripe-interleaved gate|up
    stack. Returns f32 [S, d]; the caller sums slots per token."""
    m, k = x.shape
    s_n = ei.shape[0]
    n_gu = guq3.shape[2]
    d_out = dnq3.shape[2]
    kd = dnq3.shape[1] * 2                     # dff (q4b codes are K/2-major)
    tn_gu = 2048
    _, _, tk_gu = _choose_tiles_txn(8, n_gu, k)
    if tk_gu % 256:
        tk_gu = 256
    n_k_a = k // tk_gu
    n_j_a = n_gu // tn_gu
    t_a = n_j_a * n_k_a
    _, tn_dn, tk_dn = _choose_tiles_txn(8, d_out, kd)
    if tk_dn % 256:
        tk_dn = 256
    n_k_b = kd // tk_dn
    n_j_b = d_out // tn_dn
    grid = (s_n, t_a + n_j_b * n_k_b)
    xlo, xhi, sxg = _m1_prep_rows(x, nrm, eps)

    def a_kk(t):
        return jnp.where(t < t_a, t % n_k_a, n_k_a - 1)

    def a_j(t):
        return jnp.where(t < t_a, t // n_k_a, n_j_a - 1)

    def b_kk(t):
        return jnp.where(t < t_a, 0, (t - t_a) % n_k_b)

    def b_j(t):
        return jnp.where(t < t_a, 0, (t - t_a) // n_k_b)

    in_specs = [
        pl.BlockSpec((None, tk_gu // 256, 8, 128),
                     lambda s, t, er, tr, twr: (tr[s], a_kk(t), 0, 0)),
        pl.BlockSpec((None, tk_gu // 256, 8, 128),
                     lambda s, t, er, tr, twr: (tr[s], a_kk(t), 0, 0)),
        pl.BlockSpec((None, k // 32, 1),
                     lambda s, t, er, tr, twr: (tr[s], 0, 0)),
        pl.BlockSpec((None, tk_gu // 2, tn_gu),
                     lambda s, t, er, tr, twr: (er[s], a_kk(t), a_j(t))),
        pl.BlockSpec((None, tk_gu // 32, tn_gu),
                     lambda s, t, er, tr, twr: (er[s], a_kk(t), a_j(t))),
    ]
    operands = [xlo, xhi, sxg, guq3, gusc3]
    if gub3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk_gu // 32, tn_gu),
            lambda s, t, er, tr, twr: (er[s], a_kk(t), a_j(t))))
        operands.append(gub3)
    in_specs += [
        pl.BlockSpec((None, tk_dn // 2, tn_dn),
                     lambda s, t, er, tr, twr: (er[s], b_kk(t), b_j(t))),
        pl.BlockSpec((None, tk_dn // 32, tn_dn),
                     lambda s, t, er, tr, twr: (er[s], b_kk(t), b_j(t))),
    ]
    operands += [dnq3, dnsc3]
    if dnb3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk_dn // 32, tn_dn),
            lambda s, t, er, tr, twr: (er[s], b_kk(t), b_j(t))))
        operands.append(dnb3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, 1, tn_dn),
                               lambda s, t, er, tr, twr: (s, 0, b_j(t))),
        scratch_shapes=[
            pltpu.VMEM((1, tn_gu), jnp.float32),
            pltpu.VMEM((1, tn_dn), jnp.float32),
            pltpu.VMEM((kd // 256, 8, 128), jnp.int8),
            pltpu.VMEM((kd // 256, 8, 128), jnp.int8),
            pltpu.VMEM((kd // 32, 1), jnp.float32),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_qmm_kernel_moe_m1, t_a=t_a, n_k_a=n_k_a,
                          n_k_b=n_k_b, gu_bias=gub3 is not None,
                          dn_bias=dnb3 is not None),
        out_shape=jax.ShapeDtypeStruct((s_n, 1, d_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_n * (n_gu * k + d_out * kd),
            bytes_accessed=(s_n * (guq3.size // guq3.shape[0]
                                   + dnq3.size // dnq3.shape[0])
                            + x.size + s_n * d_out * 4),
            transcendentals=s_n * kd,
        ),
        interpret=interpret,
    )(ei.astype(jnp.int32), ti.astype(jnp.int32),
      topw.reshape(s_n).astype(jnp.float32), *operands)
    return y.reshape(s_n, d_out)


GU_STRIPE = 1024


def split_gu(gu, dff: int, interleaved: bool):
    """Split a fused gate|up matmul output [..., 2*dff] into (g, u): plain
    halves, or de-interleave the GU_STRIPE-striped layout the fused MoE
    kernel's weight stack uses (repack.stack_experts interleave)."""
    if not interleaved:
        return gu[..., :dff], gu[..., dff:]
    lead = gu.shape[:-1]
    p = gu.reshape(*lead, dff // GU_STRIPE, 2, GU_STRIPE)
    g = p[..., 0, :].reshape(*lead, dff)
    u = p[..., 1, :].reshape(*lead, dff)
    return g, u


def qmatmul_moe(x: jax.Array, gu_qt: QTensor, dn_qt: QTensor, expert_ids,
                topw, row_map=None, prenorm=None):
    """Fused routed FFN entry (see _qmm_call_moe_m1). gu_qt must be the
    interleaved gate|up expert stack ("gateup_il"); dn_qt the down stack.
    Returns f32 [S, d] = per-slot routing-weighted expert FFN outputs.
    Caller must check moe_fusable() first."""
    m, k = x.shape
    s_n = expert_ids.shape[0]
    if row_map is None:
        row_map = jnp.repeat(jnp.arange(m, dtype=jnp.int32), s_n // m)
    pn_kw = {}
    if prenorm is not None:
        pn_kw = {"nrm": jnp.asarray(prenorm[0], jnp.float32),
                 "eps": float(prenorm[1])}
    y = _qmm_call_moe_m1(x, gu_qt.qs, gu_qt.scales, gu_qt.bias,
                         dn_qt.qs, dn_qt.scales, dn_qt.bias,
                         expert_ids, row_map, topw,
                         interpret=_interpret(), **pn_kw)
    n = dn_qt.shape[0]                  # storage may be N-tile-padded
    return y[:, :n] if y.shape[1] > n else y


def moe_fusable(gu_qt, dn_qt, k: int, dff: int) -> bool:
    """Shape/kind gate for the fused routed-FFN kernel."""
    if gu_qt is None or dn_qt is None:
        return False
    if gu_qt.kind != "q4b" or dn_qt.kind != "q4b" or Q4B_KERNEL != "txn":
        return False
    if getattr(gu_qt.qs, "ndim", 0) != 3 or getattr(dn_qt.qs, "ndim", 0) != 3:
        return False
    n_gu, d_out = gu_qt.qs.shape[2], dn_qt.qs.shape[2]
    return (k % 256 == 0 and dff % 1024 == 0 and n_gu == 2 * dff
            and n_gu % 2048 == 0 and dff % 256 == 0 and d_out % 256 == 0)


def _routed_fallback(x, qt: QTensor, ei, ti):
    """Reference routed matmul (dense kind / odd shapes): per-slot gather of
    the expert's weights through the XLA dequant path."""
    def one(e, t):
        sub = QTensor(
            qt.kind, qt.shape, qt.g,
            jax.lax.dynamic_index_in_dim(qt.qs, e, 0, keepdims=False),
            None if qt.scales is None else
            jax.lax.dynamic_index_in_dim(qt.scales, e, 0, keepdims=False),
            None if qt.bias is None else
            jax.lax.dynamic_index_in_dim(qt.bias, e, 0, keepdims=False))
        row = jax.lax.dynamic_index_in_dim(x, t, 0, keepdims=True)
        return qmatmul_fallback(row, sub)[0]
    return jax.vmap(one)(ei, ti)


def qmatmul_routed(x: jax.Array, qt: QTensor, expert_ids, row_map=None,
                   prenorm=None) -> jax.Array:
    """Expert-routed matmul: y[s] = x[row_map[s]] @ W[expert_ids[s]].T.

    qt holds EXPERT-STACKED leaves (leading dim E; see repack.stack_experts).
    expert_ids int32 [S] (traced — the router's flattened top-k choices);
    row_map int32 [S] maps slots to x rows, defaulting to s // (S // M)
    (each token's k_used slots contiguous). Returns f32 [S, N].

    This is the framework's MixMul (reference llamafile_mixmul,
    tinyblas_cpu_mixmul.inc:32-74 shape semantics): HBM streams only the
    routed experts' bytes. Intended for decode-sized M where S = M*k_used
    <= E; at prefill sizes the dense formulation amortizes better per byte.
    """
    m, k = x.shape
    s_n = expert_ids.shape[0]
    if row_map is None:
        row_map = jnp.repeat(jnp.arange(m, dtype=jnp.int32), s_n // m)
    if prenorm is not None:
        pn_kw = {"nrm": jnp.asarray(prenorm[0], jnp.float32),
                 "eps": float(prenorm[1])}
    else:
        pn_kw = {}
    if (qt.kind == "q4b" and Q4B_KERNEL == "txn" and k % 256 == 0):
        y = _qmm_call_txn_m1_routed(x, qt.qs, qt.scales, expert_ids, row_map,
                                    qt.bias, interpret=_interpret(), **pn_kw)
    elif (qt.kind == "q8b" and qt.g in (16, 32) and k % (8 * qt.g) == 0
          and k % 32 == 0):
        y = _qmm_call_q8_m1_routed(x, qt.qs, qt.scales, expert_ids, row_map,
                                   qt.bias, g=qt.g, interpret=_interpret(),
                                   **pn_kw)
    else:
        if prenorm is not None:
            x = apply_rmsnorm(x, prenorm[0], float(prenorm[1]))
        y = _routed_fallback(x, qt, expert_ids, row_map)
    n = qt.shape[0]
    return y[:, :n] if y.shape[1] > n else y


# ---------------------------------------------------------------------------
# Grouped (ragged) expert matmuls — the prefill half of the TPU MixMul.
#
# At prefill sizes, per-slot expert streaming (qmatmul_routed) would re-read
# each expert's weights once per token. Instead the caller SORTS the routed
# (token, expert) slots by expert, pads each expert's group of rows to a
# multiple of the M tile, and passes a per-M-tile expert map: every grid row
# tile then reads exactly one expert's weight tiles (scalar-prefetch indexed),
# so compute is proportional to routed tokens (the reference's per-expert
# GEMMs over row-pointer lists, tinyblas_cpu_mixmul.inc:100-111) and weight
# bytes are n_tiles * expert_bytes instead of tokens * expert_bytes.
# ---------------------------------------------------------------------------


def _qmm_kernel_txn_g(te_ref, xq_ref, sx_ref, qs_ref, sc_ref, *rest,
                      n_k: int, fused_bias: bool = False):
    """Grouped txn kernel: row-tile i reads expert te[i]'s weight tiles."""
    _qmm_kernel_txn(xq_ref, sx_ref, qs_ref, sc_ref, *rest, n_k=n_k,
                    fused_bias=fused_bias)


@functools.partial(jax.jit, static_argnames=("interpret", "tm"))
def _qmm_call_txn_grouped(x, qs3, scales3, te, bias3=None, *,
                          tm: int, interpret: bool):
    """Grouped q4b int8 matmul (decode-scale S: tm <= 32 keeps the int32
    partial tensors VMEM-resident). x [S_pad, K] expert-sorted tile-padded
    rows; te int32 [S_pad/tm] per-tile expert ids (scalar prefetch)."""
    m, k = x.shape
    n = qs3.shape[2]
    _, tn, tk = _choose_tiles_txn(8, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xq, sx = quantize_activations_g32(x)
    xqg = xq.reshape(m, k // 32, 32).transpose(1, 0, 2)
    sxg = sx.T
    in_specs = [
        pl.BlockSpec((tk // 32, tm, 32), lambda i, j, kk, t: (kk, i, 0)),
        pl.BlockSpec((k // 32, tm), lambda i, j, kk, t: (0, i)),
        pl.BlockSpec((None, tk // 2, tn), lambda i, j, kk, t: (t[i], kk, j)),
        pl.BlockSpec((None, tk // 32, tn), lambda i, j, kk, t: (t[i], kk, j)),
    ]
    operands = [xqg, sxg, qs3, scales3]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec(
            (None, tk // 32, tn), lambda i, j, kk, t: (t[i], kk, j)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, t: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_txn_g, n_k=n_k,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m // tm) * (qs3.size // qs3.shape[0])
            + x.size + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(te.astype(jnp.int32), *operands)


def _qmm_kernel_planes_g(te_ref, xe_ref, xo_ref, qs_ref, slo_ref, shi_ref,
                         *rest, n_k: int, fused_bias: bool = False):
    """Grouped planes kernel (prefill-scale). With fused_bias, the per-group
    activation sums contract against expert te[i]'s bias rows in-kernel (one
    extra bf16 dot) — the dense path's external XLA bias dot can't index a
    per-tile expert."""
    if fused_bias:
        bx_ref, b_ref = rest[0], rest[1]
        o_ref, acc_ref = rest[2], rest[3]
    else:
        o_ref, acc_ref = rest[0], rest[1]
    _qmm_kernel_planes(xe_ref, xo_ref, qs_ref, slo_ref, shi_ref,
                       o_ref, acc_ref, n_k=n_k)
    if fused_bias:
        # bx rides TRANSPOSED [groups, tm]: groups on sublanes keeps the
        # block lane dim at tm (128) — (tm, tk/32) blocks had a tk/32-wide
        # lane dim, which Mosaic rejects for tk < k
        acc_ref[...] += jax.lax.dot_general(
            bx_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(2) == n_k - 1)
        def _done2():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tm"))
def _qmm_call_planes_grouped(x, qs3, scales3, te, bias3=None, *,
                             tm: int, interpret: bool):
    """Grouped q4b bf16-dequant matmul (prefill-scale S). See txn variant
    for the row layout contract."""
    m, k = x.shape
    n = qs3.shape[2]
    e_n = qs3.shape[0]
    _, tn, tk = _choose_tiles(tm, n, k)
    if tk % 256:
        tk = 256
    if (tk // 64) % 8 and tk != k:
        tk = k          # sublane-legal scale planes (see _qmm_call_planes)
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xb = x.astype(jnp.bfloat16)
    x4 = xb.reshape(m, k // 256, 2, 128)
    xe = x4[:, :, 0, :].reshape(m, k // 2)
    xo = x4[:, :, 1, :].reshape(m, k // 2)
    sc3 = scales3.reshape(e_n, k // 256, 8, -1)
    slo = sc3[:, :, :4].reshape(e_n, k // 64, -1)
    shi = sc3[:, :, 4:].reshape(e_n, k // 64, -1)
    in_specs = [
        pl.BlockSpec((tm, tk // 2), lambda i, j, kk, t: (i, kk)),
        pl.BlockSpec((tm, tk // 2), lambda i, j, kk, t: (i, kk)),
        pl.BlockSpec((None, tk // 2, tn), lambda i, j, kk, t: (t[i], kk, j)),
        pl.BlockSpec((None, tk // 64, tn), lambda i, j, kk, t: (t[i], kk, j)),
        pl.BlockSpec((None, tk // 64, tn), lambda i, j, kk, t: (t[i], kk, j)),
    ]
    operands = [xe, xo, qs3, slo, shi]
    if bias3 is not None:
        # per-group activation sums for the fused bias dot (w = a*q + b
        # normalization: y += sum_g (sum_k x)[g] * b[g, n])
        bx = jnp.sum(x.astype(jnp.float32).reshape(m, k // 32, 32),
                     axis=2).astype(jnp.bfloat16).T    # [k/32, m]
        in_specs.append(pl.BlockSpec((tk // 32, tm),
                                     lambda i, j, kk, t: (kk, i)))
        in_specs.append(pl.BlockSpec((None, tk // 32, tn),
                                     lambda i, j, kk, t: (t[i], kk, j)))
        operands.extend([bx, bias3])
    out_t = jnp.bfloat16 if m >= 256 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, t: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_planes_g, n_k=n_k,
                          fused_bias=bias3 is not None),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m // tm) * (qs3.size // qs3.shape[0])
            + x.size + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(te.astype(jnp.int32), *operands)


def qmatmul_grouped(x: jax.Array, qt: QTensor, tile_expert, *,
                    tm: int) -> jax.Array:
    """Grouped expert matmul: row tile i of x multiplies W[tile_expert[i]].T.

    x [S_pad, K] float — routed rows sorted by expert, each expert's group
    padded to a multiple of tm (padding rows are zeros; their outputs are
    garbage-free zeros and the caller drops them). qt EXPERT-STACKED q4b,
    K % 256 == 0 (callers guard). Returns [S_pad, N] f32 (bf16 at large S,
    like the dense prefill path)."""
    k = x.shape[1]
    assert qt.kind == "q4b" and k % 256 == 0 and x.shape[0] % tm == 0
    if tm <= 32:
        y = _qmm_call_txn_grouped(x, qt.qs, qt.scales, tile_expert, qt.bias,
                                  tm=tm, interpret=_interpret())
    else:
        y = _qmm_call_planes_grouped(x, qt.qs, qt.scales, tile_expert,
                                     qt.bias, tm=tm, interpret=_interpret())
    n = qt.shape[0]
    return y[:, :n] if y.shape[1] > n else y


def quantize_activations_g32(x: jax.Array, nrm=None, eps: float = 0.0):
    """x [M, K] float -> (xq int8 [M, K], sx f32 [M, K//32]) per-32 absmax.

    nrm (f32 [K]) folds an RMSNorm of x into the quantization EXACTLY:
    the int8 codes of rmsnorm(x)*nrm depend only on the per-group absmax of
    x*nrm (the rsqrt(mean(x^2)+eps) scalar is positive and uniform across K,
    so it cancels out of code/absmax ratios) — the norm rides entirely in
    the [M, K//32] activation scales. This removes the standalone norm
    fusion XLA otherwise emits before every quantized projection (~4 us per
    norm on v5e at decode M; reference does norm then quantize separately,
    llama.cpp build_norm + quantize_row_q8_K)."""
    m, k = x.shape
    x32 = x.astype(jnp.float32)
    if nrm is not None:
        xw = x32 * nrm.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    else:
        xw = x32
        r = None
    xg = xw.reshape(m, k // 32, 32)
    amax = jnp.max(jnp.abs(xg), axis=2)
    sx = amax / 127.0
    if r is not None:
        sx = sx * r
    inv = jnp.where(amax > 0, 127.0 / jnp.where(amax > 0, amax, 1.0), 0.0)
    xq = jnp.clip(jnp.round(xg * inv[:, :, None]), -127, 127).astype(jnp.int8)
    return xq.reshape(m, k), sx


def apply_rmsnorm(x: jax.Array, nrm, eps: float) -> jax.Array:
    """Plain RMSNorm (prenorm fallback for kernels without fused quantize)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)) * nrm


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_call_int8(x, qs, scales, *, interpret: bool):
    """q4b matmul via int8 MXU with on-the-fly activation quantization."""
    m, k = x.shape
    n = qs.shape[1]
    tm, tn, tk = _choose_tiles(m, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xq, sx = quantize_activations_g32(x)
    # even/odd 128-chunk planes of codes and the matching per-group x scales;
    # codes go group-major (G, M, 32) so kernel blocks slice the G axis
    x4 = xq.reshape(m, k // 256, 2, 128)
    xqe = x4[:, :, 0, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
    xqo = x4[:, :, 1, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
    sx3 = sx.reshape(m, k // 256, 8)
    sxe = sx3[:, :, :4].reshape(m, k // 64).T    # [K/64, M] (sublane-sliced)
    sxo = sx3[:, :, 4:].reshape(m, k // 64).T
    sc3 = scales.reshape(k // 256, 8, -1)
    slo = sc3[:, :4].reshape(k // 64, -1)
    shi = sc3[:, 4:].reshape(k // 64, -1)
    in_specs = [
        pl.BlockSpec((tk // 64, tm, 32), lambda i, j, kk: (kk, i, 0)),
        pl.BlockSpec((tk // 64, tm, 32), lambda i, j, kk: (kk, i, 0)),
        pl.BlockSpec((k // 64, tm), lambda i, j, kk: (0, i)),
        pl.BlockSpec((k // 64, tm), lambda i, j, kk: (0, i)),
        pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j)),
    ]
    operands = [xqe, xqo, sxe, sxo, qs, slo, shi]
    return pl.pallas_call(
        functools.partial(_qmm_kernel_int8, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs.size + scales.size * 2 + x.size + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _qmm_kernel_planes_l(li_ref, xe_ref, xo_ref, qs_ref, slo_ref, shi_ref,
                         o_ref, acc_ref, *, n_k: int):
    """Scalar-prefetch variant of the planes kernel for layer-stacked weights:
    the [L, K/2, N] code array is indexed by the prefetched layer id directly
    in the block spec, so a lax.scan over layers reads each layer's weights
    exactly ONCE from HBM (naive scan xs-slicing materializes a full copy of
    the slice before the kernel can consume it — measured 1.5x per-layer
    cost on v5e)."""
    _qmm_kernel_planes(xe_ref, xo_ref, qs_ref, slo_ref, shi_ref, o_ref,
                       acc_ref, n_k=n_k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_call_planes_stacked(x, qs3, scales3, li, *, interpret: bool):
    """q4b planes matmul against layer li of stacked weights.

    qs3 uint8 [L, K/2, N]; scales3 [L, K/32, N]; li int32 scalar."""
    m, k = x.shape
    n = qs3.shape[2]
    tm, tn, tk = _choose_tiles(m, n, k)
    if tk % 256:
        tk = 256
    if (tk // 64) % 8 and tk != k:
        tk = k          # sublane-legal scale planes (see _qmm_call_planes)
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xb = x.astype(jnp.bfloat16)
    x4 = xb.reshape(m, k // 256, 2, 128)
    xe = x4[:, :, 0, :].reshape(m, k // 2)
    xo = x4[:, :, 1, :].reshape(m, k // 2)
    # scale planes come from an XLA dynamic slice (small: ~1/32 of weights)
    sc = jax.lax.dynamic_index_in_dim(scales3, li, 0, keepdims=False)
    sc3 = sc.reshape(k // 256, 8, -1)
    slo = sc3[:, :4].reshape(k // 64, -1)
    shi = sc3[:, 4:].reshape(k // 64, -1)
    li_arr = jnp.asarray([li], jnp.int32)
    out_t = jnp.bfloat16 if m >= 256 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk // 2), lambda i, j, kk, li_r: (i, kk)),
            pl.BlockSpec((tm, tk // 2), lambda i, j, kk, li_r: (i, kk)),
            pl.BlockSpec((None, tk // 2, tn),
                         lambda i, j, kk, li_r: (li_r[0], kk, j)),
            pl.BlockSpec((tk // 64, tn), lambda i, j, kk, li_r: (kk, j)),
            pl.BlockSpec((tk // 64, tn), lambda i, j, kk, li_r: (kk, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, li_r: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_planes_l, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs3.size // qs3.shape[0] + x.size * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(li_arr, xe, xo, qs3, slo, shi)


def _qmm_kernel_int8_l(li_ref, xqe_ref, xqo_ref, sxe_ref, sxo_ref, qs_ref,
                       slo_ref, shi_ref, o_ref, acc_ref, *, n_k: int):
    """Scalar-prefetch (layer-stacked) variant of the int8 kernel."""
    _qmm_kernel_int8(xqe_ref, xqo_ref, sxe_ref, sxo_ref, qs_ref, slo_ref,
                     shi_ref, o_ref, acc_ref, n_k=n_k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_call_int8_stacked(x, qs3, scales3, li, *, interpret: bool):
    """int8-MXU q4b matmul against layer li of stacked weights."""
    m, k = x.shape
    n = qs3.shape[2]
    tm, tn, tk = _choose_tiles(m, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xq, sx = quantize_activations_g32(x)
    x4 = xq.reshape(m, k // 256, 2, 128)
    xqe = x4[:, :, 0, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
    xqo = x4[:, :, 1, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
    sx3 = sx.reshape(m, k // 256, 8)
    sxe = sx3[:, :, :4].reshape(m, k // 64).T
    sxo = sx3[:, :, 4:].reshape(m, k // 64).T
    sc = jax.lax.dynamic_index_in_dim(scales3, li, 0, keepdims=False)
    sc3 = sc.reshape(k // 256, 8, -1)
    slo = sc3[:, :4].reshape(k // 64, -1)
    shi = sc3[:, 4:].reshape(k // 64, -1)
    in_specs = [
        pl.BlockSpec((tk // 64, tm, 32), lambda i, j, kk, li_r: (kk, i, 0)),
        pl.BlockSpec((tk // 64, tm, 32), lambda i, j, kk, li_r: (kk, i, 0)),
        pl.BlockSpec((k // 64, tm), lambda i, j, kk, li_r: (0, i)),
        pl.BlockSpec((k // 64, tm), lambda i, j, kk, li_r: (0, i)),
        pl.BlockSpec((None, tk // 2, tn),
                     lambda i, j, kk, li_r: (li_r[0], kk, j)),
        pl.BlockSpec((tk // 64, tn), lambda i, j, kk, li_r: (kk, j)),
        pl.BlockSpec((tk // 64, tn), lambda i, j, kk, li_r: (kk, j)),
    ]
    operands = [jnp.asarray([li], jnp.int32), xqe, xqo, sxe, sxo, qs3, slo,
                shi]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, li_r: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_kernel_int8_l, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs3.size // qs3.shape[0] + x.size + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _qmm_kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref, *, g: int, n_k: int, kind: str):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant_tile(qs_ref, sc_ref, g, kind)
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("kind", "g", "interpret"))
def _qmm_call(x, qs, scales, *, kind: str, g: int, interpret: bool):
    m, k = x.shape
    n = qs.shape[1]
    tm, tn, tk = _choose_tiles(m, n, k)
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    if kind == "q8b":
        qs_spec = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    else:
        qs_spec = pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, g=g, n_k=n_k, kind=kind),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            qs_spec,
            pl.BlockSpec((tk // g, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qs.size * qs.dtype.itemsize + x.size * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qs, scales)


def _qmm_kernel_i8p(xq_ref, sxa_ref, w_ref, sw_ref, o_ref, acc_ref, *,
                    nb: int):
    """int8-MXU prefill kernel (two-level scheme, docs/prefill_analysis.md
    §2): per-256-deep-K int8 x int8 -> int32 dots, scaled into an f32
    accumulator by outer(activation_scale, weight_scale) once per block.
    256 MACs of (+-127)^2 stay within int32 (max 4.13e6 * 256).

    xq_ref  (TM, TK) int8    per-row-per-256-group quantized activations
    sxa_ref (TK/256, TM) f32 activation group scales
    w_ref   (TK, TN) int8    requantized weights (repack.attach_int8_prefill)
    sw_ref  (TK/256, TN) f32 weight group scales
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = xq_ref[...]
    w = w_ref[...]
    sxa = sxa_ref[...]
    sw = sw_ref[...]
    acc = acc_ref[...]
    dn = (((1,), (0,)), ((), ()))
    for b in range(nb):
        xb = x[:, b * 256:(b + 1) * 256]
        wb = w[b * 256:(b + 1) * 256, :]
        pi = jax.lax.dot_general(xb, wb, dn,
                                 preferred_element_type=jnp.int32)
        acc = acc + (pi.astype(jnp.float32)
                     * sxa[b][:, None]) * sw[b][None, :]
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = acc_ref[...]


def _i8p_prep(x):
    """Per-row-per-256-group int8 activation quantize + row tiling."""
    m, k = x.shape
    nb_all = k // 256
    xg = x.astype(jnp.float32).reshape(m, nb_all, 256)
    amax = jnp.max(jnp.abs(xg), axis=2)
    sxa = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)        # (m, nb)
    xq = jnp.clip(jnp.round(xg / sxa[:, :, None]), -127, 127).astype(
        jnp.int8).reshape(m, k)
    tm = 512 if m >= 512 else m
    mp = -(-m // tm) * tm
    if mp > m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        sxa = jnp.pad(sxa, ((0, mp - m), (0, 0)), constant_values=1.0)
    return xq, sxa.T.astype(jnp.float32), tm, mp


def _i8p_tiles(n, k):
    tn = 1024 if n % 1024 == 0 else (512 if n % 512 == 0 else n)
    # the per-256 scale operands block as (tk/256, ...): Mosaic needs the
    # sublane dim divisible by 8 (tk % 2048 == 0) or equal to the array
    # (tk == k) — K like 1536/2560/5120 takes the one-K-step form
    tk = 2048 if k % 2048 == 0 else k
    return tn, tk


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_call_i8p(x, w8, s8, *, interpret: bool):
    """Prefill int8 matmul: y = x @ dequant(w8, s8). x f32/bf16 [M, K]
    (already normed); w8 int8 [K, Ns]; s8 f32 [K/256, Ns]."""
    m, k = x.shape
    n = w8.shape[1]
    xq, sxa_t, tm, mp = _i8p_prep(x)
    tn, tk = _i8p_tiles(n, k)
    grid = (mp // tm, n // tn, k // tk)
    y = pl.pallas_call(
        functools.partial(_qmm_kernel_i8p, nb=tk // 256),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tk // 256, tm), lambda i, j, kk: (kk, i)),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((tk // 256, tn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=w8.size + xq.size + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, sxa_t, w8, s8)
    return y[:m]


def _qmm_kernel_i8p_l(li_ref, xq_ref, sxa_ref, w_ref, sw_ref, o_ref,
                      acc_ref, *, nb: int):
    """Scalar-prefetch (layer-stacked) variant of the i8p kernel."""
    _qmm_kernel_i8p(xq_ref, sxa_ref, w_ref, sw_ref, o_ref, acc_ref, nb=nb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_call_i8p_stacked(x, w8_3, s8_3, li, *, interpret: bool):
    """i8p prefill matmul against layer li of stacked weights: w8_3 int8
    [L, K, Ns]; s8_3 f32 [L, K/256, Ns]; weights index in-kernel (scalar
    prefetch, no slice copy); the small scale plane slices via XLA."""
    m, k = x.shape
    n = w8_3.shape[2]
    xq, sxa_t, tm, mp = _i8p_prep(x)
    tn, tk = _i8p_tiles(n, k)
    grid = (mp // tm, n // tn, k // tk)
    sw = jax.lax.dynamic_index_in_dim(s8_3, li, 0, keepdims=False)
    li_arr = jnp.asarray([li], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk, lr: (i, kk)),
            pl.BlockSpec((tk // 256, tm), lambda i, j, kk, lr: (kk, i)),
            pl.BlockSpec((None, tk, tn),
                         lambda i, j, kk, lr: (lr[0], kk, j)),
            pl.BlockSpec((tk // 256, tn), lambda i, j, kk, lr: (kk, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, lr: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_qmm_kernel_i8p_l, nb=tk // 256),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=w8_3.size // w8_3.shape[0] + xq.size + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(li_arr, xq, sxa_t, w8_3, sw)
    return y[:m]


def _pad_rows(x, multiple):
    m = x.shape[0]
    pad = (-m) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, m


def qmatmul(x: jax.Array, qt: QTensor, li=None, prenorm=None) -> jax.Array:
    """y[M, N] = x[M, K] @ W.T for GGML weight W[N, K] stored K-major.

    x: float (f32/bf16), 2-D [M, K]. Returns f32 [M, N].
    Shapes are taken from the arrays (not qt.shape) so sharded local views
    work. With li (an int32 scalar), qt holds LAYER-STACKED leaves (leading
    dim L, see models.llama.stack_layers) and layer li is used — the q4b fast
    path indexes the stacked codes inside the kernel (no slice copy).

    prenorm=(w_vec, eps) applies RMSNorm(x)*w_vec before the matmul; on the
    txn decode path the norm folds into the activation-quantize fusion
    (exact — see quantize_activations_g32), elsewhere it is applied inline.
    """
    if prenorm is not None:
        pn_w, pn_eps = prenorm

    def _with_lora(y, xn):
        """Unmerged LoRA side-matmul: y += scale*(xn@A.T)@B.T (runtime
        low-rank path — see repack.LoraQTensor; rank r makes this
        2*r*(K+N) flops, negligible against the base matmul)."""
        la = getattr(qt, "lora_a", None)
        if la is None:
            return y
        lb = qt.lora_b
        if li is not None:
            la = jax.lax.dynamic_index_in_dim(la, li, 0, keepdims=False)
            lb = jax.lax.dynamic_index_in_dim(lb, li, 0, keepdims=False)
        xb = xn.astype(jnp.bfloat16)
        side = jnp.dot(jnp.dot(xb, la.T, preferred_element_type=jnp.float32)
                       .astype(jnp.bfloat16), lb.T,
                       preferred_element_type=jnp.float32)
        return y + qt.lora_scale * side[: y.shape[0], : y.shape[1]]

    if qt.kind == "dense":
        w = qt.qs if li is None else jax.lax.dynamic_index_in_dim(
            qt.qs, li, 0, keepdims=False)
        if prenorm is not None:
            x = apply_rmsnorm(x, pn_w, pn_eps)
        return _with_lora(jnp.dot(x.astype(jnp.bfloat16), w,
                                  preferred_element_type=jnp.float32), x)
    k = x.shape[1]
    if (qt.kind == "q8b" and Q4B_KERNEL == "txn" and x.shape[0] == 1
            and qt.g in (16, 32) and k % (8 * qt.g) == 0 and k % 32 == 0):
        # single-row decode for int8-stored formats: block-diagonal int8-MXU
        # kernel instead of the bf16 dequant path (VPU-bound at M=1)
        pn_kw = ({} if prenorm is None
                 else {"nrm": jnp.asarray(pn_w, jnp.float32),
                       "eps": float(pn_eps)})
        if li is not None:
            y = _qmm_call_q8_m1_stacked(x, qt.qs, qt.scales, li, qt.bias,
                                        g=qt.g, interpret=_interpret(),
                                        **pn_kw)
        else:
            y = _qmm_call_q8_m1(x, qt.qs, qt.scales, qt.bias, g=qt.g,
                                interpret=_interpret(), **pn_kw)
        n = qt.shape[0]
        xn = (apply_rmsnorm(x, pn_w, pn_eps) if prenorm is not None else x)
        return _with_lora(y[:, :n] if y.shape[1] > n else y, xn)
    if (qt.kind == "q4b" and Q4B_KERNEL == "txn" and x.shape[0] == 1
            and k % 256 == 0):
        # single-row decode: M=1 kernel (no M padding, 2-D partials)
        pn_kw = ({} if prenorm is None
                 else {"nrm": jnp.asarray(pn_w, jnp.float32),
                       "eps": float(pn_eps)})
        if li is not None:
            y = _qmm_call_txn_m1_stacked(x, qt.qs, qt.scales, li, qt.bias,
                                         interpret=_interpret(), **pn_kw)
        else:
            y = _qmm_call_txn_m1(x, qt.qs, qt.scales, qt.bias,
                                 interpret=_interpret(), **pn_kw)
        n = qt.shape[0]
        xn = (apply_rmsnorm(x, pn_w, pn_eps) if prenorm is not None else x)
        return _with_lora(y[:, :n] if y.shape[1] > n else y, xn)
    qs8 = getattr(qt, "qs8", None)
    if qs8 is not None and x.shape[0] > 32 and k % 256 == 0:
        # int8-MXU PREFILL path (two-level scheme): only reachable when the
        # loader/bench attached the int8-g256 companion
        # (repack.attach_int8_prefill); decode keeps the 4.5-bit stream
        xn = apply_rmsnorm(x, pn_w, pn_eps) if prenorm is not None else x
        if li is not None and qs8.ndim == 3:
            y = _qmm_call_i8p_stacked(xn, qs8, qt.s8, li,
                                      interpret=_interpret())
        elif li is None and qs8.ndim == 2:
            y = _qmm_call_i8p(xn, qs8, qt.s8, interpret=_interpret())
        else:
            y = None
        if y is not None:
            n = qt.shape[0]
            return _with_lora(y[:, :n] if y.shape[1] > n else y, xn)
        x = xn
        prenorm = None
    xp, m = _pad_rows(x, 8)
    # the int8 group-dot kernel holds a (G, TM, TN) partial-sum tensor in
    # VMEM — a DECODE kernel (TM <= 32); large-M prefill uses the bf16
    # planes kernel, whose dequant cost amortizes over M anyway
    int8_ok = Q4B_KERNEL in ("int8", "txn") and xp.shape[0] <= 32
    bias_fused = False
    txn_path = (qt.kind == "q4b" and int8_ok and k % 256 == 0
                and Q4B_KERNEL == "txn")
    if prenorm is not None and not txn_path:
        xp = apply_rmsnorm(xp, pn_w, pn_eps)
        prenorm = None
    pn_kw = ({} if prenorm is None
             else {"nrm": jnp.asarray(pn_w, jnp.float32),
                   "eps": float(pn_eps)})
    if li is not None:
        if qt.kind == "q4b" and int8_ok and k % 256 == 0:
            if Q4B_KERNEL == "txn":
                y = _qmm_call_txn_stacked(xp, qt.qs, qt.scales, li, qt.bias,
                                          interpret=_interpret(), **pn_kw)
                bias_fused = qt.bias is not None
            else:
                y = _qmm_call_int8_stacked(xp, qt.qs, qt.scales, li,
                                           interpret=_interpret())
        elif qt.kind == "q4b" and Q4B_KERNEL in ("planes", "uplanes", "int8") \
                and k % 256 == 0:
            y = _qmm_call_planes_stacked(xp, qt.qs, qt.scales, li,
                                         interpret=_interpret())
        else:
            # slice-copy fallback (q8b stacked): correctness over speed
            qs = jax.lax.dynamic_index_in_dim(qt.qs, li, 0, keepdims=False)
            sc = jax.lax.dynamic_index_in_dim(qt.scales, li, 0,
                                              keepdims=False)
            y = _qmm_call(xp, qs, sc, kind=qt.kind, g=qt.g,
                          interpret=_interpret())
    elif qt.kind == "q4b" and int8_ok and k % 256 == 0:
        if Q4B_KERNEL == "txn":
            y = _qmm_call_txn(xp, qt.qs, qt.scales, qt.bias,
                              interpret=_interpret(), **pn_kw)
            bias_fused = qt.bias is not None
        else:
            y = _qmm_call_int8(xp, qt.qs, qt.scales, interpret=_interpret())
    elif qt.kind == "q4b" and Q4B_KERNEL in ("planes", "uplanes", "int8",
                                             "txn") \
            and k % 256 == 0:
        y = _qmm_call_planes(xp, qt.qs, qt.scales, interpret=_interpret(),
                             unsigned_hi=(Q4B_KERNEL == "uplanes"))
    else:
        y = _qmm_call(xp, qt.qs, qt.scales, kind=qt.kind, g=qt.g,
                      interpret=_interpret())
    if qt.bias is not None and not bias_fused:
        bias = qt.bias if li is None else jax.lax.dynamic_index_in_dim(
            qt.bias, li, 0, keepdims=False)
        bx = xp.astype(jnp.float32).reshape(xp.shape[0], k // qt.g, qt.g).sum(axis=2)
        y = y + jnp.dot(bx, bias,
                        preferred_element_type=jnp.float32).astype(y.dtype)
    n = qt.shape[0]
    # drop N tile padding (y narrower than logical n = sharded local view)
    y = y[:m, :n] if y.shape[1] > n else y[:m]
    if getattr(qt, "lora_a", None) is not None:
        xn = (apply_rmsnorm(xp, pn_w, pn_eps)[:m]
              if prenorm is not None else xp[:m])
        y = _with_lora(y, xn)
    return y


def qmatmul_fallback(x: jax.Array, qt: QTensor) -> jax.Array:
    """Pure-XLA reference path (dequant materialized): for tests & debugging."""
    n, k = qt.shape
    if qt.kind == "dense":
        return jnp.dot(x.astype(jnp.bfloat16), qt.qs, preferred_element_type=jnp.float32)
    ns = qt.qs.shape[-1]                 # storage N (may be tile-padded)
    if qt.kind == "q4b":
        p = qt.qs
        lo = (p & 0x0F).astype(jnp.int8).reshape(-1, 1, 128, ns)
        hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8).reshape(-1, 1, 128, ns)
        q = jnp.concatenate([lo, hi], axis=1).reshape(k, ns).astype(jnp.float32)
    else:
        q = qt.qs.astype(jnp.float32)
    w = (q.reshape(k // qt.g, qt.g, ns) * qt.scales[:, None, :]).reshape(k, ns)
    if qt.bias is not None:
        w = w + jnp.repeat(qt.bias, qt.g, axis=0)
    y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return y[:, :n] if ns > n else y
