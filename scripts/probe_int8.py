#!/usr/bin/env python3
"""int8-MXU q4b kernel variant probe: where do the ~82us/layer go?

Round-2 state: int8 kernel 0.279 ms/layer for 136MB of fused-layer matmuls
(M=8) vs the 0.197 dense-bf16 ceiling (697 GB/s = 85% of v5e HBM). Suspects:
  (a) VPU postprocess of the (g, TM, TN) int32 group partials
      (cast + *sc + *sx + sum-over-g = 4 full passes per plane)
  (b) batched-dot MXU latency (g tiny 8x32xTN dots per grid step)
  (c) nibble mask/xor unpack ops
  (d) the fused per-group bias dots

Variants (--post):
  cur     production kernel (4-pass f32 postprocess, fused bias)
  nobias  cur without the per-group bias term          -> bounds (d)
  raw     int32 sum over g only, one cast, no scales   -> floor; bounds (a)
  nosx    drop the *sx pass (3 passes)                 -> cost of one pass
  sb      superblock analog: *sc then 8:1 in-group sum, sx at sb granularity
          (the Q8_K-shaped postprocess: 3 big passes, small sb tail)
  bf16    postprocess in bf16 (packed VPU rate)
  onedot  both planes in ONE 2g-batch dot_general      -> bounds (b) call count
  nomask  int8-codes-as-stored (no mask/xor; wrong numerics) -> bounds (c)

Timing-only: variants other than cur/nobias compute wrong numbers on purpose.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamafile_tpu.ops.qmatmul import (_choose_tiles, quantize_activations_g32)
from llamafile_tpu.models.synthetic import _rand_qtensor


def _kernel(xqe_ref, xqo_ref, sxe_ref, sxo_ref, qs_ref, slo_ref, shi_ref,
            *rest, n_k: int, post: str, fused_bias: bool):
    if fused_bias:
        bxe_ref, bxo_ref, blo_ref, bhi_ref, o_ref, acc_ref = rest
    else:
        bxe_ref = bxo_ref = blo_ref = bhi_ref = None
        o_ref, acc_ref = rest

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qs_ref[...]
    tk2, tn = p.shape
    g = tk2 // 32
    kk = pl.program_id(2)
    sxe = sxe_ref[pl.ds(kk * g, g), :]
    sxo = sxo_ref[pl.ds(kk * g, g), :]
    if post == "nomask":
        lo = p.astype(jnp.int8)  # bitcast view — wrong numbers, zero mask ops
        hi = p.astype(jnp.int8)
    elif post == "nx":
        # timing for a pre-xored repack (p' = p ^ 0x80 stored): hi extraction
        # drops to one mask op (wrong numbers here; exact with p' storage)
        lo = (p & 0x0F).astype(jnp.int8)
        hi = (p & 0xF0).astype(jnp.int8)
    else:
        lo = (p & 0x0F).astype(jnp.int8)
        hi = ((p ^ 0x80) & 0xF0).astype(jnp.int8)

    def dot(xg, w):
        return jax.lax.dot_general(
            xg, w.reshape(g, 32, tn), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    if post == "sc2":
        # od with ALL per-step concats removed: x codes arrive pre-stacked
        # (2g, tm, 32), x scales pre-stacked [2*K/64, tm], weight scales
        # pre-interleaved [2*K/64, tn] (repack-time ordering in production).
        # Only the unavoidable w2 plane concat remains.
        g2 = 2 * g
        kk = pl.program_id(2)
        sx2 = sxe_ref[pl.ds(kk * g2, g2), :]
        w2 = jnp.concatenate([lo.reshape(g, 32, tn), hi.reshape(g, 32, tn)],
                             axis=0)
        part = jax.lax.dot_general(
            xqe_ref[...], w2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        pf = part.astype(jnp.float32) * slo_ref[...].astype(
            jnp.float32).reshape(g2, 1, tn)
        acc_ref[...] += jnp.sum(pf * sx2[:, :, None], axis=0)

        @pl.when(pl.program_id(2) == n_k - 1)
        def _done3():
            o_ref[...] = acc_ref[...]
        return

    if post in ("k128", "k256", "k64", "flat"):
        # TIMING-ONLY (wrong numerics): how does MXU time scale with the
        # contraction depth of the int8 dots? Same weight bytes/layout; the
        # activation refs arrive pre-shaped by qmm ((tm, tk2) for flat,
        # (nb, tm, kk) group-major for k128/k256).
        if post == "flat":
            part = (jax.lax.dot_general(
                        xqe_ref[...], lo.reshape(tk2, tn),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    + jax.lax.dot_general(
                        xqo_ref[...], hi.reshape(tk2, tn),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32))
            acc_ref[...] += part.astype(jnp.float32)
        else:
            kk2 = {"k64": 64, "k128": 128, "k256": 256}[post]
            nbp = tk2 // kk2                       # batches per plane
            part = (jax.lax.dot_general(
                        xqe_ref[...], lo.reshape(nbp, kk2, tn),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    + jax.lax.dot_general(
                        xqo_ref[...], hi.reshape(nbp, kk2, tn),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32))
            acc_ref[...] += jnp.sum(part, axis=0).astype(jnp.float32)
        @pl.when(pl.program_id(2) == n_k - 1)
        def _done2():
            o_ref[...] = acc_ref[...]
        return

    if post.startswith("od") or post == "nx":
        xg2 = jnp.concatenate([xqe_ref[...], xqo_ref[...]], axis=0)
        w2 = jnp.concatenate([lo.reshape(g, 32, tn), hi.reshape(g, 32, tn)],
                             axis=0)
        part = jax.lax.dot_general(
            xg2, w2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)          # (2g, tm, tn)
        sc2 = jnp.concatenate([slo_ref[...], shi_ref[...]], axis=0)
        sx2 = jnp.concatenate([sxe, sxo], axis=0)
        if post == "od-raw":
            acc_ref[...] += jnp.sum(part, axis=0).astype(jnp.float32)
        elif post == "od-nosx":
            acc_ref[...] += jnp.sum(
                part.astype(jnp.float32)
                * sc2.astype(jnp.float32).reshape(2 * g, 1, tn), axis=0)
        elif post == "od-sb":
            pf = part.astype(jnp.float32) * sc2.astype(jnp.float32).reshape(
                2 * g, 1, tn)
            tm = pf.shape[1]
            psb = jnp.sum(pf.reshape(2 * g // 8, 8, tm, tn), axis=1)
            sxsb = sx2.reshape(2 * g // 8, 8, -1)[:, 0, :]
            acc_ref[...] += jnp.sum(psb * sxsb[:, :, None], axis=0)
        else:
            pf = part.astype(jnp.float32) * sc2.astype(jnp.float32).reshape(
                2 * g, 1, tn)
            acc_ref[...] += jnp.sum(pf * sx2[:, :, None], axis=0)
    else:
        def plane(xg, sx, w, sc_ref):
            part = dot(xg, w)                           # (g, tm, tn) int32
            if post == "raw":
                return jnp.sum(part, axis=0).astype(jnp.float32)
            if post == "bf16":
                pb = part.astype(jnp.bfloat16) * sc_ref[...].astype(
                    jnp.bfloat16).reshape(g, 1, tn)
                return jnp.sum(pb * sx.astype(jnp.bfloat16)[:, :, None],
                               axis=0).astype(jnp.float32)
            pf = part.astype(jnp.float32) * sc_ref[...].astype(
                jnp.float32).reshape(g, 1, tn)
            if post == "nosx":
                return jnp.sum(pf, axis=0)
            if post == "sb":
                tm = pf.shape[1]
                psb = jnp.sum(pf.reshape(g // 8, 8, tm, tn), axis=1)
                sxsb = sx.reshape(g // 8, 8, -1)[:, 0, :]
                return jnp.sum(psb * sxsb[:, :, None], axis=0)
            return jnp.sum(pf * sx[:, :, None], axis=0)

        acc_ref[...] += (plane(xqe_ref[...], sxe, lo, slo_ref)
                         + plane(xqo_ref[...], sxo, hi, shi_ref))

    if fused_bias:
        bxe = bxe_ref[pl.ds(kk * g, g), :]
        bxo = bxo_ref[pl.ds(kk * g, g), :]
        dn = (((0,), (0,)), ((), ()))
        if post == "biasbf16":
            acc_ref[...] += (
                jax.lax.dot_general(bxe.astype(jnp.bfloat16),
                                    blo_ref[...].astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(bxo.astype(jnp.bfloat16),
                                      bhi_ref[...].astype(jnp.bfloat16), dn,
                                      preferred_element_type=jnp.float32))
        else:
            acc_ref[...] += (
                jax.lax.dot_general(bxe, blo_ref[...].astype(jnp.float32), dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(bxo, bhi_ref[...].astype(jnp.float32),
                                      dn, preferred_element_type=jnp.float32))

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("post", "use_bias"))
def qmm(x, qs, scales, bias, *, post: str, use_bias: bool):
    m, k = x.shape
    n = qs.shape[1]
    tm, tn, tk = _choose_tiles(m, n, k)
    if tk % 256:
        tk = 256
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    xq, sx = quantize_activations_g32(x)
    x4 = xq.reshape(m, k // 256, 2, 128)
    if post == "flat":
        xqe = x4[:, :, 0, :].reshape(m, k // 2)
        xqo = x4[:, :, 1, :].reshape(m, k // 2)
        x_specs = [pl.BlockSpec((tm, tk // 2), lambda i, j, kk: (i, kk)),
                   pl.BlockSpec((tm, tk // 2), lambda i, j, kk: (i, kk))]
    elif post == "sc2":
        tiles = k // tk
        g_t = tk // 64                 # groups per plane per K-tile
        e4 = x4[:, :, 0, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
        o4 = x4[:, :, 1, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
        xqe = jnp.concatenate(
            [e4.reshape(tiles, g_t, m, 32), o4.reshape(tiles, g_t, m, 32)],
            axis=1).reshape(2 * k // 64, m, 32)
        xqo = jnp.zeros((1, m, 32), jnp.int8)
        x_specs = [
            pl.BlockSpec((2 * tk // 64, tm, 32), lambda i, j, kk: (kk, i, 0)),
            pl.BlockSpec((1, tm, 32), lambda i, j, kk: (0, 0, 0))]
    elif post in ("k64", "k128", "k256"):
        kk2 = {"k64": 64, "k128": 128, "k256": 256}[post]
        xqe = x4[:, :, 0, :].reshape(m, k // 2 // kk2, kk2).transpose(1, 0, 2)
        xqo = x4[:, :, 1, :].reshape(m, k // 2 // kk2, kk2).transpose(1, 0, 2)
        x_specs = [
            pl.BlockSpec((tk // 2 // kk2, tm, kk2), lambda i, j, kk: (kk, i, 0)),
            pl.BlockSpec((tk // 2 // kk2, tm, kk2), lambda i, j, kk: (kk, i, 0))]
    else:
        xqe = x4[:, :, 0, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
        xqo = x4[:, :, 1, :].reshape(m, k // 64, 32).transpose(1, 0, 2)
        x_specs = [pl.BlockSpec((tk // 64, tm, 32), lambda i, j, kk: (kk, i, 0)),
                   pl.BlockSpec((tk // 64, tm, 32), lambda i, j, kk: (kk, i, 0))]
    sx3 = sx.reshape(m, k // 256, 8)
    sxe = sx3[:, :, :4].reshape(m, k // 64).T
    sxo = sx3[:, :, 4:].reshape(m, k // 64).T
    sc3 = scales.reshape(k // 256, 8, -1)
    slo = sc3[:, :4].reshape(k // 64, -1)
    shi = sc3[:, 4:].reshape(k // 64, -1)
    sx_specs = [pl.BlockSpec((k // 64, tm), lambda i, j, kk: (0, i)),
                pl.BlockSpec((k // 64, tm), lambda i, j, kk: (0, i))]
    sc_specs = [pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j))]
    if post == "sc2":
        tiles, g_t = k // tk, tk // 64
        sxe = jnp.concatenate([sxe.reshape(tiles, g_t, m),
                               sxo.reshape(tiles, g_t, m)],
                              axis=1).reshape(2 * k // 64, m)
        sxo = sxe                      # alias (header slice stays in bounds)
        nn = slo.shape[1]
        slo = jnp.concatenate([slo.reshape(tiles, g_t, nn),
                               shi.reshape(tiles, g_t, nn)],
                              axis=1).reshape(2 * k // 64, nn)
        shi = jnp.zeros((1, nn), jnp.float32)
        sx_specs = [pl.BlockSpec((2 * k // 64, tm), lambda i, j, kk: (0, i)),
                    pl.BlockSpec((2 * k // 64, tm), lambda i, j, kk: (0, i))]
        sc_specs = [
            pl.BlockSpec((2 * tk // 64, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j))]
    in_specs = x_specs + sx_specs + [
        pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j)),
    ] + sc_specs
    operands = [xqe, xqo, sxe, sxo, qs, slo, shi]
    if use_bias:
        bx = x.astype(jnp.float32).reshape(m, k // 32, 32).sum(axis=2)
        bx3 = bx.reshape(m, k // 256, 8)
        bxe = bx3[:, :, :4].reshape(m, k // 64).T
        bxo = bx3[:, :, 4:].reshape(m, k // 64).T
        bb3 = bias.reshape(k // 256, 8, -1)
        blo = bb3[:, :4].reshape(k // 64, -1)
        bhi = bb3[:, 4:].reshape(k // 64, -1)
        in_specs += [
            pl.BlockSpec((k // 64, tm), lambda i, j, kk: (0, i)),
            pl.BlockSpec((k // 64, tm), lambda i, j, kk: (0, i)),
            pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((tk // 64, tn), lambda i, j, kk: (kk, j)),
        ]
        operands += [bxe, bxo, blo, bhi]
    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, post=post, fused_bias=use_bias),
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
    )(*operands)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--post", default="cur")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--bias", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    d, dff = 4096, 14336
    ws = [_rand_qtensor(rng, 6144, d, "Q4_K"),
          _rand_qtensor(rng, d, d, "Q4_K"),
          _rand_qtensor(rng, 2 * dff, d, "Q4_K"),
          _rand_qtensor(rng, d, dff, "Q4_K")]
    nbytes = sum(w.nbytes for w in ws)

    def make_loop(post):
        if post == "one":
            # launch-overhead bound: the SAME byte volume as one layer's four
            # matmuls in ONE production-kernel call. prod - one = 3 extra
            # pallas launches + the inter-matmul XLA glue. (weights ride as
            # jit args — closures inline into the serialized remote program)
            from llamafile_tpu.ops.qmatmul import qmatmul

            @jax.jit
            def loop(x0, wone, w1, w2, w3, n):
                def body(i, x):
                    y = qmatmul(x, wone)
                    return x + 1e-6 * y[:, :d]
                return jax.lax.fori_loop(0, n, body, x0)
            return loop
        if post in ("w4x", "qonce"):
            # prep-cost isolation: four SAME-SHAPE matmuls per iteration.
            # w4x quantizes+restructures the activations per matmul (like the
            # real model); qonce does it once and feeds all four dots.
            # (w4x - qonce) / 3 = per-matmul XLA prep cost.
            from llamafile_tpu.ops.qmatmul import qmatmul

            del qmatmul
            if post == "w4x":
                @jax.jit
                def loop(x0, w0, w1, w2, w3, n):
                    def body(i, x):
                        def mm(xx, w):
                            return qmm(xx, w.qs, w.scales, w.bias, post="od",
                                       use_bias=False)[:, :d]
                        y0 = mm(x, w0)
                        y1 = mm(x + 1e-6 * y0, w1)
                        y2 = mm(x + 1e-6 * y1, w2)
                        y3 = mm(x + 1e-6 * y2, w3)
                        return x + 1e-6 * y3
                    return jax.lax.fori_loop(0, n, body, x0)
                return loop

            @jax.jit
            def loop(x0, w0, w1, w2, w3, n):
                def body(i, x):
                    y = (qmm(x, w0.qs, w0.scales, w0.bias, post="od",
                             use_bias=False)
                         + qmm(x, w1.qs, w1.scales, w1.bias, post="od",
                               use_bias=False)
                         + qmm(x, w2.qs, w2.scales, w2.bias, post="od",
                               use_bias=False)
                         + qmm(x, w3.qs, w3.scales, w3.bias, post="od",
                               use_bias=False))
                    return x + 1e-6 * y[:, :d]
                return jax.lax.fori_loop(0, n, body, x0)
            return loop
        if post in ("txn", "txnb"):
            # production-shape loop through the natural-order kernel;
            # txn = external XLA bias dot, txnb = bias fused in-kernel
            from llamafile_tpu.ops.qmatmul import _qmm_call_txn
            fuse_b = post == "txnb"

            @jax.jit
            def loop(x0, w0, w1, w2, w3, n, fuse_b=fuse_b):
                def mm(x, w):
                    if fuse_b:
                        return _qmm_call_txn(x, w.qs, w.scales, w.bias,
                                             interpret=False)
                    y = _qmm_call_txn(x, w.qs, w.scales, interpret=False)
                    if w.bias is not None:
                        bx = x.astype(jnp.float32).reshape(
                            x.shape[0], -1, 32).sum(axis=2)
                        y = y + jnp.dot(bx, w.bias,
                                        preferred_element_type=jnp.float32)
                    return y
                def body(i, x):
                    qkv = mm(x, w0)
                    o = mm(qkv[:, :d], w1)
                    gu = mm(x + 1e-6 * o[:, :d], w2)
                    dn = mm(jax.nn.silu(gu[:, :dff]) * gu[:, dff:], w3)
                    return x + 1e-6 * dn
                return jax.lax.fori_loop(0, n, body, x0)
            return loop
        if post == "prod":
            # the production qmatmul path (whatever LLAMAFILE_TPU_Q4B selects)
            from llamafile_tpu.ops.qmatmul import qmatmul

            @jax.jit
            def loop(x0, w0, w1, w2, w3, n):
                def body(i, x):
                    qkv = qmatmul(x, w0)
                    o = qmatmul(qkv[:, :d], w1)
                    gu = qmatmul(x + 1e-6 * o[:, :d], w2)
                    dn = qmatmul(jax.nn.silu(gu[:, :dff]) * gu[:, dff:], w3)
                    return x + 1e-6 * dn
                return jax.lax.fori_loop(0, n, body, x0)
            return loop
        if post == "dense":
            # XLA's own bf16 matmul on the SAME byte footprint: in-process
            # ceiling reference (ratios cancel the minutes-scale drift).
            nbig = int(round(nbytes / (d * 2) / 128)) * 128
            wd = jnp.asarray(rng.standard_normal((d, nbig)), jnp.bfloat16)

            @jax.jit
            def loop(x0, w0, w1, w2, w3, n, wd=wd):
                def body(i, x):
                    y = jnp.dot(x.astype(jnp.bfloat16), wd,
                                preferred_element_type=jnp.float32)
                    return x + 1e-6 * y[:, :d]
                return jax.lax.fori_loop(0, n, body, x0)
            return loop
        use_bias = bool(args.bias) and post not in (
            "nobias", "od-xbias", "flat", "k128", "k256")
        kpost = "cur" if post == "nobias" else post

        @jax.jit
        def loop(x0, w0, w1, w2, w3, n, kpost=kpost, use_bias=use_bias):
            def mm(x, w):
                y = qmm(x, w.qs, w.scales, w.bias, post=kpost,
                        use_bias=use_bias)
                if kpost == "od-xbias":
                    bx = x.astype(jnp.float32).reshape(
                        x.shape[0], -1, 32).sum(axis=2)
                    y = y + jnp.dot(bx, w.bias.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                return y[:, :w.shape[0]] if y.shape[1] > w.shape[0] else y
            def body(i, x):
                qkv = mm(x, w0)
                o = mm(qkv[:, :d], w1)
                gu = mm(x + 1e-6 * o[:, :d], w2)
                dn = mm(jax.nn.silu(gu[:, :dff]) * gu[:, dff:], w3)
                return x + 1e-6 * dn
            return jax.lax.fori_loop(0, n, body, x0)
        return loop

    posts = args.post.split(",")
    loops, var_ws, var_bytes = {}, {}, {}
    for post in posts:
        loops[post] = make_loop(post)
        var_ws[post] = ws
        var_bytes[post] = nbytes
        if post == "one":
            nbig = 58368               # ~= layer param count / d, 256-mult
            wone = _rand_qtensor(rng, nbig, d, "Q4_K")
            var_ws[post] = [wone] + ws[1:]
            var_bytes[post] = wone.nbytes
        elif post in ("w4x", "qonce"):
            w4 = [_rand_qtensor(rng, 6144, d, "Q4_K") for _ in range(4)]
            var_ws[post] = w4
            var_bytes[post] = sum(w.nbytes for w in w4)
        x0 = jnp.asarray(rng.standard_normal((args.batch, d)), jnp.float32)
        t0 = time.time()
        np.asarray(loops[post](x0, *var_ws[post], jnp.int32(2)))
        print(f"  compiled {post} in {time.time()-t0:.0f}s", file=sys.stderr)

    # interleaved round-robin: per-variant min over rounds cancels the
    # minutes-scale device-throughput drift seen across processes
    n1, n2 = args.iters, 3 * args.iters
    best = {p: {n1: float("inf"), n2: float("inf")} for p in posts}
    for rnd in range(args.rounds):
        for post in posts:
            x0 = jnp.asarray(rng.standard_normal((args.batch, d)),
                             jnp.float32)
            for n in (n1, n2):
                t0 = time.time()
                np.asarray(loops[post](x0, *var_ws[post], jnp.int32(n)))
                best[post][n] = min(best[post][n], time.time() - t0)
        for post in posts:
            dt = (best[post][n2] - best[post][n1]) / (n2 - n1)
            gbs = var_bytes[post] / dt / 1e9
            print(f"r{rnd} int8[{post}]: {dt*1e3:.3f} ms/layer "
                  f"({gbs:.0f} GB/s, {gbs/819*100:.0f}% HBM)")


if __name__ == "__main__":
    main()
