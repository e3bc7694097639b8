#!/usr/bin/env python3
"""Phase-level probe of the routed MoE FFN (VERDICT r4 item 1 follow-up).

Times, in ONE process with interleaved reps (docs/BENCH_NOTES methodology):
  gateup   qmatmul_routed on the fused gate|up expert stack alone
  down     qmatmul_routed on the down stack alone (pre-prepped input)
  ffn      full moe_ffn (router + both calls + glue)
Each phase reports ms/layer and effective HBM GB/s against its repacked byte
footprint, so the gap `ffn - gateup - down` is the inter-call glue (activation
preps, silu*up*topw, output reshape/sum) and any per-call ramp.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--dff", type=int, default=14336)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--topk", type=int, default=2)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--quant", default="Q4_K")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import LlamaConfig, LlamaLayer, moe_ffn
    from llamafile_tpu.models.synthetic import _rand_qtensor
    from llamafile_tpu.ops.qmatmul import qmatmul_routed
    from llamafile_tpu.ops.repack import stack_experts

    print("backend", jax.default_backend(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    d, dff, E = args.d, args.dff, args.experts
    ex = {}
    for e in range(E):
        ex[f"gate.{e}"] = _rand_qtensor(rng, dff, d, args.quant)
        ex[f"up.{e}"] = _rand_qtensor(rng, dff, d, args.quant)
        ex[f"down.{e}"] = _rand_qtensor(rng, d, dff, args.quant)
    stacked = stack_experts(ex, E, fuse_gate_up=True)
    stacked2 = stack_experts(ex, E, fuse_gate_up=True, interleave=False)
    gu_key = next(k for k in ("gateup_il", "gateup", "gate") if k in stacked)
    jax.block_until_ready(stacked[gu_key].qs)
    cfg = LlamaConfig(n_layers=1, d_model=d, n_heads=32, n_kv_heads=8,
                      head_dim=d // 32, d_ff=dff, n_vocab=32000,
                      max_context=4096, n_experts=E, n_experts_used=args.topk)
    gate_inp = _rand_qtensor(rng, E, d, "F16")
    layer = LlamaLayer(attn_norm=jnp.ones(d), wq=None, wk=None, wv=None,
                       wo=None, ffn_norm=jnp.ones(d),
                       w_gate=None, w_up=None, w_down=None,
                       gate_inp=gate_inp, experts=stacked)
    layer2 = LlamaLayer(attn_norm=jnp.ones(d), wq=None, wk=None, wv=None,
                        wo=None, ffn_norm=jnp.ones(d),
                        w_gate=None, w_up=None, w_down=None,
                        gate_inp=gate_inp, experts=stacked2)
    m = args.m
    s_n = m * args.topk
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32) * 0.3
    y0 = jnp.asarray(rng.standard_normal((s_n, dff)), jnp.float32) * 0.3
    gu_qt = stacked[gu_key]
    dn_qt = stacked["down"]
    eb = {r: stacked[r].nbytes // E for r in stacked}
    gu_bytes = s_n * eb[gu_key]
    dn_bytes = s_n * eb["down"]

    @jax.jit
    def loop_gu(xx, qt, n):
        def body(i, acc):
            ei = (jnp.arange(s_n, dtype=jnp.int32) + i) % E
            out = qmatmul_routed(acc, qt, ei)
            return acc + 1e-7 * out[:m, :d]
        return jax.lax.fori_loop(0, n, body, xx)

    @jax.jit
    def loop_dn(yy, qt, n):
        def body(i, acc):
            ei = (jnp.arange(s_n, dtype=jnp.int32) + i) % E
            out = qmatmul_routed(acc, qt, ei,
                                 row_map=jnp.arange(s_n, dtype=jnp.int32))
            return acc.at[:, :d].add(1e-7 * out)
        return jax.lax.fori_loop(0, n, body, yy)

    @jax.jit
    def loop_ffn(xx, ly, n):
        def body(i, acc):
            out = moe_ffn(acc, ly, cfg)
            return acc + 1e-6 * out[:m]
        return jax.lax.fori_loop(0, n, body, xx)

    from llamafile_tpu.ops.qmatmul import _m1_prep_rows, qmatmul

    @jax.jit
    def loop_glue(xx, ly, n):
        # everything moe_ffn does EXCEPT the two routed pallas calls (their
        # outputs faked from cheap broadcasts with live data deps): router
        # matmul + softmax/top-k, both activation preps, silu*up*topw, the
        # output reshape-sum
        def body(i, acc):
            router = qmatmul(acc, ly.gate_inp)
            weights = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
            topw, topi = jax.lax.top_k(weights, args.topk)
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
            xlo, xhi, sx = _m1_prep_rows(acc, None, 0.0)
            gu = jnp.broadcast_to(
                (xlo[:, :1, :1, :1].reshape(m, 1)
                 * topi[:, :1]).astype(jnp.float32), (s_n, 2 * dff))
            g, u = gu[:, :dff], gu[:, dff:]
            y = (jax.nn.silu(g) * u) * topw.reshape(s_n, 1)
            ylo, yhi, sy = _m1_prep_rows(y, None, 0.0)
            dn = jnp.broadcast_to(ylo[:, :1, :1, :1].reshape(s_n, 1), (s_n, d))
            out = dn.reshape(m, args.topk, d).sum(axis=1)
            return acc + 1e-6 * out + 1e-9 * jnp.sum(sy)
        return jax.lax.fori_loop(0, n, body, xx)

    cases = {
        "gateup": (loop_gu, (x, gu_qt), gu_bytes),
        "down": (loop_dn, (y0, dn_qt), dn_bytes),
        "ffn": (loop_ffn, (x, layer), gu_bytes + dn_bytes),
        "ffn2call": (loop_ffn, (x, layer2), gu_bytes + dn_bytes),
        "glue": (loop_glue, (x, layer), 1),
    }
    n1, n2 = args.reps, 3 * args.reps
    for name, (fn, fixed, _) in cases.items():
        t0 = time.time()
        np.asarray(fn(*fixed, jnp.int32(2)))
        print(f"  compiled {name} in {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)
    best = {k: {n1: float("inf"), n2: float("inf")} for k in cases}
    for rnd in range(4):
        for name, (fn, fixed, _) in cases.items():
            for n in (n1, n2):
                t0 = time.time()
                np.asarray(fn(*fixed, jnp.int32(n)))
                best[name][n] = min(best[name][n], time.time() - t0)
        lines = []
        for name, (_, _, nb) in cases.items():
            dt = (best[name][n2] - best[name][n1]) / (n2 - n1)
            lines.append(f"{name} {dt*1e6:.0f}us {nb/dt/1e9:.0f}GB/s")
        print(f"r{rnd}: " + " | ".join(lines), flush=True)
    dts = {name: (best[name][n2] - best[name][n1]) / (n2 - n1)
           for name in cases}
    glue = dts["ffn"] - dts["gateup"] - dts["down"]
    print(f"glue (ffn - gateup - down): {glue*1e6:.0f} us/layer")


if __name__ == "__main__":
    main()
