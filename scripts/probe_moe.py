#!/usr/bin/env python3
"""Routed-MoE probe: parity on real TPU + per-layer routed FFN perf.

Measures moe_ffn (routed decode path) on Mixtral-8x7B layer shapes and
reports ms/layer and effective HBM GB/s against the ROUTED byte footprint
(top-k experts only) — the kernel-level half of VERDICT r3 item 1.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--dff", type=int, default=14336)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--topk", type=int, default=2)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--quant", default="Q4_K")
    ap.add_argument("--parity", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import LlamaConfig, LlamaLayer, moe_ffn
    from llamafile_tpu.models.synthetic import _rand_qtensor
    from llamafile_tpu.ops.repack import expert_slice, stack_experts

    print("backend", jax.default_backend(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    d, dff, E = args.d, args.dff, args.experts
    ex = {}
    t0 = time.time()
    for e in range(E):
        ex[f"gate.{e}"] = _rand_qtensor(rng, dff, d, args.quant)
        ex[f"up.{e}"] = _rand_qtensor(rng, dff, d, args.quant)
        ex[f"down.{e}"] = _rand_qtensor(rng, d, dff, args.quant)
        print(f"expert {e} built {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
    stacked = stack_experts(ex, E)
    jax.block_until_ready(stacked["gate"].qs)
    print(f"stacked {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    cfg = LlamaConfig(n_layers=1, d_model=d, n_heads=32, n_kv_heads=8,
                      head_dim=d // 32, d_ff=dff, n_vocab=32000,
                      max_context=4096, n_experts=E, n_experts_used=args.topk)
    layer = LlamaLayer(attn_norm=jnp.ones(d), wq=None, wk=None, wv=None,
                       wo=None, ffn_norm=jnp.ones(d),
                       w_gate=None, w_up=None, w_down=None,
                       gate_inp=_rand_qtensor(rng, E, d, "F16"),
                       experts=stacked)
    x = jnp.asarray(rng.standard_normal((args.m, d)), jnp.float32) * 0.3

    # layer rides as an ARGUMENT (closing over GB-scale weights turns them
    # into jit constants — pathological compile times)
    fn = jax.jit(lambda xx, ly: moe_ffn(xx, ly, cfg))
    t0 = time.time()
    y = np.asarray(fn(x, layer))
    print(f"compile+first: {time.time()-t0:.1f}s out={y.shape} "
          f"finite={np.isfinite(y).all()}", file=sys.stderr, flush=True)

    if args.parity:
        import dataclasses
        ex_dict = {}
        for role in ("gate", "up", "down"):
            for e in range(E):
                ex_dict[f"{role}.{e}"] = expert_slice(stacked[role], e)
        layer_d = dataclasses.replace(layer, experts=ex_dict)
        yd = np.asarray(jax.jit(
            lambda xx, ly: moe_ffn(xx, ly, cfg))(x, layer_d))
        scale = np.abs(yd).max() + 1e-3
        err = np.abs(y - yd).max() / scale
        print(f"parity routed-vs-dense rel err: {err:.5f}")
        assert err < 2e-2

    # differential timing: N vs 3N chained calls (varying input defeats CSE)
    @jax.jit
    def loop(xx, ly, n):
        def body(i, acc):
            out = moe_ffn(acc, ly, cfg)
            return acc + 1e-6 * out[: args.m]
        return jax.lax.fori_loop(0, n, body, xx)

    np.asarray(loop(x, layer, jnp.int32(2)))
    times = {}
    for n in (args.reps, 3 * args.reps):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(x, layer, jnp.int32(n)))
            best = min(best, time.time() - t0)
        times[n] = best
    dt = (times[3 * args.reps] - times[args.reps]) / (2 * args.reps)
    s_n = args.m * args.topk
    routed_bytes = s_n * sum(
        stacked[r].nbytes // E for r in ("gate", "up", "down"))
    print(f"moe_ffn m={args.m} topk={args.topk}: {dt*1e3:.3f} ms/layer, "
          f"routed bytes {routed_bytes/1e6:.1f} MB -> "
          f"{routed_bytes/dt/1e9:.0f} GB/s effective")


if __name__ == "__main__":
    main()
