#!/usr/bin/env python3
"""Decode-path perf probe: isolate where per-step time goes on the real TPU.

Experiments (--exp):
  kern   one transformer layer's worth of fused matmuls (qkv / wo / gate_up /
         down) in a fori_loop — pure dequant-GEMM floor, reported as ms/layer
         and effective HBM GB/s against the quantized byte footprint.
  tail   full-model decode with n_layers in {0, 32}: marginal ms/layer with all
         glue (attention, norms, rope, KV scatter) + the fixed per-step tail
         (embed, out-norm, lm head, argmax).

Methodology per docs/BENCH_NOTES: runtime trip counts (one compile), varied
inputs between reps, differential timing t(3N)-t(N), np.asarray sync.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="kern",
                    choices=["kern", "tail", "ptail", "embed", "abtail",
                             "ablate", "pablate"])
    ap.add_argument("--kernels", default="int8,txn",
                    help="abtail: Q4B kernel flavors to interleave")
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--stack", type=int, default=1)
    ap.add_argument("--quant", default="Q4_K")
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from llamafile_tpu.ops.qmatmul import qmatmul, Q4B_KERNEL
    from llamafile_tpu.models.synthetic import (_rand_qtensor,
                                                make_synthetic_llama,
                                                param_bytes)

    print(f"device={jax.devices()[0].device_kind} q4b_kernel={Q4B_KERNEL}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    def timeit(fn, *fixed):
        """Differential: (t(3N) - t(N)) / 2N, best of 2 reps each."""
        n1, n2 = args.iters, 3 * args.iters
        t0 = time.time()
        np.asarray(fn(*fixed, jnp.int32(2)))
        compile_s = time.time() - t0
        best = {}
        for n in (n1, n2):
            b = float("inf")
            for _ in range(2):
                t0 = time.time()
                np.asarray(fn(*fixed, jnp.int32(n)))
                b = min(b, time.time() - t0)
            best[n] = b
        return (best[n2] - best[n1]) / (n2 - n1), compile_s

    if args.exp == "kern":
        d, dff = 4096, 14336
        wqkv = _rand_qtensor(rng, 6144, d, args.quant)
        wo = _rand_qtensor(rng, d, d, args.quant)
        wgu = _rand_qtensor(rng, 2 * dff, d, args.quant)
        wdn = _rand_qtensor(rng, d, dff, args.quant)
        nbytes = sum(w.nbytes for w in (wqkv, wo, wgu, wdn))

        @jax.jit
        def loop(x0, wqkv, wo, wgu, wdn, n):
            # weights as jit ARGUMENTS (closure constants get inlined into the
            # serialized program on some paths -> remote-compile size blowup)
            def body(i, x):
                qkv = qmatmul(x, wqkv)
                o = qmatmul(qkv[:, :d], wo)
                gu = qmatmul(x + 1e-6 * o[:, :d], wgu)
                dn = qmatmul(jax.nn.silu(gu[:, :dff]) * gu[:, dff:], wdn)
                return x + 1e-6 * dn
            return jax.lax.fori_loop(0, n, body, x0)

        x0 = jnp.asarray(rng.standard_normal((args.batch, d)), jnp.float32)
        dt, cs = timeit(loop, x0, wqkv, wo, wgu, wdn)
        gbs = nbytes / dt / 1e9
        print(f"kern {args.quant} q4b={Q4B_KERNEL}: {dt*1e3:.3f} ms/layer "
              f"({nbytes/1e6:.0f} MB -> {gbs:.0f} GB/s, {gbs/819*100:.0f}% of "
              f"v5e HBM) compile={cs:.0f}s")
        return

    if args.exp == "embed":
        # isolate the embedding row-gather at prefill T (suspected cost in
        # the depth-0 ptail baseline): gather vs one-hot-matmul formulations
        T = args.prefill
        import jax.random as jr
        tbl = jr.normal(jr.PRNGKey(0), (128256, 4096), jnp.bfloat16)

        @jax.jit
        def gather_loop(tbl, toks0, n):
            def body(i, toks):
                x = tbl[toks]                              # [1, T, d]
                return (toks + x[0, :, 0].astype(jnp.int32)) % 128256
            return jax.lax.fori_loop(0, n, body, toks0)

        @jax.jit
        def take_loop(tbl, toks0, n):
            def body(i, toks):
                x = jnp.take(tbl, toks[0], axis=0)[None]
                return (toks + x[0, :, 0].astype(jnp.int32)) % 128256
            return jax.lax.fori_loop(0, n, body, toks0)

        toks0 = jnp.arange(T, dtype=jnp.int32)[None] * 17 % 128256
        for name, fn in (("gather", gather_loop), ("take", take_loop)):
            dt, cs = timeit(fn, tbl, toks0)
            print(f"embed {name} T={T}: {dt*1e3:.3f} ms/iter "
                  f"(compile {cs:.0f}s)")
        return

    if args.exp == "ptail":
        # prefill decomposition: fresh-prefill forward at depth 32 vs 0
        from llamafile_tpu.models.llama import forward, init_cache, stack_layers
        import dataclasses
        res = {}
        cfg, params = make_synthetic_llama(args.preset, quant=args.quant,
                                           fuse=True)
        T = args.prefill
        for nl in (32, 0):
            c = dataclasses.replace(cfg, n_layers=nl)
            p = dataclasses.replace(params, layers=params.layers[:nl])
            if args.stack:
                p = stack_layers(p)
            cache = init_cache(c, args.batch, T)

            last = jnp.full((args.batch,), T - 1, jnp.int32)

            @jax.jit
            def pf(pp, toks, cc, c=c, last=last):
                logits, _ = forward(pp, c, toks, jnp.zeros(
                    (args.batch,), jnp.int32), cc, fresh_prefill=True,
                    last_idx=last)
                return logits[:, -1, :8]

            t0 = time.time()
            np.asarray(pf(p, jnp.zeros((args.batch, T), jnp.int32), cache))
            cs = time.time() - t0
            best = float("inf")
            for rep in (2, 3, 4):
                toks = jnp.full((args.batch, T), rep, jnp.int32)
                t0 = time.time()
                np.asarray(pf(p, toks, cache))
                best = min(best, time.time() - t0)
            res[nl] = best
            print(f"ptail depth={nl}: {best*1e3:.1f} ms compile={cs:.0f}s",
                  file=sys.stderr)
        marg = (res[32] - res[0]) / 32
        flops_layer = 2 * T * (4096 * (6144 + 4096) + 4096 * 3 * 14336)
        mxu = flops_layer / marg / 197e12 * 100
        print(f"ptail {args.quant} T={T}: marginal {marg*1e3:.2f} ms/layer "
              f"({mxu:.0f}% MXU), head {res[0]*1e3:.1f} ms, "
              f"total {res[32]*1e3:.1f} ms = "
              f"{args.batch*T/res[32]:.0f} tok/s")
        return

    if args.exp == "abtail":
        # MODEL-level kernel A/B: full 32-layer decode step per q4b kernel
        # flavor, interleaved in ONE process (cross-process absolute numbers
        # drift 15-50% on this chip; only same-window ratios are meaningful)
        import dataclasses
        from llamafile_tpu.models.llama import forward, init_cache
        from llamafile_tpu.ops import qmatmul as QMOD
        cfg, params = make_synthetic_llama(args.preset, quant=args.quant,
                                           fuse=True)
        cache0 = init_cache(cfg, args.batch, args.ctx)
        loops = {}
        for kern in args.kernels.split(","):
            QMOD.Q4B_KERNEL = kern       # captured at trace time

            @jax.jit
            def loop(pp, tok0, pos0, cc, n, cfg=cfg):
                def body(i, carry):
                    tok, q, kvc = carry
                    logits, kvc = forward(pp, cfg, tok[:, None], q, kvc)
                    return (jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32),
                            q + 1, kvc)
                return jax.lax.fori_loop(0, n, body, (tok0, pos0, cc))[0]

            t0 = time.time()
            np.asarray(loop(params, jnp.ones((args.batch,), jnp.int32),
                            jnp.full((args.batch,), 512, jnp.int32),
                            cache0, jnp.int32(2)))
            print(f"  compiled {kern} in {time.time()-t0:.0f}s",
                  file=sys.stderr)
            loops[kern] = loop
        n1, n2 = args.iters, 3 * args.iters
        best = {kk: {n1: float("inf"), n2: float("inf")} for kk in loops}
        for rnd in range(5):
            for kern, loop in loops.items():
                tok0 = jnp.full((args.batch,), 1 + rnd, jnp.int32)
                for n in (n1, n2):
                    t0 = time.time()
                    np.asarray(loop(params, tok0,
                                    jnp.full((args.batch,), 512, jnp.int32),
                                    cache0, jnp.int32(n)))
                    best[kern][n] = min(best[kern][n], time.time() - t0)
            for kern in loops:
                dt = (best[kern][n2] - best[kern][n1]) / (n2 - n1)
                print(f"r{rnd} abtail[{kern}]: {dt*1e3:.3f} ms/step = "
                      f"{args.batch/dt:.1f} tok/s")
        return

    if args.exp == "pablate":
        # prefill glue attribution at T (timing-only): stub one subsystem per
        # variant, interleave in one process; differential over n reps
        from llamafile_tpu.models import llama as LM
        from llamafile_tpu.models.llama import init_cache
        from llamafile_tpu.ops import attention as OA
        import dataclasses
        cfg, params = make_synthetic_llama(args.preset, quant=args.quant,
                                           fuse=True)
        T = args.prefill
        cache0 = init_cache(cfg, args.batch, T)
        orig = [(OA, "flash_prefill", OA.flash_prefill),
                (LM, "apply_rope", LM.apply_rope),
                (LM, "norm_fn", LM.norm_fn),
                (LM, "rmsnorm", LM.rmsnorm)]

        ABL = {
            "full": [],
            "noattn": [(OA, "flash_prefill",
                        lambda q, k, v, scale, **kw: q)],
            "norope": [(LM, "apply_rope", lambda x, c, s, nx: x)],
            "nonorm": [(LM, "norm_fn", lambda x, w, c, b=None: x),
                       (LM, "rmsnorm", lambda x, w, e: x)],
        }
        loops = {}
        last = jnp.full((args.batch,), T - 1, jnp.int32)
        for name, patches in ABL.items():
            for mod, k, v in orig:
                setattr(mod, k, v)
            for mod, k, v in patches:
                setattr(mod, k, v)

            @jax.jit
            def loop(pp, cc, n, cfg=cfg, last=last):
                def body(i, s):
                    toks = jnp.full((args.batch, T), 1 + i % 7, jnp.int32)
                    logits, _ = LM.forward(pp, cfg, toks,
                                           jnp.zeros((args.batch,), jnp.int32),
                                           cc, fresh_prefill=True,
                                           last_idx=last)
                    return s + logits[0, 0, :8].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body,
                                         jnp.zeros((8,), jnp.float32))

            t0 = time.time()
            np.asarray(loop(params, cache0, jnp.int32(1)))
            print(f"  compiled {name} in {time.time()-t0:.0f}s",
                  file=sys.stderr)
            loops[name] = loop
        for mod, k, v in orig:
            setattr(mod, k, v)
        n1, n2 = max(4, args.iters // 8), 3 * max(4, args.iters // 8)
        best = {kk: {n1: float("inf"), n2: float("inf")} for kk in loops}
        for rnd in range(4):
            for name, loop in loops.items():
                for n in (n1, n2):
                    t0 = time.time()
                    np.asarray(loop(params, cache0, jnp.int32(n)))
                    best[name][n] = min(best[name][n], time.time() - t0)
            for name in loops:
                dt = (best[name][n2] - best[name][n1]) / (n2 - n1)
                print(f"r{rnd} pablate[{name}]: {dt*1e3:.2f} ms/prefill = "
                      f"{args.batch*T/dt:.0f} tok/s")
        return

    if args.exp == "ablate":
        # glue attribution (timing-only, wrong numerics): rebuild the full
        # decode step with one subsystem stubbed out per variant; all
        # variants interleave in one process
        from llamafile_tpu.models import llama as LM
        from llamafile_tpu.models.llama import init_cache
        from llamafile_tpu.ops import attention as OA
        cfg, params = make_synthetic_llama(args.preset, quant=args.quant,
                                           fuse=True)
        cache0 = init_cache(cfg, args.batch, args.ctx)
        orig = [(LM, "attention", LM.attention),
                (OA, "flash_decode", OA.flash_decode),
                (OA, "flash_decode_write_stacked",
                 OA.flash_decode_write_stacked),
                (LM, "apply_rope", LM.apply_rope),
                (LM, "norm_fn", LM.norm_fn),
                (LM, "rmsnorm", LM.rmsnorm),
                (LM, "moe_ffn", LM.moe_ffn)]

        def fake_attn(q, k_cache, v_cache, pos, t_pos, scale, **kw):
            return q
        def fake_fdw(q, k3, v3, kn, vn, li, pos, scale, **kw):
            return q, k3, v3
        ABL = {
            "full": [],
            "noattn": [(LM, "attention", fake_attn),
                       (OA, "flash_decode",
                        lambda q, kci, vci, pos, scale, **kw: q),
                       (OA, "flash_decode_write_stacked", fake_fdw)],
            "norope": [(LM, "apply_rope", lambda x, c, s, nx: x)],
            "nonorm": [(LM, "norm_fn", lambda x, w, c, b=None: x),
                       (LM, "rmsnorm", lambda x, w, e: x)],
        }
        if cfg.n_experts > 0:
            # MoE decomposition (VERDICT r4 #1): where do the ~21 points
            # between the 94%-of-HBM routed FFN and the 73% model go?
            from llamafile_tpu.ops.qmatmul import qmatmul_routed

            def moe_gone(x2d, layer, c):          # no MoE FFN at all
                return x2d * 0.01

            def moe_fixedroute(x2d, layer, c):    # kernels, no router glue
                m, d = x2d.shape
                s_n = m * c.n_experts_used
                ei = (jnp.arange(s_n, dtype=jnp.int32) % c.n_experts)
                ex = layer.experts
                if "gateup" in ex:
                    gu = qmatmul_routed(x2d, ex["gateup"], ei)
                    g, u = gu[:, :c.d_ff], gu[:, c.d_ff:]
                else:
                    g = qmatmul_routed(x2d, ex["gate"], ei)
                    u = qmatmul_routed(x2d, ex["up"], ei)
                y = (jax.nn.silu(g) * u) * 0.5
                dn = qmatmul_routed(y, ex["down"], ei,
                                    row_map=jnp.arange(s_n, dtype=jnp.int32))
                return dn.reshape(m, c.n_experts_used, d).sum(axis=1)

            def moe_norouter_mm(x2d, layer, c):   # real top-k, router mm
                m, d = x2d.shape                  # replaced by a slice
                router = x2d[:, :c.n_experts]
                weights = jax.nn.softmax(router.astype(jnp.float32), -1)
                topw, topi = jax.lax.top_k(weights, c.n_experts_used)
                topw = topw / jnp.sum(topw, -1, keepdims=True)
                s_n = m * c.n_experts_used
                ei = topi.reshape(s_n).astype(jnp.int32)
                ex = layer.experts
                gu = qmatmul_routed(x2d, ex["gateup"], ei)
                g, u = gu[:, :c.d_ff], gu[:, c.d_ff:]
                y = (jax.nn.silu(g) * u) * topw.reshape(s_n, 1)
                dn = qmatmul_routed(y, ex["down"], ei,
                                    row_map=jnp.arange(s_n, dtype=jnp.int32))
                return dn.reshape(m, c.n_experts_used, d).sum(axis=1)

            ABL["nomoe"] = [(LM, "moe_ffn", moe_gone)]
            ABL["fixedroute"] = [(LM, "moe_ffn", moe_fixedroute)]
            ABL["noroutermm"] = [(LM, "moe_ffn", moe_norouter_mm)]
        loops = {}
        for name, patches in ABL.items():
            for mod, k, v in orig:
                setattr(mod, k, v)
            for mod, k, v in patches:
                setattr(mod, k, v)

            @jax.jit
            def loop(pp, tok0, pos0, cc, n, cfg=cfg):
                def body(i, carry):
                    tok, q, kvc = carry
                    logits, kvc = LM.forward(pp, cfg, tok[:, None], q, kvc)
                    return (jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32),
                            q + 1, kvc)
                return jax.lax.fori_loop(0, n, body, (tok0, pos0, cc))[0]

            t0 = time.time()
            np.asarray(loop(params, jnp.ones((args.batch,), jnp.int32),
                            jnp.full((args.batch,), 512, jnp.int32),
                            cache0, jnp.int32(2)))
            print(f"  compiled {name} in {time.time()-t0:.0f}s",
                  file=sys.stderr)
            loops[name] = loop
        for mod, k, v in orig:
            setattr(mod, k, v)
        n1, n2 = args.iters, 3 * args.iters
        best = {kk: {n1: float("inf"), n2: float("inf")} for kk in loops}
        for rnd in range(5):
            for name, loop in loops.items():
                tok0 = jnp.full((args.batch,), 1 + rnd, jnp.int32)
                for n in (n1, n2):
                    t0 = time.time()
                    np.asarray(loop(params, tok0,
                                    jnp.full((args.batch,), 512, jnp.int32),
                                    cache0, jnp.int32(n)))
                    best[name][n] = min(best[name][n], time.time() - t0)
            for name in loops:
                dt = (best[name][n2] - best[name][n1]) / (n2 - n1)
                print(f"r{rnd} ablate[{name}]: {dt*1e3:.3f} ms/step")
        return

    # tail: full forward at depth 32 vs 0 (fixed per-step cost decomposition)
    from llamafile_tpu.models.llama import forward, init_cache, stack_layers
    import dataclasses
    res = {}
    cfg, params = make_synthetic_llama(args.preset, quant=args.quant, fuse=True)
    for nl in (32, 0):
        c = dataclasses.replace(cfg, n_layers=nl)
        p = dataclasses.replace(params, layers=params.layers[:nl])
        if args.stack:
            p = stack_layers(p)
        cache = init_cache(c, args.batch, args.ctx)

        @jax.jit
        def loop(pp, tok0, pos0, cc, n, c=c):
            def body(i, carry):
                tok, q, k = carry
                logits, k = forward(pp, c, tok[:, None], q, k)
                return (jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32),
                        q + 1, k)
            return jax.lax.fori_loop(0, n, body, (tok0, pos0, cc))[0]

        pos = jnp.full((args.batch,), 512, jnp.int32)
        tok = jnp.ones((args.batch,), jnp.int32)
        dt, cs = timeit(loop, p, tok, pos, cache)
        res[nl] = dt
        print(f"tail depth={nl}: {dt*1e3:.3f} ms/step compile={cs:.0f}s",
              file=sys.stderr)
    marg = (res[32] - res[0]) / 32
    print(f"tail {args.quant} q4b={Q4B_KERNEL}: marginal {marg*1e3:.3f} "
          f"ms/layer, fixed tail {res[0]*1e3:.3f} ms/step, "
          f"step {res[32]*1e3:.2f} ms = {args.batch/res[32]:.1f} tok/s")


if __name__ == "__main__":
    main()
