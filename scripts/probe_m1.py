#!/usr/bin/env python3
"""Isolate the M=1 decode matmul chain costs: kernel-only (prebuilt
operands) vs prep-in-loop, per production shape. Interleaved in one
process (cross-process numbers drift on a shared chip)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from llamafile_tpu.ops.qmatmul import _m1_pallas, _m1_prep, qmatmul
    from llamafile_tpu.models.synthetic import _rand_qtensor

    rng = np.random.default_rng(0)
    d, dff = 4096, 14336
    shapes = {"qkv": (6144, d), "o": (d, d), "gu": (2 * dff, d),
              "dn": (d, dff)}
    ws = {k: _rand_qtensor(rng, n, kk, "Q4_K") for k, (n, kk) in shapes.items()}
    nbytes = sum(w.nbytes for w in ws.values())

    # (a) kernel-only: operands prebuilt once; a cheap per-iteration xor on
    # the tiny activation blocks keeps XLA from hoisting the calls
    preps = {}
    for name, (n, kk) in shapes.items():
        x = jnp.asarray(rng.standard_normal((1, kk)), jnp.float32)
        preps[name] = _m1_prep(x, None, 0.0)

    @jax.jit
    def kern_only(preps, ws, n):
        def body(i, s):
            z = (i * 0).astype(jnp.int8)
            tot = s
            for name in shapes:
                xlo, xhi, sx = preps[name]
                w = ws[name]
                y = _m1_pallas((xlo ^ z, xhi, sx), w.qs, w.scales,
                               w.bias, interpret=False)
                tot = tot + y[0, 0]
            return tot
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # (b) full chain (prep in loop) — same as probe_decode kern
    @jax.jit
    def chain(x0, ws, n):
        def body(i, x):
            qkv = qmatmul(x, ws["qkv"])
            o = qmatmul(qkv[:, :d], ws["o"])
            gu = qmatmul(x + 1e-6 * o[:, :d], ws["gu"])
            dn = qmatmul(jax.nn.silu(gu[:, :dff]) * gu[:, dff:], ws["dn"])
            return x + 1e-6 * dn
        return jax.lax.fori_loop(0, n, body, x0)

    def timeit(fn, *fixed, iters=96):
        n1, n2 = iters, 3 * iters
        np.asarray(fn(*fixed, jnp.int32(2)))
        best = {}
        for n in (n1, n2):
            b = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(*fixed, jnp.int32(n)))
                b = min(b, time.time() - t0)
            best[n] = b
        return (best[n2] - best[n1]) / (n2 - n1)

    x0 = jnp.asarray(rng.standard_normal((1, d)), jnp.float32)
    for rnd in range(3):
        dt_k = timeit(kern_only, preps, ws)
        dt_c = timeit(chain, x0, ws)
        print(f"r{rnd} kern-only: {dt_k*1e3:.3f} ms/layer "
              f"({nbytes/dt_k/819e7:.0f}% HBM) | chain: {dt_c*1e3:.3f} "
              f"({nbytes/dt_c/819e7:.0f}% HBM) | prep+glue "
              f"{(dt_c-dt_k)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
