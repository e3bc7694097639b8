#!/usr/bin/env python3
"""Direct bandwidth probe of _qmm_call_txn_m1_routed at several slot counts
and shapes — sanity-checks the >819 GB/s reading from probe_moe_phases (is it
byte miscounting, block dedup, or real chip bandwidth above spec?)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from llamafile_tpu.models.synthetic import _rand_qtensor
    from llamafile_tpu.ops.qmatmul import qmatmul_routed, Q4B_KERNEL
    from llamafile_tpu.ops.repack import stack_experts

    print(f"kernel={Q4B_KERNEL}", file=sys.stderr)
    rng = np.random.default_rng(0)
    E = 8
    for name, n, k in (("gateup", 28672, 4096), ("down", 4096, 14336)):
        ex = {}
        for e in range(E):
            ex[f"gate.{e}"] = _rand_qtensor(rng, n, k, "Q4_K")
            ex[f"up.{e}"] = _rand_qtensor(rng, 128, k, "Q4_K")
            ex[f"down.{e}"] = _rand_qtensor(rng, 128, k, "Q4_K")
        st = stack_experts(ex, E)["gate"]
        jax.block_until_ready(st.qs)
        eb = st.nbytes // E
        print(f"{name}: leaf qs {st.qs.shape} {st.qs.dtype}, "
              f"scales {st.scales.shape} {st.scales.dtype}, "
              f"bias {None if st.bias is None else st.bias.dtype}, "
              f"expert bytes {eb/1e6:.1f} MB", file=sys.stderr)

        for s_n in (2, 8):
            x = jnp.asarray(rng.standard_normal((s_n, k)), jnp.float32) * 0.3

            @jax.jit
            def loop(xx, qt, n_it, s_n=s_n):
                def body(i, acc):
                    ei = (jnp.arange(s_n, dtype=jnp.int32) + i) % E
                    out = qmatmul_routed(
                        acc, qt, ei, row_map=jnp.arange(s_n, dtype=jnp.int32))
                    w = min(out.shape[1], k)
                    return acc.at[:, :w].add(1e-7 * out[:, :w])
                return jax.lax.fori_loop(0, n_it, body, xx)

            np.asarray(loop(x, st, jnp.int32(2)))
            n1, n2 = 24, 72
            best = {n1: float("inf"), n2: float("inf")}
            for _ in range(3):
                for n_it in (n1, n2):
                    t0 = time.time()
                    np.asarray(loop(x, st, jnp.int32(n_it)))
                    best[n_it] = min(best[n_it], time.time() - t0)
            dt = (best[n2] - best[n1]) / (n2 - n1)
            nb = s_n * eb
            print(f"{name} s_n={s_n}: {dt*1e6:.0f} us/call "
                  f"{nb/1e6:.0f} MB -> {nb/dt/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
