#!/usr/bin/env python3
"""pp/tg sweep benchmark (llama-bench analog).

Reference: llamafile's patched llama-bench (SURVEY.md §2.7) — prompt-processing
and token-generation throughput sweeps across batch sizes. The reference adds a
CPU temperature governor (govern.cpp:27-49); on TPU the analog is a warm-up +
steady-state repetition policy.

Usage: python tools/llama_bench.py -m model.gguf [-p 512] [-n 128] [-b 1,8]
       python tools/llama_bench.py --preset tinyllama-1.1b --quant Q8_0
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model")
    ap.add_argument("--preset")
    ap.add_argument("--quant", default="Q4_K")
    ap.add_argument("-p", "--n-prompt", type=int, default=512)
    ap.add_argument("-n", "--n-gen", type=int, default=128)
    ap.add_argument("-b", "--batches", default="1")
    ap.add_argument("-r", "--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache

    if args.preset:
        from llamafile_tpu.models.synthetic import make_synthetic_llama, param_bytes
        cfg, params = make_synthetic_llama(args.preset, quant=args.quant)
        name = f"{args.preset}-{args.quant}"
    else:
        from llamafile_tpu.models.loader import load_llama
        cfg, params, _t, _ = load_llama(args.model)
        name = os.path.basename(args.model)

    from llamafile_tpu.models.llama import stack_layers
    params = stack_layers(params)
    fwd = jax.jit(lambda p, t, q, c: forward(p, cfg, t, q, c))

    @jax.jit
    def gen_n(p, tok0, pos0, c, n):
        def body(i, carry):
            tok, q, cc = carry
            logits, cc = forward(p, cfg, tok[:, None], q, cc)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, q + 1, cc)
        return jax.lax.fori_loop(0, n, body, (tok0, pos0, c))[0]

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        ctx = args.n_prompt + args.n_gen + 1
        # prompt processing
        cache = init_cache(cfg, b, ctx)
        ptoks = jnp.ones((b, args.n_prompt), jnp.int32)
        pos0 = jnp.zeros((b,), jnp.int32)
        fwd(params, ptoks, pos0, cache)[0].block_until_ready()   # compile
        best_pp = 0.0
        for _ in range(args.reps):
            t0 = time.time()
            logits, c1 = fwd(params, ptoks, pos0, cache)
            logits.block_until_ready()
            best_pp = max(best_pp, b * args.n_prompt / (time.time() - t0))
        # token generation
        import numpy as np
        tok0 = jnp.ones((b,), jnp.int32)
        gpos = jnp.full((b,), args.n_prompt, jnp.int32)
        np.asarray(gen_n(params, tok0, gpos, c1, jnp.int32(2)))  # compile
        best_tg = 0.0
        for rep in range(args.reps):
            t0 = time.time()
            np.asarray(gen_n(params, tok0 + rep, gpos, c1,
                             jnp.int32(args.n_gen)))
            best_tg = max(best_tg, b * args.n_gen / (time.time() - t0))
        rows.append({"model": name, "batch": b,
                     f"pp{args.n_prompt}": round(best_pp, 1),
                     f"tg{args.n_gen}": round(best_tg, 1)})
        print(f"| {name} | b={b} | pp{args.n_prompt} {best_pp:10.1f} t/s "
              f"| tg{args.n_gen} {best_tg:8.1f} t/s |", file=sys.stderr)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
