#!/usr/bin/env python3
"""LocalScore-style composite benchmark.

Analog of the reference's localscore CLI (SURVEY.md §2.7; localscore/
localscore.cpp:387-397 test shapes, :330-331 scoring):
  9 (n_prompt, n_gen) shapes; score = 10 * cbrt(prompt_tps * gen_tps * 1000/ttft_ms).
No leaderboard submission (zero egress); prints per-test rows + composite.

Power sampling (reference localscore/powersampler.cpp: nvml / rocm-smi /
Apple IOKit wattage during runs) is NOT implemented: this environment
exposes no TPU power API to user code (no NVML analog over the tunnel),
so the composite omits the reference's watts column rather than fake it.

Usage: python tools/localscore.py -m model.gguf  (or --preset llama3-8b --quant Q4_K)
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (n_prompt, n_gen) — reference localscore.cpp:387-397
TESTS = [(1024, 16), (4096, 256), (2048, 256), (2048, 768), (1024, 1024),
         (1280, 3072), (384, 1152), (64, 1024), (16, 1536)]


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model")
    ap.add_argument("--preset", default=None, help="synthetic preset instead of a file")
    ap.add_argument("--quant", default="Q4_K")
    ap.add_argument("--ctx", type=int, default=4608)
    ap.add_argument("--tests", type=int, default=len(TESTS))
    ap.add_argument("--out", default=None,
                    help="also write the result JSON to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from llamafile_tpu.models.llama import forward, init_cache

    if args.preset:
        from llamafile_tpu.models.synthetic import make_synthetic_llama
        cfg, params = make_synthetic_llama(args.preset, quant=args.quant)
    else:
        from llamafile_tpu.models.loader import load_llama
        cfg, params, _tok, _ = load_llama(args.model)

    if os.environ.get("LLAMAFILE_TPU_I8P", "1") != "0":
        # match the engine/bench prefill config: int8-g256 companions give
        # ~2x prompt-side MXU rate, which TTFT (and so the score) weights
        from llamafile_tpu.models.llama import int8_prefill_params
        params = int8_prefill_params(params)
    from llamafile_tpu.models.llama import stack_layers
    params = stack_layers(params)
    fwd = jax.jit(lambda p, t, q, c: forward(p, cfg, t, q, c))

    @jax.jit
    def gen_n(p, tok0, pos0, c, n):
        # on-device decode loop — measures the same scan-style path the
        # engine serves with (round-1 bench tools dispatched one jit call
        # per token over the device tunnel, understating the engine)
        def body(i, carry):
            tok, q, cc = carry
            logits, cc = forward(p, cfg, tok[:, None], q, cc)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, q + 1, cc)
        return jax.lax.fori_loop(0, n, body, (tok0, pos0, c))[0]

    results = []
    for n_prompt, n_gen in TESTS[: args.tests]:
        ctx = min(args.ctx, cfg.max_context)
        if n_prompt + n_gen > ctx:
            n_gen = max(16, ctx - n_prompt)
        cache = init_cache(cfg, 1, n_prompt + n_gen)
        pos0 = jnp.zeros((1,), jnp.int32)

        # TTFT = one prefill, measured DIFFERENTIALLY inside one program
        # (t(3)-t(1))/2 so the ~30 ms per-call tunnel dispatch and result
        # caching don't pollute it (inputs vary with the loop index); sync
        # via np.asarray — block_until_ready does not reliably block here
        @jax.jit
        def pf_n(p, c, n_iter):
            def body(i, acc):
                toks = ((jnp.arange(n_prompt, dtype=jnp.int32)[None]
                         * (i + 3)) % cfg.n_vocab)
                lg, _ = forward(p, cfg, toks, pos0, c)
                return acc + lg[0, -1, 0]
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        np.asarray(pf_n(params, cache, jnp.int32(1)))          # compile
        pts = {}
        for n_iter in (1, 3):
            bst = float("inf")
            for _ in range(2):
                t0 = time.time()
                np.asarray(pf_n(params, cache, jnp.int32(n_iter)))
                bst = min(bst, time.time() - t0)
            pts[n_iter] = bst
        ttft = max(pts[3] - pts[1], 1e-9) / 2
        prompt_tps = n_prompt / ttft
        ptoks = jnp.ones((1, n_prompt), jnp.int32)
        logits, c1 = fwd(params, ptoks, pos0, cache)           # cache fill
        np.asarray(logits[0, -1, :1])
        tok0 = jnp.ones((1,), jnp.int32)
        gpos = jnp.asarray([n_prompt], jnp.int32)
        np.asarray(gen_n(params, tok0, gpos, c1, jnp.int32(2)))  # compile
        gen_s = float("inf")
        for rep in (2, 3):
            t0 = time.time()
            np.asarray(gen_n(params, tok0 + rep, gpos, c1,
                             jnp.int32(n_gen)))
            gen_s = min(gen_s, time.time() - t0)
        gen_tps = n_gen / gen_s
        results.append((n_prompt, n_gen, prompt_tps, gen_tps, ttft * 1e3))
        print(f"pp{n_prompt:>5} tg{n_gen:>5}: prompt {prompt_tps:9.1f} t/s  "
              f"gen {gen_tps:7.1f} t/s  ttft {ttft*1e3:8.1f} ms", file=sys.stderr)

    avg_prompt = float(np.mean([r[2] for r in results]))
    avg_gen = float(np.mean([r[3] for r in results]))
    avg_ttft = float(np.mean([r[4] for r in results]))
    score = 10.0 * (avg_prompt * avg_gen * 1000.0 / avg_ttft) ** (1.0 / 3.0)
    out = {"metric": "localscore", "value": round(score, 1),
           "unit": "points",
           "prompt_tps": round(avg_prompt, 1),
           "gen_tps": round(avg_gen, 1),
           "ttft_ms": round(avg_ttft, 1),
           "shapes": [{"pp": r[0], "tg": r[1],
                       "prompt_tps": round(r[2], 1),
                       "gen_tps": round(r[3], 1),
                       "ttft_ms": round(r[4], 1)} for r in results]}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
