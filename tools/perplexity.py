#!/usr/bin/env python3
"""Perplexity evaluation — the quantization-quality gate.

Analog of the reference's llamafile-perplexity tool (SURVEY.md §2.7: WikiText-2
ppl is the documented correctness metric for quant parity; llamafile-files/
perplexity). Same methodology as upstream: sliding non-overlapping windows of
n_ctx tokens, NLL measured over the second half of each window (first half is
context warm-up), ppl = exp(mean nll).

Usage: python tools/perplexity.py -m model.gguf -f wiki.test.raw [-c 512]
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="raw text file")
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    import jax

    cfg, params, tok, _ = load_llama(args.model)
    text = open(args.file, errors="replace").read()
    ids = tok.encode(text)
    n_ctx = args.ctx
    n_chunks = len(ids) // n_ctx
    if args.max_chunks:
        n_chunks = min(n_chunks, args.max_chunks)
    if n_chunks == 0:
        print("text too short", file=sys.stderr)
        return 1
    print(f"{len(ids)} tokens, {n_chunks} chunks of {n_ctx}", file=sys.stderr)

    @jax.jit
    def chunk_nll(params, toks):
        cache = init_cache(cfg, 1, n_ctx)
        logits, _ = forward(params, cfg, toks[None, :-1],
                            jnp.zeros((1,), jnp.int32), cache)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        tgt = toks[1:]
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        # evaluate over the second half only (llama.cpp convention)
        start = n_ctx // 2
        return nll[start:].sum(), nll.shape[0] - start

    total_nll = 0.0
    total_cnt = 0
    t0 = time.time()
    for i in range(n_chunks):
        chunk = np.asarray(ids[i * n_ctx:(i + 1) * n_ctx], np.int32)
        s, c = chunk_nll(params, jnp.asarray(chunk))
        total_nll += float(s)
        total_cnt += int(c)
        ppl = math.exp(total_nll / total_cnt)
        print(f"[{i + 1}/{n_chunks}] ppl={ppl:.4f} "
              f"({(i+1)*n_ctx/(time.time()-t0):.0f} tok/s)", file=sys.stderr)
    ppl = math.exp(total_nll / total_cnt)
    if args.json:
        import json
        print(json.dumps({"ppl": ppl, "tokens": total_cnt, "ctx": n_ctx}))
    else:
        print(f"Final perplexity: {ppl:.4f} over {total_cnt} tokens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
