#!/usr/bin/env python3
"""Importance-matrix collection for quantization.

Analog of the reference's imatrix tool (SURVEY.md §2.7: collects per-column
activation statistics feeding IQ/K-quant weighting). Runs calibration text
through the model with the matmul entry instrumented, accumulating sum(x^2)
per input column of every weight matrix; saved as .npz keyed by GGUF tensor
name for tools/quantize.py --imatrix.

Usage: python tools/imatrix.py -m model.gguf -f calib.txt -o model.imatrix.npz
       [-c 512] [--max-chunks 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp
    from llamafile_tpu.models import llama as L
    from llamafile_tpu.models.llama import init_cache
    from llamafile_tpu.models.loader import load_llama

    cfg, params, tok, _ = load_llama(args.model, fuse=False)
    # map weight object id -> gguf tensor name
    names = {}
    for i, layer in enumerate(params.layers):
        p = f"blk.{i}."
        for attr, nm in (("wq", "attn_q.weight"), ("wk", "attn_k.weight"),
                         ("wv", "attn_v.weight"), ("wo", "attn_output.weight"),
                         ("w_gate", "ffn_gate.weight"), ("w_up", "ffn_up.weight"),
                         ("w_down", "ffn_down.weight")):
            qt = getattr(layer, attr)
            if qt is not None:
                names[id(qt)] = p + nm
    names[id(params.output)] = "output.weight"

    sums = {}
    counts = {}
    orig_mm = L._mm

    def tapped_mm(x2d, w):
        nm = names.get(id(w))
        if nm is not None:
            sq = np.asarray((x2d.astype(jnp.float32) ** 2).sum(axis=0))
            if nm in sums:
                sums[nm] += sq
                counts[nm] += x2d.shape[0]
            else:
                sums[nm] = sq
                counts[nm] = x2d.shape[0]
        return orig_mm(x2d, w)

    L._mm = tapped_mm
    try:
        ids = tok.encode(open(args.file, errors="replace").read())
        n_chunks = min(len(ids) // args.ctx, args.max_chunks) or 1
        for i in range(n_chunks):
            chunk = ids[i * args.ctx:(i + 1) * args.ctx]
            if not chunk:
                break
            cache = init_cache(cfg, 1, len(chunk) + 1)
            L.forward(params, cfg, jnp.asarray([chunk], jnp.int32),
                      jnp.zeros((1,), jnp.int32), cache)
            print(f"[{i + 1}/{n_chunks}] collected", file=sys.stderr)
    finally:
        L._mm = orig_mm

    out = {}
    for nm, s in sums.items():
        out[nm] = (s / max(counts[nm], 1)).astype(np.float32)
    np.savez_compressed(args.output, **out)
    print(f"wrote {args.output}: {len(out)} tensors")
    return 0


if __name__ == "__main__":
    sys.exit(main())
