#!/usr/bin/env python3
"""GGUF re-quantization tool.

Analog of the reference's quantize CLI (SURVEY.md §2.7; quantize_quantize.cpp
patch). Reads any GGUF, re-encodes weight matrices to the target format, copies
metadata; matches llama.cpp's structural rules: token embeddings / output head
get Q6_K when the target is a K-quant below 6 bits, norms/biases stay F32,
only 2-D matrices with 256-divisible rows are K-quantized.

Usage: python tools/quantize.py in.gguf out.gguf Q4_K [--threads N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pick_type(name: str, shape, target: str, quants) -> str:
    if len(shape) < 2:
        return "F32"
    k = shape[-1]
    spec = quants.TYPE_BY_NAME[target]
    if k % spec.block_elems:
        return "F16" if k % 32 else "Q8_0" if k % 32 == 0 else "F16"
    if target in ("Q4_K", "Q5_K", "Q3_K", "Q2_K") or target.startswith("IQ"):
        # important matrices get a higher-precision format (llama.cpp rule)
        if name in ("output.weight", "token_embd.weight"):
            return "Q6_K"
    return target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("type", help="target: Q8_0 Q4_0 Q4_K Q5_K Q6_K")
    ap.add_argument("--imatrix", help="importance matrix .npz from tools/imatrix.py")
    args = ap.parse_args()

    from llamafile_tpu.gguf import GGUFReader, GGUFWriter, quants

    target = args.type.upper()
    # Q4_K_M / Q4_K_S / Q3_K_L style mixes collapse to the base K-quant
    # (the structural per-tensor rules in pick_type provide the mix)
    if target not in quants.TYPE_BY_NAME and target.endswith(("_M", "_S", "_L")) \
            and not target.startswith("IQ"):
        target = target[:-2]
    if target not in quants.TYPE_BY_NAME or quants.TYPE_BY_NAME[target].quantize is None:
        have = [s.name for s in quants.GGML_TYPES if s.quantize]
        print(f"unsupported target {target}; available: {have}", file=sys.stderr)
        return 1
    # the low-bit IQ family is meaningless without importance weighting —
    # refuse exactly like the reference
    # (llama.cpp.patches/patches/quantize_quantize.cpp.patch:59-65)
    if target in ("IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ1_S", "IQ1_M") \
            and not args.imatrix:
        print(f"error: {target} requires an importance matrix "
              f"(--imatrix; see tools/imatrix.py)", file=sys.stderr)
        return 1

    imatrix = dict(np.load(args.imatrix)) if args.imatrix else {}
    r = GGUFReader(args.input)
    w = GGUFWriter(args.output)
    for key, val in r.metadata.items():
        if key == "general.file_type":
            continue
        try:
            w.add(key, val if not isinstance(val, np.ndarray) else val)
        except TypeError:
            pass
    t0 = time.time()
    total_in = total_out = 0
    for name, info in r.tensors.items():
        data = r.tensor_f32(name)
        tt = pick_type(name, info.shape, target, quants)
        spec = quants.TYPE_BY_NAME.get(tt)
        total_in += info.nbytes
        if tt == "F32" or spec is None or spec.quantize is None:
            if tt == "F16":
                w.add_tensor_f16(name, data)
                total_out += data.size * 2
            else:
                w.add_tensor_f32(name, data)
                total_out += data.size * 4
            print(f"  {name}: {info.type_name} -> {tt} {data.shape}", file=sys.stderr)
            continue
        qw = imatrix.get(name)
        takes_imatrix = tt == "Q4_K" or tt.startswith(("IQ2", "IQ3"))
        if qw is not None and takes_imatrix and qw.shape[0] == data.shape[-1]:
            qw_full = np.broadcast_to(qw, data.shape).reshape(-1)
            raw = spec.quantize(data.reshape(-1), qw_full)
        else:
            raw = spec.quantize(data.reshape(-1))
        w.add_tensor(name, info.shape, tt, raw)
        total_out += raw.nbytes
        print(f"  {name}: {info.type_name} -> {tt} {data.shape}", file=sys.stderr)
    w.write()
    print(f"quantized {total_in/1e6:.1f} MB -> {total_out/1e6:.1f} MB "
          f"in {time.time()-t0:.1f}s -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
