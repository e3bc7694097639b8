#!/usr/bin/env python3
"""Extract IQ-quant codebook grid tables from the reference's metal shader patch.

The importance-quant (IQ) GGUF formats are *defined* by fixed codebook tables
(E8-lattice sign/magnitude grids). These constants are part of the serialization
format itself (like a Huffman table in JPEG) — without them the bitstreams are
undecodable. We extract them once from
/root/reference/llama.cpp.patches/patches/ggml-metal.metal.patch (the only place
the snapshot carries them; upstream ggml-common.h lives in an empty submodule)
and store them as an .npz consumed by llamafile_tpu.gguf.quants.

Tables extracted: iq2xxs_grid[256] u64, iq2xs_grid[512] u64, iq2s_grid[1024] u64,
iq3xxs_grid[256] u32, iq3s_grid[512] u32, iq1s_grid[2048] u64 (C variant),
ksigns_iq2xs[128] u8 (also derivable: i | parity(i)<<7).
"""
import re
import sys

import numpy as np

SRC = "/root/reference/llama.cpp.patches/patches/ggml-metal.metal.patch"
OUT = "/root/repo/llamafile_tpu/gguf/iq_grids.npz"

WANT = {
    "iq2xxs_grid": ("u8", 256),   # stored u64, viewed as 8 bytes (values)
    "iq2xs_grid": ("u8", 512),
    "iq2s_grid": ("u8", 1024),
    "iq3xxs_grid": ("u8", 256),   # stored u32, 4 bytes
    "iq3s_grid": ("u8", 512),
    "iq1s_grid": ("i8", 2048),    # stored u64, 8 int8 values in {-1,0,1}
}


def main() -> None:
    text = open(SRC).read()
    tables = {}
    for m in re.finditer(
        r"GGML_TABLE_BEGIN\((uint64_t|uint32_t|uint8_t|int8_t),\s*(\w+),\s*(\w+)\)(.*?)GGML_TABLE_END\(\)",
        text,
        re.S,
    ):
        ctype, name, _count, body = m.groups()
        if name in tables or name not in WANT:
            continue  # first definition wins (C variant before GPU variant)
        vals = [int(v, 16) for v in re.findall(r"0x([0-9a-fA-F]+)", body)]
        base = {"uint64_t": np.uint64, "uint32_t": np.uint32,
                "uint8_t": np.uint8, "int8_t": np.int8}[ctype]
        arr = np.array(vals, dtype=np.uint64).astype(base)
        tables[name] = arr

    out = {}
    for name, (view, count) in WANT.items():
        if name not in tables:
            print(f"MISSING table {name}", file=sys.stderr)
            sys.exit(1)
        arr = tables[name]
        assert len(arr) == count, (name, len(arr), count)
        # Expand packed u64/u32 entries to per-element byte grids (little-endian),
        # shape (count, elems_per_entry).
        if arr.dtype in (np.uint64, np.uint32):
            nb = arr.dtype.itemsize
            b = arr.view(np.uint8).reshape(count, nb)
            out[name] = b.view(np.int8) if view == "i8" else b
        else:
            out[name] = arr
    # ksigns_iq2xs[i] = i | (odd_parity(i) << 7); derived, not extracted.
    i = np.arange(128, dtype=np.uint8)
    parity = np.zeros(128, dtype=np.uint8)
    for bit in range(7):
        parity ^= (i >> bit) & 1
    out["ksigns_iq2xs"] = (i | (parity << 7)).astype(np.uint8)
    np.savez_compressed(OUT, **out)
    for k, v in out.items():
        print(k, v.shape, v.dtype)


if __name__ == "__main__":
    main()
