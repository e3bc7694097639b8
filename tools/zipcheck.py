#!/usr/bin/env python3
"""Verify a packed artifact: ZIP integrity + member alignment + GGUF parse.

Analog of llamafile's zipcheck (reference: llamafile/zipcheck.c — validates the
artifact's central directory and member alignment so weights mmap cleanly).

Usage: python tools/zipcheck.py artifact.llamafile [--alignment 4096]
"""
import argparse
import os
import struct
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--alignment", type=int, default=4096)
    args = ap.parse_args()

    try:
        zf = zipfile.ZipFile(args.path)
    except zipfile.BadZipFile as e:
        print(f"FAIL: not a valid zip: {e}")
        return 1
    bad = zf.testzip()
    if bad is not None:
        print(f"FAIL: corrupt member {bad}")
        return 1
    status = 0
    with open(args.path, "rb") as f:
        for info in zf.infolist():
            f.seek(info.header_offset)
            lh = struct.unpack("<IHHHHHIIIHH", f.read(30))
            data_off = info.header_offset + 30 + lh[9] + lh[10]
            aligned = data_off % args.alignment == 0
            stored = info.compress_type == zipfile.ZIP_STORED
            mark = "ok" if (stored and (aligned or not info.filename.endswith(".gguf"))) else "WARN"
            if mark != "ok" and info.filename.endswith(".gguf"):
                status = 1
            print(f"  {info.filename}: offset={data_off} stored={stored} "
                  f"aligned@{args.alignment}={aligned} [{mark}]")
            if info.filename.endswith(".gguf"):
                from llamafile_tpu.gguf import GGUFReader
                try:
                    r = GGUFReader(args.path)
                    print(f"    gguf: v{r.version}, {len(r.tensors)} tensors, "
                          f"arch={r.architecture}")
                    r.close()
                except Exception as e:
                    print(f"    gguf FAIL: {e}")
                    status = 1
    print("OK" if status == 0 else "FAILED")
    return status


if __name__ == "__main__":
    sys.exit(main())
