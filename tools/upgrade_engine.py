#!/usr/bin/env python3
"""Swap the engine inside a packed artifact, keeping the weights.

Analog of build/llamafile-upgrade-engine (SURVEY.md §2.8): a .llamafile-style
ZIP carries weights (.gguf) + config (.args); this re-packs those members with
page alignment so a newer runtime can keep using the same artifact.

Usage: python tools/upgrade_engine.py old.llamafile new.llamafile
"""
import os
import sys
import tempfile
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 1
    src, dst = sys.argv[1], sys.argv[2]
    from llamafile_tpu.gguf import pack_zip
    zf = zipfile.ZipFile(src)
    with tempfile.TemporaryDirectory() as td:
        members = {}
        for info in zf.infolist():
            path = os.path.join(td, os.path.basename(info.filename) or "member")
            with open(path, "wb") as f:
                f.write(zf.read(info))
            members[info.filename] = path
        pack_zip(dst, members)
    print(f"repacked {len(members)} members -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
