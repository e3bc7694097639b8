"""GGUF v3 writer — used by the quantize tool, converters, and test-model factories.

The reference gets this from upstream ggml's gguf API plus `zipalign` for packaging
(reference: llamafile/zipalign.c:100). We write plain .gguf files; `pack_zip` appends
the model into a ZIP with page-aligned stored members for the llamafile-style
single-artifact distribution.
"""
from __future__ import annotations

import struct
import zipfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .quants import TYPE_BY_NAME, type_size

GGUF_MAGIC = 0x46554747
T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL, T_STR, T_ARR, T_U64, T_I64, T_F64 = range(13)

ALIGNMENT = 32


def _pack_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _infer_type(v: Any) -> int:
    if isinstance(v, bool):
        return T_BOOL
    if isinstance(v, int):
        return T_I64 if (v < 0 or v >= 2 ** 32) else T_U32
    if isinstance(v, float):
        return T_F32
    if isinstance(v, str):
        return T_STR
    if isinstance(v, (list, tuple, np.ndarray)):
        return T_ARR
    raise TypeError(f"cannot infer gguf type for {type(v)}")


def _pack_value(v: Any, vtype: int) -> bytes:
    if vtype == T_BOOL:
        return struct.pack("<B", 1 if v else 0)
    if vtype == T_U32:
        return struct.pack("<I", v)
    if vtype == T_I32:
        return struct.pack("<i", v)
    if vtype == T_U64:
        return struct.pack("<Q", v)
    if vtype == T_I64:
        return struct.pack("<q", v)
    if vtype == T_F32:
        return struct.pack("<f", v)
    if vtype == T_STR:
        return _pack_str(v)
    if vtype == T_ARR:
        if isinstance(v, np.ndarray):
            etype = {np.dtype(np.int32): T_I32, np.dtype(np.uint32): T_U32,
                     np.dtype(np.float32): T_F32, np.dtype(np.int64): T_I64}[v.dtype]
            body = v.astype(v.dtype.newbyteorder("<")).tobytes()
            return struct.pack("<IQ", etype, len(v)) + body
        if len(v) and isinstance(v[0], str):
            return struct.pack("<IQ", T_STR, len(v)) + b"".join(_pack_str(s) for s in v)
        if len(v) and isinstance(v[0], float):
            return struct.pack("<IQ", T_F32, len(v)) + struct.pack(f"<{len(v)}f", *v)
        # default int array
        return struct.pack("<IQ", T_I32, len(v)) + struct.pack(f"<{len(v)}i", *v)
    raise TypeError(f"unsupported gguf value type {vtype}")


class GGUFWriter:
    def __init__(self, path: str):
        self.path = path
        self.metadata: List[Tuple[str, int, Any]] = []
        self.tensors: List[Tuple[str, Tuple[int, ...], int, bytes]] = []

    def add(self, key: str, value: Any, vtype: Optional[int] = None) -> None:
        self.metadata.append((key, _infer_type(value) if vtype is None else vtype, value))

    def add_tensor(self, name: str, shape: Sequence[int], type_name: str, raw: np.ndarray) -> None:
        """shape in numpy convention (row-major); raw = packed block bytes (uint8)."""
        spec = TYPE_BY_NAME[type_name]
        n = int(np.prod(shape))
        raw = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
        expect = type_size(n, spec)
        assert raw.nbytes == expect, (name, raw.nbytes, expect)
        self.tensors.append((name, tuple(shape), spec.type_id, raw.tobytes()))

    def add_tensor_f32(self, name: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        self.tensors.append((name, arr.shape, TYPE_BY_NAME["F32"].type_id, arr.tobytes()))

    def add_tensor_f16(self, name: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr, dtype=np.float16)
        self.tensors.append((name, arr.shape, TYPE_BY_NAME["F16"].type_id, arr.tobytes()))

    def write(self) -> None:
        out = bytearray()
        out += struct.pack("<IIQQ", GGUF_MAGIC, 3, len(self.tensors), len(self.metadata))
        for key, vtype, value in self.metadata:
            out += _pack_str(key) + struct.pack("<I", vtype) + _pack_value(value, vtype)
        offset = 0
        offsets = []
        for name, shape, type_id, raw in self.tensors:
            ne = tuple(reversed(shape))          # GGUF stores innermost-first
            out += _pack_str(name) + struct.pack("<I", len(ne))
            out += struct.pack(f"<{len(ne)}Q", *ne)
            out += struct.pack("<IQ", type_id, offset)
            offsets.append(offset)
            offset += (len(raw) + ALIGNMENT - 1) // ALIGNMENT * ALIGNMENT
        pad = (-len(out)) % ALIGNMENT
        out += b"\x00" * pad
        for (_, _, _, raw), off in zip(self.tensors, offsets):
            assert len(out) % ALIGNMENT == 0
            out += raw
            out += b"\x00" * ((-len(raw)) % ALIGNMENT)
        with open(self.path, "wb") as f:
            f.write(bytes(out))


def pack_zip(zip_path: str, members: Dict[str, str], alignment: int = 4096) -> None:
    """zipalign analog: store files uncompressed in a ZIP with member data aligned.

    Alignment is achieved by padding the local-header extra field so that each
    member's data begins on an `alignment` boundary (reference rationale:
    docs/technical_details.md:12-23 — mmap-able weights inside the artifact).
    """
    with open(zip_path, "wb") as f:
        central = []
        for name, src in members.items():
            data = open(src, "rb").read()
            nameb = name.encode()
            header_off = f.tell()
            data_off_nopad = header_off + 30 + len(nameb)
            pad = (-data_off_nopad - 4) % alignment  # 4 bytes extra-field header
            extra = struct.pack("<HH", 0x7065, pad) + b"\x00" * pad  # 'ep' padding field
            crc = zipfile.crc32(data) & 0xFFFFFFFF
            lh = struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0, 0, 0, 0,
                             crc, len(data), len(data), len(nameb), len(extra))
            f.write(lh + nameb + extra)
            assert f.tell() % alignment == 0
            f.write(data)
            central.append((nameb, extra, crc, len(data), header_off))
        cd_start = f.tell()
        for nameb, extra, crc, sz, header_off in central:
            cd = struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, 0, 0, 0,
                             crc, sz, sz, len(nameb), 0, 0, 0, 0, 0, header_off)
            f.write(cd + nameb)
        cd_size = f.tell() - cd_start
        eocd = struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(central), len(central),
                           cd_size, cd_start, 0)
        f.write(eocd)
