"""GGUF reader/writer round-trip + ZIP (llamafile-style artifact) tests.

Mirrors the packaging layer behavior of llamafile_open_gguf + zipalign
(reference: llamafile/llamafile.c:61-264, zipalign.c:100).
"""
import zipfile

import numpy as np
import pytest

from llamafile_tpu.gguf import GGUFReader, GGUFWriter, pack_zip, quants


def _write_model(path, with_quant=True):
    w = GGUFWriter(str(path))
    w.add("general.architecture", "llama")
    w.add("general.name", "unit-test")
    w.add("llama.block_count", 2)
    w.add("llama.embedding_length", 64)
    w.add("llama.attention.head_count", 4)
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add("tokenizer.ggml.scores", [0.0, 0.0, -1.0])
    w.add("some.float", 3.5)
    w.add("some.bool", True)
    w.add("some.intarray", np.arange(5, dtype=np.int32))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((16, 32)).astype(np.float32)
    w.add_tensor_f32("tensor.f32", a)
    w.add_tensor_f16("tensor.f16", b)
    tensors = {"tensor.f32": a, "tensor.f16": b.astype(np.float16).astype(np.float32)}
    if with_quant:
        c = rng.standard_normal((4, 256)).astype(np.float32)
        raw = quants.quantize_q8_0(c)
        w.add_tensor("tensor.q8_0", (4, 256), "Q8_0", raw)
        tensors["tensor.q8_0"] = quants.dequant_q8_0(raw).reshape(4, 256)
        k = rng.standard_normal((2, 512)).astype(np.float32)
        rawk = quants.quantize_q4_k(k)
        w.add_tensor("tensor.q4_k", (2, 512), "Q4_K", rawk)
        tensors["tensor.q4_k"] = quants.dequant_q4_k(rawk).reshape(2, 512)
    w.write()
    return tensors


def test_roundtrip(tmp_path):
    path = tmp_path / "m.gguf"
    tensors = _write_model(path)
    with GGUFReader(str(path)) as r:
        assert r.version == 3
        assert r.architecture == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert r.metadata["some.float"] == pytest.approx(3.5)
        assert r.metadata["some.bool"] is True
        assert list(r.metadata["some.intarray"]) == [0, 1, 2, 3, 4]
        assert r.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello"]
        assert r.field("{arch}.embedding_length") == 64
        for name, want in tensors.items():
            got = r.tensor_f32(name)
            assert got.shape == want.shape, name
            np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=name)


def test_zip_artifact(tmp_path):
    gguf_path = tmp_path / "m.gguf"
    tensors = _write_model(gguf_path, with_quant=False)
    zpath = tmp_path / "m.llamafile"
    args = tmp_path / ".args"
    args.write_text("-m\nm.gguf\n")
    pack_zip(str(zpath), {"m.gguf": str(gguf_path), ".args": str(args)}, alignment=4096)
    # valid zip per stdlib
    zf = zipfile.ZipFile(str(zpath))
    assert zf.testzip() is None
    assert set(zf.namelist()) == {"m.gguf", ".args"}
    # reader opens the member straight out of the archive, data page-aligned
    with GGUFReader(str(zpath)) as r:
        assert r._base % 4096 == 0
        np.testing.assert_allclose(r.tensor_f32("tensor.f32"), tensors["tensor.f32"])


def test_alignment_of_tensor_data(tmp_path):
    path = tmp_path / "m.gguf"
    _write_model(path)
    with GGUFReader(str(path)) as r:
        for t in r.tensors.values():
            assert (t.offset - r.data_start) % r.alignment == 0


def test_zip64_artifact(tmp_path, monkeypatch):
    """ZIP64 path: force the threshold low and verify the archive parses with
    both stdlib zipfile and our reader (8B models are >4GiB in reality)."""
    import llamafile_tpu.gguf.writer as W
    gguf_path = tmp_path / "m.gguf"
    tensors = _write_model(gguf_path, with_quant=False)
    # exercise ZIP64 records without writing 4GiB: lower the cutoff
    monkeypatch.setattr(W, "_ZIP64_THRESHOLD", 1024)
    zpath = tmp_path / "m64.llamafile"
    W.pack_zip(str(zpath), {"m.gguf": str(gguf_path)}, alignment=4096)
    zf = zipfile.ZipFile(str(zpath))
    assert zf.testzip() is None
    info = zf.getinfo("m.gguf")
    assert info.file_size == gguf_path.stat().st_size
    with GGUFReader(str(zpath)) as r:
        np.testing.assert_allclose(r.tensor_f32("tensor.f32"),
                                   tensors["tensor.f32"])
