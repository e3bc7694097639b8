"""LLaVA multimodal path: mmproj GGUF -> vision tower -> image atoms ->
prefill -> generation, including the server's private-row multimodal decode.

Reference: llava_clip.cpp.patch (clip.cpp ViT + mlp projector) and
slot.cpp eval_image (image embeddings as embd batches).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

from llamafile_tpu.gguf import GGUFWriter
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.runtime.atoms import image_atom
from llamafile_tpu.runtime.engine import Engine
from tests.util_models import make_tiny_llama_gguf


def make_tiny_mmproj(path, d=32, layers=2, heads=2, dff=64, proj=64,
                     img=28, patch=14):
    rng = np.random.default_rng(0)
    w = GGUFWriter(str(path))
    w.add("clip.vision.image_size", img)
    w.add("clip.vision.patch_size", patch)
    w.add("clip.vision.embedding_length", d)
    w.add("clip.vision.block_count", layers)
    w.add("clip.vision.attention.head_count", heads)
    w.add("clip.vision.feed_forward_length", dff)
    w.add("clip.vision.projection_dim", proj)
    w.add("clip.projector_type", "mlp")

    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    n_patch = (img // patch) ** 2
    w.add_tensor_f32("v.patch_embd.weight", r(d, 3, patch, patch))
    w.add_tensor_f32("v.class_embd", r(d))
    w.add_tensor_f32("v.position_embd.weight", r(1 + n_patch, d))
    for i in range(layers):
        p = f"v.blk.{i}."
        for n, shape in (("ln1", (d,)), ("ln2", (d,))):
            w.add_tensor_f32(p + n + ".weight", np.ones(d, np.float32))
            w.add_tensor_f32(p + n + ".bias", np.zeros(d, np.float32))
        for n in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor_f32(p + n + ".weight", r(d, d))
            w.add_tensor_f32(p + n + ".bias", r(d))
        w.add_tensor_f32(p + "ffn_down.weight", r(dff, d))   # clip.cpp fc1
        w.add_tensor_f32(p + "ffn_down.bias", r(dff))
        w.add_tensor_f32(p + "ffn_up.weight", r(d, dff))     # fc2
        w.add_tensor_f32(p + "ffn_up.bias", r(d))
    w.add_tensor_f32("mm.0.weight", r(proj, d))
    w.add_tensor_f32("mm.0.bias", r(proj))
    w.add_tensor_f32("mm.2.weight", r(proj, proj))
    w.add_tensor_f32("mm.2.bias", r(proj))
    w.write()
    return str(path)


@pytest.fixture(scope="module")
def llava(tmp_path_factory):
    d = tmp_path_factory.mktemp("mm")
    llm = str(d / "llm.gguf")
    make_tiny_llama_gguf(llm)                 # d_model=64 matches proj_dim
    mm = make_tiny_mmproj(d / "mmproj.gguf")
    return llm, mm


def test_vision_tower_and_atoms(llava):
    llm, mm = llava
    from llamafile_tpu.models.clip import LlavaEncoder
    enc = LlavaEncoder(mm)
    img = (np.random.default_rng(1).random((40, 40, 3)) * 255).astype(np.uint8)
    emb = enc.embed(img)
    assert emb.shape == (4, 64) and np.isfinite(emb).all()
    cfg, params, tok, _ = load_llama(llm)
    eng = Engine(cfg, params, tok, max_seq_len=96)
    atoms = [3, 5] + [image_atom(emb)] + [7, 9]
    cache = eng.new_cache()
    last, cache, n = eng.prefill_atoms(cache, atoms)
    assert n == 8                              # 4 text + 4 image positions
    assert np.isfinite(np.asarray(last)).all()


def test_server_multimodal_generation(llava):
    """The server's private-row multimodal decode (atoms bypass the batcher):
    regression for the _decode_scan unpacking after the mirostat change."""
    llm, mm = llava
    from llamafile_tpu.models.clip import LlavaEncoder
    from llamafile_tpu.server.http import Server
    from llamafile_tpu.utils.flags import Flags
    from llamafile_tpu.runtime.sampling import SamplingParams
    srv = Server(Flags(model=llm, mmproj=mm, ctx_size=96))
    try:
        enc = srv.llava()
        assert enc is not None
        img = (np.random.default_rng(2).random((30, 30, 3)) * 255
               ).astype(np.uint8)
        atoms = [3, 5, image_atom(enc.embed(img)), 7]
        out = srv._generate_multimodal_sync(
            atoms, SamplingParams(temperature=0.0), 6, [], lambda p: None)
        assert out["completion_tokens"] >= 1
        assert isinstance(out["text"], str)
    finally:
        srv.batcher.shutdown()


def test_cli_image_flag(llava, tmp_path, monkeypatch, capsys):
    """--image on the CLI (reference llava CLI surface)."""
    llm, mm = llava
    from PIL import Image
    imgp = str(tmp_path / "i.png")
    Image.fromarray((np.random.default_rng(3).random((32, 32, 3)) * 255
                     ).astype(np.uint8)).save(imgp)
    import sys
    from llamafile_tpu.cli import main
    monkeypatch.setattr(sys, "argv", [
        "cli", "--cli", "-m", llm, "--mmproj", mm, "--image", imgp,
        "-p", "describe", "-n", "3"])
    assert main() == 0
    assert len(capsys.readouterr().out) > 0
