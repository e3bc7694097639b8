"""phi3-style GGUF loading: pre-fused attn_qkv / gate|up wire tensors.

Reference loader coverage (upstream llama.cpp build_phi3 reached through
llama.cpp.patch): phi3 GGUFs carry `blk.N.attn_qkv.weight` ([nq+2nkv, d]) and
a fused `blk.N.ffn_up.weight` ([2*d_ff, d], gate rows first). The fused fast
path consumes them directly; the unfused (TP) path splits by exact column
slices — both must agree with a reference llama GGUF holding the same
weights split."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from llamafile_tpu.gguf import GGUFWriter
from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from tests.util_models import byte_vocab


def _write(path, arch_phi3: bool, tensors, meta):
    tokens, scores, token_type = byte_vocab()
    w = GGUFWriter(path)
    arch = "phi3" if arch_phi3 else "llama"
    w.add("general.architecture", arch)
    for key, val in meta.items():
        w.add(f"{arch}.{key}", val)
    w.add(f"{arch}.vocab_size", len(tokens))
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", np.asarray(token_type, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    for name, arr in tensors.items():
        w.add_tensor_f32(name, arr)
    w.write()


@pytest.mark.parametrize("fuse", [True, False])
def test_phi3_fused_wire_tensors_match_split(tmp_path, fuse):
    rng = np.random.default_rng(0)
    d, heads, kvh, dff, L = 64, 4, 2, 96, 2
    hd = d // heads
    nq, nkv = heads * hd, kvh * hd
    meta = {"block_count": L, "embedding_length": d,
            "attention.head_count": heads, "attention.head_count_kv": kvh,
            "feed_forward_length": dff, "rope.freq_base": 10000.0,
            "attention.layer_norm_rms_epsilon": 1e-5, "context_length": 256}
    common = {
        "token_embd.weight": rng.standard_normal((266, d)).astype(np.float32) * .05,
        "output_norm.weight": np.ones(d, np.float32),
        "output.weight": rng.standard_normal((266, d)).astype(np.float32) * .05,
    }
    split, fused = dict(common), dict(common)
    for i in range(L):
        p = f"blk.{i}."
        q = rng.standard_normal((nq, d)).astype(np.float32) * .05
        k = rng.standard_normal((nkv, d)).astype(np.float32) * .05
        v = rng.standard_normal((nkv, d)).astype(np.float32) * .05
        g = rng.standard_normal((dff, d)).astype(np.float32) * .05
        u = rng.standard_normal((dff, d)).astype(np.float32) * .05
        dn = rng.standard_normal((d, dff)).astype(np.float32) * .05
        o = rng.standard_normal((d, d)).astype(np.float32) * .05
        for t in (split, fused):
            t[p + "attn_norm.weight"] = np.ones(d, np.float32)
            t[p + "ffn_norm.weight"] = np.ones(d, np.float32)
            t[p + "attn_output.weight"] = o
            t[p + "ffn_down.weight"] = dn
        split[p + "attn_q.weight"] = q
        split[p + "attn_k.weight"] = k
        split[p + "attn_v.weight"] = v
        split[p + "ffn_gate.weight"] = g
        split[p + "ffn_up.weight"] = u
        fused[p + "attn_qkv.weight"] = np.concatenate([q, k, v], axis=0)
        fused[p + "ffn_up.weight"] = np.concatenate([g, u], axis=0)

    p_ref = str(tmp_path / "ref.gguf")
    p_phi = str(tmp_path / "phi3.gguf")
    _write(p_ref, False, split, meta)
    _write(p_phi, True, fused, meta)

    # llama ref with NEOX rope to match phi3's mode: compare via phi3 config
    cfg_p, params_p, _t, _ = load_llama(p_phi, fuse=fuse)
    assert cfg_p.rope_neox
    cfg_r, params_r, _t2, _ = load_llama(p_ref, fuse=False)
    toks = jnp.asarray([[3, 7, 11, 13]], jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    import dataclasses
    cfg_r = dataclasses.replace(cfg_r, rope_neox=True)
    ref, _ = forward(params_r, cfg_r, toks, pos, init_cache(cfg_r, 1, 32))
    got, _ = forward(params_p, cfg_p, toks, pos, init_cache(cfg_p, 1, 32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)
