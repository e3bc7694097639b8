"""Qwen MoE families: qwen2moe (shared expert, raw router weights) and
qwen3moe (q/k norms, normalized top-k) — converter round-trip + transformers
logit parity.

Reference: upstream llama.cpp build_qwen2moe/build_qwen3moe (inherited by the
llamafile runtime); qwen2moe's defining features are the always-on
sigmoid-gated shared expert and NO top-k renormalization.
"""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _convert(hf_dir, out):
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(hf_dir),
                        str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]


def _parity(model, gguf_path, ids):
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(str(gguf_path))
    cache = init_cache(cfg, 1, 16)
    got, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    assert np.array_equal(want.argmax(-1), got.argmax(-1))
    return cfg


def test_qwen2moe_parity(tmp_path):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=128, norm_topk_prob=False,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.Qwen2MoeForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    _convert(d, out)
    lcfg = _parity(model, out, [[3, 17, 42, 99, 7]])
    assert lcfg.n_experts == 4 and not lcfg.moe_norm_topk
    assert lcfg.attn_qkv_bias


def test_qwen3moe_parity(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=128, norm_topk_prob=True,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    _convert(d, out)
    lcfg = _parity(model, out, [[5, 9, 200, 43, 1]])
    assert lcfg.n_experts == 4 and lcfg.moe_norm_topk and lcfg.qk_norm
