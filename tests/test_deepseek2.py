"""DeepSeek-V2 (MLA + fine-grained MoE): converter round-trip + transformers
logit parity.

MLA is decompressed to MHA at the cache (the reference's pinned llama.cpp
build_deepseek2 caches full roped K / full V the same way); qk heads are
nope+rope wide while V heads are v_head_dim wide. The MoE has leading dense
blocks, unconditional shared experts, and a routed_scaling_factor."""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _make(tmp_path, **kw):
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=24,
        kv_lora_rank=32, n_routed_experts=4, num_experts_per_tok=2,
        n_shared_experts=1, first_k_dense_replace=1, topk_method="greedy",
        norm_topk_prob=False, routed_scaling_factor=2.0,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False, **kw)
    torch.manual_seed(0)
    model = transformers.DeepseekV2ForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d),
                        str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    return model, str(out)


def _parity(model, gguf_path, ids):
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(gguf_path)
    cache = init_cache(cfg, 1, 16)
    got, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    # tiny random models produce near-ties; f16 storage may flip one argmax
    agree = (want.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.8, agree
    return cfg


def test_deepseek2_lite_parity(tmp_path):
    """V2-Lite style: direct q projection (q_lora_rank unset)."""
    model, gguf = _make(tmp_path, q_lora_rank=None)
    cfg = _parity(model, gguf, [[3, 17, 42, 99, 7]])
    assert cfg.kv_lora_rank == 32 and cfg.v_head_dim == 24
    assert cfg.head_dim == 48 and cfg.rope_dim == 16
    assert cfg.n_dense_layers == 1 and cfg.n_shared_experts == 1
    assert cfg.expert_weights_scale == 2.0 and not cfg.moe_norm_topk


def test_deepseek2_qlora_parity(tmp_path):
    """Full V2 style: rank-compressed q (q_a/q_b + q_a_layernorm)."""
    model, gguf = _make(tmp_path, q_lora_rank=24)
    cfg = _parity(model, gguf, [[5, 9, 200, 43, 1]])
    assert cfg.q_lora_rank == 24


def test_deepseek2_decode_matches_prefill(tmp_path):
    """Token-by-token decode through the MLA cache == one-shot prefill."""
    model, gguf = _make(tmp_path, q_lora_rank=None)
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    cfg, params, _, _ = load_llama(gguf)
    ids = [3, 17, 42, 99, 7]
    cache = init_cache(cfg, 1, 16)
    lp, _ = forward(params, cfg, jnp.asarray([ids]), jnp.asarray([0]), cache)
    cache = init_cache(cfg, 1, 16)
    for t, tid in enumerate(ids):
        ld, cache = forward(params, cfg, jnp.asarray([[tid]]),
                            jnp.asarray([t]), cache)
    np.testing.assert_allclose(np.asarray(lp[0, -1]), np.asarray(ld[0, -1]),
                               rtol=2e-2, atol=2e-2)
