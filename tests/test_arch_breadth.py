"""Arch breadth round 3: gpt2 (learned positions), mpt (ALiBi), dbrx
(LN + clamped QKV + MoE), olmoe (full-width q/k norms + raw-topk MoE) —
converter round-trip + transformers logit parity.

Reference: upstream llama.cpp build_gpt2 / build_mpt / build_dbrx /
build_olmoe (arch registry, SURVEY §2.4; VERDICT r2 next #10).
"""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _convert_and_check(model, tmp_path, ids, decode_check=True):
    model.eval()      # gpt2/mpt default dropout > 0, unlike the llama family
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d),
                        str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(str(out))
    cache = init_cache(cfg, 1, 16)
    got, cache = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]),
                         cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    agree = (want.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.8, agree
    if decode_check:
        # one DECODE step (t=1, non-fresh path — exercises the alibi/no-rope
        # cached-attention branch) must match HF too
        nxt = [[int(want[-1].argmax())]]
        with torch.no_grad():
            w2 = model(torch.tensor(ids + nxt if False else
                                    [ids[0] + nxt[0]])).logits[0, -1]
        g2, _ = forward(params, cfg, jnp.asarray(nxt, jnp.int32),
                        jnp.asarray([len(ids[0])]), cache)
        corr = np.corrcoef(w2.float().numpy(),
                           np.asarray(g2[0, 0], np.float64))[0, 1]
        assert corr > 0.999, corr
    return cfg


def test_gpt2_parity(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        n_inner=None, tie_word_embeddings=False)
    torch.manual_seed(0)
    lcfg = _convert_and_check(transformers.GPT2LMHeadModel(cfg), tmp_path,
                              [[3, 17, 42, 99, 7]])
    assert lcfg.no_rope and lcfg.norm_type == "ln" and lcfg.gelu_approx


def test_mpt_alibi_parity(tmp_path):
    cfg = transformers.MptConfig(
        vocab_size=256, d_model=64, n_layers=2, n_heads=4, max_seq_len=128,
        expansion_ratio=2,
        attn_config=transformers.models.mpt.configuration_mpt
        .MptAttentionConfig(alibi=True, alibi_bias_max=8, clip_qkv=None),
        no_bias=True, tie_word_embeddings=True)
    torch.manual_seed(1)
    lcfg = _convert_and_check(transformers.MptForCausalLM(cfg), tmp_path,
                              [[5, 9, 200, 31, 77]])
    assert lcfg.alibi and lcfg.no_rope


def test_dbrx_parity(tmp_path):
    from transformers import DbrxConfig
    cfg = DbrxConfig(
        vocab_size=256, d_model=64, n_heads=4, n_layers=2, max_seq_len=128,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0, "rope_theta": 10000},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                    "moe_top_k": 2},
        tie_word_embeddings=False)
    torch.manual_seed(2)
    lcfg = _convert_and_check(transformers.DbrxForCausalLM(cfg), tmp_path,
                              [[8, 30, 90, 111, 2]])
    assert lcfg.n_experts == 4 and lcfg.clamp_qkv == 8.0
    assert lcfg.norm_type == "ln" and lcfg.rope_neox


def test_olmoe_parity(tmp_path):
    cfg = transformers.OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(3)
    lcfg = _convert_and_check(transformers.OlmoeForCausalLM(cfg), tmp_path,
                              [[4, 40, 77, 202, 13]])
    assert lcfg.qk_norm_flat and not lcfg.moe_norm_topk


def test_alibi_slopes_reference_values():
    from llamafile_tpu.models.llama import alibi_slopes
    s = alibi_slopes(8)
    np.testing.assert_allclose(
        s, [2 ** -1, 2 ** -2, 2 ** -3, 2 ** -4, 2 ** -5, 2 ** -6, 2 ** -7,
            2 ** -8], rtol=1e-6)
    s12 = alibi_slopes(12)
    assert len(s12) == 12 and (s12 > 0).all()
    # extras interleave from the 2n schedule (Press et al. formula)
    np.testing.assert_allclose(s12[8:], [2 ** -0.5, 2 ** -1.5, 2 ** -2.5,
                                         2 ** -3.5], rtol=1e-6)
