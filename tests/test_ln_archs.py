"""LayerNorm-family architectures (gptneox/pythia, starcoder2): affine LN +
biases, gateless GELU FFN, parallel residual, partial rotary — converter
round-trip + transformers logit parity.

Reference: upstream llama.cpp build_gptneox / build_starcoder2 (inherited by
the llamafile runtime's arch registry)."""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _convert_and_check(model, hf_dir, tmp_path, ids):
    out = tmp_path / "m.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(hf_dir),
                        str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(str(out))
    cache = init_cache(cfg, 1, 16)
    got, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    assert np.array_equal(want.argmax(-1), got.argmax(-1))
    return cfg


@pytest.mark.parametrize("parallel", [True, False])
def test_gptneox_parity(tmp_path, parallel):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=parallel, max_position_embeddings=128,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.GPTNeoXForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    lcfg = _convert_and_check(model, d, tmp_path, [[3, 17, 42, 99, 7]])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual == parallel
    assert lcfg.rope_dim == 4      # rotary_pct 0.25 of head_dim 16


@pytest.mark.parametrize("new_arch", [False, True])
def test_falcon_parity(tmp_path, new_arch):
    """Falcon: parallel residual with a single shared LN (7b style) or the
    new decoder architecture's grouped-QKV + dual norms (40b style)."""
    kw = dict(new_decoder_architecture=new_arch)
    if new_arch:
        kw["num_kv_heads"] = 2
    else:
        kw["multi_query"] = True
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, parallel_attn=True, bias=False, alibi=False,
        max_position_embeddings=128, layer_norm_epsilon=1e-5,
        tie_word_embeddings=False, **kw)
    torch.manual_seed(3)
    model = transformers.FalconForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    lcfg = _convert_and_check(model, d, tmp_path, [[4, 40, 77, 202, 13]])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual
    assert lcfg.n_kv_heads == (2 if new_arch else 1)


def test_cohere_parity(tmp_path):
    """Cohere command-r: biasless LayerNorm, ONE shared input norm feeding
    parallel attention+SwiGLU branches, multiplied logit_scale, interleaved
    rope (no converter permute)."""
    cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, layer_norm_eps=1e-5, logit_scale=0.25,
        use_qk_norm=False, tie_word_embeddings=True)
    torch.manual_seed(2)
    model = transformers.CohereForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    lcfg = _convert_and_check(model, d, tmp_path, [[7, 30, 99, 2, 150]])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual
    assert abs(lcfg.logit_scale - 4.0) < 1e-6


def test_glm4_parity(tmp_path):
    """GLM4: sandwich RMS norms (no +1), fused gate_up wire, qkv biases,
    partial interleaved rope, configurable head_dim."""
    cfg = transformers.Glm4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, pad_token_id=0,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(5)
    model = transformers.Glm4ForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    lcfg = _convert_and_check(model, d, tmp_path, [[9, 33, 120, 7, 61]])
    assert lcfg.post_norms and not lcfg.norm_plus_one
    assert lcfg.rope_dim == 8 and not lcfg.rope_neox


def test_phi2_parity(tmp_path):
    """phi-2: affine LN, single shared norm feeding parallel attention +
    gateless-GELU branches, partial rotary, biases incl. the lm head."""
    cfg = transformers.PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(4)
    model = transformers.PhiForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    lcfg = _convert_and_check(model, d, tmp_path, [[6, 21, 88, 150, 3]])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual
    assert lcfg.rope_dim == 8      # partial_rotary_factor 0.5 of head_dim 16


def test_starcoder2_parity(tmp_path):
    cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, norm_epsilon=1e-5, use_bias=True,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.Starcoder2ForCausalLM(cfg)
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    lcfg = _convert_and_check(model, d, tmp_path, [[5, 9, 200, 43, 1]])
    assert lcfg.norm_type == "ln" and not lcfg.parallel_residual
    assert lcfg.ffn_gelu              # gelu_pytorch_tanh
