"""gemma2 / gemma3 / qwen3 / granite parity vs transformers.

Same strategy as test_convert_hf.py: build a tiny real HF checkpoint,
convert through tools/convert_hf.py, and require logits parity through the
whole stack. These archs exercise the round-2 feature set: sliding-window
attention (per-layer), attn/final softcaps, sandwich norms, per-head q/k
norms, SWA-specific rope base, and granite's scale multipliers.

Reference: llama.cpp.patch build_gemma3 (:2036), hparams (:1237-1268),
build_qwen3, LLM_ARCH_GRANITE handling.
"""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _roundtrip(tmp_path, cfg_cls, model_cls, name, **cfg_kw):
    d = tmp_path / name
    cfg = cfg_cls(**cfg_kw)
    torch.manual_seed(0)
    model = model_cls(cfg)
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / f"{name}.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d),
                       str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    return model, str(out)


def _check_parity(model, gguf_path, ids, min_corr=0.999, decode_check=True):
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0].float().numpy()

    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache, stack_layers
    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(gguf_path)
    cache = init_cache(cfg, 1, 32)
    got, _ = forward(params, cfg, jnp.asarray([ids]), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids)):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > min_corr, (t, corr)
    assert np.array_equal(want.argmax(-1), got.argmax(-1))

    if decode_check:
        # token-by-token through the STACKED scan (traced per-layer window /
        # rope selection) must agree with the full-prompt forward
        sp = stack_layers(params)
        c = init_cache(cfg, 1, 32)
        for t, tok_id in enumerate(ids):
            dlog, c = forward(sp, cfg, jnp.asarray([[tok_id]]),
                              jnp.asarray([t]), c)
        corr = np.corrcoef(want[-1], np.asarray(dlog[0, 0], np.float64))[0, 1]
        assert corr > min_corr, ("decode", corr)


def test_gemma2_parity(tmp_path):
    # window 8 < prompt length: the sliding mask must actually bite, and
    # softcaps + sandwich norms are on by default
    model, gguf = _roundtrip(
        tmp_path, transformers.Gemma2Config, transformers.Gemma2ForCausalLM,
        "g2", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, sliding_window=8, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0)
    ids = [3, 17, 42, 99, 7, 5, 23, 88, 101, 14, 60, 2]
    _check_parity(model, gguf, ids)


def test_gemma3_parity(tmp_path):
    # 6 layers: l=0..4 SWA (rope base 10k), l=5 global (configured base)
    model, gguf = _roundtrip(
        tmp_path, transformers.Gemma3TextConfig,
        transformers.Gemma3ForCausalLM,
        "g3", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=50000.0, rope_local_base_freq=10000.0, sliding_window=8,
        query_pre_attn_scalar=16)
    ids = [3, 17, 42, 99, 7, 5, 23, 88, 101, 14, 60, 2]
    _check_parity(model, gguf, ids)


def test_qwen3_parity(tmp_path):
    model, gguf = _roundtrip(
        tmp_path, transformers.Qwen3Config, transformers.Qwen3ForCausalLM,
        "q3", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False)
    ids = [3, 17, 42, 99, 7]
    _check_parity(model, gguf, ids)


def test_granite_parity(tmp_path):
    model, gguf = _roundtrip(
        tmp_path, transformers.GraniteConfig, transformers.GraniteForCausalLM,
        "gr", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, embedding_multiplier=6.0,
        residual_multiplier=0.5, logits_scaling=8.0,
        attention_multiplier=0.25)
    ids = [3, 17, 42, 99, 7]
    _check_parity(model, gguf, ids)


def test_sliding_window_mask_semantics():
    """attention() window mask: key j visible iff pos+t-window < j <= pos+t,
    checked against a dense numpy softmax reference."""
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import attention
    rng = np.random.default_rng(0)
    b, t, hq, hkv, dh, s = 1, 4, 2, 1, 8, 16
    q = rng.standard_normal((b, t, hq, dh)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, dh)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, dh)).astype(np.float32)
    pos, win, scale = 6, 3, 0.35
    out = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray([pos]), jnp.arange(t), scale,
                               window=win))
    for tt in range(t):
        lim = pos + tt
        vis = [j for j in range(s) if j <= lim and j > lim - win]
        for h in range(hq):
            sc = np.array([q[0, tt, h] @ k[0, j, 0] * scale for j in vis])
            p = np.exp(sc - sc.max()); p /= p.sum()
            ref = (p[:, None] * v[0, vis, 0]).sum(0)
            np.testing.assert_allclose(out[0, tt, h], ref, rtol=1e-4,
                                       atol=1e-4)
