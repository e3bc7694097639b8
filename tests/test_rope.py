"""YaRN rope scaling: exact-formula checks vs a scalar reference.

Reference semantics: ggml rope_yarn / rope_yarn_ramp / ggml_rope_yarn_corr_dims
(upstream llama.cpp via llama.cpp.patch; llamafile runtime uses them for every
YaRN-extended model). The scalar reimplementation below is written from the
published formula, independent of the vectorized code under test.
"""
import math

import numpy as np
import pytest

from llamafile_tpu.models.llama import LlamaConfig, rope_cos_sin


def scalar_yarn(pos, i, head_dim, base, freq_scale, ext_factor, attn_factor,
                beta_fast, beta_slow, orig_ctx):
    """cos/sin for pair index i at position pos — straight from the formula."""
    theta_extrap = pos * base ** (-2.0 * i / head_dim)
    theta_interp = freq_scale * theta_extrap

    def corr_dim(n_rot):
        return (head_dim * math.log(orig_ctx / (n_rot * 2 * math.pi))
                / (2 * math.log(base)))

    low = max(0.0, math.floor(corr_dim(beta_fast)))
    high = min(head_dim - 1.0, math.ceil(corr_dim(beta_slow)))
    y = (i - low) / max(1e-3, high - low)
    ramp = 1.0 - min(1.0, max(0.0, y))
    mix = ramp * ext_factor
    theta = theta_interp * (1 - mix) + theta_extrap * mix
    mscale = attn_factor * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    return math.cos(theta) * mscale, math.sin(theta) * mscale


def _cfg(**kw):
    base = dict(n_layers=1, d_model=128, n_heads=2, n_kv_heads=2, d_ff=256,
                n_vocab=128, head_dim=64)
    base.update(kw)
    return LlamaConfig(**base)


def test_yarn_matches_scalar_reference():
    cfg = _cfg(rope_theta=10000.0, rope_scale=0.25, rope_yarn_ext=1.0,
               rope_yarn_attn=1.0, rope_yarn_orig_ctx=4096)
    import jax.numpy as jnp
    pos = jnp.asarray([0, 1, 100, 5000], jnp.int32)
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta, cfg.rope_scale,
                            cfg)
    cos, sin = np.asarray(cos), np.asarray(sin)
    for pi, p in enumerate([0, 1, 100, 5000]):
        for i in range(cfg.head_dim // 2):
            c, s = scalar_yarn(p, i, cfg.head_dim, cfg.rope_theta,
                               cfg.rope_scale, 1.0, 1.0, 32.0, 1.0, 4096)
            assert cos[pi, i] == pytest.approx(c, abs=2e-4), (p, i)
            assert sin[pi, i] == pytest.approx(s, abs=2e-4), (p, i)


def test_yarn_attn_factor_scales_magnitude():
    import jax.numpy as jnp
    cfg = _cfg(rope_scale=0.5, rope_yarn_ext=1.0, rope_yarn_attn=2.0,
               rope_yarn_orig_ctx=2048)
    cos, _ = rope_cos_sin(jnp.asarray([0]), cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scale, cfg)
    expected = 2.0 * (1.0 + 0.1 * math.log(2.0))
    assert float(cos[0, 0]) == pytest.approx(expected, rel=1e-5)


def test_yarn_off_is_linear_scaling():
    import jax.numpy as jnp
    cfg = _cfg(rope_scale=0.5)          # linear scaling, no yarn
    pos = jnp.asarray([37], jnp.int32)
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta, cfg.rope_scale,
                            cfg)
    half = cfg.head_dim // 2
    freqs = 10000.0 ** (-np.arange(half) / half)
    ang = 37 * 0.5 * freqs
    np.testing.assert_allclose(np.asarray(cos)[0], np.cos(ang), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sin)[0], np.sin(ang), atol=2e-6)


def test_from_gguf_yarn_metadata():
    class FakeReader:
        architecture = "llama"
        metadata = {"tokenizer.ggml.tokens": ["a"] * 64}

        def field(self, key, default=None):
            vals = {
                "llama.embedding_length": 128,
                "llama.attention.head_count": 2,
                "llama.block_count": 1,
                "llama.feed_forward_length": 256,
                "llama.rope.scaling.type": "yarn",
                "llama.rope.scaling.factor": 4.0,
                "llama.rope.scaling.original_context_length": 2048,
                "llama.context_length": 8192,
            }
            return vals.get(key.format(arch="llama"), default)

    cfg = LlamaConfig.from_gguf(FakeReader())
    assert cfg.rope_yarn_ext == 1.0
    assert cfg.rope_scale == 0.25
    assert cfg.rope_yarn_orig_ctx == 2048

    class LinearReader(FakeReader):
        def field(self, key, default=None):
            v = FakeReader.field(self, key, default)
            if key.endswith("scaling.type"):
                return "linear"
            return v

    cfg2 = LlamaConfig.from_gguf(LinearReader())
    assert cfg2.rope_yarn_ext == 0.0 and cfg2.rope_scale == 0.25
