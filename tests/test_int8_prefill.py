"""int8-MXU prefill path (two-level scheme, docs/prefill_analysis.md §2):
the attached int8-g256 companion must produce matmuls close to the base
quantized tensor's own dequant result, and a full prefill forward through
int8_prefill_params must track the planes-kernel forward."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.ops import qmatmul as QM
from llamafile_tpu.ops.repack import attach_int8_prefill, I8PQTensor


def _rand_qt(n, k, quant="Q4_K", seed=0):
    from llamafile_tpu.models.synthetic import _rand_qtensor
    rng = np.random.default_rng(seed)
    return _rand_qtensor(rng, n, k, quant)


@pytest.mark.parametrize("quant", ["Q4_K", "Q8_0"])
def test_i8p_matmul_matches_base_dequant(quant):
    n, k, m = 512, 512, 64
    qt = _rand_qt(n, k, quant)
    i8 = attach_int8_prefill(qt)
    assert isinstance(i8, I8PQTensor) and i8.qs8 is not None
    assert i8.qs is qt.qs                      # base leaves shared
    x = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)),
                    jnp.float32)
    ref = np.asarray(QM.qmatmul_fallback(x, qt))
    got = np.asarray(QM.qmatmul(x, i8))
    assert got.shape == ref.shape
    # two int8 requantizations (weights to g256, activations per row-group)
    # on top of the base quant: relative error stays small vs output scale
    scale = np.abs(ref).max() + 1e-6
    rel = np.abs(got - ref).max() / scale
    assert rel < 2e-2, rel


def test_i8p_small_m_keeps_base_path():
    qt = _rand_qt(512, 512)
    i8 = attach_int8_prefill(qt)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 512)),
                    jnp.float32)
    # M=1 decode must NOT take the int8 prefill kernel (companion unused)
    y1 = np.asarray(QM.qmatmul(x, i8))
    y2 = np.asarray(QM.qmatmul(x, qt))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)


def test_i8p_full_prefill_forward(tmp_path):
    from llamafile_tpu.models.llama import (forward, init_cache,
                                            int8_prefill_params)
    from llamafile_tpu.models.loader import load_llama
    from tests.util_models import make_tiny_llama_gguf
    p = str(tmp_path / "m.gguf")
    # dims multiples of 256 so every matmul takes the i8p path
    make_tiny_llama_gguf(p, d_model=512, n_layers=2, n_heads=4,
                         n_kv_heads=4, d_ff=512, quant="Q4_K")
    cfg, params, _tok, _ = load_llama(p, fuse=True)
    toks = jnp.asarray(np.random.default_rng(3).integers(
        3, 250, size=(1, 64)), jnp.int32)
    last = jnp.asarray([63], jnp.int32)
    cache = init_cache(cfg, 1, 64)
    base, _ = forward(params, cfg, toks, jnp.zeros((1,), jnp.int32), cache,
                      fresh_prefill=True, last_idx=last)
    i8params = int8_prefill_params(params)
    got, _ = forward(i8params, cfg, toks, jnp.zeros((1,), jnp.int32),
                     init_cache(cfg, 1, 64), fresh_prefill=True,
                     last_idx=last)
    b = np.asarray(base)
    g = np.asarray(got)
    scale = np.abs(b).max() + 1e-6
    assert np.abs(g - b).max() / scale < 5e-2
    # logits must rank-agree at the top (quality gate measures NLL impact
    # at model scale; this pins plumbing-level sanity)
    assert (b.argmax(-1) == g.argmax(-1)).mean() > 0.9


def test_i8p_stacked_forward_matches_unrolled(tmp_path):
    """Layer-stacked i8p (scalar-prefetch weight indexing — the serving
    engine's layout after stack_layers) must match the unrolled i8p path."""
    from llamafile_tpu.models.llama import (forward, init_cache,
                                            int8_prefill_params,
                                            stack_layers)
    from llamafile_tpu.models.loader import load_llama
    from tests.util_models import make_tiny_llama_gguf
    p = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(p, d_model=512, n_layers=2, n_heads=4,
                         n_kv_heads=4, d_ff=512, quant="Q4_K")
    cfg, params, _tok, _ = load_llama(p, fuse=True)
    i8params = int8_prefill_params(params)
    st = stack_layers(i8params)
    assert not isinstance(st.layers, list)          # actually stacked
    assert st.layers.wqkv.qs8.ndim == 3             # companion stacked too
    toks = jnp.asarray(np.random.default_rng(5).integers(
        3, 250, size=(1, 64)), jnp.int32)
    last = jnp.asarray([63], jnp.int32)
    ur, _ = forward(i8params, cfg, toks, jnp.zeros((1,), jnp.int32),
                    init_cache(cfg, 1, 64), fresh_prefill=True,
                    last_idx=last)
    stk, _ = forward(st, cfg, toks, jnp.zeros((1,), jnp.int32),
                     init_cache(cfg, 1, 64), fresh_prefill=True,
                     last_idx=last)
    # scan-vs-unrolled f32 op ordering moves logits ~1e-2; a wrong-layer
    # index would produce uncorrelated values, which this still catches
    np.testing.assert_allclose(np.asarray(stk), np.asarray(ur),
                               rtol=2e-2, atol=2e-2)
