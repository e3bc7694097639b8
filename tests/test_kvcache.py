"""INT8 KV cache tests: quantization round-trip + end-to-end decode parity."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.runtime import kvcache as KV
from tests.util_models import make_tiny_llama_gguf


def test_quant_rows_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 7, 2, 64)),
                    jnp.float32)
    q, s = KV._quant_rows(x)
    back = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(back - x)).max() / np.abs(np.asarray(x)).max()
    assert err < 0.02


def test_init_kv_int8_shapes():
    c = KV.init_kv(2, 1, 16, 4, 64, jnp.int8)
    assert c.quantized and c.k.dtype == jnp.int8
    assert c.k_scale.shape == (2, 1, 16, 4)
    c2 = KV.init_kv(2, 1, 16, 4, 64)
    assert not c2.quantized and c2.k_scale is None


def test_int8_kv_decode_parity(tmp_path):
    """Generation with int8 KV must closely track bf16-KV logits."""
    path = tmp_path / "t.gguf"
    make_tiny_llama_gguf(str(path), d_model=128, n_layers=2, n_heads=4,
                         n_kv_heads=2, d_ff=256)
    cfg, params, tok, _ = load_llama(str(path))
    ids = [[1, 7, 13, 21, 9]]
    outs = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("i8", jnp.int8)):
        cache = init_cache(cfg, 1, 16, dtype)
        lg, cache = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
        # one incremental step too (scatter path)
        lg2, _ = forward(params, cfg, jnp.asarray([[3]]), jnp.asarray([5]), cache)
        outs[name] = (np.asarray(lg[0, -1], np.float64),
                      np.asarray(lg2[0, 0], np.float64))
    for a, b in zip(outs["bf16"], outs["i8"]):
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.999, corr
