"""End-to-end model runtime tests on a tiny random llama GGUF.

Mirrors the reference CI smoke test (TinyLLama 5M, 50 tokens, CPU greedy —
.github/workflows/ci.yml:55-80) plus numeric invariants: quantized forward must
track the F32 forward; greedy decode must be deterministic; KV-cached decode
must equal full-context recompute (the correctness core of incremental decode).
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.runtime.engine import Engine
from llamafile_tpu.runtime.sampling import SamplingParams
from tests.util_models import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def tiny_f32(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny_f32.gguf"
    make_tiny_llama_gguf(str(path))
    return str(path)


def test_load_and_forward_shapes(tiny_f32):
    cfg, params, tok, _ = load_llama(tiny_f32)
    assert cfg.n_layers == 2 and cfg.d_model == 64
    cache = init_cache(cfg, 1, 64)
    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)
    logits, cache2 = forward(params, cfg, tokens, jnp.asarray([0]), cache)
    assert logits.shape == (1, 3, cfg.n_vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_incremental_equals_full(tiny_f32):
    """Decode with KV cache must match recomputing the whole sequence."""
    cfg, params, tok, _ = load_llama(tiny_f32)
    ids = [1, 10, 20, 30, 40]
    # full forward
    cache = init_cache(cfg, 1, 32)
    full_logits, _ = forward(params, cfg, jnp.asarray([ids]), jnp.asarray([0]), cache)
    # incremental
    cache = init_cache(cfg, 1, 32)
    logits_steps = []
    for i, t in enumerate(ids):
        lg, cache = forward(params, cfg, jnp.asarray([[t]]), jnp.asarray([i]), cache)
        logits_steps.append(np.asarray(lg[0, 0]))
    inc = np.stack(logits_steps)
    np.testing.assert_allclose(inc, np.asarray(full_logits[0]), rtol=2e-2, atol=2e-2)


def test_greedy_generation_deterministic(tiny_f32):
    eng = Engine(*_load(tiny_f32), max_seq_len=128)
    sp = SamplingParams(temperature=0.0)
    out1 = eng.complete("hello", max_tokens=8, sampling=sp)
    out2 = eng.complete("hello", max_tokens=8, sampling=sp)
    assert out1 == out2


def _load(path):
    cfg, params, tok, _ = load_llama(path)
    return cfg, params, tok


@pytest.mark.parametrize("quant", ["Q8_0", "Q4_K"])
def test_quantized_tracks_f32(tmp_path, quant):
    """Quantized model logits must correlate strongly with the F32 model's."""
    # d_ff/d_model must be multiples of 256 for K-quant blocks
    kw = dict(d_model=256, n_layers=1, n_heads=4, n_kv_heads=2, d_ff=256, seed=3)
    pf = tmp_path / "f32.gguf"
    pq = tmp_path / "q.gguf"
    make_tiny_llama_gguf(str(pf), **kw)
    make_tiny_llama_gguf(str(pq), quant=quant, **kw)
    ids = [[1, 4, 7, 11]]
    outs = {}
    for name, path in (("f", pf), ("q", pq)):
        cfg, params, tok, _ = load_llama(str(path))
        cache = init_cache(cfg, 1, 16)
        lg, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
        outs[name] = np.asarray(lg[0, -1], np.float64)
    f, q = outs["f"], outs["q"]
    corr = np.corrcoef(f, q)[0, 1]
    assert corr > 0.98, f"{quant}: corr {corr}"


def test_sampling_topk_topp(tiny_f32):
    eng = Engine(*_load(tiny_f32), max_seq_len=64)
    sp = SamplingParams(temperature=0.9, top_k=20, top_p=0.9, seed=7)
    out = eng.complete("abc", max_tokens=6, sampling=sp)
    assert isinstance(out, str)


def test_batch_cache_positions(tiny_f32):
    """Per-sequence positions: two sequences at different offsets stay independent."""
    cfg, params, tok, _ = load_llama(tiny_f32)
    cache = init_cache(cfg, 2, 32)
    toks = jnp.asarray([[5], [9]], jnp.int32)
    lg, cache = forward(params, cfg, toks, jnp.asarray([0, 3]), cache)
    k = np.asarray(cache[0][0])       # layer 0 K cache, [B, S, H, D]
    assert np.abs(k[0, 0]).sum() > 0 and np.abs(k[0, 3]).sum() == 0
    assert np.abs(k[1, 3]).sum() > 0 and np.abs(k[1, 0]).sum() == 0
