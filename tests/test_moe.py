"""MoE (Mixtral-style) tests: dense vs stacked-EP parity, single and multi-device.

The reference's MoE path is llamafile_mixmul (SURVEY.md §2.2); here the parity
chain is: per-expert dict (dense loop) == stacked experts (EP layout) on one
device == expert-sharded over a 4-way mesh axis with psum.
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.parallel import tp as TP
from llamafile_tpu.parallel.moe import epify_params
from tests.util_models import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "moe.gguf"
    make_tiny_llama_gguf(str(path), d_model=64, n_layers=2, n_heads=4,
                         n_kv_heads=4, d_ff=96, n_experts=4, n_experts_used=2)
    return str(path)


def test_moe_loads_and_runs(moe_model):
    cfg, params, tok, _ = load_llama(moe_model, fuse=False)
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    cache = init_cache(cfg, 1, 16)
    lg, _ = forward(params, cfg, jnp.asarray([[1, 5, 7]]), jnp.asarray([0]), cache)
    assert np.isfinite(np.asarray(lg)).all()


def test_stacked_equals_dense(moe_model):
    cfg, params, tok, _ = load_llama(moe_model, fuse=False)
    toks = jnp.asarray([[1, 5, 7, 9]])
    cache = init_cache(cfg, 1, 16)
    dense, _ = forward(params, cfg, toks, jnp.asarray([0]), cache)
    eparams = epify_params(params, cfg)
    cache = init_cache(cfg, 1, 16)
    stacked, _ = forward(eparams, cfg, toks, jnp.asarray([0]), cache)
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(dense),
                               rtol=2e-2, atol=2e-2)


def test_ep_sharded_matches_dense(moe_model):
    cfg, params, tok, _ = load_llama(moe_model, fuse=False)
    toks = jnp.asarray([[1, 5, 7, 9]])
    cache = init_cache(cfg, 1, 16)
    golden, _ = forward(params, cfg, toks, jnp.asarray([0]), cache)

    eparams = epify_params(params, cfg)
    mesh = TP.make_mesh(dp=1, tp=4)       # 4 experts over 4 devices
    sparams = TP.shard_params(eparams, mesh)
    scache = TP.init_sharded_cache(cfg, mesh, 1, 16)
    run = TP.make_tp_forward(cfg, mesh)
    logits, _ = run(sparams, toks, jnp.asarray([0], jnp.int32), scache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("quant,rtol,atol", [
    # F32 pins the sharding MATH: per-expert COL/ROW fallback is exact
    # (adjudicated round 5 — unquantized sharded == unsharded to fp32 eps).
    ("F32", 1e-4, 1e-4),
    # Q4_K runs ROW-sharded down/wo with PER-SHARD int8 activation
    # requantization: each K-shard picks its own activation scale, a
    # different quantization grid than the unsharded kernel, so logits
    # legitimately move ~0.15 abs at |logit|~40 (0.8% of elements past
    # 3e-2).  The stacked E%tp==0 path shards the EXPERT dim (no K split)
    # and has no such noise, which is why only this fallback test needs
    # the looser bound.
    ("Q4_K", 3e-2, 0.25),
])
def test_tp_oddsize_experts_fall_back_to_per_expert(quant, rtol, atol):
    """Expert counts not divisible by tp (qwen2moe: 60 experts) must shard
    COL/ROW per expert instead of failing the expert-dim device_put
    (review r4 finding #5): tp=4 with 4 experts shards the expert dim, but
    a 3-expert synthetic with tp=2 must unstack and still match."""
    import jax
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.synthetic import make_synthetic_llama
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    # 3 experts, tp=2: 3 % 2 != 0. Dims sized so every K shard stays a
    # multiple of the 256 q4b superblock (wo: 8 heads x 128 / tp=2 = 512)
    from llamafile_tpu.models.synthetic import PRESETS
    PRESETS["tiny-moe3"] = dict(
        n_layers=1, d_model=1024, n_heads=8, n_kv_heads=8, d_ff=1536,
        n_vocab=2048, max_context=2048, n_experts=3, n_experts_used=2,
        moe_norm_topk=True)
    try:
        cfg, params = make_synthetic_llama("tiny-moe3", quant=quant, seed=2)
    finally:
        del PRESETS["tiny-moe3"]
    toks = jnp.asarray([[1, 5, 7, 9]])
    golden, _ = forward(params, cfg, toks, jnp.asarray([0]),
                        init_cache(cfg, 1, 16))
    mesh = TP.make_mesh(dp=1, tp=2)
    sparams = TP.shard_params(params, mesh)
    # per-expert dict after the fallback (stacked would need E % tp == 0)
    assert "gate.0" in sparams.layers[0].experts
    scache = TP.init_sharded_cache(cfg, mesh, 1, 16)
    run = TP.make_tp_forward(cfg, mesh)
    logits, _ = run(sparams, toks, jnp.asarray([0], jnp.int32), scache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               rtol=rtol, atol=atol)
