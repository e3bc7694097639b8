"""Pipeline parallelism tests: pp-sharded stages match single-device forward."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.parallel import pp as PP
from tests.util_models import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "pp.gguf"
    make_tiny_llama_gguf(str(path), d_model=64, n_layers=4, n_heads=4,
                         n_kv_heads=2, d_ff=128)
    return str(path)


@pytest.mark.parametrize("n_micro", [1, 2])
def test_pp_matches_single_device(model, n_micro):
    cfg, params, tok, _ = load_llama(model, fuse=False)
    toks = jnp.asarray([[1, 5, 9, 2], [3, 7, 11, 4]], jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)
    cache0 = init_cache(cfg, 2, 16)
    golden, gcache = forward(params, cfg, toks, pos, cache0)

    mesh = PP.make_pp_mesh(pp=4)            # 4 stages x 1 layer
    stacked, head = PP.shard_pp(params, mesh)
    cache = PP.init_pp_cache(cfg, mesh, 2, 16)
    run = PP.make_pp_forward(cfg, mesh, n_micro=n_micro)
    logits, ncache = run(stacked, head, toks, pos, cache)
    # microbatching changes matmul tiling (M=1 vs M=2) -> bf16 accumulation
    # order differs slightly; tolerance covers that numeric noise
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               rtol=5e-2, atol=6e-2)
    # pp keeps head-structured [L, B, S, H, D]; single-device dense is flat
    pk = np.asarray(jax.device_get(ncache.k))
    np.testing.assert_allclose(pk, np.asarray(gcache.k).reshape(pk.shape),
                               rtol=3e-2, atol=3e-2)


def test_pp_two_stages(model):
    cfg, params, tok, _ = load_llama(model, fuse=False)
    toks = jnp.asarray([[2, 4]], jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    cache0 = init_cache(cfg, 1, 8)
    golden, _ = forward(params, cfg, toks, pos, cache0)
    mesh = PP.make_pp_mesh(pp=2)            # 2 stages x 2 layers
    stacked, head = PP.shard_pp(params, mesh)
    cache = PP.init_pp_cache(cfg, mesh, 1, 8)
    run = PP.make_pp_forward(cfg, mesh, n_micro=1)
    logits, _ = run(stacked, head, toks, pos, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               rtol=2e-2, atol=2e-2)


def test_pp_tp_composition_matches_single_device(model):
    """2D (pp=2, tp=2) mesh: pipeline stages with Megatron sharding inside
    each stage must reproduce the single-device logits."""
    cfg, params, tok, _ = load_llama(model, fuse=False)
    toks = jnp.asarray([[1, 5, 9, 2], [3, 7, 11, 4]], jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)
    golden, _ = forward(params, cfg, toks, pos, init_cache(cfg, 2, 16))

    mesh = PP.make_pp_tp_mesh(pp=2, tp=2)
    stacked, head = PP.shard_pp(params, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from llamafile_tpu.runtime.kvcache import KVCache
    shape = (cfg.n_layers, 2, 16, cfg.n_kv_heads, cfg.head_dim)
    sp = NamedSharding(mesh, P("pp", None, None, "tp", None))
    z = jax.jit(lambda: jnp.zeros(shape, jnp.bfloat16), out_shardings=sp)
    cache = KVCache(z(), z(), None, None)
    run = PP.make_pp_forward(cfg, mesh, n_micro=2)
    logits, _ = run(stacked, head, toks, pos, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               rtol=5e-2, atol=6e-2)
