"""Sequence/context-parallel prefill: sp-sharded matches single-device."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.parallel import sp as SP
from tests.util_models import make_tiny_llama_gguf


def test_sp_prefill_matches_single_device(tmp_path):
    path = tmp_path / "sp.gguf"
    make_tiny_llama_gguf(str(path), d_model=64, n_layers=2, n_heads=4,
                         n_kv_heads=2, d_ff=128)
    cfg, params, tok, _ = load_llama(str(path), fuse=False)
    toks = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    cache = init_cache(cfg, 1, 16)
    golden, _ = forward(params, cfg, toks, jnp.zeros((1,), jnp.int32), cache)

    mesh = SP.make_sp_mesh(sp=4)          # 16 tokens over 4 sequence shards
    run = SP.make_sp_prefill(cfg, mesh)
    logits = run(params, toks)
    assert logits.shape == golden.shape
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               rtol=3e-2, atol=3e-2)


def test_ring_attention_matches_allgather():
    """Ring attention (ppermute K/V streaming + LSE merge) must reproduce the
    all-gather formulation exactly."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.parallel import sp as SP
    import tempfile, os
    from tests.util_models import make_tiny_llama_gguf
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.gguf")
        make_tiny_llama_gguf(p, d_model=64, n_layers=2, n_heads=4,
                             n_kv_heads=2, d_ff=128)
        cfg, params, _t, _ = load_llama(p, fuse=False)
    mesh = SP.make_sp_mesh(sp=4)
    toks = jnp.arange(1, 33, dtype=jnp.int32).reshape(1, 32)
    base = SP.make_sp_prefill(cfg, mesh)(params, toks)
    ring = SP.make_sp_prefill(cfg, mesh, ring=True)(params, toks)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(base),
                               atol=2e-4, rtol=1e-4)
