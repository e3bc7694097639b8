"""MoE under the layer scan (stack_layers merged [L*E, ...] expert stacks).

Parity: the scanned stacked-MoE forward must match the unrolled per-layer
forward exactly (same kernels, same math — only the expert index base li*E
differs). Covers decode (routed kernels), prefill (grouped ragged matmul)
and the paged batcher path. Reference capability: llamafile_mixmul
(tinyblas_cpu_mixmul.inc:100-111); scan motivation: one MoE layer body in
the compiled HLO instead of n_layers inlined copies."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from llamafile_tpu.models.llama import (LlamaLayer, forward, init_cache,
                                        stack_layers)
from llamafile_tpu.models.synthetic import make_synthetic_llama


def _build():
    cfg, params = make_synthetic_llama("tiny-moe", quant="Q4_K", seed=3,
                                       fuse=True)
    return cfg, params


def test_stack_layers_accepts_homogeneous_moe():
    cfg, params = _build()
    st = stack_layers(params)
    assert isinstance(st.layers, LlamaLayer)
    gu = (st.layers.experts.get("gateup_il")
          or st.layers.experts.get("gateup"))
    # merged leading dim L*E
    assert gu.qs.shape[0] == cfg.n_layers * cfg.n_experts
    assert st.layers.experts["down"].qs.shape[0] \
        == cfg.n_layers * cfg.n_experts


def test_stack_layers_refuses_shexp_and_mixed():
    import dataclasses as dc
    cfg, params = _build()
    # shared-expert models stay unrolled
    ex = dict(params.layers[0].experts)
    ex["shexp.gate"] = ex["down"]
    ex["shexp.up"] = ex["down"]
    ex["shexp.down"] = ex["down"]
    layers = [dc.replace(params.layers[0], experts=ex), params.layers[1]]
    p2 = dc.replace(params, layers=layers)
    assert not isinstance(stack_layers(p2).layers, LlamaLayer)


@pytest.mark.parametrize("t", [1, 5])
def test_scanned_moe_matches_unrolled(t):
    cfg, params = _build()
    st = stack_layers(params)
    assert isinstance(st.layers, LlamaLayer)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(2, cfg.n_vocab, (1, t)), jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)

    cache_u = init_cache(cfg, 1, 64)
    lg_u, cache_u = forward(params, cfg, toks, pos, cache_u)
    cache_s = init_cache(cfg, 1, 64)
    lg_s, cache_s = forward(st, cfg, toks, pos, cache_s)
    a, b = np.asarray(lg_u), np.asarray(lg_s)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    assert err < 3e-3, err

    # one decode step on the warmed caches must also agree
    nxt = jnp.asarray([[5]], jnp.int32)
    p2 = jnp.full((1,), t, jnp.int32)
    lg_u2, _ = forward(params, cfg, nxt, p2, cache_u)
    lg_s2, _ = forward(st, cfg, nxt, p2, cache_s)
    a, b = np.asarray(lg_u2), np.asarray(lg_s2)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    assert err < 3e-3, err
