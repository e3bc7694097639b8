"""Dense-FFN fusion: the il-interleaved w_gate_up + fused one-call FFN
(ops.qmatmul._qmm_kernel_moe_m1 with the layer id as the scalar-prefetch
"expert") must match the two-call gateup/down formulation.

Uses d_ff=1024 (the minimum GU_STRIPE multiple) so the fused path engages
on a CPU-interpret-sized model. Reference capability: llamafile's fused
ffn_gate_up wire tensors + tinyBLAS fused GEMM epilogues."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from llamafile_tpu.models.llama import (LlamaConfig, LlamaLayer, LlamaParams,
                                        forward, init_cache, stack_layers)
from llamafile_tpu.models.synthetic import _rand_qtensor
from llamafile_tpu.ops.repack import interleave_gateup
from llamafile_tpu.ops.qmatmul import moe_fusable

D, DFF, L, V = 256, 1024, 2, 512


def _params(rng, il: bool):
    import dataclasses as dc
    layers = []
    for _ in range(L):
        g = _rand_qtensor(rng, DFF, D, "Q4_K")
        u = _rand_qtensor(rng, DFF, D, "Q4_K")
        dn = _rand_qtensor(rng, D, DFF, "Q4_K")
        if il:
            gu = interleave_gateup(g, u)
            lkw = dict(w_gate=None, w_up=None, w_gate_up=gu)
        else:
            lkw = dict(w_gate=g, w_up=u)
        layers.append(LlamaLayer(
            attn_norm=jnp.ones(D), ffn_norm=jnp.ones(D),
            wq=_rand_qtensor(rng, D, D, "Q4_K"),
            wk=_rand_qtensor(rng, D // 2, D, "Q4_K"),
            wv=_rand_qtensor(rng, D // 2, D, "Q4_K"),
            wo=_rand_qtensor(rng, D, D, "Q4_K"),
            w_down=dn, **lkw))
    embd = jnp.asarray(np.asarray(
        np.random.default_rng(7).standard_normal((V, D)), np.float32) * 0.02,
        jnp.bfloat16)
    return LlamaParams(tok_embd=embd, layers=layers,
                       out_norm=jnp.ones(D),
                       output=_rand_qtensor(rng, V, D, "Q4_K"))


def _cfg():
    return LlamaConfig(n_layers=L, d_model=D, n_heads=4, n_kv_heads=2,
                       head_dim=64, d_ff=DFF, n_vocab=V, max_context=128)


def test_il_fusable_at_model_shapes():
    rng = np.random.default_rng(0)
    p = _params(rng, il=True)
    st = stack_layers(p)
    assert isinstance(st.layers, LlamaLayer)
    assert st.layers.w_gate_up.il
    assert moe_fusable(st.layers.w_gate_up, st.layers.w_down, D, DFF)


@pytest.mark.parametrize("t", [1, 4])
def test_dense_fused_matches_two_call(t):
    cfg = _cfg()
    rng = np.random.default_rng(1)
    p_il = _params(rng, il=True)
    p_2c = _params(np.random.default_rng(1), il=False)
    st_il = stack_layers(p_il)
    st_2c = stack_layers(p_2c)
    toks = jnp.asarray(np.random.default_rng(2)
                       .integers(2, V, (1, t)), jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    c1 = init_cache(cfg, 1, 32)
    c2 = init_cache(cfg, 1, 32)
    lg1, c1 = forward(st_il, cfg, toks, pos, c1)
    lg2, c2 = forward(st_2c, cfg, toks, pos, c2)
    a, b = np.asarray(lg1), np.asarray(lg2)
    # t=1 runs the fused kernel vs two txn calls: only the y-requantize
    # rounding order differs; t>1 runs the same kernels on both sides
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
    assert err < 2e-2, err
    # decode step on warmed caches (the fused path at M=1)
    nxt = jnp.asarray([[3]], jnp.int32)
    p2 = jnp.full((1,), t, jnp.int32)
    lg1d, _ = forward(st_il, cfg, nxt, p2, c1)
    lg2d, _ = forward(st_2c, cfg, nxt, p2, c2)
    a, b = np.asarray(lg1d), np.asarray(lg2d)
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
    assert err < 2e-2, err
