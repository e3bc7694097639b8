"""Routed MoE tests: qmatmul_routed (the TPU MixMul) vs per-slot golden, and
moe_ffn's routed decode path vs the dense-compute loop.

Reference behavior: llamafile_mixmul gathers per-expert row-pointer lists and
runs per-expert GEMMs over just the routed rows
(tinyblas_cpu_mixmul.inc:32-74, :100-111). Here the routed kernel must produce
the same values as computing each expert densely and masking by router weight.
"""
import dataclasses

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.gguf import quants as Q
from llamafile_tpu.ops import qmatmul as QM
from llamafile_tpu.ops import repack as R
from llamafile_tpu.ops.repack import expert_slice, stack_experts

RNG = np.random.default_rng(11)


def _random_qt(name, n, k):
    spec = Q.TYPE_BY_NAME[name]
    raw = RNG.integers(0, 256, size=(n * k // spec.block_elems,
                                     spec.block_bytes), dtype=np.uint8)
    D_HI = {"Q2_K": [81, 83], "Q3_K": [109], "Q6_K": [209]}
    for off in D_HI.get(name, [1, 3]):
        raw[:, off] &= 0x3B
    w = spec.dequant(raw).reshape(n, k)
    return R.repack(raw, name, (n, k)), w


@pytest.mark.parametrize("name", ["Q4_K", "Q8_0", "Q6_K"])
def test_qmatmul_routed_vs_golden(name):
    n, k, n_exp = 256, 512, 4
    qts, ws = zip(*[_random_qt(name, n, k) for _ in range(n_exp)])
    ex = {}
    for e, qt in enumerate(qts):
        ex[f"gate.{e}"] = qt
        ex[f"up.{e}"] = qt
        ex[f"down.{e}"] = qt
    stacked = stack_experts(ex, n_exp)["gate"]
    x = RNG.standard_normal((2, k)).astype(np.float32) * 0.5
    ei = jnp.asarray([0, 2, 1, 3], jnp.int32)      # 2 tokens x top-2 slots
    y = np.asarray(QM.qmatmul_routed(jnp.asarray(x), stacked, ei))
    assert y.shape == (4, n)
    for s, (e, t) in enumerate([(0, 0), (2, 0), (1, 1), (3, 1)]):
        golden = x[t] @ ws[e].T
        scale = np.abs(golden).max() + 1e-3
        err = np.abs(y[s] - golden).max() / scale
        assert err < 2e-2, f"{name} slot {s}: rel err {err}"


def test_qmatmul_routed_row_map():
    """Explicit row_map (the down-projection case: one x row per slot)."""
    n, k, n_exp = 256, 512, 4
    qts, ws = zip(*[_random_qt("Q4_K", n, k) for _ in range(n_exp)])
    stacked = stack_experts(
        {f"{r}.{e}": qts[e] for e in range(n_exp)
         for r in ("gate", "up", "down")}, n_exp)["down"]
    x = RNG.standard_normal((4, k)).astype(np.float32) * 0.5
    ei = jnp.asarray([3, 1, 1, 0], jnp.int32)
    ti = jnp.arange(4, dtype=jnp.int32)
    y = np.asarray(QM.qmatmul_routed(jnp.asarray(x), stacked, ei, row_map=ti))
    for s in range(4):
        golden = x[s] @ ws[int(ei[s])].T
        scale = np.abs(golden).max() + 1e-3
        assert np.abs(y[s] - golden).max() / scale < 2e-2


def test_qmatmul_routed_prenorm_folds():
    """RMSNorm fold through the routed kernel == norm-then-routed."""
    n, k, n_exp = 256, 512, 2
    qts, ws = zip(*[_random_qt("Q4_K", n, k) for _ in range(n_exp)])
    stacked = stack_experts(
        {f"{r}.{e}": qts[e] for e in range(n_exp)
         for r in ("gate", "up", "down")}, n_exp)["gate"]
    x = RNG.standard_normal((1, k)).astype(np.float32)
    nrm = RNG.standard_normal(k).astype(np.float32) * 0.1 + 1.0
    eps = 1e-5
    ei = jnp.asarray([1, 0], jnp.int32)
    y1 = np.asarray(QM.qmatmul_routed(jnp.asarray(x), stacked, ei,
                                      prenorm=(jnp.asarray(nrm), eps)))
    xn = np.asarray(QM.apply_rmsnorm(jnp.asarray(x), jnp.asarray(nrm), eps))
    y2 = np.asarray(QM.qmatmul_routed(jnp.asarray(xn), stacked, ei))
    scale = np.abs(y2).max() + 1e-3
    assert np.abs(y1 - y2).max() / scale < 2e-2


def test_routed_fallback_dense_kind():
    """dense-kind experts route through the XLA gather fallback."""
    n, k, n_exp = 64, 96, 4
    ws = [RNG.standard_normal((n, k)).astype(np.float32) * 0.1
          for _ in range(n_exp)]
    qts = [R.repack(w.tobytes(), "F32", (n, k)) for w in ws]
    stacked = stack_experts(
        {f"{r}.{e}": qts[e] for e in range(n_exp)
         for r in ("gate", "up", "down")}, n_exp)["up"]
    x = RNG.standard_normal((1, k)).astype(np.float32)
    ei = jnp.asarray([2, 0], jnp.int32)
    y = np.asarray(QM.qmatmul_routed(jnp.asarray(x), stacked, ei))
    for s, e in enumerate([2, 0]):
        golden = x[0] @ ws[e].T
        scale = np.abs(golden).max() + 1e-3
        assert np.abs(y[s] - golden).max() / scale < 2e-2


def test_moe_ffn_routed_equals_dense_loop():
    """Decode (m=1, s_n <= E): the routed path must equal the dense-compute
    loop over all experts — same synthetic model, stacked vs per-expert."""
    from llamafile_tpu.models.llama import forward, init_cache, moe_ffn
    from llamafile_tpu.models.synthetic import make_synthetic_llama
    cfg, params = make_synthetic_llama("tiny-moe", quant="Q4_K", seed=3)
    layer = params.layers[0]
    ex_stacked = layer.experts
    ex_dict = {}
    for role in ("gate", "up", "down"):
        for e in range(cfg.n_experts):
            ex_dict[f"{role}.{e}"] = expert_slice(ex_stacked[role], e)
    x = jnp.asarray(RNG.standard_normal((1, cfg.d_model)), jnp.float32)
    y_routed = np.asarray(moe_ffn(x, layer, cfg))
    layer_d = dataclasses.replace(layer, experts=ex_dict)
    y_dense = np.asarray(moe_ffn(x, layer_d, cfg))
    scale = np.abs(y_dense).max() + 1e-3
    assert np.abs(y_routed - y_dense).max() / scale < 2e-2


@pytest.mark.parametrize("tm", [8, 32, 128])
def test_qmatmul_grouped_vs_golden(tm):
    """Grouped (ragged) kernel: each row tile multiplies its own expert."""
    n, k, n_exp = 256, 512, 4
    qts, ws = zip(*[_random_qt("Q4_K", n, k) for _ in range(n_exp)])
    stacked = stack_experts(
        {f"{r}.{e}": qts[e] for e in range(n_exp)
         for r in ("gate", "up", "down")}, n_exp)["gate"]
    n_tiles = 5
    te = jnp.asarray([0, 2, 2, 1, 3], jnp.int32)
    x = RNG.standard_normal((n_tiles * tm, k)).astype(np.float32) * 0.5
    x[tm - 2:tm] = 0.0                              # padding rows stay zero
    y = np.asarray(QM.qmatmul_grouped(jnp.asarray(x), stacked, te, tm=tm))
    assert y.shape == (n_tiles * tm, n)
    for t in range(n_tiles):
        golden = x[t * tm:(t + 1) * tm] @ ws[int(te[t])].T
        scale = np.abs(golden).max() + 1e-3
        err = np.abs(y[t * tm:(t + 1) * tm] - golden).max() / scale
        assert err < 2e-2, f"tile {t} (tm={tm}): rel err {err}"


@pytest.mark.parametrize("m", [8, 40, 300])
def test_moe_ffn_grouped_equals_dense_loop(m):
    """Batched/prefill sizes (s_n > E): the grouped ragged path must equal
    the dense-compute loop over all experts."""
    from llamafile_tpu.models.llama import moe_ffn
    from llamafile_tpu.models.synthetic import make_synthetic_llama
    cfg, params = make_synthetic_llama("tiny-moe", quant="Q4_K", seed=3)
    layer = params.layers[0]
    ex_stacked = layer.experts
    ex_dict = {}
    for role in ("gate", "up", "down"):
        for e in range(cfg.n_experts):
            ex_dict[f"{role}.{e}"] = expert_slice(ex_stacked[role], e)
    x = jnp.asarray(RNG.standard_normal((m, cfg.d_model)), jnp.float32) * 0.5
    y_grouped = np.asarray(moe_ffn(x, layer, cfg))
    layer_d = dataclasses.replace(layer, experts=ex_dict)
    y_dense = np.asarray(moe_ffn(x, layer_d, cfg))
    scale = np.abs(y_dense).max() + 1e-3
    assert np.abs(y_grouped - y_dense).max() / scale < 2e-2


@pytest.mark.parametrize("m", [1, 8])
def test_moe_ffn_fused_gateup_matches_unfused(m):
    """stack_experts(fuse_gate_up=True) (one gate|up kernel call per layer)
    must match the unfused stacked layout on both routed and grouped paths."""
    from llamafile_tpu.models.llama import moe_ffn
    from llamafile_tpu.models.synthetic import make_synthetic_llama
    cfg, params = make_synthetic_llama("tiny-moe", quant="Q4_K", seed=9)
    layer = params.layers[0]
    ex_u = layer.experts
    ex_dict = {}
    for role in ("gate", "up", "down"):
        for e in range(cfg.n_experts):
            ex_dict[f"{role}.{e}"] = expert_slice(ex_u[role], e)
    ex_f = stack_experts(ex_dict, cfg.n_experts, fuse_gate_up=True)
    assert "gateup" in ex_f and "gate" not in ex_f
    x = jnp.asarray(RNG.standard_normal((m, cfg.d_model)), jnp.float32) * 0.5
    y_u = np.asarray(moe_ffn(x, layer, cfg))
    layer_f = dataclasses.replace(layer, experts=ex_f)
    y_f = np.asarray(moe_ffn(x, layer_f, cfg))
    scale = np.abs(y_u).max() + 1e-3
    assert np.abs(y_f - y_u).max() / scale < 2e-2


def test_moe_forward_decode_and_prefill():
    """tiny-moe end-to-end: prefill (dense loop, s_n > E) then decode
    (routed kernel) both produce finite logits and consistent results."""
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.synthetic import make_synthetic_llama
    cfg, params = make_synthetic_llama("tiny-moe", quant="Q4_K", seed=5)
    cache = init_cache(cfg, 1, 32)
    toks = jnp.asarray([[1, 5, 7, 9]])
    lg, cache = forward(params, cfg, toks, jnp.asarray([0]), cache,
                        fresh_prefill=True)
    assert np.isfinite(np.asarray(lg)).all()
    lg2, cache = forward(params, cfg, jnp.asarray([[2]]), jnp.asarray([4]),
                         cache)
    assert np.isfinite(np.asarray(lg2)).all()
