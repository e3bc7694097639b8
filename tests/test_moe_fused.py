"""Fused routed-FFN kernel (ops.qmatmul._qmm_kernel_moe_m1) parity.

One pallas call per MoE layer: gateup matmul, silu*up, per-32 requantize
(router weight folded into the activation scales), and the down matmul —
vs the reference per-expert dense formulation. Reference capability:
llamafile_mixmul (tinyblas_cpu_mixmul.inc:100-111)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from llamafile_tpu.models.llama import LlamaConfig, LlamaLayer, moe_ffn
from llamafile_tpu.models.synthetic import _rand_qtensor
from llamafile_tpu.ops.qmatmul import GU_STRIPE, moe_fusable, split_gu
from llamafile_tpu.ops.repack import stack_experts

D, DFF, E, TOPK = 512, 2048, 4, 2


def _build(rng, quant="Q4_K"):
    ex = {}
    for e in range(E):
        ex[f"gate.{e}"] = _rand_qtensor(rng, DFF, D, quant)
        ex[f"up.{e}"] = _rand_qtensor(rng, DFF, D, quant)
        ex[f"down.{e}"] = _rand_qtensor(rng, D, DFF, quant)
    return ex


def _layer(rng, experts):
    return LlamaLayer(attn_norm=jnp.ones(D), wq=None, wk=None, wv=None,
                      wo=None, ffn_norm=jnp.ones(D), w_gate=None,
                      w_up=None, w_down=None,
                      gate_inp=_rand_qtensor(rng, E, D, "F16"),
                      experts=experts)


def _cfg():
    return LlamaConfig(n_layers=1, d_model=D, n_heads=8, n_kv_heads=2,
                       head_dim=64, d_ff=DFF, n_vocab=1000, max_context=512,
                       n_experts=E, n_experts_used=TOPK)


def test_interleaved_stack_emitted_and_fusable():
    rng = np.random.default_rng(0)
    st = stack_experts(_build(rng), E, fuse_gate_up=True)
    assert "gateup_il" in st and "gateup" not in st
    assert moe_fusable(st["gateup_il"], st["down"], D, DFF)
    # layout: stripe s of gateup_il == gate/up stripe s//2
    st2 = stack_experts(_build(np.random.default_rng(0)), E,
                        fuse_gate_up=True, interleave=False)
    a = np.asarray(st["gateup_il"].qs)
    b = np.asarray(st2["gateup"].qs)
    ns = DFF // GU_STRIPE
    for s in range(2 * ns):
        src = (s // 2) * GU_STRIPE + (s % 2) * DFF
        np.testing.assert_array_equal(
            a[..., s * GU_STRIPE:(s + 1) * GU_STRIPE],
            b[..., src:src + GU_STRIPE])


def test_split_gu_roundtrip():
    rng = np.random.default_rng(1)
    g = rng.standard_normal((3, DFF)).astype(np.float32)
    u = rng.standard_normal((3, DFF)).astype(np.float32)
    ns = DFF // GU_STRIPE
    il = np.stack([g.reshape(3, ns, GU_STRIPE), u.reshape(3, ns, GU_STRIPE)],
                  axis=2).reshape(3, 2 * DFF)
    g2, u2 = split_gu(jnp.asarray(il), DFF, True)
    np.testing.assert_allclose(np.asarray(g2), g)
    np.testing.assert_allclose(np.asarray(u2), u)


@pytest.mark.parametrize("m", [1, 2])
def test_fused_matches_dense_loop(m):
    rng = np.random.default_rng(2)
    ex = _build(rng)
    fused = stack_experts(ex, E, fuse_gate_up=True)
    assert "gateup_il" in fused
    cfg = _cfg()
    rng2 = np.random.default_rng(3)
    lay_f = _layer(rng2, fused)
    lay_d = _layer(np.random.default_rng(3), dict(ex))
    x = jnp.asarray(rng.standard_normal((m, D)), jnp.float32) * 0.3
    yf = np.asarray(moe_ffn(x, lay_f, cfg))
    yd = np.asarray(moe_ffn(x, lay_d, cfg))
    err = np.abs(yf - yd).max() / (np.abs(yd).max() + 1e-6)
    # the fused path quantizes y in-kernel with the same per-32 absmax
    # formula; residual difference is activation-requant noise ordering
    assert err < 2e-2, err


def test_fused_matches_two_call_routed():
    """Fused kernel vs the two-call routed path on the SAME weights (only
    the y requantization rounding may differ: tw folds into scales)."""
    rng = np.random.default_rng(4)
    ex = _build(rng)
    fused = stack_experts(ex, E, fuse_gate_up=True)
    plain = stack_experts(ex, E, fuse_gate_up=True, interleave=False)
    assert "gateup" in plain
    cfg = _cfg()
    lay_f = _layer(np.random.default_rng(5), fused)
    lay_p = _layer(np.random.default_rng(5), plain)
    x = jnp.asarray(rng.standard_normal((1, D)), jnp.float32) * 0.3
    yf = np.asarray(moe_ffn(x, lay_f, cfg))
    yp = np.asarray(moe_ffn(x, lay_p, cfg))
    err = np.abs(yf - yp).max() / (np.abs(yp).max() + 1e-6)
    assert err < 5e-3, err
