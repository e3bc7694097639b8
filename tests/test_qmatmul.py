"""Fused dequant-GEMM tests: repack exactness + kernel vs numpy golden.

Counterpart of the reference's sgemm_matmul_test / tinyblas_test accuracy suites
(SURVEY.md §4; reference llamafile/BUILD.mk:204-233): the Pallas kernel (interpret
mode on CPU here; compiled on real TPU via bench.py) must match the f32 dequant
matmul within bf16-input accumulation error bounds.
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401  (sets JAX_PLATFORMS before jax import)
import jax
import jax.numpy as jnp

from llamafile_tpu.gguf import quants as Q
import sys
R = sys.modules.get('llamafile_tpu.ops.repack') or __import__('importlib').import_module('llamafile_tpu.ops.repack')
QM = __import__('importlib').import_module('llamafile_tpu.ops.qmatmul')

RNG = np.random.default_rng(7)

ALL_FORMATS = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q2_K", "Q3_K", "Q4_K",
               "Q5_K", "Q6_K", "IQ4_NL", "IQ4_XS", "IQ2_XXS", "IQ2_XS", "IQ2_S",
               "IQ3_XXS", "IQ3_S", "IQ1_S"]


def random_blocks(name, nblocks):
    spec = Q.TYPE_BY_NAME[name]
    raw = RNG.integers(0, 256, size=(nblocks, spec.block_bytes), dtype=np.uint8)
    D_HI = {"Q2_K": [81, 83], "Q3_K": [109], "Q6_K": [209]}
    for off in D_HI.get(name, [1, 3]):
        raw[:, off] &= 0x3B
    return raw


@pytest.mark.parametrize("name", ALL_FORMATS)
def test_repack_matches_dequant(name):
    """(q, a, b) decomposition must reproduce the reference dequant exactly."""
    spec = Q.TYPE_BY_NAME[name]
    n, k = 4, 512
    raw = random_blocks(name, n * k // spec.block_elems)
    golden = spec.dequant(raw).reshape(n, k)
    kind, qs, a, b, g = R.repack_numpy(raw, name, (n, k))
    w = R.dequant_qtensor_numpy(kind, qs, a, b, g, (n, k))
    # q4b folds 16x/-128 into scales/bias (algebraically exact, +-2 f32 ulps)
    atol = 4e-6 * (np.abs(golden).max() + 1)
    np.testing.assert_allclose(w, golden, rtol=1e-5, atol=atol, err_msg=name)


def test_nibble_pack_roundtrip():
    q = RNG.integers(0, 16, size=(1024, 8)).astype(np.uint8)   # (K, N)
    p = R._pack_nibbles_sb128(q)
    assert p.shape == (512, 8)
    np.testing.assert_array_equal(R.unpack_nibbles_sb128(p), q)


@pytest.mark.parametrize("name", ["Q8_0", "Q4_0", "Q4_K", "Q5_K", "Q6_K", "Q3_K"])
@pytest.mark.parametrize("m", [1, 2, 3, 4, 16, 64])
def test_qmatmul_vs_golden(name, m):
    spec = Q.TYPE_BY_NAME[name]
    n, k = 256, 512
    raw = random_blocks(name, n * k // spec.block_elems)
    w = spec.dequant(raw).reshape(n, k)
    x = RNG.standard_normal((m, k)).astype(np.float32) * 0.5
    golden = x @ w.T
    qt = R.repack(raw, name, (n, k))
    y = np.asarray(QM.qmatmul(jnp.asarray(x), qt))
    assert y.shape == (m, n)
    # bf16 inputs: relative error ~2^-8 per element accumulated over k
    scale = np.abs(golden).max() + 1e-3
    err = np.abs(y - golden).max() / scale
    assert err < 2e-2, f"{name} m={m}: rel err {err}"


@pytest.mark.parametrize("name", ["Q4_K", "Q8_0"])
def test_qmatmul_fallback_agrees(name):
    spec = Q.TYPE_BY_NAME[name]
    n, k = 256, 512
    raw = random_blocks(name, n * k // spec.block_elems)
    x = RNG.standard_normal((8, k)).astype(np.float32)
    qt = R.repack(raw, name, (n, k))
    y1 = np.asarray(QM.qmatmul(jnp.asarray(x), qt))
    y2 = np.asarray(QM.qmatmul_fallback(jnp.asarray(x), qt))
    scale = np.abs(y2).max() + 1e-3
    assert np.abs(y1 - y2).max() / scale < 2e-2


def test_dense_path():
    w = RNG.standard_normal((128, 256)).astype(np.float32)
    x = RNG.standard_normal((4, 256)).astype(np.float32)
    qt = R.repack(w.astype(np.float32).tobytes(), "F32", (128, 256))
    y = np.asarray(QM.qmatmul(jnp.asarray(x), qt))
    scale = np.abs(x @ w.T).max()
    assert np.abs(y - x @ w.T).max() / scale < 2e-2


@pytest.mark.parametrize("kern", ["int8", "txn", "planes"])
def test_q4b_kernel_variants_agree(monkeypatch, kern):
    """Every q4b kernel flavor (od int8, natural-order txn, bf16 planes)
    must match the f32 golden within quantized-activation error bounds."""
    monkeypatch.setattr(QM, "Q4B_KERNEL", kern)
    spec = Q.TYPE_BY_NAME["Q4_K"]
    n, k = 256, 512
    raw = random_blocks("Q4_K", n * k // spec.block_elems)
    w = spec.dequant(raw).reshape(n, k)
    x = RNG.standard_normal((8, k)).astype(np.float32) * 0.5
    golden = x @ w.T
    qt = R.repack(raw, "Q4_K", (n, k))
    y = np.asarray(QM.qmatmul(jnp.asarray(x), qt))
    scale = np.abs(golden).max() + 1e-3
    err = np.abs(y - golden).max() / scale
    assert err < 2e-2, f"{kern}: rel err {err}"


def test_txn_stacked_matches_single():
    """The scalar-prefetch stacked txn kernel (in-kernel qs3+scales3 layer
    indexing) must reproduce the per-layer kernel exactly."""
    spec = Q.TYPE_BY_NAME["Q4_K"]
    n, k, L = 256, 512, 3
    x = RNG.standard_normal((8, k)).astype(np.float32) * 0.5
    qts = [R.repack(random_blocks("Q4_K", n * k // spec.block_elems),
                    "Q4_K", (n, k)) for _ in range(L)]
    qs3 = jnp.stack([t.qs for t in qts])
    sc3 = jnp.stack([t.scales for t in qts])
    for li in range(L):
        y1 = np.asarray(QM._qmm_call_txn(jnp.asarray(x), qts[li].qs,
                                         qts[li].scales, interpret=True))
        y2 = np.asarray(QM._qmm_call_txn_stacked(jnp.asarray(x), qs3, sc3,
                                                 jnp.int32(li),
                                                 interpret=True))
        np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)


def test_iq1_m_fused_path_exact():
    """IQ1_M decodes through the fused (q,a,b) path bit-exactly (round-1 fell
    back to dense bf16; reference decodes it in iqk_mul_mat)."""
    import numpy as np
    from llamafile_tpu.gguf import quants as Q
    from llamafile_tpu.ops.repack import dequant_qtensor_numpy, repack_numpy
    rng = np.random.default_rng(0)
    spec = Q.TYPE_BY_NAME["IQ1_M"]
    raw = rng.integers(0, 256, (8, spec.block_bytes), dtype=np.uint8)
    ref = spec.dequant(raw)
    kind, qs, a, b, g = repack_numpy(raw.reshape(-1), "IQ1_M", (8, 256))
    assert kind == "q8b" and g == 8
    w = dequant_qtensor_numpy(kind, qs, a, b, g, (8, 256))
    np.testing.assert_allclose(w, ref, atol=1e-6)


def test_flash_decode_matches_einsum_interpret(monkeypatch):
    """Fused flash-decode kernel (block-diagonal-Q GQA) vs the einsum
    reference, via pallas interpret mode (also validated on real TPU:
    max err 3e-4)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import llamafile_tpu.ops.attention as A
    from llamafile_tpu.models.llama import attention
    rng = np.random.default_rng(0)
    b, s, hkv, g, d = 2, 512, 4, 4, 128
    hq = hkv * g
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16) * 0.3
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16) * 0.3
    pos = jnp.asarray([100, 511], jnp.int32)
    ref = np.asarray(attention(q[:, None], k, v, pos, jnp.arange(1),
                               0.09))[:, 0]
    orig = A.pl.pallas_call
    monkeypatch.setattr(A.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(A.flash_decode(q, k, v, pos, 0.09))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-2)


def test_m1_kernel_matches_general():
    """The block-diagonal M=1 kernel (packed per-group partials, in-kernel
    bias group sums) must agree with the general padded-M txn kernel on the
    same quantized activations — both quantize per-32, so results match to
    accumulation-order rounding."""
    spec = Q.TYPE_BY_NAME["Q4_K"]
    n, k = 256, 512
    raw = random_blocks("Q4_K", n * k // spec.block_elems)
    qt = R.repack(raw, "Q4_K", (n, k))
    x1 = RNG.standard_normal((1, k)).astype(np.float32) * 0.5
    y_m1 = np.asarray(QM.qmatmul(jnp.asarray(x1), qt))        # m1 dispatch
    x8 = np.concatenate([x1, np.zeros((7, k), np.float32)])
    y_gen = np.asarray(QM._qmm_call_txn(jnp.asarray(x8), qt.qs, qt.scales,
                                        qt.bias, interpret=True))[:1, :n]
    scale = np.abs(y_gen).max() + 1e-3
    assert np.abs(y_m1 - y_gen).max() / scale < 1e-4


def test_m1_stacked_matches_single():
    spec = Q.TYPE_BY_NAME["Q4_K"]
    n, k, L = 256, 512, 3
    x = RNG.standard_normal((1, k)).astype(np.float32) * 0.5
    qts = [R.repack(random_blocks("Q4_K", n * k // spec.block_elems),
                    "Q4_K", (n, k)) for _ in range(L)]
    qs3 = jnp.stack([t.qs for t in qts])
    sc3 = jnp.stack([t.scales for t in qts])
    b3 = jnp.stack([t.bias for t in qts])
    for li in range(L):
        y1 = np.asarray(QM._qmm_call_txn_m1(jnp.asarray(x), qts[li].qs,
                                            qts[li].scales, qts[li].bias,
                                            interpret=True))
        y2 = np.asarray(QM._qmm_call_txn_m1_stacked(
            jnp.asarray(x), qs3, sc3, jnp.int32(li), b3, interpret=True))
        np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)


def test_prenorm_fold_is_exact():
    """qmatmul(prenorm=(w, eps)) must equal rmsnorm-then-qmatmul: the
    rsqrt(var) scalar cancels out of the int8 codes and rides in the
    activation scales (ops/qmatmul.quantize_activations_g32)."""
    spec = Q.TYPE_BY_NAME["Q4_K"]
    n, k = 256, 512
    raw = random_blocks("Q4_K", n * k // spec.block_elems)
    qt = R.repack(raw, "Q4_K", (n, k))
    nw = (1.0 + 0.1 * RNG.standard_normal(k)).astype(np.float32)
    eps = 1e-5
    for m in (1, 8):
        x = RNG.standard_normal((m, k)).astype(np.float32)
        xn = x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * nw
        y_ref = np.asarray(QM.qmatmul(jnp.asarray(xn.astype(np.float32)), qt))
        y_fused = np.asarray(QM.qmatmul(jnp.asarray(x), qt,
                                        prenorm=(jnp.asarray(nw), eps)))
        scale = np.abs(y_ref).max() + 1e-3
        assert np.abs(y_fused - y_ref).max() / scale < 1e-3, m


def test_quantize_prenorm_codes_match():
    """The prenorm-folded quantizer's codes equal quantize(rmsnorm(x)) codes
    and its scales carry the norm factor."""
    k = 512
    x = RNG.standard_normal((2, k)).astype(np.float32)
    nw = (1.0 + 0.1 * RNG.standard_normal(k)).astype(np.float32)
    eps = 1e-5
    xq_f, sx_f = QM.quantize_activations_g32(jnp.asarray(x),
                                             jnp.asarray(nw), eps)
    xn = x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * nw
    xq_r, sx_r = QM.quantize_activations_g32(jnp.asarray(
        xn.astype(np.float32)))
    assert (np.asarray(xq_f) == np.asarray(xq_r)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(sx_f), np.asarray(sx_r),
                               rtol=1e-5, atol=1e-8)
