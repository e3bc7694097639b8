"""Quant format tests: block geometry, round-trips, scalar-reference cross-checks.

Counterpart of the reference's ggml quant validation + sgemm accuracy tests
(SURVEY.md §4). The vectorized numpy dequantizers are the golden semantics for the
whole framework, so here they are checked against independent *scalar* re-implementations
transcribed from the dequantize_block_* semantics (ggml-cuda.cu.patch:3150-3700).
"""
import numpy as np
import pytest

from llamafile_tpu.gguf import quants as Q


RNG = np.random.default_rng(42)


def rand_f32(n):
    return (RNG.standard_normal(n) * 2.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Round-trips for formats with quantizers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,atol", [
    ("Q8_0", 0.04), ("Q4_0", 0.6), ("Q4_K", 0.5), ("Q5_K", 0.25), ("Q6_K", 0.15),
])
def test_roundtrip(name, atol):
    spec = Q.TYPE_BY_NAME[name]
    x = rand_f32(spec.block_elems * 64)
    raw = spec.quantize(x)
    assert raw.shape == (64, spec.block_bytes)
    y = spec.dequant(raw).reshape(-1)
    err = np.abs(y - x).mean()
    assert err < atol, f"{name}: mean abs err {err}"


def test_q8_0_exact():
    # integer data whose per-block amax is 127 survives exactly (d = 1.0)
    x = RNG.integers(-127, 128, size=(8, 32)).astype(np.float32)
    x[:, 0] = 127.0
    raw = Q.quantize_q8_0(x.reshape(-1))
    y = Q.dequant_q8_0(raw).reshape(8, 32)
    assert np.allclose(y, x, atol=1e-3)


# ---------------------------------------------------------------------------
# Scalar reference cross-checks (independent slow implementations)
# ---------------------------------------------------------------------------

def scalar_dequant_q4_k(block: np.ndarray) -> np.ndarray:
    b = block.tobytes()
    d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
    scales = block[4:16].tolist()
    qs = block[16:144].tolist()
    y = np.zeros(256, np.float32)

    def get_scale_min(j):
        if j < 4:
            return scales[j] & 63, scales[j + 4] & 63
        return ((scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4),
                (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4))

    yi = 0
    is_ = 0
    qoff = 0
    for _ in range(0, 256, 64):
        sc, m = get_scale_min(is_)
        d1, m1 = d * sc, dmin * m
        sc, m = get_scale_min(is_ + 1)
        d2, m2 = d * sc, dmin * m
        for l in range(32):
            y[yi + l] = d1 * (qs[qoff + l] & 0xF) - m1
        for l in range(32):
            y[yi + 32 + l] = d2 * (qs[qoff + l] >> 4) - m2
        yi += 64
        qoff += 32
        is_ += 2
    return y


def scalar_dequant_q6_k(block: np.ndarray) -> np.ndarray:
    b = block.tobytes()
    ql = block[0:128].tolist()
    qh = block[128:192].tolist()
    sc = block[192:208].view(np.int8).tolist()
    d = np.frombuffer(b[208:210], np.float16)[0].astype(np.float32)
    y = np.zeros(256, np.float32)
    for ip in range(2):
        for il in range(32):
            is_ = 8 * ip + il // 16
            base = 128 * ip + il
            q1 = ((ql[64 * ip + il] & 0xF) | (((qh[32 * ip + il] >> 0) & 3) << 4)) - 32
            q2 = ((ql[64 * ip + 32 + il] & 0xF) | (((qh[32 * ip + il] >> 2) & 3) << 4)) - 32
            q3 = ((ql[64 * ip + il] >> 4) | (((qh[32 * ip + il] >> 4) & 3) << 4)) - 32
            q4 = ((ql[64 * ip + 32 + il] >> 4) | (((qh[32 * ip + il] >> 6) & 3) << 4)) - 32
            y[base + 0] = d * sc[is_ + 0] * q1
            y[base + 32] = d * sc[is_ + 2] * q2
            y[base + 64] = d * sc[is_ + 4] * q3
            y[base + 96] = d * sc[is_ + 6] * q4
    return y


def scalar_dequant_q2_k(block: np.ndarray) -> np.ndarray:
    b = block.tobytes()
    scales = block[0:16].tolist()
    qs = block[16:80].tolist()
    d = np.frombuffer(b[80:82], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(b[82:84], np.float16)[0].astype(np.float32)
    y = np.zeros(256, np.float32)
    for n in range(2):
        for l in range(32):
            is_ = 8 * n + l // 16
            q = qs[32 * n + l]
            for row in range(4):
                sc = scales[is_ + 2 * row]
                y[256 // 2 * n + 32 * row + l] = (
                    d * (sc & 0xF) * ((q >> (2 * row)) & 3) - dmin * (sc >> 4))
    return y


def scalar_dequant_q3_k(block: np.ndarray) -> np.ndarray:
    b = block.tobytes()
    hmask = block[0:32].tolist()
    qs = block[32:96].tolist()
    scales = block[96:108].tolist()
    d = np.frombuffer(b[108:110], np.float16)[0].astype(np.float32)
    y = np.zeros(256, np.float32)
    for n in range(2):
        for j in range(4):
            for l in range(32):
                is_ = 8 * n + 2 * j + l // 16
                if is_ < 4:
                    us = (scales[is_] & 0xF) | (((scales[is_ + 8] >> 0) & 3) << 4)
                elif is_ < 8:
                    us = (scales[is_] & 0xF) | (((scales[is_ + 4] >> 2) & 3) << 4)
                elif is_ < 12:
                    us = (scales[is_ - 8] >> 4) | (((scales[is_] >> 4) & 3) << 4)
                else:
                    us = (scales[is_ - 8] >> 4) | (((scales[is_ - 4] >> 6) & 3) << 4)
                dl = d * (us - 32)
                m = 1 << (4 * n + j)
                q = (qs[32 * n + l] >> (2 * j)) & 3
                if not (hmask[l] & m):
                    q -= 4
                y[128 * n + 32 * j + l] = dl * q
    return y


def scalar_dequant_q5_k(block: np.ndarray) -> np.ndarray:
    b = block.tobytes()
    d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
    scales = block[4:16].tolist()
    qh = block[16:48].tolist()
    qs = block[48:176].tolist()

    def get_scale_min(j):
        if j < 4:
            return scales[j] & 63, scales[j + 4] & 63
        return ((scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4),
                (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4))

    y = np.zeros(256, np.float32)
    is_ = 0
    qoff = 0
    u1, u2 = 1, 2
    yi = 0
    for _ in range(0, 256, 64):
        sc, m = get_scale_min(is_)
        d1, m1 = d * sc, dmin * m
        sc, m = get_scale_min(is_ + 1)
        d2, m2 = d * sc, dmin * m
        for l in range(32):
            y[yi + l] = d1 * ((qs[qoff + l] & 0xF) + (16 if qh[l] & u1 else 0)) - m1
        for l in range(32):
            y[yi + 32 + l] = d2 * ((qs[qoff + l] >> 4) + (16 if qh[l] & u2 else 0)) - m2
        yi += 64
        qoff += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return y


@pytest.mark.parametrize("name,scalar_fn", [
    ("Q2_K", scalar_dequant_q2_k),
    ("Q3_K", scalar_dequant_q3_k),
    ("Q4_K", scalar_dequant_q4_k),
    ("Q5_K", scalar_dequant_q5_k),
    ("Q6_K", scalar_dequant_q6_k),
])
def test_vectorized_vs_scalar(name, scalar_fn):
    spec = Q.TYPE_BY_NAME[name]
    raw = RNG.integers(0, 256, size=(8, spec.block_bytes), dtype=np.uint8)
    fast = spec.dequant(raw)
    for i in range(8):
        slow = scalar_fn(raw[i])
        np.testing.assert_allclose(fast[i], slow, rtol=1e-5, atol=1e-5,
                                   err_msg=f"{name} block {i}")


@pytest.mark.parametrize("name", [
    "Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q8_1", "Q2_K", "Q3_K", "Q4_K",
    "Q5_K", "Q6_K", "Q8_K", "IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS", "IQ3_S",
    "IQ1_S", "IQ1_M", "IQ4_NL", "IQ4_XS",
])
def test_dequant_shape_and_finiteness(name):
    spec = Q.TYPE_BY_NAME[name]
    raw = RNG.integers(0, 256, size=(16, spec.block_bytes), dtype=np.uint8)
    # avoid inf/nan in the float16/float32 scale fields: mask exponent high bytes
    D_HI_BYTES = {"Q2_K": [81, 83], "Q3_K": [109], "Q6_K": [209], "Q8_K": [3],
                  "IQ1_M": [49, 51, 53, 55]}
    for off in D_HI_BYTES.get(name, [1, 3]):
        raw[:, off] &= 0x3B
    y = spec.dequant(raw)
    assert y.shape == (16, spec.block_elems)
    assert np.isfinite(y).all()


def test_iq4nl_table_semantics():
    # one block: d=1.0, all nibbles index i -> kvalues[i]
    d = np.float16(1.0)
    qs = (np.arange(16, dtype=np.uint8) | (np.arange(16, dtype=np.uint8) << 4))
    raw = np.concatenate([np.frombuffer(d.tobytes(), np.uint8), qs])[None, :]
    y = Q.dequant_iq4_nl(raw)[0]
    np.testing.assert_array_equal(y[:16], Q.KVALUES_IQ4NL.astype(np.float32))
    np.testing.assert_array_equal(y[16:], Q.KVALUES_IQ4NL.astype(np.float32))


def test_iq2xxs_known_block():
    # grid row 0 is all 0x08 (value 8); build a block selecting grid 0, signs idx 0,
    # scale bits 0 -> d * (0.5+0)*0.25 * 8 with d = 2.0 -> 2*0.125*8 = 2.0
    d = np.float16(2.0)
    qs = np.zeros(32, np.uint16)  # all grid index 0, aux32 = 0
    raw = np.concatenate([
        np.frombuffer(d.tobytes(), np.uint8),
        qs.view(np.uint8),
    ])[None, :]
    y = Q.dequant_iq2_xxs(raw)[0]
    np.testing.assert_allclose(y, np.full(256, 2.0, np.float32), rtol=1e-6)


def test_type_registry_block_geometry():
    sizes = {"Q4_0": (32, 18), "Q8_0": (32, 34), "Q2_K": (256, 84), "Q3_K": (256, 110),
             "Q4_K": (256, 144), "Q5_K": (256, 176), "Q6_K": (256, 210), "Q8_K": (256, 292),
             "IQ2_XXS": (256, 66), "IQ2_XS": (256, 74), "IQ2_S": (256, 82),
             "IQ3_XXS": (256, 98), "IQ3_S": (256, 110), "IQ1_S": (256, 50),
             "IQ1_M": (256, 56), "IQ4_NL": (32, 18), "IQ4_XS": (256, 136)}
    for name, (be, bb) in sizes.items():
        spec = Q.TYPE_BY_NAME[name]
        assert (spec.block_elems, spec.block_bytes) == (be, bb), name


@pytest.mark.parametrize("name,atol", [("IQ4_NL", 0.25), ("IQ4_XS", 0.3)])
def test_iq4_roundtrip(name, atol):
    spec = Q.TYPE_BY_NAME[name]
    x = rand_f32(spec.block_elems * 32)
    raw = spec.quantize(x)
    assert raw.shape == (32, spec.block_bytes)
    y = spec.dequant(raw).reshape(-1)
    err = np.abs(y - x).mean()
    assert err < atol, f"{name}: mean abs err {err}"


def test_iq4_beats_q4_0_on_gaussians():
    """The non-linear grid should beat linear Q4_0 on normal data (that is
    its purpose); sanity-check our quantizer achieves that."""
    x = rand_f32(32 * 256)
    e_nl = np.abs(Q.TYPE_BY_NAME["IQ4_NL"].dequant(
        Q.quantize_iq4_nl(x)).reshape(-1) - x).mean()
    e_40 = np.abs(Q.TYPE_BY_NAME["Q4_0"].dequant(
        Q.quantize_q4_0(x)).reshape(-1) - x).mean()
    assert e_nl < e_40, (e_nl, e_40)


# ---------------------------------------------------------------------------
# IQ2/IQ3 grid ENCODERS (round 2): encode -> decode consistency and quality
# (reference gate: quantize_quantize.cpp.patch:59-65 — IQ targets are
# imatrix-weighted codebook quantizers)
# ---------------------------------------------------------------------------

IQ_ENCODERS = ["IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS", "IQ3_S",
               "IQ1_S"]


@pytest.mark.parametrize("name", IQ_ENCODERS)
def test_iq_encoder_roundtrip_valid_blocks(name):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((32, 256)) * 0.08).astype(np.float32)
    spec = Q.TYPE_BY_NAME[name]
    raw = spec.quantize(x)
    assert raw.shape == (32, spec.block_bytes) and raw.dtype == np.uint8
    y = spec.dequant(raw)
    assert np.isfinite(y).all()
    # meaningful reconstruction (not garbage): correlation with the source
    c = np.corrcoef(x.reshape(-1), y.reshape(-1))[0, 1]
    floor = 0.85 if name.startswith("IQ1") else 0.9   # 1.56-bit ternary
    assert c > floor, (name, c)


@pytest.mark.parametrize("name,bits", [("IQ2_XXS", 2), ("IQ2_XS", 2),
                                       ("IQ2_S", 2), ("IQ3_XXS", 3),
                                       ("IQ3_S", 3)])
def test_iq_encoder_beats_linear_at_equal_bits(name, bits):
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((64, 256)) * 0.1).astype(np.float32)
    spec = Q.TYPE_BY_NAME[name]
    y = spec.dequant(spec.quantize(x))
    err = np.mean((y - x) ** 2)
    lv = 2 ** (bits - 1)
    g = x.reshape(-1, 32)
    a = np.abs(g).max(1, keepdims=True) / max(lv - 0.5, 1)
    q = np.clip(np.round(g / np.where(a > 0, a, 1)), -lv, lv - 1)
    lin = np.mean((q * a - g) ** 2)
    assert err < lin, (name, err, lin)


def test_iq_encoder_imatrix_improves_weighted_error():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((32, 256)) * 0.1).astype(np.float32)
    qw = np.ones((32, 256), np.float32)
    qw[:, :64] = 25.0                      # first columns matter much more
    spec = Q.TYPE_BY_NAME["IQ2_XXS"]
    y_plain = spec.dequant(spec.quantize(x))
    y_w = spec.dequant(spec.quantize(x, qw))
    werr_plain = np.mean(qw * (y_plain - x) ** 2)
    werr_w = np.mean(qw * (y_w - x) ** 2)
    assert werr_w <= werr_plain * 1.001, (werr_w, werr_plain)


def test_quantize_tool_refuses_iq2_without_imatrix(tmp_path):
    import subprocess, sys as _sys
    from tests.util_models import make_tiny_llama_gguf
    src = tmp_path / "in.gguf"
    make_tiny_llama_gguf(str(src))
    p = subprocess.run(
        [_sys.executable, "tools/quantize.py", str(src),
         str(tmp_path / "out.gguf"), "IQ2_XXS"],
        capture_output=True, text=True)
    assert p.returncode != 0
    assert "imatrix" in p.stderr.lower()


def test_iq1s_encoder_beats_ternary_baseline():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((64, 256)) * 0.1).astype(np.float32)
    spec = Q.TYPE_BY_NAME["IQ1_S"]
    y = spec.dequant(spec.quantize(x))
    err = np.mean((y - x) ** 2)
    g = x.reshape(-1, 32)
    tern = np.sign(g) * np.abs(g).mean(1, keepdims=True)
    base = np.mean((tern - g) ** 2)
    assert err < base, (err, base)


def test_iq1m_encoder_beats_iq1s():
    """IQ1_M's finer structure (per-16 scales + per-8 delta signs) must beat
    IQ1_S on the same data, and both beat the ternary baseline."""
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((64, 256)) * 0.1).astype(np.float32)
    m = Q.TYPE_BY_NAME["IQ1_M"]
    s = Q.TYPE_BY_NAME["IQ1_S"]
    err_m = np.mean((m.dequant(m.quantize(x)) - x) ** 2)
    err_s = np.mean((s.dequant(s.quantize(x)) - x) ** 2)
    g = x.reshape(-1, 32)
    tern = np.sign(g) * np.abs(g).mean(1, keepdims=True)
    base = np.mean((tern - g) ** 2)
    assert err_m < err_s < base, (err_m, err_s, base)
    # imatrix weighting must not be rejected and should not hurt on average
    qw = np.abs(rng.standard_normal((64, 256))).astype(np.float32) + 0.5
    y = m.dequant(m.quantize(x, qweights=qw))
    werr = np.mean(qw * (y - x) ** 2)
    uerr = np.mean(qw * (m.dequant(m.quantize(x)) - x) ** 2)
    assert werr <= uerr * 1.02
