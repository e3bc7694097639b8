"""Native C++ repacker vs numpy reference: bit-exact parity.

The native library is optional (auto-built with g++); tests skip when the
toolchain is unavailable.
"""
import numpy as np
import pytest

import llamafile_tpu.native as N
from llamafile_tpu.gguf import quants as Q

repack_mod = pytest.importorskip("llamafile_tpu.ops.repack")

RNG = np.random.default_rng(11)


@pytest.mark.skipif(N.lib() is None, reason="native toolchain unavailable")
@pytest.mark.parametrize("name", ["Q8_0", "Q4_0", "Q4_K", "Q5_K", "Q6_K"])
def test_native_matches_numpy(name):
    spec = Q.TYPE_BY_NAME[name]
    n, k = 128, 512
    raw = RNG.integers(0, 256, size=(n * k // spec.block_elems, spec.block_bytes),
                       dtype=np.uint8)
    nat = N.native_repack(raw, name, n, k)
    assert nat is not None
    saved = N.native_repack
    N.native_repack = lambda *a: None
    try:
        ref = repack_mod.repack_numpy(raw, name, (n, k))
    finally:
        N.native_repack = saved
    assert nat[0] == ref[0] and nat[4] == ref[4]
    for a, b in zip(nat[1:4], ref[1:4]):
        if a is None:
            assert b is None
            continue
        if a.dtype == np.float32:
            np.testing.assert_array_equal(a, b)  # nan-safe: compare bits
        else:
            assert np.array_equal(a, b)


def test_fallback_when_unavailable(monkeypatch):
    monkeypatch.setattr(N, "native_repack", lambda *a: None)
    spec = Q.TYPE_BY_NAME["Q8_0"]
    raw = RNG.integers(0, 256, size=(32 * 256 // 32, 34), dtype=np.uint8)
    kind, qs, a, b, g = repack_mod.repack_numpy(raw, "Q8_0", (32, 256))
    assert kind == "q8b" and qs.shape == (256, 32)
