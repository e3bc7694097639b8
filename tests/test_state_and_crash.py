"""Session-state persistence + fault-retry utilities."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from llamafile_tpu.runtime.kvcache import init_kv
from llamafile_tpu.runtime.state import load_state, save_state
from llamafile_tpu.utils.crash import device_retry, show_crash_reports


def test_state_roundtrip(tmp_path):
    c = init_kv(2, 1, 8, 2, 16)
    c2 = type(c)(c.k + 1.0, c.v + 2.0, None, None)
    path = str(tmp_path / "s.npz")
    save_state(path, c2, [1, 2, 3])
    # trimmed to len(history) on disk, re-padded to max_len on load
    got, hist = load_state(path, max_len=8)
    assert hist == [1, 2, 3]
    assert got.k.shape == c2.k.shape
    np.testing.assert_array_equal(np.asarray(got.k[:, :, :3]),
                                  np.asarray(c2.k[:, :, :3]))
    np.testing.assert_array_equal(np.asarray(got.k[:, :, 3:]), 0.0)
    assert got.k_scale is None
    got2, _ = load_state(path)             # untrimmed load keeps S=3
    assert got2.k.shape[2] == 3


def test_state_roundtrip_int8(tmp_path):
    c = init_kv(1, 1, 4, 2, 16, jnp.int8)
    path = str(tmp_path / "s.npz")
    save_state(path, c, [7])
    got, hist = load_state(path, max_len=4)
    assert got.quantized and hist == [7]
    assert got.k.shape[2] == 4 and got.k_scale.shape[2] == 4


def test_device_retry_retries_faults(monkeypatch):
    calls = []

    class FakeJaxRuntimeError(Exception):
        pass
    FakeJaxRuntimeError.__name__ = "JaxRuntimeError"

    @device_retry(retries=2, backoff_s=0.0)
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise FakeJaxRuntimeError("FAILED_PRECONDITION: TPU halted")
        return "ok"

    assert flaky() == "ok"
    assert len(calls) == 3


def test_device_retry_passes_logic_errors():
    @device_retry(retries=3, backoff_s=0.0)
    def broken():
        raise ValueError("logic bug")

    with pytest.raises(ValueError):
        broken()


def test_show_crash_reports_enables():
    show_crash_reports()   # idempotent, should not raise
