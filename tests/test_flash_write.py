"""Fused flash-decode + KV-row-write kernel: the attention output AND the
updated cache must match the unfused (dynamic_update_slice + flash) path
exactly. On TPU this drives the aliased-output kernel; on CPU the fallback."""
import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from llamafile_tpu.ops.attention import (flash_decode_stacked,
                                         flash_decode_write_stacked)

L, B, S, Hkv, D, Hq = 3, 2, 512, 2, 128, 8


def test_fused_write_matches_unfused():
    rng = np.random.default_rng(0)
    k3 = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.bfloat16)
    v3 = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    pos = jnp.asarray([37, 301], jnp.int32)
    li = jnp.int32(1)
    scale = 0.088

    bidx = jnp.arange(B)
    k3u = k3.at[li, bidx, pos].set(kn.reshape(B, -1).astype(k3.dtype))
    v3u = v3.at[li, bidx, pos].set(vn.reshape(B, -1).astype(v3.dtype))
    want = np.asarray(flash_decode_stacked(q, k3u, v3u, li, pos, scale,
                                           hkv=Hkv))
    got, k3o, v3o = flash_decode_write_stacked(q, k3, v3, kn, vn, li, pos,
                                               scale, hkv=Hkv)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k3o), np.asarray(k3u))
    np.testing.assert_array_equal(np.asarray(v3o), np.asarray(v3u))


def test_fused_write_kernel_interpret(monkeypatch):
    """Drive the ACTUAL pallas write-kernel (in-kernel diagonal extract,
    aliased row write) via interpret mode — the test above exercises the
    CPU fallback only."""
    import llamafile_tpu.ops.attention as A
    rng = np.random.default_rng(1)
    k3 = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.bfloat16)
    v3 = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    pos = jnp.asarray([37, 301], jnp.int32)
    li = jnp.int32(1)
    scale = 0.088

    bidx = jnp.arange(B)
    k3u = k3.at[li, bidx, pos].set(kn.reshape(B, -1).astype(k3.dtype))
    v3u = v3.at[li, bidx, pos].set(vn.reshape(B, -1).astype(v3.dtype))
    want = np.asarray(flash_decode_stacked(q, k3u, v3u, li, pos, scale,
                                           hkv=Hkv))
    orig = A.pl.pallas_call
    monkeypatch.setattr(A.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got, k3o, v3o = flash_decode_write_stacked(q, k3, v3, kn, vn, li, pos,
                                               scale, hkv=Hkv)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k3o), np.asarray(k3u))
    np.testing.assert_array_equal(np.asarray(v3o), np.asarray(v3u))
