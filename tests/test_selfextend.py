"""Group-attention self-extend (reference --grp-attn-n/--grp-attn-w,
server_server.cpp.patch:3629-3651).

The strongest check available without long-context weights: the incremental
shift mechanism (periodic re-rope of cached K, exactly the reference's
seq_add/seq_div/seq_add loop) must produce the SAME logits as directly roping
every cached key at its final mapped position — rope re-rotation is exact, so
any drift is a mechanism bug.
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.runtime.engine import Engine
from llamafile_tpu.runtime.selfextend import SelfExtend, plan_shifts
from tests.util_models import make_tiny_llama_gguf

GA_N, GA_W = 2, 8


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    make_tiny_llama_gguf(str(path))
    cfg, params, tok, _ = load_llama(str(path))
    # f32 KV: re-rope rotations are then exact, so the incremental-vs-direct
    # check isolates the mechanism (bf16 caches accumulate one rounding per
    # shift round, same as the reference's f16 cache)
    return Engine(cfg, params, tok, max_seq_len=64, kv_dtype="f32",
                  grp_attn_n=GA_N, grp_attn_w=GA_W)


def test_plan_shifts_reference_semantics():
    """The while-loop fires exactly when n_past crosses ga_i + ga_w and
    compresses positions by bd each round."""
    pos = np.arange(64, dtype=np.int32)
    n_past, ga_i, newpos, changed = plan_shifts(16, 16, 0, GA_N, GA_W, pos)
    assert changed
    # the reference while-loop fires twice here (bd = (w/n)(n-1) = 4):
    # round 1: n_past 16 -> 12, ga_i 0 -> 4; round 2: -> (8, 8)
    assert (n_past, ga_i) == (8, 8)
    # fully grouped: every ga_n=2 cells share one rope position
    assert np.array_equal(newpos[:16], np.arange(16) // 2)
    # positions stay monotonic non-decreasing over live cells
    assert (np.diff(newpos[:16]) >= 0).all()


def test_rerope_is_exact_rope_shift(engine):
    """rerope_dense(K roped at p, delta) == K roped at p + delta (rope is a
    rotation; shifting is exact). This is the op every self-extend position
    edit goes through."""
    from llamafile_tpu.models.llama import apply_rope, rope_cos_sin
    from llamafile_tpu.runtime.selfextend import rerope_dense
    cfg = engine.cfg
    rng = np.random.default_rng(1)
    L, B, S, H, D = 2, 1, 16, cfg.n_kv_heads, cfg.head_dim
    raw = jnp.asarray(rng.standard_normal((L, B, S, H, D)), jnp.float32)
    p0 = jnp.asarray(rng.integers(0, 100, (B, S)), jnp.int32)
    delta = jnp.asarray(rng.integers(-50, 50, (B, S)), jnp.int32)

    def rope_at(x, pos):
        cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta,
                                cfg.rope_scale, None)
        return apply_rope(x, cos[None, :, :, None, :],
                          sin[None, :, :, None, :], cfg.rope_neox)

    k0 = rope_at(raw, p0).reshape(L, B, S, H * D)
    got = rerope_dense(k0, delta, cfg.head_dim, cfg.rope_theta,
                       cfg.rope_scale, cfg.rope_neox)
    want = rope_at(raw, p0 + delta).reshape(L, B, S, H * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_positions_stay_bounded(engine):
    """Feeding far beyond ga_w keeps every rope position within the grouped
    bound (the whole point: positions never exceed ~ trained context)."""
    se = SelfExtend(engine, GA_N, GA_W)
    cache = engine.new_cache()
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=40).tolist()
    fed = 0
    while fed < len(ids):
        sl = ids[fed:fed + 7]
        cache, off = se.advance(cache, len(sl))
        _, cache = engine.prefill(cache, sl, pos0=fed, rope_off=off)
        fed += len(sl)
    assert se.ga_i > 0                  # the loop actually fired
    live = se.cell_pos[:se.cells]
    assert (np.diff(live) >= 0).all()   # monotonic grouped positions
    # every position was divided into the grouped range: far below raw index
    assert live.max() < len(ids) - 4
    assert se.rope_off == se.cells - se.n_past_se > 0


def test_generate_beyond_trained_context(engine):
    """End-to-end: greedy generation runs past ga_w with bounded rope
    positions and stays deterministic."""
    from llamafile_tpu.runtime.sampling import SamplingParams
    sp = SamplingParams(temperature=0.0)
    ids = list(range(3, 15))
    out1 = [t for t, _ in engine.generate("", max_tokens=20, sampling=sp,
                                          stop_on_eog=False, prompt_ids=ids)]
    out2 = [t for t, _ in engine.generate("", max_tokens=20, sampling=sp,
                                          stop_on_eog=False, prompt_ids=ids)]
    assert out1 == out2 and len(out1) == 20


def test_selfextend_rejects_bad_configs(engine):
    with pytest.raises(ValueError):
        SelfExtend(engine, 1, 8)        # ga_n must be > 1
    with pytest.raises(ValueError):
        SelfExtend(engine, 2, 9)        # ga_w % ga_n != 0
