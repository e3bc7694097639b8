"""Sampling-chain tail: tfs_z, typical_p, dynatemp, logit_bias, and the
penalty_last_n sliding window — parity against scalar transcriptions of the
reference samplers.

Reference: llamafile-files/sampling.h:30-35,61 (knobs), sampling.cpp:249-266
(sampler_queue order: top_k -> tfs_z -> typical_p -> top_p -> min_p -> temp),
upstream llama.cpp llama_sample_tail_free / llama_sample_typical /
llama_sample_entropy formulas.
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from llamafile_tpu.runtime.sampling import (PenaltyWindow, RowParams,
                                            SamplingParams, _dyn_temp,
                                            _tfs_mask, _typical_mask,
                                            penalty_window_init,
                                            penalty_window_push, sample,
                                            sample_batched)


def _rand_logits(v=512, seed=0, b=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 2.0, (b, v)).astype(np.float32))


# -- scalar references (llama.cpp transcriptions) ---------------------------

def ref_tfs_keep(logits, z, min_keep=1):
    """Returns the kept token-id set (llama_sample_tail_free)."""
    order = np.argsort(-logits)
    p = np.exp(logits[order] - logits[order].max())
    p /= p.sum()
    size = len(p)
    if z >= 1.0 or size <= 2:
        return set(order.tolist())
    fd = p[:-1] - p[1:]
    sd = np.abs(fd[:-1] - fd[1:])
    s = sd.sum()
    sd = sd / s if s > 1e-6 else np.full_like(sd, 1.0 / len(sd))
    cum = 0.0
    last_idx = size
    for i in range(len(sd)):
        cum += sd[i]
        if cum > z and i >= min_keep:
            last_idx = i
            break
    return set(order[:last_idx].tolist())


def ref_typical_keep(logits, tp, min_keep=1):
    """Kept token-id set (llama_sample_typical)."""
    if tp >= 1.0:
        return set(range(len(logits)))
    lp = logits - logits.max()
    p = np.exp(lp)
    p /= p.sum()
    logp = np.log(p)
    ent = -np.sum(p * logp)
    shifted = np.abs(-logp - ent)
    order = np.argsort(shifted, kind="stable")
    cum = 0.0
    last_idx = len(order)
    for i, oi in enumerate(order):
        cum += p[oi]
        if cum > tp and i + 1 >= min_keep:
            last_idx = i + 1
            break
    return set(order[:last_idx].tolist())


def ref_dyn_temp(logits, temp, rng_, expo):
    mn, mx = max(0.0, temp - rng_), max(0.0, temp + rng_)
    lp = logits - logits.max()
    p = np.exp(lp)
    p /= p.sum()
    ent = -np.sum(p[p > 0] * np.log(p[p > 0]))
    max_ent = np.log(len(p))
    return mn + (mx - mn) * (ent / max_ent) ** expo


# -- full-vocab chain (engine path) ------------------------------------------

@pytest.mark.parametrize("z", [0.3, 0.7, 0.95])
def test_tfs_matches_scalar_reference(z):
    logits = _rand_logits(v=256, seed=1)
    masked = np.asarray(_tfs_mask(logits, z))[0]
    got = set(np.nonzero(np.isfinite(masked))[0].tolist())
    want = ref_tfs_keep(np.asarray(logits)[0], z)
    assert got == want, (len(got), len(want), z)


@pytest.mark.parametrize("tp", [0.2, 0.5, 0.9])
def test_typical_matches_scalar_reference(tp):
    logits = _rand_logits(v=256, seed=2)
    masked = np.asarray(_typical_mask(logits, tp))[0]
    got = set(np.nonzero(np.isfinite(masked))[0].tolist())
    want = ref_typical_keep(np.asarray(logits)[0], tp)
    assert got == want, (sorted(got)[:5], sorted(want)[:5], tp)


def test_dynatemp_matches_scalar_reference():
    logits = _rand_logits(v=256, seed=3)
    t = float(np.asarray(_dyn_temp(logits, 0.8, 0.5, 1.3))[0, 0])
    want = ref_dyn_temp(np.asarray(logits)[0], 0.8, 0.5, 1.3)
    assert abs(t - want) < 1e-4


def test_logit_bias_forces_and_bans_tokens():
    logits = _rand_logits(v=64, seed=4)
    top = int(np.asarray(logits)[0].argmax())
    target = (top + 7) % 64
    sp = SamplingParams(temperature=0.0,
                        logit_bias=((target, 100.0),))
    tok = sample(logits, jax.random.PRNGKey(0), sp)
    assert int(tok[0]) == target
    # banning the argmax moves greedy to the runner-up
    sp2 = SamplingParams(temperature=0.0, logit_bias=((top, -1e9),))
    tok2 = sample(logits, jax.random.PRNGKey(0), sp2)
    assert int(tok2[0]) != top


def test_tfs_typical_disabled_are_noops():
    logits = _rand_logits(v=128, seed=5)
    m1 = np.asarray(_tfs_mask(logits, 1.0) if False else logits)
    sp = SamplingParams(temperature=0.0, tfs_z=1.0, typical_p=1.0)
    tok = sample(logits, jax.random.PRNGKey(0), sp)
    assert int(tok[0]) == int(np.asarray(logits)[0].argmax())


# -- penalty window -----------------------------------------------------------

def test_penalty_window_init_counts_only_last_n():
    ids = [5] * 10 + [7] * 3
    pw = penalty_window_init(ids, 32, last_n=4)
    c = np.asarray(pw.counts)[0]
    assert c[7] == 3 and c[5] == 1 and c.sum() == 4


def test_penalty_window_push_evicts_leaving_token():
    ids = [1, 2, 3, 4]
    pw = penalty_window_init(ids, 32, last_n=4)
    # push 9: window becomes [2, 3, 4, 9] — token 1 evicted
    pw = penalty_window_push(pw, jnp.asarray([9], jnp.int32))
    c = np.asarray(pw.counts)[0]
    assert c[1] == 0 and c[9] == 1 and c[2] == c[3] == c[4] == 1
    # three more pushes: [9, 10, 11, 12]
    for t in (10, 11, 12):
        pw = penalty_window_push(pw, jnp.asarray([t], jnp.int32))
    c = np.asarray(pw.counts)[0]
    assert c.sum() == 4 and c[9] == 1 and c[2] == 0


def test_penalty_window_whole_context_never_evicts():
    pw = penalty_window_init([1, 2, 3], 32, last_n=-1)
    for t in range(10):
        pw = penalty_window_push(pw, jnp.asarray([t % 5], jnp.int32))
    assert float(np.asarray(pw.counts).sum()) == 13.0


def test_repeat_penalty_respects_window():
    # token 3 occurred long ago (outside the 2-token window): unpenalized
    ids = [3, 3, 3, 1, 2]
    pw = penalty_window_init(ids, 8, last_n=2)
    logits = jnp.asarray([[0.0, 0.5, 0.5, 2.0, 1.0, 0.0, 0.0, 0.0]])
    sp = SamplingParams(temperature=0.0, repeat_penalty=5.0, penalty_last_n=2)
    tok = sample(logits, jax.random.PRNGKey(0), sp, pw.counts)
    assert int(tok[0]) == 3        # 3 is outside the window: stays argmax
    # same logits with the window covering the 3s: heavily penalized
    pw_all = penalty_window_init(ids, 8, last_n=-1)
    sp_all = SamplingParams(temperature=0.0, repeat_penalty=5.0,
                            penalty_last_n=-1)
    tok2 = sample(logits, jax.random.PRNGKey(0), sp_all, pw_all.counts)
    assert int(tok2[0]) != 3


# -- batched chain (k-budget path) -------------------------------------------

def _rp(sps, v):
    from llamafile_tpu.runtime.sampling import row_params_from_sp
    return row_params_from_sp(sps, v)


def test_batched_tfs_typical_match_full_vocab_on_small_support():
    # concentrate mass on < 64 tokens so the k-budget set is exact
    rng = np.random.default_rng(7)
    base = np.full((2, 512), -60.0, np.float32)
    base[0, :20] = rng.normal(0, 1.5, 20)
    base[1, 100:130] = rng.normal(0, 1.5, 30)
    logits = jnp.asarray(base)
    sps = [SamplingParams(temperature=1.0, top_k=0, top_p=1.0, min_p=0.0,
                          tfs_z=0.6, seed=5),
           SamplingParams(temperature=1.0, top_k=0, top_p=1.0, min_p=0.0,
                          typical_p=0.5, seed=6)]
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    toks = np.asarray(sample_batched(logits, keys, _rp(sps, 512)))
    keep0 = ref_tfs_keep(base[0], 0.6)
    keep1 = ref_typical_keep(base[1], 0.5)
    # over many draws every sample must come from the reference-kept set
    for s in range(20):
        ks = jax.random.split(jax.random.PRNGKey(100 + s), 2)
        t = np.asarray(sample_batched(logits, ks, _rp(sps, 512)))
        assert int(t[0]) in keep0
        assert int(t[1]) in keep1


def test_batched_dynatemp_and_greedy_rows():
    logits = _rand_logits(v=128, seed=8, b=2)
    sps = [SamplingParams(temperature=0.0),
           SamplingParams(temperature=0.8, dynatemp_range=0.4, top_k=0,
                          top_p=1.0, min_p=0.0, seed=1)]
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    toks = np.asarray(sample_batched(logits, keys, _rp(sps, 128)))
    assert int(toks[0]) == int(np.asarray(logits)[0].argmax())
    assert 0 <= int(toks[1]) < 128


def test_batched_logit_bias_table():
    logits = _rand_logits(v=96, seed=9, b=2)
    sps = [SamplingParams(temperature=0.0, logit_bias=((11, 200.0),)),
           SamplingParams(temperature=0.0)]
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    toks = np.asarray(sample_batched(logits, keys, _rp(sps, 96)))
    assert int(toks[0]) == 11
    assert int(toks[1]) == int(np.asarray(logits)[1].argmax())
