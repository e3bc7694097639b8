"""Sampling chain: penalties / logit-bias / top-k / tfs / typical / top-p /
min-p / temperature (or dynatemp) / mirostat.

Analog of the reference's llama_sampling_sample chain (upstream sampling.cpp
via llamafile-files/sampling.cpp; defaults in llamafile/flags.cpp:39-89 — temp
0.8, top_p 0.95; sampler order sampling.cpp:249-266 = top_k -> tfs_z ->
typical_p -> top_p -> min_p -> temperature, applied over the PENALIZED,
logit-biased distribution with temperature LAST). Implemented as jit-friendly
functions over logits so the chain runs on-device inside the decode scan; the
host never sees full logits.

Repetition penalties follow the reference's penalty_last_n window (sampling.h
:35, default 64): callers maintain a sliding window of recent token ids via
penalty_window_init/push instead of whole-context counts.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    # tail-free sampling / locally-typical sampling (sampling.h:30-31,
    # 1.0 = disabled; chain position per sampler_queue)
    tfs_z: float = 1.0
    typical_p: float = 1.0
    # dynamic-temperature (entropy) sampling: temp ranges over
    # [temp-range, temp+range] by normalized candidate entropy^exponent
    # (sampling.h:33-34, llama_sample_entropy)
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # how many recent tokens the penalties see (sampling.h:35):
    # 0 = penalties disabled, -1 = entire context
    penalty_last_n: int = 64
    # static per-token logit offsets ((token_id, bias), ...) — tuple for
    # hashability (SamplingParams is a static jit arg); reference
    # sampling.h:61 unordered_map applied in llama_sampling_prepare
    logit_bias: Tuple[Tuple[int, float], ...] = ()
    seed: int = 0
    # mirostat adaptive sampling (reference: llamafile-files/sampling.h:39-41
    # cfg defaults mirostat=0 tau=5.0 eta=0.1): 0=off, 1=v1, 2=v2
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0 and self.mirostat == 0

    @property
    def penalized(self) -> bool:
        return self.penalty_last_n != 0 and (
            self.repeat_penalty != 1.0 or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0)


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    repeat: float, presence: float, frequency: float) -> jax.Array:
    """counts: [B, n_vocab] occurrence counts of tokens in the penalty window."""
    seen = counts > 0
    if repeat != 1.0:
        logits = jnp.where(seen, jnp.where(logits > 0, logits / repeat, logits * repeat),
                           logits)
    logits = logits - counts * frequency - seen * presence
    return logits


def apply_logit_bias(logits: jax.Array, bias: Tuple[Tuple[int, float], ...]):
    if not bias:
        return logits
    ids = jnp.asarray([t for t, _ in bias], jnp.int32)
    vals = jnp.asarray([v for _, v in bias], jnp.float32)
    return logits.at[:, ids].add(vals)


# ---------------------------------------------------------------------------
# Penalty window (reference penalty_last_n, default 64)
# ---------------------------------------------------------------------------

class PenaltyWindow(NamedTuple):
    """Sliding-window token counts carried through the decode scan.

    counts [B, V] float32 — occurrence counts of the last `last_n` tokens;
    ring [B, N] int32 — the most recent N token ids (N >= effective last_n);
    rlen [B] int32 — total tokens ever pushed (eviction index derives from it).
    last_n [B] int32 — per-row window (<= N); <=0 entries never evict
    (penalty_last_n = -1, whole context)."""
    counts: jax.Array
    ring: jax.Array
    rlen: jax.Array
    last_n: jax.Array


def penalty_window_init(ids_list, n_vocab: int, last_n: int,
                        ring_size: Optional[int] = None) -> PenaltyWindow:
    """Host-side init for ONE row from its full context ids (python list).

    ring_size: fixed ring width for batched carriers (the batcher shares one
    [R, N] ring across rows — last_n clamps to it); default sizes the ring to
    last_n exactly (single-row engine path)."""
    import numpy as np
    n = max(1, ring_size if ring_size is not None
            else (last_n if last_n > 0 else 1))
    eff = min(last_n, n) if last_n > 0 else (-1 if last_n < 0 else 0)
    counts = np.zeros((1, n_vocab), np.float32)
    ring = np.zeros((1, n), np.int32)
    window = (ids_list if eff < 0
              else ids_list[-min(eff, len(ids_list)):] if eff > 0 else [])
    for t in window:
        counts[0, t] += 1.0
    rlen = len(ids_list)
    for j, t in enumerate(ids_list[-min(n, rlen):]):
        ring[0, (rlen - min(n, rlen) + j) % n] = t
    return PenaltyWindow(jnp.asarray(counts), jnp.asarray(ring),
                         jnp.asarray([rlen], jnp.int32),
                         jnp.asarray([eff], jnp.int32))


def penalty_window_push(pw: PenaltyWindow, nxt: jax.Array) -> PenaltyWindow:
    """Push one token per row (nxt [B] int32), evicting the token that leaves
    each row's last_n window. jit-friendly; O(B) scatter work."""
    b = nxt.shape[0]
    n = pw.ring.shape[1]
    rows = jnp.arange(b)
    # token leaving the window: position rlen - last_n (still inside the ring
    # because last_n <= N); only evict when the window is full and last_n > 0
    evict_on = (pw.last_n > 0) & (pw.rlen >= pw.last_n)
    evict_pos = jnp.where(pw.last_n > 0, (pw.rlen - pw.last_n) % n, 0)
    old = pw.ring[rows, evict_pos]
    counts = pw.counts.at[rows, old].add(
        -evict_on.astype(jnp.float32))
    ring = pw.ring.at[rows, pw.rlen % n].set(nxt)
    counts = counts.at[rows, nxt].add(1.0)
    return PenaltyWindow(counts, ring, pw.rlen + 1, pw.last_n)


# ---------------------------------------------------------------------------
# Chain stages (full-vocab; each gated statically by its param)
# ---------------------------------------------------------------------------

def _scatter_sorted_mask(keep_sorted: jax.Array, order: jax.Array) -> jax.Array:
    """keep_sorted [B, V] bool in sorted order, order [B, V] original indices
    -> keep mask [B, V] in vocab order."""
    b, v = order.shape
    rows = jnp.arange(b)[:, None]
    return jnp.zeros_like(keep_sorted).at[rows, order].set(keep_sorted)


def _tfs_mask(logits: jax.Array, z: float) -> jax.Array:
    """Tail-free sampling cut (llama_sample_tail_free): normalize the absolute
    second derivative of the sorted-prob curve, keep candidates before the
    cumsum crosses z. Returns masked logits."""
    order = jnp.argsort(-logits, axis=-1)
    sl = jnp.take_along_axis(logits, order, axis=-1)
    p = jax.nn.softmax(sl, axis=-1)                      # -inf -> 0
    live = jnp.isfinite(sl)
    n_live = jnp.sum(live, axis=-1, keepdims=True)       # [B, 1]
    fd = p[..., :-1] - p[..., 1:]                        # [B, V-1]
    sd = jnp.abs(fd[..., :-1] - fd[..., 1:])             # [B, V-2]
    i = jnp.arange(sd.shape[-1])[None, :]
    valid = i < (n_live - 2)
    sd = jnp.where(valid, sd, 0.0)
    ssum = jnp.sum(sd, axis=-1, keepdims=True)
    n_sd = jnp.maximum(n_live - 2, 1).astype(jnp.float32)
    sd = jnp.where(ssum > 1e-6, sd / jnp.maximum(ssum, 1e-20),
                   jnp.where(valid, 1.0 / n_sd, 0.0))
    cum = jnp.cumsum(sd, axis=-1)                        # [B, V-2]
    # token position i dropped iff i >= first index (>= min_keep=1) whose
    # inclusive cumsum exceeds z; positions beyond the sd range inherit the
    # total (== 1 after normalization, > z) so the tail is dropped
    ti = jnp.arange(p.shape[-1])[None, :]
    cum_tok = jnp.take_along_axis(
        jnp.pad(cum, ((0, 0), (0, 2)), mode="edge"),
        jnp.minimum(ti, jnp.maximum(n_live - 3, 0)), axis=-1)
    keep_sorted = (ti == 0) | (cum_tok <= z)
    keep_sorted = keep_sorted & live
    keep = _scatter_sorted_mask(keep_sorted, order)
    return jnp.where(keep, logits, -jnp.inf)


def _typical_mask(logits: jax.Array, tp: float) -> jax.Array:
    """Locally-typical sampling (llama_sample_typical): rank candidates by
    |surprise - entropy| ascending, keep until cumulative prob crosses tp."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1, keepdims=True)
    shifted = jnp.where(jnp.isfinite(logits),
                        jnp.abs(-logp - ent), jnp.inf)
    order = jnp.argsort(shifted, axis=-1)                # ascending
    ps = jnp.take_along_axis(p, order, axis=-1)
    cum_excl = jnp.cumsum(ps, axis=-1) - ps
    # reference breaks when inclusive cumsum EXCEEDS tp with last_idx = i+1
    # (the crossing token is kept) -> keep while the exclusive cumsum <= tp
    ti = jnp.arange(p.shape[-1])[None, :]
    keep_sorted = ((ti == 0) | (cum_excl <= tp)) & jnp.isfinite(
        jnp.take_along_axis(logits, order, axis=-1))
    keep = _scatter_sorted_mask(keep_sorted, order)
    return jnp.where(keep, logits, -jnp.inf)


def _dyn_temp(logits: jax.Array, temp: float, rng: float, expo: float):
    """llama_sample_entropy: map normalized candidate entropy to a temperature
    in [max(0, temp-rng), max(0, temp+rng)]. Returns per-row temps [B, 1]."""
    min_t = max(0.0, temp - rng)
    max_t = max(0.0, temp + rng)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1, keepdims=True)
    n_live = jnp.sum(jnp.isfinite(logits), axis=-1, keepdims=True)
    max_ent = jnp.log(jnp.maximum(n_live.astype(jnp.float32), 1.0))
    norm = jnp.where(max_ent > 0, ent / max_ent, 0.0)
    return min_t + (max_t - min_t) * jnp.power(norm, expo)


def sample(logits: jax.Array, key: jax.Array, params: SamplingParams,
           counts: Optional[jax.Array] = None) -> jax.Array:
    """logits [B, V] f32 -> token ids [B] int32. Reference chain order:
    bias -> penalties -> top_k -> tfs_z -> typical_p -> top_p -> min_p ->
    temperature (cutoffs operate on the UNtempered distribution, temperature
    last — sampler_queue's default KFYPMT sequence)."""
    logits = apply_logit_bias(logits, params.logit_bias)
    if counts is not None and params.penalized:
        logits = apply_penalties(logits, counts, params.repeat_penalty,
                                 params.presence_penalty, params.frequency_penalty)
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    v = logits.shape[-1]
    if params.top_k and params.top_k < v:
        kth = jnp.sort(logits, axis=-1)[..., v - params.top_k:v - params.top_k + 1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.tfs_z < 1.0:
        logits = _tfs_mask(logits, params.tfs_z)
    if params.typical_p < 1.0:
        logits = _typical_mask(logits, params.typical_p)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep the best)
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if params.min_p > 0.0:
        max_logit = jnp.max(logits, axis=-1, keepdims=True)
        # p_i / p_max >= min_p  <=>  logit_i >= logit_max + log(min_p)
        logits = jnp.where(logits < max_logit + jnp.log(params.min_p), -jnp.inf, logits)
    if params.dynatemp_range > 0.0:
        t = _dyn_temp(logits, params.temperature, params.dynatemp_range,
                      params.dynatemp_exponent)
        logits = logits / jnp.maximum(t, 1e-4)
    else:
        logits = logits / max(params.temperature, 1e-4)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def mirostat_init(params: SamplingParams, batch: int) -> jax.Array:
    """Initial mu state [B] (2*tau, per the reference's ctx init)."""
    return jnp.full((batch,), 2.0 * params.mirostat_tau, jnp.float32)


def sample_mirostat(logits: jax.Array, key: jax.Array, params: SamplingParams,
                    mu: jax.Array):
    """Mirostat v1/v2 (Basu et al. 2021; reference sampling.cpp mirostat path),
    run fully ON DEVICE with mu as carried state — the reference recomputes the
    candidate sort on the host each token; here it lives in the decode scan.

    logits [B, V], mu [B] -> (tokens [B] int32, new mu [B]).
    """
    b, v = logits.shape
    t = jnp.float32(max(params.temperature, 1e-4))
    logp = jax.nn.log_softmax(logits / t, axis=-1)
    if params.mirostat == 2:
        # v2: drop candidates whose surprise -log2 p exceeds mu, renormalize
        surprise = -logp / jnp.log(2.0)                       # [B, V]
        masked = jnp.where(surprise > mu[:, None], -jnp.inf, logp)
        # never mask everything: always keep the argmax
        best = jnp.argmax(logp, axis=-1)
        masked = jnp.where(jnp.all(jnp.isinf(masked), axis=-1, keepdims=True),
                           logp, masked)
        tok = jax.random.categorical(key, masked, axis=-1)
        # observed surprise from the RENORMALIZED truncated set (the reference
        # re-runs llama_sample_softmax over the survivors before -log2 p)
        logq = jax.nn.log_softmax(masked, axis=-1)
        surprise_obs = -jnp.take_along_axis(
            logq, tok[:, None], axis=1)[:, 0] / jnp.log(2.0)
    else:
        # v1: fit the Zipf exponent s_hat on the top-100 candidates, derive k
        m = min(100, v)
        vals, idx = jax.lax.top_k(logp, m)                    # [B, m] desc
        i = jnp.arange(m - 1, dtype=jnp.float32)
        t_i = jnp.log((i + 2.0) / (i + 1.0))                  # [m-1]
        b_i = vals[:, :-1] - vals[:, 1:]                      # log(p_i/p_{i+1})
        s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)   # [B]
        eps = jnp.maximum(s_hat - 1.0, 1e-4)
        n = jnp.float32(v)
        k = ((eps * jnp.exp2(mu)) / (1.0 - n ** (-eps))) ** (1.0 / s_hat)
        k = jnp.clip(k, 1.0, float(m))
        keep = jnp.arange(m)[None, :] < k[:, None]
        masked = jnp.where(keep, vals, -jnp.inf)
        pick = jax.random.categorical(key, masked, axis=-1)   # [B] in [0, m)
        tok = jnp.take_along_axis(idx, pick[:, None], axis=1)[:, 0]
        logq = jax.nn.log_softmax(masked, axis=-1)   # renormalized survivors
        surprise_obs = -jnp.take_along_axis(
            logq, pick[:, None], axis=1)[:, 0] / jnp.log(2.0)
    mu = mu - params.mirostat_eta * (surprise_obs - params.mirostat_tau)
    return tok.astype(jnp.int32), mu


def sample_stateful(logits: jax.Array, key: jax.Array, params: SamplingParams,
                    counts: Optional[jax.Array], mu: Optional[jax.Array]):
    """Full chain incl. mirostat state: returns (tokens [B], new mu)."""
    if params.mirostat:
        assert mu is not None
        logits = apply_logit_bias(logits, params.logit_bias)
        if counts is not None and params.penalized:
            logits = apply_penalties(logits, counts, params.repeat_penalty,
                                     params.presence_penalty,
                                     params.frequency_penalty)
        return sample_mirostat(logits, key, params, mu)
    return sample(logits, key, params, counts), mu


# ---------------------------------------------------------------------------
# Batched per-row chain (continuous batcher)
# ---------------------------------------------------------------------------

K_BUDGET = 64


class RowParams(NamedTuple):
    """Per-row sampling knobs for the fused batcher step (all [R] f32/int32
    except bias, an optional [R, V] logit-offset table built from each
    request's logit_bias map)."""
    temps: jax.Array
    top_ps: jax.Array
    min_ps: jax.Array
    top_ks: jax.Array
    rep_pens: jax.Array
    pres_pens: jax.Array
    freq_pens: jax.Array
    tfs_zs: jax.Array
    typ_ps: jax.Array
    dt_ranges: jax.Array
    dt_exps: jax.Array
    bias: Optional[jax.Array] = None


def sample_batched(logits: jax.Array, keys: jax.Array, rp: RowParams,
                   counts: Optional[jax.Array] = None,
                   k_budget: int = K_BUDGET) -> jax.Array:
    """Per-row sampling for the continuous batcher — full chain fidelity.

    logits [R, V]; keys: typed PRNG key array [R] (one independent stream per
    request, derived from its seed); counts [R, V] penalty-window occurrence
    counts. Rows with temp <= 0 decode greedily (over penalized logits,
    matching the reference chain order). Non-greedy rows run the cutoff chain
    within a fixed top-k_budget candidate set (sorting V per step is wasteful;
    k_budget covers practical top_k settings) in the reference order — top_k,
    tfs_z, typical_p, top_p, min_p on the UNtempered distribution, then
    temperature/dynatemp last. Returns [R] int32.
    """
    r, v = logits.shape
    if rp.bias is not None:
        logits = logits + rp.bias
    if counts is not None:
        seen = counts > 0
        rpen = rp.rep_pens[:, None]
        logits = jnp.where(seen,
                           jnp.where(logits > 0, logits / rpen, logits * rpen),
                           logits)
        logits = (logits - counts * rp.freq_pens[:, None]
                  - seen * rp.pres_pens[:, None])
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    vals, idx = jax.lax.top_k(logits, k_budget)       # [R, K] sorted desc, raw
    ti = jnp.arange(k_budget)[None, :]
    # per-row top_k (<= 0 means disabled: keep the whole budget)
    eff_k = jnp.where(rp.top_ks <= 0, k_budget,
                      jnp.minimum(rp.top_ks, k_budget))       # [R]
    vals = jnp.where(ti < eff_k[:, None], vals, -jnp.inf)
    # --- tfs_z within the budget (sorted desc already) ---
    p = jax.nn.softmax(vals, axis=-1)
    n_live = jnp.sum(jnp.isfinite(vals), axis=-1, keepdims=True)
    fd = p[:, :-1] - p[:, 1:]
    sd = jnp.abs(fd[:, :-1] - fd[:, 1:])
    sd = jnp.where(ti[:, : k_budget - 2] < (n_live - 2), sd, 0.0)
    ssum = jnp.sum(sd, axis=-1, keepdims=True)
    n_sd = jnp.maximum(n_live - 2, 1).astype(jnp.float32)
    sd = jnp.where(ssum > 1e-6, sd / jnp.maximum(ssum, 1e-20),
                   jnp.where(ti[:, : k_budget - 2] < (n_live - 2),
                             1.0 / n_sd, 0.0))
    cum_sd = jnp.cumsum(sd, axis=-1)
    cum_tok = jnp.take_along_axis(
        jnp.pad(cum_sd, ((0, 0), (0, 2)), mode="edge"),
        jnp.minimum(ti, jnp.maximum(n_live - 3, 0)), axis=-1)
    tfs_keep = ((ti == 0) | (cum_tok <= rp.tfs_zs[:, None])
                | (rp.tfs_zs[:, None] >= 1.0))
    vals = jnp.where(tfs_keep, vals, -jnp.inf)
    # --- typical_p within the budget ---
    logp = jax.nn.log_softmax(vals, axis=-1)
    pt = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(pt > 0, pt * logp, 0.0), axis=-1, keepdims=True)
    shifted = jnp.where(jnp.isfinite(vals), jnp.abs(-logp - ent), jnp.inf)
    order = jnp.argsort(shifted, axis=-1)
    ps = jnp.take_along_axis(pt, order, axis=-1)
    cum_excl = jnp.cumsum(ps, axis=-1) - ps
    keep_sorted = (ti == 0) | (cum_excl <= rp.typ_ps[:, None])
    keep_sorted = keep_sorted | (rp.typ_ps[:, None] >= 1.0)
    rows = jnp.arange(r)[:, None]
    typ_keep = jnp.zeros((r, k_budget), bool).at[rows, order].set(keep_sorted)
    vals = jnp.where(typ_keep, vals, -jnp.inf)
    # --- top_p / min_p on the untempered candidate probs ---
    probs = jax.nn.softmax(vals, axis=-1)
    # candidates are desc by logit but typical may punch holes; re-sorting is
    # unnecessary because cumsum-over-desc-order only needs monotonic probs —
    # holes have p=0 and don't perturb the running sum
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < rp.top_ps[:, None]               # top-p: keep head
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    keep_m = probs >= (pmax * rp.min_ps[:, None])             # min-p vs best
    masked = jnp.where(keep_p & keep_m, vals, -jnp.inf)
    # --- temperature last (dynatemp per row when range > 0) ---
    safe_t = jnp.maximum(rp.temps, 1e-4)
    mlogp = jax.nn.log_softmax(masked, axis=-1)
    mp = jnp.exp(mlogp)
    ment = -jnp.sum(jnp.where(mp > 0, mp * mlogp, 0.0), axis=-1)
    mn = jnp.maximum(jnp.sum(jnp.isfinite(masked), axis=-1), 1)
    ment_max = jnp.log(mn.astype(jnp.float32))
    norm = jnp.where(ment_max > 0, ment / ment_max, 0.0)
    min_t = jnp.maximum(rp.temps - rp.dt_ranges, 0.0)
    max_t = jnp.maximum(rp.temps + rp.dt_ranges, 0.0)
    dyn_t = min_t + (max_t - min_t) * jnp.power(norm, rp.dt_exps)
    t_eff = jnp.where(rp.dt_ranges > 0.0, jnp.maximum(dyn_t, 1e-4), safe_t)
    picked = jax.vmap(jax.random.categorical)(keys, masked / t_eff[:, None])
    sampled_tok = jnp.take_along_axis(idx, picked[:, None], axis=1)[:, 0]
    return jnp.where(rp.temps <= 0.0, greedy_tok, sampled_tok).astype(jnp.int32)


def row_params_from_sp(sps, n_vocab: int) -> RowParams:
    """Build RowParams from a list of per-row SamplingParams (host-side).
    Rows with penalty_last_n == 0 get their penalties neutralized (reference:
    last_n 0 disables penalties regardless of the knob values)."""
    import numpy as np
    r = len(sps)
    f = lambda g: jnp.asarray([g(sp) for sp in sps], jnp.float32)
    bias = None
    if any(sp.logit_bias for sp in sps):
        b = np.zeros((r, n_vocab), np.float32)
        for i, sp in enumerate(sps):
            for t, x in sp.logit_bias:
                if 0 <= t < n_vocab:
                    b[i, t] += x
        bias = jnp.asarray(b)
    off = lambda sp: sp.penalty_last_n != 0
    return RowParams(
        temps=f(lambda s: s.temperature),
        top_ps=f(lambda s: s.top_p),
        min_ps=f(lambda s: s.min_p),
        top_ks=jnp.asarray([sp.top_k for sp in sps], jnp.int32),
        rep_pens=f(lambda s: s.repeat_penalty if off(s) else 1.0),
        pres_pens=f(lambda s: s.presence_penalty if off(s) else 0.0),
        freq_pens=f(lambda s: s.frequency_penalty if off(s) else 0.0),
        tfs_zs=f(lambda s: s.tfs_z),
        typ_ps=f(lambda s: s.typical_p),
        dt_ranges=f(lambda s: s.dynatemp_range),
        dt_exps=f(lambda s: s.dynatemp_exponent),
        bias=bias,
    )
