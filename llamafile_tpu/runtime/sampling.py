"""Sampling chain: temperature / top-k / top-p / min-p / penalties.

Analog of the reference's llama_sampling_sample chain (upstream sampling.cpp via
llamafile-files/sampling.cpp; defaults in llamafile/flags.cpp:39-89 — temp 0.8,
top_p 0.95). Implemented as a jit-friendly function over logits so it can run
on-device inside the decode step; the host never sees full logits.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: int = 0
    # mirostat adaptive sampling (reference: llamafile-files/sampling.h:39-41
    # cfg defaults mirostat=0 tau=5.0 eta=0.1): 0=off, 1=v1, 2=v2
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0 and self.mirostat == 0


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    repeat: float, presence: float, frequency: float) -> jax.Array:
    """counts: [B, n_vocab] occurrence counts of tokens in each context."""
    seen = counts > 0
    if repeat != 1.0:
        logits = jnp.where(seen, jnp.where(logits > 0, logits / repeat, logits * repeat),
                           logits)
    logits = logits - counts * frequency - seen * presence
    return logits


def sample(logits: jax.Array, key: jax.Array, params: SamplingParams,
           counts: Optional[jax.Array] = None) -> jax.Array:
    """logits [B, V] f32 -> token ids [B] int32."""
    if counts is not None and (params.repeat_penalty != 1.0
                               or params.presence_penalty != 0.0
                               or params.frequency_penalty != 0.0):
        logits = apply_penalties(logits, counts, params.repeat_penalty,
                                 params.presence_penalty, params.frequency_penalty)
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / params.temperature
    v = logits.shape[-1]
    if params.top_k and params.top_k < v:
        kth = jnp.sort(logits, axis=-1)[..., v - params.top_k:v - params.top_k + 1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
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
    surprise_obs = -jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0] \
        / jnp.log(2.0)
    mu = mu - params.mirostat_eta * (surprise_obs - params.mirostat_tau)
    return tok.astype(jnp.int32), mu


def sample_stateful(logits: jax.Array, key: jax.Array, params: SamplingParams,
                    counts: Optional[jax.Array], mu: Optional[jax.Array]):
    """Full chain incl. mirostat state: returns (tokens [B], new mu)."""
    if counts is not None and (params.repeat_penalty != 1.0
                               or params.presence_penalty != 0.0
                               or params.frequency_penalty != 0.0):
        logits = apply_penalties(logits, counts, params.repeat_penalty,
                                 params.presence_penalty,
                                 params.frequency_penalty)
    if params.mirostat:
        assert mu is not None
        return sample_mirostat(logits, key, params, mu)
    return sample(logits, key, params, None), mu


@dataclass(frozen=True)
class BatchSamplingKinds:
    """Static shape info for the batched sampler (top-k budget)."""
    k_budget: int = 64


def sample_batched(logits: jax.Array, keys: jax.Array, temps: jax.Array,
                   top_ps: jax.Array, min_ps: jax.Array,
                   top_ks: Optional[jax.Array] = None,
                   counts: Optional[jax.Array] = None,
                   rep_pens: Optional[jax.Array] = None,
                   pres_pens: Optional[jax.Array] = None,
                   freq_pens: Optional[jax.Array] = None,
                   k_budget: int = 64) -> jax.Array:
    """Per-row sampling for the continuous batcher — full chain fidelity.

    logits [R, V]; keys: typed PRNG key array [R] (one independent stream per
    request, derived from its seed); temps/top_ps/min_ps/top_ks [R];
    counts [R, V] context occurrence counts with per-row penalty knobs.
    Rows with temp <= 0 decode greedily (over penalized logits, matching the
    reference chain order). Non-greedy rows sample within a fixed top-k budget
    (sorting V per step is wasteful; k_budget covers practical top_k settings);
    per-row top_k <= k_budget masks the sorted slice. Returns [R] int32.
    """
    r, v = logits.shape
    if counts is not None:
        seen = counts > 0
        rp = rep_pens[:, None]
        logits = jnp.where(seen,
                           jnp.where(logits > 0, logits / rp, logits * rp),
                           logits)
        logits = (logits - counts * freq_pens[:, None]
                  - seen * pres_pens[:, None])
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    safe_t = jnp.maximum(temps, 1e-4)[:, None]
    vals, idx = jax.lax.top_k(logits / safe_t, k_budget)     # [R, K] sorted desc
    if top_ks is not None:
        # top_k <= 0 means disabled (keep the whole budget)
        eff_k = jnp.where(top_ks <= 0, k_budget,
                          jnp.minimum(top_ks, k_budget))     # [R]
        vals = jnp.where(jnp.arange(k_budget)[None, :] < eff_k[:, None],
                         vals, -jnp.inf)
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_ps[:, None]                 # top-p: keep head
    keep_m = probs >= (probs[:, :1] * min_ps[:, None])       # min-p vs best
    masked = jnp.where(keep_p & keep_m, vals, -jnp.inf)
    picked = jax.vmap(jax.random.categorical)(keys, masked)   # [R] in [0, K)
    sampled_tok = jnp.take_along_axis(idx, picked[:, None], axis=1)[:, 0]
    return jnp.where(temps <= 0.0, greedy_tok, sampled_tok).astype(jnp.int32)
