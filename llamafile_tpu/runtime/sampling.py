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

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


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


@dataclass(frozen=True)
class BatchSamplingKinds:
    """Static shape info for the batched sampler (top-k budget)."""
    k_budget: int = 64


def sample_batched(logits: jax.Array, keys: jax.Array, temps: jax.Array,
                   top_ps: jax.Array, min_ps: jax.Array,
                   k_budget: int = 64) -> jax.Array:
    """Per-row sampling for the continuous batcher.

    logits [R, V]; keys: typed PRNG key array [R]; temps/top_ps/min_ps [R].
    Rows with temp <= 0 decode greedily. Non-greedy rows sample within a fixed
    top-k budget (sorting V per step is wasteful; k_budget covers practical
    top_k settings) with per-row top-p and min-p cutoffs applied on the sorted
    slice. Returns [R] int32.
    """
    r, v = logits.shape
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    safe_t = jnp.maximum(temps, 1e-4)[:, None]
    vals, idx = jax.lax.top_k(logits / safe_t, k_budget)     # [R, K] sorted desc
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_ps[:, None]                 # top-p: keep head
    keep_m = probs >= (probs[:, :1] * min_ps[:, None])       # min-p vs best
    masked = jnp.where(keep_p & keep_m, vals, -jnp.inf)
    picked = jax.vmap(jax.random.categorical)(keys, masked)   # [R] in [0, K)
    sampled_tok = jnp.take_along_axis(idx, picked[:, None], axis=1)[:, 0]
    return jnp.where(temps <= 0.0, greedy_tok, sampled_tok).astype(jnp.int32)
