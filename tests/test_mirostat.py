"""Mirostat v1/v2 sampling: convergence of observed surprise to tau.

Reference: llamafile-files/sampling.h:39-41,73-74 (mirostat modes in the
sampling chain); algorithm from Basu et al., "Mirostat: a neural text decoding
algorithm that directly controls perplexity".
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from llamafile_tpu.runtime.sampling import (SamplingParams, mirostat_init,
                                            sample_mirostat, sample_stateful)


def _zipf_logits(v=4096, s=1.1):
    p = 1.0 / np.arange(1, v + 1) ** s
    p /= p.sum()
    return jnp.asarray(np.log(p), jnp.float32)[None, :]


@pytest.mark.parametrize("version", [1, 2])
def test_mirostat_converges_to_target_surprise(version):
    # Observed surprise is defined over the RENORMALIZED truncated candidate
    # set (reference: llama_sample_token re-runs llama_sample_softmax on the
    # survivors before -log2f(p)); the mu update drives THAT quantity to tau.
    # Recover it from consecutive mu values: s_obs = tau + (mu - mu')/eta.
    tau = 3.0
    eta = 0.2
    sp = SamplingParams(temperature=1.0, mirostat=version, mirostat_tau=tau,
                        mirostat_eta=eta)
    logits = _zipf_logits()
    mu = mirostat_init(sp, 1)
    key = jax.random.PRNGKey(0)
    surprises = []
    for i in range(300):
        key, sub = jax.random.split(key)
        tok, mu_new = sample_mirostat(logits, sub, sp, mu)
        surprises.append(tau + (float(mu[0]) - float(mu_new[0])) / eta)
        mu = mu_new
    # after burn-in, mean observed surprise tracks tau
    mean_s = np.mean(surprises[100:])
    assert abs(mean_s - tau) < 0.75, mean_s
    # and mu has settled near its fixed point (finite, sane range)
    assert 0.0 < float(mu[0]) < 4.0 * tau


def test_mirostat_v2_surprise_matches_scalar_reference():
    # One-step check against a scalar transcription of the reference v2
    # algorithm (sampling.cpp mirostat v2: softmax -> cut surprise>mu ->
    # renormalize -> sample -> s_obs from the renormalized p -> mu update).
    tau, eta = 3.0, 0.2
    sp = SamplingParams(temperature=1.0, mirostat=2, mirostat_tau=tau,
                        mirostat_eta=eta)
    logits = _zipf_logits()
    mu0 = jnp.asarray([4.0], jnp.float32)
    key = jax.random.PRNGKey(7)
    tok, mu1 = sample_mirostat(logits, key, sp, mu0)
    # scalar reference for the mu update given the sampled token
    p = np.exp(np.asarray(jax.nn.log_softmax(logits, axis=-1))[0])
    surprise = -np.log2(p)
    keep = surprise <= 4.0
    q = np.where(keep, p, 0.0)
    q = q / q.sum()
    s_obs = -np.log2(q[int(tok[0])])
    want = 4.0 - eta * (s_obs - tau)
    assert abs(float(mu1[0]) - want) < 1e-3


def test_mirostat_state_threads_through_sample_stateful():
    sp = SamplingParams(temperature=1.0, mirostat=2)
    mu0 = mirostat_init(sp, 1)
    tok, mu1 = sample_stateful(_zipf_logits(), jax.random.PRNGKey(1), sp,
                               None, mu0)
    assert tok.shape == (1,) and not np.allclose(np.asarray(mu0),
                                                 np.asarray(mu1))


def test_mirostat_greedy_flag_off():
    # mirostat forces the sampling path even at temp 0 (reference behavior:
    # mirostat overrides greedy shortcutting)
    sp = SamplingParams(temperature=0.0, mirostat=2)
    assert not sp.greedy
