"""Token-sharded EP all-to-all tests: moe_ffn_ep_a2a on a multi-device CPU
mesh must match the single-device moe_ffn on the gathered batch, including
under pathological routing skew (overflow takes the exact dense arm, never
drops tokens).

Reference capability: llamafile_mixmul partitions routed-expert GEMM work
(tinyblas_cpu_mixmul.inc:100-111); SURVEY.md §2.10 maps multi-device MoE to
all-to-all token dispatch over an expert-sharded mesh axis.
"""
import dataclasses
import functools

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from llamafile_tpu.models.llama import LlamaLayer, moe_ffn
from llamafile_tpu.models.synthetic import make_synthetic_llama
from llamafile_tpu.parallel.moe import moe_ffn_ep_a2a

RNG = np.random.default_rng(21)


def _setup(ep):
    cfg, params = make_synthetic_llama("tiny-moe", quant="Q4_K", seed=7)
    layer = params.layers[0]
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    n_local = cfg.n_experts // ep
    return cfg, layer, mesh, n_local


def _local_experts_tree(layer):
    return {k: v for k, v in layer.experts.items()
            if k in ("gate", "up", "down")}


def _run_a2a(cfg, layer, mesh, n_local, x, capacity=None):
    ex = _local_experts_tree(layer)

    def f(x_loc, ex_loc, gi):
        ly = LlamaLayer(attn_norm=None, wq=None, wk=None, wv=None, wo=None,
                        ffn_norm=None, w_gate=None, w_up=None, w_down=None,
                        gate_inp=gi, experts=ex_loc)
        return moe_ffn_ep_a2a(x_loc, ly, cfg, n_local, "ep",
                              capacity=capacity)

    run = shard_map(f, mesh=mesh,
                    in_specs=(P("ep"), P("ep"), P()),
                    out_specs=P("ep"), check_vma=False)
    return np.asarray(jax.jit(run)(x, ex, layer.gate_inp))


@pytest.mark.parametrize("ep", [2, 4])
def test_ep_a2a_matches_single_device(ep):
    cfg, layer, mesh, n_local = _setup(ep)
    t = 8 * ep
    x = jnp.asarray(RNG.standard_normal((t, cfg.d_model)), jnp.float32) * 0.5
    golden = np.asarray(moe_ffn(x, layer, cfg))
    got = _run_a2a(cfg, layer, mesh, n_local, x)
    scale = np.abs(golden).max() + 1e-3
    assert np.abs(got - golden).max() / scale < 2e-2


def test_ep_a2a_overflow_exact():
    """Router collapse: every token routes to experts 0/1 (device 0 when
    ep=4 owns expert 0 only -> n_recv on device 0 exceeds a capacity of 2
    rows). The cond's dense arm must keep results exact — no dropping."""
    cfg, layer, mesh, n_local = _setup(4)
    # bias the router hard toward expert 0/1 by rebuilding gate_inp as a
    # dense QTensor whose first two rows dominate
    gi = layer.gate_inp
    w = np.zeros((cfg.d_model, cfg.n_experts), np.float32)
    w[:, 0] = 0.3
    w[:, 1] = 0.2
    gi2 = dataclasses.replace(gi, qs=jnp.asarray(w, jnp.bfloat16))
    layer = dataclasses.replace(layer, gate_inp=gi2)
    t = 32
    x = jnp.asarray(RNG.standard_normal((t, cfg.d_model)), jnp.float32) * 0.5
    golden = np.asarray(moe_ffn(x, layer, cfg))
    got = _run_a2a(cfg, layer, mesh, n_local, x, capacity=8)
    scale = np.abs(golden).max() + 1e-3
    assert np.abs(got - golden).max() / scale < 2e-2
