"""Expert parallelism for MoE (Mixtral): experts sharded across the mesh.

Replaces llamafile's MixMul (reference: tinyblas_cpu_mixmul.inc:100-111 builds
per-expert row-pointer lists in shared memory; SURVEY.md §2.10 maps this to
expert-sharded matmul). Design for decode (weight-bandwidth-bound): experts are
STACKED into leading-dim-E arrays sharded over the "tp" axis; each device runs
its local experts over the full token batch, weighting by the router's top-k
probabilities, and the layer's existing psum (forward's tp_axis reduction)
combines contributions. No all-to-all needed — every device reads only its own
expert weights, which is the balanced-bandwidth property that matters at decode
batch sizes. (Token-routing all-to-all for large-prefill efficiency is the
next-round extension.)
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, LlamaLayer, LlamaParams
from ..ops.repack import QTensor, expert_slice, stack_experts

_expert_slice = expert_slice     # moved to ops.repack (shared w/ moe_ffn)


def moe_ffn_ep(x2d: jax.Array, layer: LlamaLayer, cfg: LlamaConfig,
               n_local: int, expert_offset: jax.Array) -> jax.Array:
    """Local-expert MoE contribution (to be psum'd across the axis).

    layer.experts holds stacked LOCAL shards (leading dim n_local);
    expert_offset = global index of local expert 0 on this device.
    """
    from ..ops.qmatmul import qmatmul
    m, d = x2d.shape
    router = qmatmul(x2d, layer.gate_inp)                    # [M, E_global]
    weights = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(weights, cfg.n_experts_used)
    if cfg.moe_norm_topk:            # mixtral/qwen3moe; qwen2moe keeps raw
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    out = jnp.zeros((m, d), jnp.float32)
    for le in range(n_local):
        ge = expert_offset + le
        g = qmatmul(x2d, _expert_slice(layer.experts["gate"], le))
        u = qmatmul(x2d, _expert_slice(layer.experts["up"], le))
        y = qmatmul(jax.nn.silu(g) * u, _expert_slice(layer.experts["down"], le))
        w_e = jnp.sum(jnp.where(topi == ge, topw, 0.0), axis=-1)
        out = out + y * w_e[:, None]
    if layer.gate_inp_shexp is not None:
        # qwen2moe shared expert: replicated weights — compute on the
        # device owning global expert 0 only (the psum adds it back once)
        g = qmatmul(x2d, layer.experts["shexp.gate"])
        u = qmatmul(x2d, layer.experts["shexp.up"])
        y = qmatmul(jax.nn.silu(g) * u, layer.experts["shexp.down"])
        sg = jax.nn.sigmoid(qmatmul(x2d, layer.gate_inp_shexp)[:, :1])
        on0 = jnp.asarray(expert_offset == 0, jnp.float32)
        out = out + on0 * sg * y
    return out


def epify_params(params: LlamaParams, cfg: LlamaConfig) -> LlamaParams:
    """Restack all MoE layers' experts for EP execution."""
    import dataclasses as dc
    layers = []
    for layer in params.layers:
        if layer.experts is not None and "gate" not in layer.experts:
            stacked = stack_experts(layer.experts, cfg.n_experts)
            layer = dc.replace(layer, experts=stacked)
        layers.append(layer)
    return dc.replace(params, layers=layers)
