"""Expert parallelism for MoE (Mixtral): experts sharded across the mesh.

Replaces llamafile's MixMul (reference: tinyblas_cpu_mixmul.inc:100-111 builds
per-expert row-pointer lists in shared memory; SURVEY.md §2.10 maps this to
expert-sharded matmul). Design for decode (weight-bandwidth-bound): experts are
STACKED into leading-dim-E arrays sharded over the "tp" axis; each device runs
its local experts over the full token batch, weighting by the router's top-k
probabilities, and the layer's existing psum (forward's tp_axis reduction)
combines contributions. No all-to-all needed — every device reads only its own
expert weights, which is the balanced-bandwidth property that matters at decode
batch sizes. Token-routing all-to-all for prefill-scale efficiency is
moe_ffn_ep_a2a below: tokens sharded over the axis, ONE ragged_all_to_all
dispatch (expert ids ride as a packed payload column), grouped local compute,
inverse exchange to combine.
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
    gu_fused = layer.experts.get("gateup_il") or layer.experts.get("gateup")
    for le in range(n_local):
        ge = expert_offset + le
        if gu_fused is not None:
            from ..ops.qmatmul import split_gu
            dff = gu_fused.shape[0] // 2
            gu = qmatmul(x2d, _expert_slice(gu_fused, le))
            g, u = split_gu(gu, dff, "gateup_il" in layer.experts)
        else:
            g = qmatmul(x2d, _expert_slice(layer.experts["gate"], le))
            u = qmatmul(x2d, _expert_slice(layer.experts["up"], le))
        y = qmatmul(jax.nn.silu(g) * u, _expert_slice(layer.experts["down"], le))
        w_e = jnp.sum(jnp.where(topi == ge, topw, 0.0), axis=-1)
        out = out + y * w_e[:, None]
    if cfg.expert_weights_scale != 1.0:
        # deepseek2 routed_scaling_factor applies to the ROUTED sum only;
        # every device's local contribution scales identically, so the
        # post-psum result matches moe_ffn's single-chip order
        out = out * cfg.expert_weights_scale
    if "shexp.gate" in layer.experts:
        # shared expert (qwen2moe sigmoid-gated / deepseek2 unconditional):
        # replicated weights — compute on the device owning global expert 0
        # only (the psum adds it back once)
        g = qmatmul(x2d, layer.experts["shexp.gate"])
        u = qmatmul(x2d, layer.experts["shexp.up"])
        y = qmatmul(jax.nn.silu(g) * u, layer.experts["shexp.down"])
        if layer.gate_inp_shexp is not None:
            y = jax.nn.sigmoid(qmatmul(x2d, layer.gate_inp_shexp)[:, :1]) * y
        on0 = jnp.asarray(expert_offset == 0, jnp.float32)
        out = out + on0 * y
    return out


def _ragged_recv(operand, out_rows, axis: str, src_off, dst_off, sizes):
    """Exact ragged exchange, portable emulation: all_gather the operands and
    select my segments (XLA:CPU lacks the ragged-all-to-all HLO; the TPU path
    uses the native collective — see moe_ffn_ep_a2a). src_off/dst_off/sizes
    are [ep] int32 describing, per sender, where my chunk starts in their
    operand, where it lands in my buffer (contiguous, ascending), and its
    length."""
    ep = jax.lax.axis_size(axis)
    allop = jax.lax.all_gather(operand, axis)            # [ep, R, d]
    r = jnp.arange(out_rows, dtype=jnp.int32)
    ends = dst_off + sizes
    i_of = jnp.clip(jnp.searchsorted(ends, r, side="right"), 0, ep - 1)
    src = jnp.clip(src_off[i_of] + r - dst_off[i_of],
                   0, operand.shape[0] - 1)
    vals = allop[i_of, src]
    valid = (r >= dst_off[i_of]) & (r < ends[i_of])
    return jnp.where(valid[:, None], vals, jnp.zeros_like(vals))


def moe_ffn_ep_a2a(x_loc: jax.Array, layer: LlamaLayer, cfg: LlamaConfig,
                   n_local: int, axis: str,
                   capacity: int | None = None) -> jax.Array:
    """Token-sharded expert parallelism with all-to-all dispatch/combine.

    The prefill-scale EP formulation (SURVEY.md §2.10's TPU equivalent of
    the reference's MixMul work partition): tokens are SHARDED over `axis`
    (unlike moe_ffn_ep, whose replicated-activation form is right for
    decode). Each device routes its local tokens, sends every routed
    (token, expert) slot to the device owning that expert with ONE
    ragged_all_to_all (exact, no capacity-factor dropping by default),
    computes its local experts with the ragged grouped matmul, and returns
    results by the inverse exchange. Per-device compute scales with
    received slots, comm with k_used * T_loc * d, and expert weights are
    read once per device per step.

    EXACT at any routing skew, with no capacity-factor dropping: the
    receive buffer holds the true worst case (every global slot routed to
    one device), the grouped fast path covers up to `capacity` received
    rows (default 2 * T_loc * k_used — double a perfectly balanced
    router's load), and a lax.cond falls back to masked dense-local
    compute over the full buffer when a step actually overflows — the
    pathological tail costs FLOPs, never correctness (GShard-style
    droppers trade that tail for silent quality loss; an inference
    framework can't).
    """
    from ..models.llama import grouped_expert_ffn, _grouped_tm
    from ..ops.qmatmul import qmatmul
    ep = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    t_loc, d = x_loc.shape
    ku = cfg.n_experts_used
    s = t_loc * ku
    cap = ep * s                         # exact worst-case receive buffer
    c_comp = min(cap, 2 * s if capacity is None else capacity)
    router = qmatmul(x_loc, layer.gate_inp)
    weights = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(weights, ku)
    if cfg.moe_norm_topk:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    ei = topi.reshape(s).astype(jnp.int32)
    dest = ei // n_local
    order = jnp.argsort(dest)            # slots sorted by destination device
    ei_s = ei[order]
    xs = x_loc[(order // ku).astype(jnp.int32)]              # [S, d]
    send_sizes = jnp.bincount(dest, length=ep).astype(jnp.int32)
    input_offsets = (jnp.cumsum(send_sizes) - send_sizes).astype(jnp.int32)
    # size matrix [sender, dest]: column-exclusive-cumsum row `me` gives the
    # offsets where MY chunks land in each destination's receive buffer
    mat = jax.lax.all_gather(send_sizes, axis)               # [ep, ep]
    col_cum = (jnp.cumsum(mat, axis=0) - mat).astype(jnp.int32)
    output_offsets = col_cum[me]
    recv_sizes = mat[:, me].astype(jnp.int32)
    n_recv = jnp.sum(recv_sizes)
    # dispatch: token rows + their local-expert ids. The id rides as ONE
    # extra payload column (advice r4: a separate width-1 exchange pays a
    # full collective latency for 4 bytes/slot on the decode critical path)
    # — exact in any float row dtype while n_local <= 256 (bf16 represents
    # integers exactly up to 256); the two-exchange form stays as the
    # portable fallback for wider expert shards or integer activations.
    native = jax.default_backend() == "tpu"
    row_cum = (jnp.cumsum(mat, axis=1) - mat).astype(jnp.int32)

    def _fwd(op, width, dtype):
        if native:
            return jax.lax.ragged_all_to_all(
                op, jnp.zeros((cap, width), dtype), input_offsets,
                send_sizes, output_offsets, recv_sizes, axis_name=axis)
        return _ragged_recv(op, cap, axis, row_cum[:, me], col_cum[:, me],
                            recv_sizes)

    le_send = (ei_s - dest[order] * n_local).astype(jnp.int32)[:, None]
    if jnp.issubdtype(xs.dtype, jnp.floating) and n_local <= 256:
        xa = _fwd(jnp.concatenate([xs, le_send.astype(xs.dtype)], axis=1),
                  d + 1, xs.dtype)
        xr = xa[:, :d]
        lr = jnp.round(xa[:, d:].astype(jnp.float32)).astype(jnp.int32)
    else:
        xr = _fwd(xs, d, xs.dtype)
        lr = _fwd(le_send, 1, jnp.int32)
    valid = jnp.arange(cap, dtype=jnp.int32) < n_recv
    gid = jnp.where(valid, lr[:, 0], n_local)    # sentinel -> dump group

    def _dense_local(rows, g_ids):        # masked dense loop over local
        out = jnp.zeros((rows.shape[0], d), jnp.float32)
        gu_fused = (layer.experts.get("gateup_il")
                    or layer.experts.get("gateup"))
        for le in range(n_local):
            if gu_fused is not None:
                from ..ops.qmatmul import split_gu
                dff = gu_fused.shape[0] // 2
                gu = qmatmul(rows, _expert_slice(gu_fused, le))
                g, u = split_gu(gu, dff, "gateup_il" in layer.experts)
            else:
                g = qmatmul(rows, _expert_slice(layer.experts["gate"], le))
                u = qmatmul(rows, _expert_slice(layer.experts["up"], le))
            y = qmatmul(jax.nn.silu(g) * u,
                        _expert_slice(layer.experts["down"], le))
            out = out + jnp.where((g_ids == le)[:, None], y, 0.0)
        return out

    gu_qt = (layer.experts.get("gateup_il") or layer.experts.get("gateup")
             or layer.experts.get("gate"))
    if gu_qt.kind == "q4b" and layer.experts["down"].kind == "q4b" \
            and d % 256 == 0 and cfg.d_ff % 256 == 0:
        # received segments pack contiguously from row 0, so all valid rows
        # sit in xr[:c_comp] whenever n_recv <= c_comp — the fast grouped
        # path computes only that slice; overflow steps take the dense arm
        def _fast(_):
            y = grouped_expert_ffn(xr[:c_comp], gid[:c_comp],
                                   valid[:c_comp].astype(jnp.float32),
                                   layer.experts, n_local,
                                   _grouped_tm(c_comp))
            return jnp.zeros((cap, d), jnp.float32).at[:c_comp].set(y)

        def _slow(_):
            return jnp.where(valid[:, None], _dense_local(xr, gid), 0.0)

        yr = jax.lax.cond(n_recv <= c_comp, _fast, _slow, operand=None)
    else:
        yr = jnp.where(valid[:, None], _dense_local(xr, gid), 0.0)
    # combine: inverse exchange (roles swap — offsets derived from the same
    # size matrix), then unsort and mix by router weight
    if native:
        ys = jax.lax.ragged_all_to_all(
            yr, jnp.zeros((s, d), yr.dtype), col_cum[:, me], recv_sizes,
            row_cum[:, me], send_sizes, axis_name=axis)
    else:
        ys = _ragged_recv(yr, s, axis, col_cum[me], row_cum[me], send_sizes)
    y_slots = jnp.zeros((s, d), jnp.float32).at[order].set(ys)
    out = (y_slots.reshape(t_loc, ku, d)
           * topw.reshape(t_loc, ku, 1)).sum(axis=1)
    # mirror moe_ffn's tail: routed scaling, then the shared expert —
    # tokens are SHARDED here, so every device computes shexp for its own
    # rows (replicated weights, no psum involved)
    if cfg.expert_weights_scale != 1.0:
        out = out * cfg.expert_weights_scale
    if "shexp.gate" in layer.experts:
        g = qmatmul(x_loc, layer.experts["shexp.gate"])
        u = qmatmul(x_loc, layer.experts["shexp.up"])
        y = qmatmul(jax.nn.silu(g) * u, layer.experts["shexp.down"])
        if layer.gate_inp_shexp is not None:
            y = jax.nn.sigmoid(qmatmul(x_loc, layer.gate_inp_shexp)[:, :1]) * y
        out = out + y
    return out


def epify_params(params: LlamaParams, cfg: LlamaConfig) -> LlamaParams:
    """Restack all MoE layers' experts for EP execution."""
    import dataclasses as dc
    layers = []
    for layer in params.layers:
        if layer.experts is not None and "gate" not in layer.experts \
                and "gateup" not in layer.experts \
                and "gateup_il" not in layer.experts:   # already-stacked (or
            # gate|up-fused) layouts pass through
            stacked = stack_experts(layer.experts, cfg.n_experts)
            layer = dc.replace(layer, experts=stacked)
        layers.append(layer)
    return dc.replace(params, layers=layers)
