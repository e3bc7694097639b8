"""Mamba (selective state space) architecture — GGUF `mamba` arch family.

The reference runtime inherits mamba support from its pinned llama.cpp
(arch table `llama.cpp.patches/patches/llama.cpp.patch:138` lists
LLM_ARCH_MAMBA; the graph is upstream build_mamba: in-proj -> causal depthwise
conv -> selective scan -> gated out-proj). This is a TPU-first reimplementation
of the same math, not a translation:

 * prefill runs the linear state recurrence h_t = dA_t * h_{t-1} + dBx_t as a
   `lax.associative_scan` over time (log-depth on device, static shapes),
 * decode is a single fused state update per token — no KV cache at all; the
   recurrent state (conv window + SSM state) IS the cache, so "context length"
   costs O(1) memory and the decode step reads only the weights,
 * the big projections (in/x/out/lm-head) run through the same fused
   dequant-GEMM Pallas kernels as the llama family (ops/qmatmul.py).

Cache semantics mirror the GGUF/llama.cpp convention: `ssm_a` stores A_log
(we fold A = -exp(A_log) at load time), `ssm_conv1d` is the depthwise causal
conv kernel, dt goes through softplus with the dt_proj bias.

Engine integration: `forward` / `init_cache` keep the llama signatures
(tokens, pos, cache, fresh_prefill, last_idx, attn_len-ignored) so
runtime/engine.py drives mamba models through the exact same jitted
prefill/decode-scan machinery. Because the state is recurrent, prefix reuse
can only extend a cached sequence (no mid-edit rewind) — MambaCache is tagged
`recurrent = True` so ChatSession/slots fall back to full re-prefill when the
new prompt is not an extension.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qmatmul import qmatmul
from ..ops.repack import QTensor


@dataclass(frozen=True)
class MambaConfig:
    n_layers: int
    d_model: int
    d_inner: int
    d_conv: int
    d_state: int
    dt_rank: int
    n_vocab: int
    rms_eps: float = 1e-5
    max_context: int = 2 ** 20       # unbounded in principle; llama.cpp's cap
    # llama-API compat fields read by generic engine/server plumbing
    n_experts: int = 0
    head_dim: int = 0

    @classmethod
    def from_gguf(cls, reader) -> "MambaConfig":
        f = reader.field
        n_vocab = f("{arch}.vocab_size")
        if n_vocab is None:
            n_vocab = len(reader.metadata.get("tokenizer.ggml.tokens", []))
        return cls(
            n_layers=int(f("{arch}.block_count")),
            d_model=int(f("{arch}.embedding_length")),
            d_inner=int(f("{arch}.ssm.inner_size")),
            d_conv=int(f("{arch}.ssm.conv_kernel")),
            d_state=int(f("{arch}.ssm.state_size")),
            dt_rank=int(f("{arch}.ssm.time_step_rank")),
            n_vocab=int(n_vocab),
            rms_eps=float(f("{arch}.attention.layer_norm_rms_epsilon", 1e-5)),
            max_context=int(f("{arch}.context_length", 2 ** 20)),
        )


@dataclass
class MambaLayer:
    attn_norm: Any           # f32 [d]
    w_in: QTensor            # [2*d_inner, d]   -> (x | z)
    conv_w: Any              # f32 [d_inner, d_conv] depthwise causal kernel
    conv_b: Any              # f32 [d_inner]
    w_x: QTensor             # [dt_rank + 2*d_state, d_inner] -> (dt_r | B | C)
    w_dt: QTensor            # [d_inner, dt_rank]
    dt_b: Any                # f32 [d_inner]
    A: Any                   # f32 [d_inner, d_state] = -exp(ssm_a)
    D: Any                   # f32 [d_inner]
    w_out: QTensor           # [d, d_inner]


@dataclass
class MambaParams:
    tok_embd: Any            # bf16 [n_vocab, d]
    layers: List[MambaLayer]
    out_norm: Any            # f32 [d]
    output: QTensor          # lm head [n_vocab, d]


@dataclass
class MambaCache:
    """Recurrent state: the whole "KV cache" of a mamba model.

    conv: f32 [L, B, d_conv-1, d_inner] — last d_conv-1 post-in-proj inputs
    ssm:  f32 [L, B, d_inner, d_state]  — selective-scan hidden state
    """
    conv: Any
    ssm: Any
    recurrent = True         # slots/ChatSession: no mid-sequence rewind
    quantized = False


for _cls in (MambaLayer, MambaParams, MambaCache):
    jax.tree_util.register_dataclass(
        _cls, [f.name for f in dataclasses.fields(_cls)], [])


def init_cache(cfg: MambaConfig, batch: int, max_len: int = 0,
               dtype=None) -> MambaCache:
    """max_len/dtype accepted for llama-API compatibility; state is O(1)."""
    return MambaCache(
        conv=jnp.zeros((cfg.n_layers, batch, cfg.d_conv - 1, cfg.d_inner),
                       jnp.float32),
        ssm=jnp.zeros((cfg.n_layers, batch, cfg.d_inner, cfg.d_state),
                      jnp.float32),
    )


def _rmsnorm(x, w, eps):
    v = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(v + eps)) * w


def _ssm_scan(dA, dBx):
    """Associative scan of h_t = dA_t * h_{t-1} + dBx_t over axis 1 (time).

    dA, dBx: [B, T, d_inner, d_state]. Returns all states h_t (same shape).
    First-order linear recurrences compose associatively:
        (a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2)
    """
    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    return h


def _layer(x, layer: MambaLayer, cfg: MambaConfig, conv_state, ssm_state,
           last_idx):
    """One mamba block over x [B, T, d]. Returns (x', conv_state', ssm_state').

    Padding positions t > last_idx are masked out of the state updates
    (dt -> 0 makes dA = 1, dBx = 0) so bucket-padded prefills leave the final
    recurrent state exactly at the last real token.
    """
    b, t, d = x.shape
    di, ds, dtr = cfg.d_inner, cfg.d_state, cfg.dt_rank

    h = _rmsnorm(x, layer.attn_norm, cfg.rms_eps)
    xz = qmatmul(h.reshape(b * t, d), layer.w_in).reshape(b, t, 2 * di)
    xin, z = xz[..., :di], xz[..., di:]

    # causal depthwise conv over time: the conv window straddles the cached
    # tail (prev d_conv-1 inputs) and the new tokens
    xpad = jnp.concatenate([conv_state, xin], axis=1)   # [B, T+c-1, di]
    y = layer.conv_b[None, None, :] * jnp.ones((b, t, di), jnp.float32)
    for j in range(cfg.d_conv):
        y = y + layer.conv_w[:, j][None, None, :] * xpad[:, j:j + t]
    y = jax.nn.silu(y)

    # next conv state: the last d_conv-1 REAL inputs. With bucket padding the
    # last real token sits at last_idx, i.e. xpad row last_idx + 1 … + c-1.
    c1 = cfg.d_conv - 1
    if last_idx is None:
        conv_state = xpad[:, t:]
    else:
        start = last_idx + 1                            # [B]
        conv_state = jax.vmap(
            lambda xp, s: jax.lax.dynamic_slice(
                xp, (s, 0), (c1, di)))(xpad, start)

    xdb = qmatmul(y.reshape(b * t, di), layer.w_x).reshape(b, t, dtr + 2 * ds)
    dt_r = xdb[..., :dtr]
    B_t = xdb[..., dtr:dtr + ds]                        # [B, T, ds]
    C_t = xdb[..., dtr + ds:]
    dt = qmatmul(dt_r.reshape(b * t, dtr), layer.w_dt).reshape(b, t, di)
    dt = jax.nn.softplus(dt + layer.dt_b[None, None, :])
    if last_idx is not None:
        valid = (jnp.arange(t)[None, :] <= last_idx[:, None]).astype(dt.dtype)
        dt = dt * valid[:, :, None]

    dA = jnp.exp(dt[..., None] * layer.A[None, None])   # [B, T, di, ds]
    dBx = (dt * y)[..., None] * B_t[:, :, None, :]
    if t == 1:
        hs = ssm_state * dA[:, 0] + dBx[:, 0]           # [B, di, ds]
        states = hs[:, None]
    else:
        h0 = ssm_state[:, None]                         # join carry as t=-1
        states = _ssm_scan(
            jnp.concatenate([jnp.ones_like(h0), dA], axis=1),
            jnp.concatenate([h0, dBx], axis=1))[:, 1:]
    if last_idx is None:
        ssm_state = states[:, -1]
    else:
        ssm_state = states[jnp.arange(b), last_idx]

    y_ssm = jnp.einsum("btds,bts->btd", states, C_t)
    y_out = (y_ssm + layer.D[None, None, :] * y) * jax.nn.silu(z)
    out = qmatmul(y_out.reshape(b * t, di), layer.w_out).reshape(b, t, d)
    return x + out, conv_state, ssm_state


def forward(params: MambaParams, cfg: MambaConfig, tokens: jax.Array,
            pos: jax.Array, cache: MambaCache,
            tp_axis: Optional[str] = None, return_hidden: bool = False,
            fresh_prefill: bool = False, embeds: Optional[jax.Array] = None,
            attn_len: Optional[int] = None,
            last_idx: Optional[jax.Array] = None,
            rope_pos: Optional[jax.Array] = None):
    """Signature-compatible with models.llama.forward (attn_len is ignored:
    there is no attention window; pos is ignored: state carries position)."""
    del pos, attn_len, fresh_prefill, rope_pos
    b, t = tokens.shape
    x = (embeds.astype(jnp.float32) if embeds is not None
         else jnp.take(params.tok_embd, tokens, axis=0).astype(jnp.float32))

    conv_states, ssm_states = [], []
    for li, layer in enumerate(params.layers):
        x, cs, ss = _layer(x, layer, cfg, cache.conv[li], cache.ssm[li],
                           last_idx if t > 1 else None)
        conv_states.append(cs)
        ssm_states.append(ss)
    cache = MambaCache(conv=jnp.stack(conv_states),
                       ssm=jnp.stack(ssm_states))

    x = _rmsnorm(x, params.out_norm, cfg.rms_eps)
    if return_hidden:
        return x, cache
    if last_idx is not None:
        x = x[jnp.arange(b), last_idx][:, None]
        t_out = 1
    else:
        t_out = t
    logits = qmatmul(x.reshape(b * t_out, cfg.d_model), params.output)
    return logits.astype(jnp.float32).reshape(b, t_out, -1), cache


def load_mamba(path: str, fuse: bool = True):
    """Load a `mamba`-arch GGUF into (config, params, tokenizer, reader)."""
    from ..gguf.reader import GGUFReader
    from ..runtime.tokenizer import Tokenizer
    from .loader import _load_qtensor, _load_vec

    reader = GGUFReader(path)
    cfg = MambaConfig.from_gguf(reader)
    tok = Tokenizer(reader.metadata)
    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        conv_w = np.asarray(reader.tensor_f32(p + "ssm_conv1d.weight"))
        conv_w = conv_w.reshape(cfg.d_inner, cfg.d_conv)
        a_log = np.asarray(reader.tensor_f32(p + "ssm_a"),
                           np.float32).reshape(cfg.d_inner, cfg.d_state)
        layers.append(MambaLayer(
            attn_norm=_load_vec(reader, p + "attn_norm.weight"),
            w_in=_load_qtensor(reader, p + "ssm_in.weight"),
            conv_w=jnp.asarray(conv_w),
            conv_b=_load_vec(reader, p + "ssm_conv1d.bias"),
            w_x=_load_qtensor(reader, p + "ssm_x.weight"),
            w_dt=_load_qtensor(reader, p + "ssm_dt.weight"),
            dt_b=_load_vec(reader, p + "ssm_dt.bias"),
            A=jnp.asarray(-np.exp(a_log)),
            D=_load_vec(reader, p + "ssm_d"),
            w_out=_load_qtensor(reader, p + "ssm_out.weight"),
        ))
    embd = jnp.asarray(reader.tensor_f32("token_embd.weight").astype(
        np.float32)).astype(jnp.bfloat16)
    out_name = "output.weight" if "output.weight" in reader else "token_embd.weight"
    params = MambaParams(
        tok_embd=embd,
        layers=layers,
        out_norm=_load_vec(reader, "output_norm.weight"),
        output=_load_qtensor(reader, out_name),
    )
    return cfg, params, tok, reader
