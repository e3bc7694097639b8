"""GGUF -> device parameters: the model loading path.

Analog of llama.cpp's llm_load_tensors as patched by llamafile to read from
/zip mmaps (reference: llama.cpp.patches/patches/llama.cpp.patch:358-563).
Tensor bytes flow mmap -> repack (numpy, vectorized) -> device_put; an optional
`sharder(name, kind, logical_shape)` returns a jax.sharding for multi-chip
placement so weights land directly in their sharded layout (no host gather).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.repack import QTensor, repack
from ..runtime.tokenizer import Tokenizer
from .llama import LlamaConfig, LlamaLayer, LlamaParams


def _load_qtensor(reader: GGUFReader, name: str, put=None) -> QTensor:
    t = reader.tensors[name]
    shape = t.shape
    n, k = int(np.prod(shape[:-1])), shape[-1]
    return repack(reader.tensor_bytes(name), t.type_name, (n, k), device_put=put)


def _load_vec(reader: GGUFReader, name: str) -> jax.Array:
    return jnp.asarray(reader.tensor_f32(name))


def _load_norm(reader: GGUFReader, name: str, d: int) -> jax.Array:
    """Norm weight, or ones when the arch has non-parametric norms (olmo
    GGUFs ship no norm tensors; norm_fn ignores the weight for ln_np)."""
    if name in reader:
        return _load_vec(reader, name)
    return jnp.ones((d,), jnp.float32)


def fuse_projections(params, cfg):
    """Single-device fast path: fuse qkv and gate/up into single QTensors
    (fewer, larger kernel launches in the decode graph). Not applied when
    weights will be tensor-parallel sharded (shards must stay head-aligned).
    """
    import dataclasses as dc
    from ..ops.repack import concat_qtensors
    layers = []
    for layer in params.layers:
        kw = {}
        try:
            # may be pre-fused (phi3 wire) or projection-less (MLA)
            if layer.wqkv is None and layer.wk is not None:
                kw["wqkv"] = concat_qtensors([layer.wq, layer.wk, layer.wv])
                kw["wq"] = kw["wk"] = kw["wv"] = None  # drop split copies
        except (AssertionError, TypeError):
            pass
        if layer.w_gate is not None and layer.w_up is not None:
            try:
                g_qt, u_qt = layer.w_gate, layer.w_up
                if (g_qt.kind == "q4b" and u_qt.kind == "q4b"
                        and g_qt.g == u_qt.g and g_qt.shape == u_qt.shape
                        and g_qt.shape[0] % 1024 == 0
                        and (g_qt.bias is None) == (u_qt.bias is None)
                        and os.environ.get("LLAMAFILE_TPU_ILGU", "1") != "0"):
                    # GU_STRIPE-interleaved layout: M=1 decode then runs the
                    # ENTIRE FFN (gateup, silu*up, requantize, down) as one
                    # pallas call per layer (ops.qmatmul._qmm_kernel_moe_m1
                    # with the layer id as the scalar-prefetch "expert")
                    from ..ops.repack import interleave_gateup
                    kw["w_gate_up"] = interleave_gateup(g_qt, u_qt)
                else:
                    kw["w_gate_up"] = concat_qtensors([g_qt, u_qt])
                kw["w_gate"] = kw["w_up"] = None
            except (AssertionError, TypeError):
                pass
        layers.append(dc.replace(layer, **kw) if kw else layer)
    return dc.replace(params, layers=layers)


def load_llama(path: str, sharder: Optional[Callable] = None,
               fuse: bool = True):
    """Load a llama-family GGUF into (config, params, tokenizer).

    sharder(name, role) -> device_put callable, or None for single-device.
    fuse: fuse qkv/gate-up projections (auto-disabled when sharding).
    """
    reader = GGUFReader(path)
    cfg = LlamaConfig.from_gguf(reader)
    tok = Tokenizer(reader.metadata)

    def put_for(name):
        if sharder is None:
            return None
        return sharder(name)

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        def opt(nm):
            return _load_vec(reader, p + nm) if p + nm in reader else None

        kw = dict(
            attn_norm=_load_norm(reader, p + "attn_norm.weight", cfg.d_model),
            bq=opt("attn_q.bias"),
            bk=opt("attn_k.bias"),
            bv=opt("attn_v.bias"),
            # LN-family (gptneox/falcon/starcoder2) norm biases + dense biases
            attn_norm_b=opt("attn_norm.bias"),
            ffn_norm_b=opt("ffn_norm.bias"),
            bo=opt("attn_output.bias"),
            b_up=opt("ffn_up.bias"),
            b_down=opt("ffn_down.bias"),
            # gemma3/qwen3 per-head q/k norms; gemma2/3 sandwich norms
            q_norm=opt("attn_q_norm.weight"),
            k_norm=opt("attn_k_norm.weight"),
            attn_post_norm=opt("post_attention_norm.weight"),
            ffn_post_norm=opt("post_ffw_norm.weight"),
            wo=_load_qtensor(reader, p + "attn_output.weight", put_for(p + "attn_output.weight")),
            # falcon-7b-style parallel layers share the single attn norm:
            # a missing ffn_norm means "reuse h", not "identity norm"
            ffn_norm=(_load_norm(reader, p + "ffn_norm.weight", cfg.d_model)
                      if (p + "ffn_norm.weight" in reader
                          or not cfg.parallel_residual) else None),
        )
        if cfg.kv_lora_rank:
            # deepseek2 MLA projections
            kw.update(
                wkv_a=_load_qtensor(reader, p + "attn_kv_a_mqa.weight"),
                kv_a_norm=_load_vec(reader, p + "attn_kv_a_norm.weight"),
                wkv_b=_load_qtensor(reader, p + "attn_kv_b.weight"),
                wq=None, wk=None, wv=None)
            if p + "attn_q_a.weight" in reader:
                kw.update(
                    wq_a=_load_qtensor(reader, p + "attn_q_a.weight"),
                    q_a_norm=_load_vec(reader, p + "attn_q_a_norm.weight"),
                    wq_b=_load_qtensor(reader, p + "attn_q_b.weight"))
            else:                       # V2-Lite: direct q projection
                kw["wq"] = _load_qtensor(reader, p + "attn_q.weight")
        elif p + "attn_qkv.weight" in reader:
            # phi3-style pre-fused qkv wire tensor: keep fused on the fast
            # path; split exactly by column for sharded (unfused) loads
            from ..ops.repack import slice_qtensor_cols
            wqkv = _load_qtensor(reader, p + "attn_qkv.weight",
                                 put_for(p + "attn_qkv.weight"))
            nq = cfg.n_heads * cfg.head_dim
            nkv = cfg.n_kv_heads * cfg.head_dim
            if p + "attn_qkv.bias" in reader:    # gptneox fused qkv bias
                bqkv = _load_vec(reader, p + "attn_qkv.bias")
                kw.update(bq=bqkv[:nq], bk=bqkv[nq:nq + nkv],
                          bv=bqkv[nq + nkv:nq + 2 * nkv])
            if fuse and sharder is None:
                kw.update(wqkv=wqkv, wq=None, wk=None, wv=None)
            else:
                kw.update(
                    wq=slice_qtensor_cols(wqkv, 0, nq),
                    wk=slice_qtensor_cols(wqkv, nq, nq + nkv),
                    wv=slice_qtensor_cols(wqkv, nq + nkv, nq + 2 * nkv))
        else:
            kw.update(
                wq=_load_qtensor(reader, p + "attn_q.weight", put_for(p + "attn_q.weight")),
                wk=_load_qtensor(reader, p + "attn_k.weight", put_for(p + "attn_k.weight")),
                wv=_load_qtensor(reader, p + "attn_v.weight", put_for(p + "attn_v.weight")))
        if cfg.n_experts > 0 and p + "ffn_gate_inp.weight" in reader:
            # (deepseek2's leading_dense_block_count layers are dense even
            # in a MoE model — they fall through to the dense FFN branches)
            kw["gate_inp"] = _load_qtensor(reader, p + "ffn_gate_inp.weight")
            experts: Dict[str, QTensor] = {}
            if p + "ffn_gate_exps.weight" in reader:
                # stacked 3-D expert tensors (newer mixtral ggufs)
                for role, nm in (("gate", "ffn_gate_exps.weight"),
                                 ("up", "ffn_up_exps.weight"),
                                 ("down", "ffn_down_exps.weight")):
                    t = reader.tensors[p + nm]
                    n_exp, rows, cols = t.shape
                    raw = reader.tensor_bytes(p + nm)
                    from ..gguf.quants import TYPE_BY_ID
                    spec = TYPE_BY_ID[t.type_id]
                    per = rows * cols // spec.block_elems * spec.block_bytes
                    for e in range(n_exp):
                        experts[f"{role}.{e}"] = repack(
                            raw[e * per:(e + 1) * per], t.type_name, (rows, cols))
            else:
                for e in range(cfg.n_experts):
                    experts[f"gate.{e}"] = _load_qtensor(reader, p + f"ffn_gate.{e}.weight")
                    experts[f"up.{e}"] = _load_qtensor(reader, p + f"ffn_up.{e}.weight")
                    experts[f"down.{e}"] = _load_qtensor(reader, p + f"ffn_down.{e}.weight")
            if p + "ffn_gate_shexp.weight" in reader:
                # shared expert: qwen2moe (sigmoid-gated) / deepseek2
                # (unconditional — no gate tensor)
                experts["shexp.gate"] = _load_qtensor(
                    reader, p + "ffn_gate_shexp.weight")
                experts["shexp.up"] = _load_qtensor(
                    reader, p + "ffn_up_shexp.weight")
                experts["shexp.down"] = _load_qtensor(
                    reader, p + "ffn_down_shexp.weight")
                if p + "ffn_gate_inp_shexp.weight" in reader:
                    kw["gate_inp_shexp"] = _load_qtensor(
                        reader, p + "ffn_gate_inp_shexp.weight")
            try:
                # expert-stacked layout: enables the routed decode kernel
                # (qmatmul_routed) on one chip and EP sharding on a mesh;
                # single-device fuse also concatenates gate|up per expert
                # (one kernel call + one activation prep per layer)
                from ..ops.repack import stack_experts
                experts = stack_experts(experts, cfg.n_experts,
                                        fuse_gate_up=fuse and sharder is None)
            except (KeyError, ValueError):
                pass                 # heterogeneous experts: per-expert dict
            kw["experts"] = experts
        elif p + "ffn_gate.weight" not in reader \
                and reader.tensors[p + "ffn_up.weight"].shape[0] == 2 * cfg.d_ff:
            # phi3-style fused gate|up wire tensor (gate in rows [0, d_ff))
            from ..ops.repack import slice_qtensor_cols
            wgu = _load_qtensor(reader, p + "ffn_up.weight",
                                put_for(p + "ffn_up.weight"))
            if fuse and sharder is None:
                kw.update(w_gate_up=wgu, w_gate=None, w_up=None)
            else:
                kw.update(w_gate=slice_qtensor_cols(wgu, 0, cfg.d_ff),
                          w_up=slice_qtensor_cols(wgu, cfg.d_ff, 2 * cfg.d_ff))
            kw["w_down"] = _load_qtensor(reader, p + "ffn_down.weight",
                                         put_for(p + "ffn_down.weight"))
        elif p + "ffn_gate.weight" not in reader:
            # gateless GELU FFN (gptneox/falcon/starcoder2)
            kw["w_gate"] = None
            kw["w_up"] = _load_qtensor(reader, p + "ffn_up.weight", put_for(p + "ffn_up.weight"))
            kw["w_down"] = _load_qtensor(reader, p + "ffn_down.weight", put_for(p + "ffn_down.weight"))
        else:
            kw["w_gate"] = _load_qtensor(reader, p + "ffn_gate.weight", put_for(p + "ffn_gate.weight"))
            kw["w_up"] = _load_qtensor(reader, p + "ffn_up.weight", put_for(p + "ffn_up.weight"))
            kw["w_down"] = _load_qtensor(reader, p + "ffn_down.weight", put_for(p + "ffn_down.weight"))
        layers.append(LlamaLayer(**kw))

    embd = jnp.asarray(
        reader.tensor_f32("token_embd.weight").astype(np.float32)).astype(jnp.bfloat16)
    out_name = "output.weight" if "output.weight" in reader else "token_embd.weight"
    params = LlamaParams(
        tok_embd=embd,
        layers=layers,
        pos_embd=(jnp.asarray(
            reader.tensor_f32("position_embd.weight").astype(np.float32))
            .astype(jnp.bfloat16)
            if "position_embd.weight" in reader else None),
        out_norm=_load_norm(reader, "output_norm.weight", cfg.d_model),
        out_norm_b=(_load_vec(reader, "output_norm.bias")
                    if "output_norm.bias" in reader else None),
        out_b=(_load_vec(reader, "output.bias")
               if "output.bias" in reader else None),
        output=_load_qtensor(reader, out_name, put_for(out_name)),
    )
    if fuse and sharder is None:
        params = fuse_projections(params, cfg)
    return cfg, params, tok, reader
