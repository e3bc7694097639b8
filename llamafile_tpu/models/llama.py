"""Llama-family model runtime: functional JAX forward over QTensor weights.

TPU-native analog of the reference's model runtime (upstream llama.cpp
build_llama graph + llamafile's sgemm hooks; SURVEY.md §2.4, §3.1 hot loop).
Instead of a ggml graph interpreted by a thread pool, the whole forward is one
jit'd function: RMSNorm -> fused dequant-GEMM QKV -> RoPE -> GQA attention over
a functional KV cache -> SwiGLU FFN, with static shapes everywhere so XLA owns
scheduling and fusion.

Covers the GGUF architecture registry (llama/mistral/qwen/gemma/phi/falcon/
deepseek2-MLA/command-r/baichuan/plamo and the rest — see
LlamaConfig.from_gguf for the per-arch feature flags and COMPONENTS.md §2.4
for the full table).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qmatmul import qmatmul
from ..ops.repack import QTensor


@dataclass(frozen=True)
class LlamaConfig:
    n_layers: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    n_vocab: int
    head_dim: int
    rope_theta: float = 10000.0
    rope_scale: float = 1.0          # freq_scale = 1 / scaling.factor
    # YaRN rope scaling (exact upstream formula; ggml-rope rope_yarn):
    # active when rope_yarn_ext > 0. orig_ctx is the pre-finetune context.
    rope_yarn_ext: float = 0.0
    rope_yarn_attn: float = 1.0
    rope_yarn_beta_fast: float = 32.0
    rope_yarn_beta_slow: float = 1.0
    rope_yarn_orig_ctx: int = 0
    rms_eps: float = 1e-5
    max_context: int = 8192
    rope_neox: bool = False          # False: interleaved pairs (llama NORM mode)
    attn_qkv_bias: bool = False      # qwen2-style q/k/v biases
    embd_scale: float = 1.0          # gemma scales embeddings by sqrt(d)
    norm_plus_one: bool = False      # gemma stores RMSNorm weights as (w - 1)
    ffn_gelu: bool = False           # gemma uses gelu instead of silu
    norm_type: str = "rms"           # "rms" | "ln_np" (olmo) | "ln" (affine
    #                                  LayerNorm + bias: gptneox/falcon/
    #                                  starcoder2 family)
    clamp_qkv: float = 0.0           # olmo clips q/k/v activations to +-clamp
    # gptneox/falcon: attention and FFN branch from the SAME input and both
    # add to the residual (use_parallel_residual / parallel_attn)
    parallel_residual: bool = False
    # partial rotary (gptneox rotary_pct): rope the first rope_dim dims of
    # each head, pass the rest through. 0 = full head_dim.
    rope_dim: int = 0
    # gemma2/gemma3-class features (reference: llama.cpp.patch build_gemma3 +
    # upstream build_gemma2; hparams at llama.cpp.patch:1237-1268):
    attn_softcap: float = 0.0        # gemma2 tanh softcap on attention scores
    final_softcap: float = 0.0       # gemma2 tanh softcap on output logits
    swa_window: int = 0              # sliding-window size (0 = global only)
    swa_pattern: int = 1             # layer l is SWA iff l % pattern < pattern-1
    swa_rope_theta: float = 0.0      # rope base for SWA layers (0 = rope_theta)
    attn_scale: float = 0.0          # score scale override (0 = 1/sqrt(head_dim))
    qk_norm: bool = False            # gemma3/qwen3 per-head q/k RMSNorm
    post_norms: bool = False         # gemma2/3 post-attn/post-ffn norms
    # granite scales (llama.cpp.patch:1276-1289)
    residual_scale: float = 1.0
    logit_scale: float = 1.0         # logits are DIVIDED by this
    # MoE (Mixtral/Qwen-MoE): 0 experts = dense FFN
    n_experts: int = 0
    n_experts_used: int = 0
    # top-k router weight renormalization: mixtral/qwen3moe yes,
    # qwen2moe no (upstream build_qwen2moe uses raw softmax weights)
    moe_norm_topk: bool = True
    # deepseek2 (MLA + fine-grained MoE): kv_lora_rank > 0 switches the
    # attention input path to multi-head latent attention, decompressed to
    # MHA for the cache (the reference's pinned llama.cpp caches full K/V
    # the same way). qk head = qk_nope_dim + rope_dim; V heads are v_head_dim
    # wide (!= qk width).
    q_lora_rank: int = 0             # 0 = direct q projection (V2-Lite)
    kv_lora_rank: int = 0
    qk_nope_dim: int = 0
    v_head_dim: int = 0              # 0 = head_dim (non-MLA archs)
    n_shared_experts: int = 0        # deepseek2: unconditional shared experts
    expert_weights_scale: float = 1.0  # routed_scaling_factor
    n_dense_layers: int = 0          # leading dense (non-MoE) blocks
    # gpt2/mpt family: no rotary embeddings at all (gpt2 adds learned
    # position embeddings via params.pos_embd; mpt uses ALiBi)
    no_rope: bool = False
    alibi: bool = False              # mpt/bloom linear attention bias
    gelu_approx: bool = False        # gpt2 gelu_new (tanh) in gateless FFN
    qk_norm_flat: bool = False       # olmoe full-width q/k RMSNorm (pre-split)

    @classmethod
    def from_gguf(cls, reader) -> "LlamaConfig":
        f = reader.field
        arch = reader.architecture
        d_model = int(f("{arch}.embedding_length"))
        n_heads = int(f("{arch}.attention.head_count"))
        n_kv = int(f("{arch}.attention.head_count_kv", n_heads))
        head_dim = int(f("{arch}.attention.key_length", d_model // n_heads))
        n_vocab = f("{arch}.vocab_size")
        if n_vocab is None:
            n_vocab = len(reader.metadata.get("tokenizer.ggml.tokens", []))
        max_ctx = int(f("{arch}.context_length", 8192))
        # YaRN metadata (llama.cpp LLM_KV_ROPE_SCALING_*): type selects the
        # formula; ext_factor defaults to 1.0 for yarn, 0.0 otherwise
        # (llama.cpp llama_context cparams.yarn_ext_factor < 0 fixup)
        scaling_type = str(f("{arch}.rope.scaling.type", "") or "")
        is_yarn = scaling_type.lower() == "yarn"
        n_layers = int(f("{arch}.block_count"))
        # gemma2/3 SWA + softcap + sandwich-norm features
        # (llama.cpp.patch:1237-1268, build_gemma3 at :2036)
        swa_window, swa_pattern, swa_rope_theta = 0, 1, 0.0
        attn_softcap = final_softcap = 0.0
        attn_scale = 0.0
        post_norms = False
        if arch == "gemma2":
            swa_window = int(f("{arch}.attention.sliding_window", 4096))
            swa_pattern = 2
            attn_softcap = float(f("{arch}.attn_logit_softcapping", 50.0))
            final_softcap = float(f("{arch}.final_logit_softcapping", 30.0))
            post_norms = True
            if n_layers == 46:           # gemma2-27b: q scaled by d/h, not D
                attn_scale = 1.0 / float(d_model / n_heads) ** 0.5
        elif arch == "glm4":
            # sandwich norms (post-attn/post-ffn RMS, no +1), sequential
            # residual, partial interleaved rope
            post_norms = True
        elif arch == "gemma3":
            swa_window = int(f("{arch}.attention.sliding_window", 1024))
            swa_pattern = 6
            swa_rope_theta = 10000.0
            post_norms = True
            if n_layers == 62:           # gemma3-27b (llama.cpp.patch:1265)
                attn_scale = 1.0 / float(d_model / n_heads) ** 0.5
            else:
                attn_scale = 1.0 / float(head_dim) ** 0.5
        return cls(
            rope_yarn_ext=1.0 if is_yarn else 0.0,
            rope_yarn_attn=float(f("{arch}.rope.scaling.attn_factor", 1.0)),
            rope_yarn_orig_ctx=int(
                f("{arch}.rope.scaling.original_context_length", max_ctx)),
            n_layers=n_layers,
            d_model=d_model,
            n_heads=n_heads,
            n_kv_heads=n_kv,
            d_ff=int(f("{arch}.feed_forward_length")),
            n_vocab=int(n_vocab),
            head_dim=head_dim,
            rope_theta=float(f("{arch}.rope.freq_base", 10000.0)),
            rope_scale=1.0 / float(f("{arch}.rope.scaling.factor", 1.0)),
            rms_eps=float(f("{arch}.attention.layer_norm_rms_epsilon",
                            f("{arch}.attention.layer_norm_epsilon", 1e-5))
                          or 1e-5),
            max_context=int(f("{arch}.context_length", 8192)),
            rope_neox=arch in ("qwen2", "qwen2moe", "qwen3", "qwen3moe",
                               "stablelm", "phi2", "phi3", "gemma", "gemma2",
                               "dbrx", "olmoe", "minicpm",
                               "gemma3", "olmo", "internlm2", "gptneox",
                               "falcon", "starcoder2", "deepseek2"),
            attn_qkv_bias=arch in ("qwen2", "qwen2moe", "stablelm",
                                   "gptneox", "starcoder2"),
            embd_scale=(float(d_model) ** 0.5 if arch.startswith("gemma")
                        else float(f("{arch}.embedding_scale", 1.0))),
            # NOTE norm_plus_one stays False for GGUF loads: llama.cpp's
            # converter bakes the (w+1) into gemma norm tensors at convert
            # time (convert_hf_to_gguf GemmaModel.modify_tensors), so the
            # runtime must use the stored weights as-is — adding 1 again
            # would double-shift every norm.
            attn_softcap=attn_softcap,
            final_softcap=final_softcap,
            swa_window=swa_window,
            swa_pattern=swa_pattern,
            swa_rope_theta=swa_rope_theta,
            attn_scale=(attn_scale if arch.startswith("gemma")
                        else float(f("{arch}.attention.scale", 0.0) or 0.0)),
            qk_norm=arch in ("gemma3", "qwen3", "qwen3moe"),
            post_norms=post_norms,
            residual_scale=float(f("{arch}.residual_scale", 1.0) or 1.0),
            logit_scale=(1.0 / float(f("{arch}.logit_scale", 1.0) or 1.0)
                         if arch == "command-r"
                         else float(f("{arch}.logit_scale", 0.0) or 1.0)),
            n_experts=int(f("{arch}.expert_count", 0) or 0),
            n_experts_used=int(f("{arch}.expert_used_count", 0) or 0),
            moe_norm_topk=(bool(f("{arch}.expert_weights_norm", False))
                           if arch == "deepseek2"
                           else arch not in ("qwen2moe", "olmoe")),
            norm_type=("ln_np" if arch == "olmo" else
                       "ln" if arch in ("gptneox", "falcon", "starcoder2",
                                        "command-r", "phi2", "gpt2", "mpt",
                                        "dbrx")
                       else "rms"),
            # baichuan-13B (40 layers) uses ALiBi and no rope; the 7B is
            # llama-shaped with NORM rope (llama.cpp build_baichuan's
            # MODEL_13B branch keys off the layer count the same way)
            no_rope=(arch in ("gpt2", "mpt", "bloom")
                     or (arch == "baichuan" and n_layers >= 40)),
            alibi=(arch in ("mpt", "bloom")
                   or (arch == "baichuan" and n_layers >= 40)),
            gelu_approx=arch == "gpt2",
            qk_norm_flat=arch == "olmoe",
            clamp_qkv=float(f("{arch}.attention.clamp_kqv", 0.0) or 0.0),
            q_lora_rank=int(f("{arch}.attention.q_lora_rank", 0) or 0),
            kv_lora_rank=int(f("{arch}.attention.kv_lora_rank", 0) or 0),
            qk_nope_dim=(head_dim - int(f("{arch}.rope.dimension_count",
                                          0) or 0)
                         if arch == "deepseek2" else 0),
            v_head_dim=(int(f("{arch}.attention.value_length", 0) or 0)
                        if arch == "deepseek2" else 0),
            rope_dim=(int(f("{arch}.rope.dimension_count", 0) or 0)
                      if arch in ("gptneox", "falcon", "starcoder2",
                                  "deepseek2", "phi2", "glm4") else 0),
            n_shared_experts=int(f("{arch}.expert_shared_count", 0) or 0),
            expert_weights_scale=float(
                f("{arch}.expert_weights_scale", 1.0) or 1.0),
            n_dense_layers=int(
                f("{arch}.leading_dense_block_count", 0) or 0),
            parallel_residual=(
                bool(f("{arch}.use_parallel_residual", True))
                if arch == "gptneox" else arch in ("falcon", "command-r",
                                                   "phi2", "plamo")),
            ffn_gelu=(arch.startswith("gemma") or arch == "starcoder2"),
        )


@dataclass
class LlamaLayer:
    attn_norm: Any          # f32 [d]
    wq: QTensor
    wk: QTensor
    wv: QTensor
    wo: QTensor
    ffn_norm: Any
    # optional attention biases (qwen2/stablelm/gptneox family)
    bq: Any = None
    bk: Any = None
    bv: Any = None
    # LN-family (gptneox/falcon/starcoder2) extras: norm biases, attn output
    # bias, FFN biases (gateless GELU FFN uses w_up/w_down only)
    attn_norm_b: Any = None
    ffn_norm_b: Any = None
    bo: Any = None
    b_up: Any = None
    b_down: Any = None
    # gemma3/qwen3 per-head q/k RMSNorm weights [head_dim]
    q_norm: Any = None
    k_norm: Any = None
    # gemma2/3 sandwich norms
    attn_post_norm: Any = None
    ffn_post_norm: Any = None
    # optional fused projections (single-device fast path: fewer, larger
    # kernel launches; TP keeps split tensors so shards stay head-aligned)
    wqkv: Optional[QTensor] = None
    w_gate_up: Optional[QTensor] = None
    # dense FFN
    w_gate: Optional[QTensor] = None
    w_up: Optional[QTensor] = None
    w_down: Optional[QTensor] = None
    # MoE
    gate_inp: Optional[QTensor] = None          # router [n_exp, d]
    experts: Optional[Dict[str, QTensor]] = None  # stacked expert weights
    # qwen2moe always-on shared expert, sigmoid-gated (ffn_*_shexp tensors);
    # deepseek2 shared experts are unconditional (no gate tensor)
    gate_inp_shexp: Optional[QTensor] = None    # [1, d]
    # deepseek2 MLA projections
    wq_a: Optional[QTensor] = None              # [q_lora_rank, d]
    q_a_norm: Any = None
    wq_b: Optional[QTensor] = None              # [h*(nope+rope), q_lora_rank]
    wkv_a: Optional[QTensor] = None             # [kv_lora_rank + rope, d]
    kv_a_norm: Any = None
    wkv_b: Optional[QTensor] = None             # [h*(nope+v), kv_lora_rank]


@dataclass
class LlamaParams:
    tok_embd: Any           # bf16 [n_vocab, d]
    layers: List[LlamaLayer]
    out_norm: Any           # f32 [d]
    output: QTensor         # lm head [n_vocab, d]
    out_norm_b: Any = None  # LN-family affine bias
    out_b: Any = None       # lm-head bias (phi2)
    pos_embd: Any = None    # gpt2 learned position embeddings [max_pos, d]


for _cls in (LlamaLayer, LlamaParams):
    jax.tree_util.register_dataclass(
        _cls, [f.name for f in dataclasses.fields(_cls)], [])


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)) * w


def _yarn_corr_dim(head_dim: int, orig_ctx: int, n_rot: float,
                   base: float) -> float:
    """Pair index where `n_rot` rotations happen at position orig_ctx
    (ggml_rope_yarn_corr_dim, llama.cpp via llama.cpp.patch; result is in
    units of i0/2 = our pair index)."""
    return (head_dim * np.log(orig_ctx / (n_rot * 2 * np.pi))
            / (2 * np.log(base)))


def rope_angles(pos: jax.Array, head_dim: int, theta: float, scale: float,
                cfg: Optional["LlamaConfig"] = None):
    """Rotation angles [..., head_dim//2] (LINEAR in pos for every supported
    scaling mode — linear and YaRN both scale per-dim frequencies — so cached
    K can be exactly re-rotated by a position delta; see runtime/paged.py
    context shift). Returns (ang, mscale)."""
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    extrap = pos[..., None].astype(jnp.float32) * freqs
    if cfg is None or cfg.rope_yarn_ext == 0.0 or scale == 1.0:
        return extrap * scale, 1.0
    interp = extrap * scale
    low = np.floor(_yarn_corr_dim(head_dim, cfg.rope_yarn_orig_ctx,
                                  cfg.rope_yarn_beta_fast, theta))
    high = np.ceil(_yarn_corr_dim(head_dim, cfg.rope_yarn_orig_ctx,
                                  cfg.rope_yarn_beta_slow, theta))
    low, high = max(0.0, low), min(head_dim - 1.0, high)
    i = jnp.arange(0, half, dtype=jnp.float32)
    ramp = 1.0 - jnp.clip((i - low) / max(1e-3, high - low), 0.0, 1.0)
    mix = ramp * cfg.rope_yarn_ext
    ang = interp * (1.0 - mix) + extrap * mix
    mscale = cfg.rope_yarn_attn * (1.0 + 0.1 * np.log(1.0 / scale))
    return ang, mscale


def rope_cos_sin(pos: jax.Array, head_dim: int, theta: float, scale: float,
                 cfg: Optional["LlamaConfig"] = None):
    """pos [...]-shaped int32 -> cos/sin [..., head_dim//2] f32.

    scale is the interpolation freq_scale (1/factor). When cfg carries YaRN
    params (rope_yarn_ext > 0), applies the exact upstream NTK-by-parts
    formula (ggml rope_yarn/rope_yarn_ramp): dims below the `beta_fast`
    correction point extrapolate (no scaling), dims above `beta_slow`
    interpolate, with a linear ramp between, and the magnitude is scaled by
    attn_factor * (1 + 0.1 ln(1/freq_scale)).
    """
    ang, mscale = rope_angles(pos, head_dim, theta, scale, cfg)
    return jnp.cos(ang) * mscale, jnp.sin(ang) * mscale


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, neox: bool) -> jax.Array:
    """x [..., H, head_dim]; cos/sin broadcastable [..., 1, head_dim//2]."""
    if neox:
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    # interleaved (NORM) mode as pure lane-wise arithmetic: the
    # reshape(..., D/2, 2) + stack formulation forces layout relayouts on TPU
    # (measured ~11 us/layer of decode rope glue). With pair-repeated
    # cos2/sin2 and a lane roll, out = x*cos2 + rot(x)*sin2 where
    # rot[2i] = -x[2i+1], rot[2i+1] = x[2i] — one elementwise fusion.
    # (identical XLA subexpressions across q/k/layers CSE the repeats)
    d = x.shape[-1]
    cos2 = jnp.repeat(cos, 2, axis=-1)
    sin2 = jnp.repeat(sin, 2, axis=-1)
    even = (jnp.arange(d) % 2 == 0)
    rot = jnp.where(even, -jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))
    return x * cos2 + rot * sin2


def attention(q, k_cache, v_cache, pos, t_pos, scale, window=None,
              softcap: float = 0.0, alibi=None):
    """GQA attention against the cache.

    q: [B, T, Hq, D]; k_cache/v_cache: [B, S, Hkv, D]; pos [B] first new index;
    t_pos [T] offsets of the new tokens. Mask: key j visible iff j <= pos+t,
    and (when `window` — int or traced scalar — is given) j > pos+t - window
    (gemma2/3 sliding-window attention). softcap != 0 applies gemma2's
    s -> cap*tanh(s/cap) to the scaled scores before masking.

    (XLA fuses the f32 casts into the matmuls — measured identical to
    bf16-operand einsums on v5e; f32 is kept for fallback-path precision.)
    """
    b, t, hq, d = q.shape
    s = k_cache.shape[1]
    hkv = k_cache.shape[2]
    group = hq // hkv
    qg = q.reshape(b, t, hkv, group, d).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, kf) * scale
    if softcap:
        scores = softcap * jnp.tanh(scores / softcap)
    j = jnp.arange(s)[None, None, :]
    limit = (pos[:, None] + t_pos[None, :])[:, :, None]      # [B, T, 1]
    if alibi is not None:
        # ALiBi: score += m_h * (j - i) (zero at the query, more negative
        # with key distance; mpt/bloom — ggml_alibi semantics)
        dist = (j - limit).astype(jnp.float32)               # [B, T, S]
        m = jnp.asarray(alibi, jnp.float32).reshape(hkv, group)
        scores = scores + m[None, :, :, None, None] * dist[:, None, None]
    mask = j <= limit                                        # [B, T, S]
    if window is not None:
        mask = mask & (j > limit - window)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, vf)
    return out.reshape(b, t, hq, vf.shape[-1])


_PRENORM = os.environ.get("LLAMAFILE_TPU_PRENORM", "1") != "0"


def _mm(x2d: jax.Array, w: QTensor, li=None, prenorm=None) -> jax.Array:
    return qmatmul(x2d, w, li, prenorm=prenorm)


def _prenorm_of(cfg: "LlamaConfig", w) -> tuple:
    """(norm_weight, eps) for folding an RMSNorm into qmatmul's activation
    prep (only valid for plain RMS archs — LN variants keep norm_fn)."""
    return (_nw(w, cfg), cfg.rms_eps)


def _finish_logits(logits: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """gemma2 final softcap + granite logit divide (llama.cpp result_output
    post-processing)."""
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    if cfg.logit_scale != 1.0:
        logits = logits / cfg.logit_scale
    return logits


def _nw(w, cfg: LlamaConfig):
    """Norm weight, honoring gemma's (w - 1) storage convention."""
    return w + 1.0 if cfg.norm_plus_one else w


def norm_fn(x: jax.Array, w, cfg: LlamaConfig, b=None) -> jax.Array:
    """Model norm: RMSNorm (default), olmo's non-parametric LayerNorm
    (mean-subtract, no affine — upstream llama.cpp build_olmo passes a NULL
    weight to build_norm), or the gptneox family's affine LayerNorm+bias."""
    if cfg.norm_type in ("ln_np", "ln"):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        out = (x32 - mu) * jax.lax.rsqrt(var + cfg.rms_eps)
        if cfg.norm_type == "ln":
            out = out * w
            if b is not None:
                out = out + b
        return out
    return rmsnorm(x, _nw(w, cfg), cfg.rms_eps)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (Press et al.; ggml_alibi formula): powers of
    2^(-8/n) for the nearest power-of-2 head count, interleaved extras."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return start * (start ** np.arange(n))
    n2 = 2 ** int(np.floor(np.log2(n_heads)))
    if n2 == n_heads:
        return pow2_slopes(n_heads).astype(np.float32)
    base = pow2_slopes(n2)
    extra = pow2_slopes(2 * n2)[0::2][: n_heads - n2]
    return np.concatenate([base, extra]).astype(np.float32)


def _alibi_local_slopes(cfg: LlamaConfig, tp_axis):
    """ALiBi slopes for THIS shard's heads. Under TP cfg.n_heads is the
    LOCAL count, so slopes come from the GLOBAL head table at offset
    axis_index * local_heads (mpt/bloom TP support — review r4 #7)."""
    if not cfg.alibi:
        return None
    if tp_axis is None:
        return alibi_slopes(cfg.n_heads)
    tpn = jax.lax.axis_size(tp_axis)
    table = jnp.asarray(alibi_slopes(cfg.n_heads * tpn))
    return jax.lax.dynamic_slice(
        table, (jax.lax.axis_index(tp_axis) * cfg.n_heads,), (cfg.n_heads,))


def _rope_qk(q, k, cos, sin, cfg: LlamaConfig):
    """Apply (possibly partial — gptneox rotary_pct) rope to q and k.
    no_rope archs (gpt2 learned positions, mpt ALiBi) pass through."""
    if cfg.no_rope:
        return q, k
    rd = cfg.rope_dim or cfg.head_dim
    if rd == cfg.head_dim:
        return (apply_rope(q, cos, sin, cfg.rope_neox),
                apply_rope(k, cos, sin, cfg.rope_neox))
    qr = apply_rope(q[..., :rd], cos, sin, cfg.rope_neox)
    kr = apply_rope(k[..., :rd], cos, sin, cfg.rope_neox)
    return (jnp.concatenate([qr, q[..., rd:]], axis=-1),
            jnp.concatenate([kr, k[..., rd:]], axis=-1))


def _clamp_qkv(q, k, v, cfg: LlamaConfig):
    if cfg.clamp_qkv > 0.0:
        c = cfg.clamp_qkv
        return (jnp.clip(q, -c, c), jnp.clip(k, -c, c), jnp.clip(v, -c, c))
    return q, k, v


def grouped_expert_ffn(rows: jax.Array, gid: jax.Array, w_row: jax.Array,
                       ex: dict, n_groups: int, tm: int,
                       base=0) -> jax.Array:
    """Ragged grouped-matmul expert FFN: the TPU analog of the reference's
    per-expert GEMMs over row-pointer lists (tinyblas_cpu_mixmul.inc:100-111).

    rows [R, d] activations; gid [R] int32 expert per row, values in
    [0, n_groups] where n_groups is a DUMP sentinel (rows whose output the
    caller discards — w_row should be 0 there); w_row [R] f32 router weight,
    applied between up and down. Rows are sorted by gid and scatter-packed
    into tile-aligned groups of a padded buffer; qmatmul_grouped's
    scalar-prefetch tile->expert map streams exactly one expert's weights
    per row tile, so compute and (at small R) weight bytes scale with
    ROUTED rows, not experts x rows. Returns [R, d] f32 in input order."""
    from ..ops.qmatmul import qmatmul_grouped
    r, d = rows.shape
    order = jnp.argsort(gid)                     # stable: ties keep row order
    gs = gid[order]
    counts = jnp.bincount(gid, length=n_groups + 1)
    padc = ((counts + tm - 1) // tm) * tm
    pend = jnp.cumsum(padc)
    start = jnp.cumsum(counts) - counts
    pos = ((pend - padc)[gs]
           + jnp.arange(r, dtype=jnp.int32) - start[gs]).astype(jnp.int32)
    n_tiles = -(-r // tm) + min(n_groups + 1, r)   # worst-case group padding
    xp = jnp.zeros((n_tiles * tm, d), rows.dtype).at[pos].set(rows[order])
    wp = jnp.zeros((n_tiles * tm, 1), jnp.float32).at[pos].set(
        w_row[order][:, None])
    # dump-group tiles clamp to expert n_groups-1: they stream real bytes
    # but their rows carry w=0, so their outputs are zeros and discarded
    te = (base + jnp.clip(jnp.searchsorted(
        pend, jnp.arange(n_tiles, dtype=jnp.int32) * tm, side="right"),
        0, n_groups - 1)).astype(jnp.int32)   # base: li*E under a layer
    # scan (stack_layers merges experts to [L*E, ...]; gid stays local)
    gu_qt = ex.get("gateup_il") or ex.get("gateup")
    if gu_qt is not None:            # fused: one call + one prep for both
        from ..ops.qmatmul import split_gu
        dff = gu_qt.shape[0] // 2
        gu = qmatmul_grouped(xp, gu_qt, te, tm=tm)
        g, u = split_gu(gu, dff, "gateup_il" in ex)
    else:
        g = qmatmul_grouped(xp, ex["gate"], te, tm=tm)
        u = qmatmul_grouped(xp, ex["up"], te, tm=tm)
    y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)) * wp
    dn = qmatmul_grouped(y, ex["down"], te, tm=tm)
    return jnp.zeros((r, d), jnp.float32).at[order].set(
        dn[pos].astype(jnp.float32))


def _grouped_tm(s: int) -> int:
    """Tile size: txn int8 kernel below 32 rows/tile (bandwidth-bound
    sizes), bf16 planes kernel at prefill scale (dequant amortizes).

    On a real TPU only tm=128 is used: the txn grouped kernel's activation
    -scale operand blocks as (K/32, tm) and Mosaic requires the lane dim be
    a multiple of 128 (or the whole array) — tm 8/32 lowers only under the
    CPU interpreter. The padding waste at small S is bounded (each expert's
    rows round up to 128) and the grouped path at decode-scale S is
    bandwidth-bound on expert bytes anyway."""
    from ..ops.qmatmul import _interpret
    if not _interpret():
        return 128
    return 8 if s <= 64 else (32 if s <= 512 else 128)


def _moe_grouped(x2d, ex, topw, topi, cfg: LlamaConfig,
                 base=0) -> jax.Array:
    """Single-chip grouped MoE: flatten (token, expert) slots, run the
    ragged grouped FFN, combine per token."""
    m, d = x2d.shape
    ku = cfg.n_experts_used
    s = m * ku
    ei = topi.reshape(s).astype(jnp.int32)
    tok = jnp.repeat(jnp.arange(m, dtype=jnp.int32), ku)
    y = grouped_expert_ffn(x2d[tok], ei, topw.reshape(s), ex,
                           cfg.n_experts, _grouped_tm(s), base)
    return y.reshape(m, ku, d).sum(axis=1)


def moe_ffn(x2d: jax.Array, layer: LlamaLayer, cfg: LlamaConfig,
            li=None) -> jax.Array:
    """Mixtral-style sparse MoE FFN (replaces llamafile_mixmul; SURVEY.md §2.2).

    Three formulations by routed-slot count S = M*k_used: expert-streamed
    decode kernels (S <= E), ragged grouped matmul (q4b), dense-compute
    loop (fallback: every expert runs on the batch, mixed by router weight).
    Expert-parallel sharding lives in parallel/moe.py for multi-chip.

    li (traced int32): layer id under the lax.scan over layers — expert
    stacks then hold ALL layers' experts [L*E, ...] (stack_layers) and
    every expert index is offset by li*E inside the kernels'
    scalar-prefetch maps; no per-layer weight slice is materialized.
    """
    from ..ops.qmatmul import moe_fusable, qmatmul_moe, qmatmul_routed, split_gu
    from ..ops.repack import expert_slice
    m, d = x2d.shape
    base = 0 if li is None else li * cfg.n_experts
    router = qmatmul(x2d, layer.gate_inp, li)                # [M, n_exp]
    weights = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(weights, cfg.n_experts_used)
    if cfg.moe_norm_topk:            # mixtral/qwen3moe; qwen2moe keeps raw
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    ex = layer.experts
    il = "gateup_il" in ex
    stacked = "gate" in ex or "gateup" in ex or il
    gu_qt = ex.get("gateup_il") or ex.get("gateup") or ex.get("gate")
    s_n = m * cfg.n_experts_used
    # grouped needs BOTH projections q4b (real Mixtral Q4_K_M GGUFs ship
    # Q6_K ffn_down — kind q8b — and must take the dense loop here)
    grouped_ok = (stacked and gu_qt.kind == "q4b"
                  and ex["down"].kind == "q4b"
                  and d % 256 == 0 and cfg.d_ff % 256 == 0)
    if stacked and s_n <= cfg.n_experts:
        # ROUTED decode path (the MixMul capability,
        # tinyblas_cpu_mixmul.inc:100-111): each (token, expert) slot is a
        # scalar-prefetch-indexed grid step — HBM streams only the top-k
        # experts' bytes (k_used/E of dense).
        ei = base + topi.reshape(s_n).astype(jnp.int32)
        if il and moe_fusable(gu_qt, ex["down"], d, cfg.d_ff):
            # ONE pallas call per layer: gateup, silu*up, requantize, and
            # down share a grid; the router weight folds into the int8
            # activation scales (see _qmm_kernel_moe_m1)
            dn = qmatmul_moe(x2d, gu_qt, ex["down"], ei,
                             topw.reshape(s_n))
            out = dn.reshape(m, cfg.n_experts_used, d).sum(axis=1)
        else:
            if gu_qt is not None and ("gateup" in ex or il):
                gu = qmatmul_routed(x2d, gu_qt, ei)
                g, u = split_gu(gu, cfg.d_ff, il)
            else:
                g = qmatmul_routed(x2d, ex["gate"], ei)
                u = qmatmul_routed(x2d, ex["up"], ei)
            y = (jax.nn.silu(g) * u) * topw.reshape(s_n, 1)  # weight pre-down
            dn = qmatmul_routed(y, ex["down"], ei,
                                row_map=jnp.arange(s_n, dtype=jnp.int32))
            out = dn.reshape(m, cfg.n_experts_used, d).sum(axis=1)
    elif grouped_ok:
        # GROUPED (ragged) path for batched decode / prefill: slots sorted
        # by expert, each expert's rows padded to an M tile, per-tile expert
        # ids ride scalar prefetch — compute stays proportional to routed
        # tokens (the reference's per-expert GEMMs over row-pointer lists)
        out = _moe_grouped(x2d, ex, topw, topi, cfg, base)
    else:
        out = jnp.zeros((m, d), jnp.float32)
        for e in range(cfg.n_experts):
            eo = e if li is None else base + e
            if stacked and ("gateup" in ex or il):
                gu = qmatmul(x2d, expert_slice(gu_qt, eo))
                g, u = split_gu(gu, cfg.d_ff, il)
            else:
                qg = expert_slice(ex["gate"], eo) if stacked else ex[f"gate.{e}"]
                qu = expert_slice(ex["up"], eo) if stacked else ex[f"up.{e}"]
                g = qmatmul(x2d, qg)
                u = qmatmul(x2d, qu)
            qd = expert_slice(ex["down"], eo) if stacked else ex[f"down.{e}"]
            y = qmatmul(jax.nn.silu(g) * u, qd)
            w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)  # [M]
            out = out + y * w_e[:, None]
    if cfg.expert_weights_scale != 1.0:
        # deepseek2 routed_scaling_factor on the routed contribution only
        out = out * cfg.expert_weights_scale
    if layer.experts is not None and "shexp.gate" in layer.experts:
        g = qmatmul(x2d, layer.experts["shexp.gate"])
        u = qmatmul(x2d, layer.experts["shexp.up"])
        y = qmatmul(jax.nn.silu(g) * u, layer.experts["shexp.down"])
        if layer.gate_inp_shexp is not None:
            # qwen2moe: sigmoid scalar gate; deepseek2: unconditional
            y = jax.nn.sigmoid(qmatmul(x2d, layer.gate_inp_shexp)[:, :1]) * y
        out = out + y
    return out


def int8_prefill_params(params: LlamaParams) -> LlamaParams:
    """Attach int8-g256 prefill companions (repack.attach_int8_prefill,
    two-level scheme — docs/prefill_analysis.md §2) to every per-layer
    matmul weight. Prefill matmuls then take the int8-MXU kernel; decode
    and all other paths are unchanged. Costs ~1 byte/weight extra HBM
    residency (base leaves are shared, not copied)."""
    import dataclasses as dc
    from ..ops.repack import attach_int8_prefill
    fields = ("wq", "wk", "wv", "wo", "wqkv", "w_gate_up",
              "w_gate", "w_up", "w_down")
    layers = []
    for layer in params.layers:
        upd = {}
        for f in fields:
            qt = getattr(layer, f, None)
            if qt is not None:
                nqt = attach_int8_prefill(qt)
                if nqt is not qt:
                    upd[f] = nqt
        layers.append(dc.replace(layer, **upd) if upd else layer)
    return dc.replace(params, layers=layers)


def stack_layers(params: LlamaParams) -> LlamaParams:
    """Stack homogeneous per-layer weights into one leading-L LlamaLayer so
    `forward` can lax.scan over layers: the compiled HLO then contains ONE
    layer body instead of n_layers copies — decode compile drops ~20x (the
    round-1 bench paid 553 s cold; VERDICT r1 weak #5). Returns params
    unchanged when layers are heterogeneous (mixed quant kinds / MoE)."""
    ls = params.layers
    if not isinstance(ls, list) or len(ls) < 2:
        return params
    if ls[0].attn_norm_b is not None or ls[0].bo is not None \
            or ls[0].b_up is not None or ls[0].wkv_a is not None \
            or ls[0].ffn_norm is None:
        # LN-family (gptneox/falcon/starcoder2/phi2), MLA (deepseek2) and
        # shared-norm parallel archs (command-r: ffn_norm is None) run
        # unrolled: the scan body lacks their branches
        return params
    if any(l.experts is not None for l in ls):
        # routed MoE joins the scan when every layer is homogeneous and all
        # expert stacks are q4b (the routed/grouped kernels' kind): expert
        # leaves [E, ...] stack to [L, E, ...] and are merged to [L*E, ...]
        # so the kernels' scalar-prefetch maps index expert li*E + e — no
        # per-layer weight slice is ever materialized. Shared-expert archs
        # (qwen2moe/deepseek2) and mixed-kind quants stay unrolled.
        ex0 = ls[0].experts
        if not all(
            l.experts is not None and l.gate_inp is not None
            and l.gate_inp_shexp is None
            and set(l.experts) == set(ex0 or ())
            and not any(k.startswith("shexp.") for k in l.experts)
            and all(isinstance(v, QTensor) and v.kind == "q4b"
                    and getattr(v.qs, "ndim", 0) == 3
                    for v in l.experts.values())
            for l in ls
        ):
            return params
        try:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
        except (ValueError, TypeError):
            return params
        merged = {
            k: QTensor(v.kind, v.shape, v.g,
                       v.qs.reshape(-1, *v.qs.shape[2:]),
                       None if v.scales is None else
                       v.scales.reshape(-1, *v.scales.shape[2:]),
                       None if v.bias is None else
                       v.bias.reshape(-1, *v.bias.shape[2:]), v.il)
            for k, v in stacked.experts.items()}
        import dataclasses as dc
        stacked = dc.replace(stacked, experts=merged)
        return LlamaParams(params.tok_embd, stacked, params.out_norm,
                           params.output)
    try:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
    except (ValueError, TypeError):
        return params                      # heterogeneous structure
    return LlamaParams(params.tok_embd, stacked, params.out_norm,
                       params.output)


def _layer_fwd(x, layer: LlamaLayer, cfg: LlamaConfig, cos, sin, pos, t_pos,
               scale, kc, vc, ksc, vsc, attn_len, fresh, tp_axis, li=None,
               rope_swa=None):
    """One transformer layer.

    li=None: kc/vc are layer-local [B, S, H, D] (+ [B, S, H] scales if int8).
    li traced int32: `layer` holds LAYER-STACKED leaves and kc/vc are the FULL
    stacked caches [L, B, S, H, D], carried through the lax.scan over layers:
    writes are per-layer row updates and the flash-decode kernel indexes the
    stacked cache by layer id (scalar prefetch) — neither materializes a
    per-layer slice copy (the earlier xs/ys formulation paid ~2 copies of the
    layer cache per decode step). Quantized matmuls likewise index stacked
    codes inside the kernel (qmatmul li path) so weights stream once.
    Returns (x, kc, vc, ksc, vsc)."""
    from ..runtime.kvcache import _quant_rows
    pick = (lambda a: a) if li is None else (lambda a: a[li])
    b, t, _ = x.shape
    s = kc.shape[1] if li is None else kc.shape[2]
    # gemma2/3 sliding-window layer selection: is_swa is a python bool for
    # the unrolled path, a traced bool under the layer scan (arithmetic on
    # li keeps the scan body layer-uniform)
    swa_on = cfg.swa_window > 0 and cfg.swa_pattern > 1
    win_l = None
    if swa_on:
        lix = li if li is not None else 0
        is_swa = (lix % cfg.swa_pattern) < (cfg.swa_pattern - 1)
        if li is None:
            win_l = cfg.swa_window if is_swa else None
        else:
            win_l = jnp.where(is_swa, jnp.int32(cfg.swa_window),
                              jnp.int32(1 << 30))
        if rope_swa is not None:         # gemma3: SWA layers use rope 10k
            if li is None:
                if is_swa:
                    cos, sin = rope_swa
            else:
                cos = jnp.where(is_swa, rope_swa[0], cos)
                sin = jnp.where(is_swa, rope_swa[1], sin)
    # mirror the unrolled path's guard (line ~939): the fold is only exact
    # for bias-free RMSNorm feeding a sequential residual — stack_layers
    # already refuses LN-bias/parallel archs, but don't depend on that
    fuse_pn = (_PRENORM and cfg.norm_type == "rms"
               and not cfg.parallel_residual and layer.attn_norm_b is None)
    if fuse_pn:
        # RMSNorm folds into the quantized matmul's activation prep (exact;
        # see ops.qmatmul.quantize_activations_g32) — no standalone norm op
        pn = _prenorm_of(cfg, pick(layer.attn_norm))
        h2d = x.reshape(b * t, cfg.d_model)
    else:
        pn = None
        h = norm_fn(x, pick(layer.attn_norm), cfg)
        h2d = h.reshape(b * t, cfg.d_model)
    nq = cfg.n_heads * cfg.head_dim
    nkv = cfg.n_kv_heads * cfg.head_dim
    if layer.wqkv is not None:
        qkv = _mm(h2d, layer.wqkv, li, prenorm=pn)
        q, k, v = (qkv[:, :nq], qkv[:, nq:nq + nkv],
                   qkv[:, nq + nkv:nq + 2 * nkv])
    else:
        q = _mm(h2d, layer.wq, li, prenorm=pn)
        k = _mm(h2d, layer.wk, li, prenorm=pn)
        v = _mm(h2d, layer.wv, li, prenorm=pn)
    if layer.bq is not None:
        q = q + pick(layer.bq)
        k = k + pick(layer.bk)
        v = v + pick(layer.bv)
    q, k, v = _clamp_qkv(q, k, v, cfg)
    q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    if cfg.qk_norm:                  # gemma3/qwen3 per-head RMSNorm pre-rope
        q = rmsnorm(q, _nw(pick(layer.q_norm), cfg), cfg.rms_eps)
        k = rmsnorm(k, _nw(pick(layer.k_norm), cfg), cfg.rms_eps)
    if cfg.qk_norm_flat:             # olmoe: full-width q/k RMSNorm
        q = rmsnorm(q.reshape(b, t, nq), pick(layer.q_norm),
                    cfg.rms_eps).reshape(b, t, cfg.n_heads, cfg.head_dim)
        k = rmsnorm(k.reshape(b, t, nkv), pick(layer.k_norm),
                    cfg.rms_eps).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    q, k = _rope_qk(q, k, cos, sin, cfg)
    idx = pos[:, None] + t_pos[None, :]                   # [B, T]
    bidx = jnp.arange(b)[:, None] * jnp.ones((1, t), jnp.int32)
    slopes = _alibi_local_slopes(cfg, tp_axis)

    quant = ksc is not None

    def put(buf, new):
        # dense caches are FLAT [..., S, H*D] (kvcache.py layout note);
        # int8 keeps head structure for the per-head scales
        if not quant and new.ndim == 4:
            new = new.reshape(b, t, -1)
        if li is not None:
            # stacked-carry write into the full [L, B, S, ...] cache
            if b == 1 and t == 1:
                return jax.lax.dynamic_update_slice(
                    buf, new[None].astype(buf.dtype),
                    (li, jnp.int32(0), pos[0])
                    + (jnp.int32(0),) * (buf.ndim - 3))
            lidx = jnp.broadcast_to(li, bidx.shape)
            return buf.at[lidx, bidx, idx].set(new.astype(buf.dtype),
                                               mode="drop")
        if b == 1 and t == 1:
            # single-token decode write: dynamic_update_slice lowers to a
            # cheap in-place row store (general scatter is far costlier).
            # Callers guarantee pos < S on this path (prefill keeps the
            # scatter because its bucket padding relies on drop semantics).
            return jax.lax.dynamic_update_slice(
                buf, new.astype(buf.dtype),
                (jnp.int32(0), pos[0]) + (jnp.int32(0),) * (buf.ndim - 2))
        return buf.at[bidx, idx].set(new.astype(buf.dtype), mode="drop")

    def layer_view(buf):
        return buf if li is None else jax.lax.dynamic_index_in_dim(
            buf, li, 0, keepdims=False)

    from ..ops.attention import (FLASH_DECODE, flash_decode,
                                 flash_decode_write_stacked, flash_prefill)
    fused_write = (t == 1 and FLASH_DECODE and li is not None and not quant
                   and not fresh and not cfg.alibi)
    if quant:                                             # int8-quantized KV
        qk, sk = _quant_rows(k.astype(jnp.float32))
        qv, sv = _quant_rows(v.astype(jnp.float32))
        kc, vc = put(kc, qk), put(vc, qv)
        ksc, vsc = put(ksc, sk), put(vsc, sv)
    elif not fused_write:
        kc, vc = put(kc, k), put(vc, v)

    if fresh:
        if cfg.alibi:
            # ALiBi bias is relative (ti - tj): einsum path over the fresh
            # tokens with zeroed base positions
            attn = attention(q, k, v, jnp.zeros_like(pos), t_pos, scale,
                             alibi=slopes)
        elif cfg.attn_softcap or (swa_on and t > cfg.swa_window):
            # softcap / wide-than-window prefill: einsum path with the
            # per-layer mask (upstream flash kernel is causal-only); when
            # T <= window SWA == causal so plain flash stays correct
            attn = flash_prefill(q, k, v, scale, window=win_l,
                                 softcap=cfg.attn_softcap)
        else:
            attn = flash_prefill(q, k, v, scale)
    elif fused_write:
        # stacked flash-decode with the KV row write fused into the kernel:
        # layer li of the carried flat [L, B, S, H*D] cache is indexed in the
        # block specs (no per-layer slice copy) and the new row lands through
        # pos-indexed aliased outputs (no XLA dynamic_update_slices)
        attn, kc, vc = flash_decode_write_stacked(
            q[:, 0], kc, vc, k[:, 0], v[:, 0], li, pos, scale,
            hkv=cfg.n_kv_heads,
            s_limit=attn_len if (attn_len is not None
                                 and attn_len < s) else None,
            win_l=win_l, softcap=cfg.attn_softcap)
        attn = attn[:, None]
    else:
        if quant:
            kci = (layer_view(kc).astype(jnp.float32)
                   * layer_view(ksc)[..., None])
            vci = (layer_view(vc).astype(jnp.float32)
                   * layer_view(vsc)[..., None])
        else:
            kci = layer_view(kc).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
            vci = layer_view(vc).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        if attn_len is not None and attn_len < s:
            kci = kci[:, :attn_len]
            vci = vci[:, :attn_len]
        if t == 1 and FLASH_DECODE and (win_l is None or li is None) \
                and not cfg.alibi:
            attn = flash_decode(q[:, 0], kci, vci, pos, scale,
                                window=(win_l or 0) if li is None else 0,
                                softcap=cfg.attn_softcap)[:, None]
        else:
            attn = attention(q, kci, vci, pos, t_pos, scale, window=win_l,
                             softcap=cfg.attn_softcap, alibi=slopes)
    o = _mm(attn.reshape(b * t, cfg.n_heads * cfg.head_dim), layer.wo, li)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    if cfg.post_norms:               # gemma2/3 sandwich norm on attn output
        o = rmsnorm(o, _nw(pick(layer.attn_post_norm), cfg), cfg.rms_eps)
    x = x + cfg.residual_scale * o.reshape(b, t, cfg.d_model)
    if fuse_pn:
        pn_f = _prenorm_of(cfg, pick(layer.ffn_norm))
        h2d = x.reshape(b * t, cfg.d_model)
    else:
        pn_f = None
        h = norm_fn(x, pick(layer.ffn_norm), cfg)
        h2d = h.reshape(b * t, cfg.d_model)
    if cfg.n_experts > 0 and layer.experts is not None:
        # routed MoE under the layer scan (stack_layers merged the expert
        # stacks to [L*E, ...]): router + experts share the normed input;
        # the kernels' scalar-prefetch maps index expert li*E + e
        if pn_f is not None:
            h2d = rmsnorm(h2d, pn_f[0], pn_f[1])
        f = moe_ffn(h2d, layer, cfg, li=li)
    elif layer.w_gate_up is not None:
        from ..ops.qmatmul import moe_fusable, qmatmul_moe, split_gu
        if (b * t == 1 and li is not None and layer.w_gate_up.il
                and not cfg.ffn_gelu and tp_axis is None
                and moe_fusable(layer.w_gate_up, layer.w_down,
                                cfg.d_model, cfg.d_ff)):
            # dense-FFN fusion: ONE pallas call runs gateup, silu*up,
            # requantize and down — the fused routed-FFN kernel with the
            # layer id as its scalar-prefetch "expert" ([L, ...] stacks)
            f = qmatmul_moe(h2d, layer.w_gate_up, layer.w_down,
                            jnp.full((1,), li, jnp.int32),
                            jnp.ones((1,), jnp.float32), prenorm=pn_f)
        else:
            gu = _mm(h2d, layer.w_gate_up, li, prenorm=pn_f)
            g, u = split_gu(gu, cfg.d_ff, layer.w_gate_up.il)
            act = (jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu
                   else jax.nn.silu(g))
            f = _mm(act * u, layer.w_down, li)
    else:
        g = _mm(h2d, layer.w_gate, li, prenorm=pn_f)
        u = _mm(h2d, layer.w_up, li, prenorm=pn_f)
        act = (jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu
               else jax.nn.silu(g))
        f = _mm(act * u, layer.w_down, li)
    if tp_axis is not None:
        f = jax.lax.psum(f, tp_axis)
    if cfg.post_norms:               # gemma2/3 sandwich norm on ffn output
        f = rmsnorm(f, _nw(pick(layer.ffn_post_norm), cfg), cfg.rms_eps)
    return x + cfg.residual_scale * f.reshape(b, t, cfg.d_model), kc, vc, ksc, vsc


def _ffn_core(h2d, layer: LlamaLayer, cfg: LlamaConfig, tp_axis,
              prenorm=None):
    """FFN branch on an input [M, d]: MoE | SwiGLU | gateless GELU.
    prenorm=(w, eps) folds the pre-FFN RMSNorm into the matmul prep for the
    dense branches; MoE applies it inline (router+experts reuse h2d)."""
    if cfg.n_experts > 0 and layer.experts is not None:
        if prenorm is not None:
            h2d = rmsnorm(h2d, prenorm[0], prenorm[1])
            prenorm = None
        if any(r in layer.experts for r in ("gate", "gateup", "gateup_il")) \
                and tp_axis is not None:
            # EP: stacked experts sharded over the axis; each device runs
            # its local experts, the psum below combines
            from ..parallel.moe import moe_ffn_ep
            n_local = (layer.experts.get("gateup_il")
                       or layer.experts.get("gateup")
                       or layer.experts.get("gate")).qs.shape[0]
            off = jax.lax.axis_index(tp_axis) * n_local
            f = moe_ffn_ep(h2d, layer, cfg, n_local, off)
        else:
            # single chip: moe_ffn handles stacked (routed decode kernel)
            # and per-expert dict layouts
            f = moe_ffn(h2d, layer, cfg)
    elif layer.w_gate is None and layer.w_gate_up is None:
        # gateless FFN (gptneox/falcon/starcoder2): up -> gelu -> down
        u = _mm(h2d, layer.w_up, prenorm=prenorm)
        if layer.b_up is not None:       # b_up shards with the d_ff columns
            u = u + layer.b_up
        # gptneox/mpt: erf gelu; gpt2: gelu_new (tanh)
        f = _mm(jax.nn.gelu(u, approximate=cfg.gelu_approx), layer.w_down)
    else:
        if layer.w_gate_up is not None:
            from ..ops.qmatmul import split_gu
            gu = _mm(h2d, layer.w_gate_up, prenorm=prenorm)
            g, u = split_gu(gu, cfg.d_ff, layer.w_gate_up.il)
        else:
            g = _mm(h2d, layer.w_gate, prenorm=prenorm)
            u = _mm(h2d, layer.w_up, prenorm=prenorm)
        act = jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu else jax.nn.silu(g)
        f = _mm(act * u, layer.w_down)
    if tp_axis is not None:
        f = jax.lax.psum(f, tp_axis)
    if layer.b_down is not None:     # replicated: add AFTER the row-parallel
        f = f + layer.b_down         # psum (before it, tp copies would sum)
    if cfg.post_norms:               # gemma2/3 sandwich norm on ffn output
        f = rmsnorm(f, _nw(layer.ffn_post_norm, cfg), cfg.rms_eps)
    return f


def _unrolled_ffn(x, layer: LlamaLayer, cfg: LlamaConfig, tp_axis):
    """FFN half of an unrolled layer: pre-norm -> FFN -> residual."""
    b, t, _ = x.shape
    if _PRENORM and cfg.norm_type == "rms" and layer.ffn_norm_b is None:
        f = _ffn_core(x.reshape(b * t, cfg.d_model), layer, cfg, tp_axis,
                      prenorm=_prenorm_of(cfg, layer.ffn_norm))
    else:
        h = norm_fn(x, layer.ffn_norm, cfg, layer.ffn_norm_b)
        f = _ffn_core(h.reshape(b * t, cfg.d_model), layer, cfg, tp_axis)
    return x + cfg.residual_scale * f.reshape(b, t, cfg.d_model)


def _finish_layer(x, h, o2d, layer: LlamaLayer, cfg: LlamaConfig, tp_axis):
    """Close out a layer given the attn-norm output h and o-proj output o2d:
    sequential residual (llama family) or parallel attn+FFN (gptneox/falcon,
    both branches fed from x and summed into one residual add)."""
    b, t, _ = x.shape
    if tp_axis is not None:
        o2d = jax.lax.psum(o2d, tp_axis)
    if layer.bo is not None:
        o2d = o2d + layer.bo
    if cfg.post_norms:               # gemma2/3 sandwich norm on attn output
        o2d = rmsnorm(o2d, _nw(layer.attn_post_norm, cfg), cfg.rms_eps)
    if cfg.parallel_residual:
        hm = (h if layer.ffn_norm is None else
              norm_fn(x, layer.ffn_norm, cfg, layer.ffn_norm_b))
        f = _ffn_core(hm.reshape(b * t, cfg.d_model), layer, cfg, tp_axis)
        return x + (o2d + f).reshape(b, t, cfg.d_model)
    x = x + cfg.residual_scale * o2d.reshape(b, t, cfg.d_model)
    return _unrolled_ffn(x, layer, cfg, tp_axis)


def forward(params: LlamaParams, cfg: LlamaConfig, tokens: jax.Array,
            pos: jax.Array, kv_cache,
            tp_axis: Optional[str] = None, return_hidden: bool = False,
            fresh_prefill: bool = False, embeds: Optional[jax.Array] = None,
            attn_len: Optional[int] = None,
            last_idx: Optional[jax.Array] = None,
            rope_pos: Optional[jax.Array] = None):
    """One forward pass over new tokens.

    tokens: int32 [B, T] new token ids
    pos:    int32 [B] index of tokens[:, 0] in each sequence
    rope_pos: int32 [B] rope position of tokens[:, 0] when it differs from
      the cache index (group-attention self-extend: runtime/selfextend.py);
      masking/KV-scatter keep using pos
    kv_cache: runtime.kvcache.KVCache (bf16 or int8-quantized), or a legacy
      (k, v) tuple of [L, B, S, Hkv, D] arrays
    tp_axis: mesh axis name when running inside shard_map with Megatron-style
      tensor parallelism (cfg must carry *local* head counts; row-parallel
      outputs are psum'd here, logits all-gathered over the vocab shards).
    Returns: logits [B, T, n_vocab] f32, new kv_cache.
    """
    from ..runtime.kvcache import KVCache, read_layer, update_layer
    b, t = tokens.shape
    legacy = not isinstance(kv_cache, KVCache)
    cache = KVCache(kv_cache[0], kv_cache[1], None, None) if legacy else kv_cache
    s = cache.max_len
    t_pos = jnp.arange(t)
    rp = pos if rope_pos is None else rope_pos
    cos, sin = rope_cos_sin(rp[:, None] + t_pos[None, :],
                            cfg.rope_dim or cfg.head_dim,
                            cfg.rope_theta, cfg.rope_scale, cfg)  # [B, T, rd/2]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    rope_swa = None
    if cfg.swa_rope_theta and cfg.swa_rope_theta != cfg.rope_theta:
        # gemma3: SWA layers keep rope base 10k / scale 1 (llama.cpp.patch
        # :1251-1252); global layers use the configured base
        cs, ss = rope_cos_sin(pos[:, None] + t_pos[None, :], cfg.head_dim,
                              cfg.swa_rope_theta, 1.0, None)
        rope_swa = (cs[:, :, None, :], ss[:, :, None, :])
    scale = cfg.attn_scale or 1.0 / np.sqrt(cfg.head_dim)

    # multimodal prefill supplies embeddings directly (image atoms spliced in)
    # jnp.take lowers ~3x faster than bracket-gather for prefill-sized
    # index batches (measured on v5e)
    x = (embeds.astype(jnp.float32) if embeds is not None
         else jnp.take(params.tok_embd, tokens, axis=0).astype(jnp.float32))
    if cfg.embd_scale != 1.0:
        x = x * cfg.embd_scale
    if params.pos_embd is not None:     # gpt2 learned position embeddings
        x = x + jnp.take(params.pos_embd,
                         jnp.clip(pos[:, None] + t_pos[None, :], 0,
                                  params.pos_embd.shape[0] - 1),
                         axis=0).astype(jnp.float32)
    if isinstance(params.layers, LlamaLayer):
        # stacked layers: ONE scanned layer body in the HLO (see stack_layers).
        # Weights stay OUT of the scan xs — the body closes over the stacked
        # arrays and indexes them by layer id inside the matmul kernels;
        # scanning weights as xs would materialize a full per-layer copy
        # before the kernel reads it (measured 1.5x per-layer cost).
        sl = params.layers
        quant = cache.quantized
        lids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        # The FULL [L, ...] cache rides the scan CARRY (per-layer row updates
        # in place; reads go through the li-indexed flash kernel) — cache
        # arrays in xs/ys cost ~2 slice copies of the layer cache per step.
        carry0 = ((x, cache.k, cache.v, cache.k_scale, cache.v_scale)
                  if quant else (x, cache.k, cache.v))

        def body(carry, li):
            xc, kc, vc = carry[0], carry[1], carry[2]
            ksc, vsc = (carry[3], carry[4]) if quant else (None, None)
            xc, kc, vc, ksc, vsc = _layer_fwd(
                xc, sl, cfg, cos, sin, pos, t_pos, scale, kc, vc, ksc, vsc,
                attn_len, fresh_prefill, tp_axis, li=li, rope_swa=rope_swa)
            return ((xc, kc, vc, ksc, vsc) if quant else (xc, kc, vc)), None

        carry, _ = jax.lax.scan(body, carry0, lids)
        x = carry[0]
        cache = (KVCache(carry[1], carry[2], carry[3], carry[4]) if quant
                 else KVCache(carry[1], carry[2], None, None))
        out_cache = (cache.k, cache.v) if legacy else cache
        if return_hidden:
            return norm_fn(x, params.out_norm, cfg), out_cache
        if last_idx is not None:
            # prefill only needs next-token logits: slice hidden states
            # BEFORE the lm head (the pallas matmul is opaque to XLA DCE —
            # a full [T, n_vocab] head costs ~1/3 of an 8B 512-token prefill)
            x = x[jnp.arange(b), last_idx][:, None]       # [B, 1, d]
            t_out = 1
        else:
            t_out = t
        if _PRENORM and cfg.norm_type == "rms":
            logits = _mm(x.reshape(b * t_out, cfg.d_model), params.output,
                         prenorm=_prenorm_of(cfg, params.out_norm))
        else:
            x = norm_fn(x, params.out_norm, cfg)
            logits = _mm(x.reshape(b * t_out, cfg.d_model), params.output)
        if tp_axis is not None:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
            logits = logits[:, : params.output.shape[0]]
        return _finish_logits(logits, cfg).reshape(b, t_out, -1), out_cache
    swa_on = cfg.swa_window > 0 and cfg.swa_pattern > 1
    for li, layer in enumerate(params.layers):
        is_swa = swa_on and (li % cfg.swa_pattern) < (cfg.swa_pattern - 1)
        win_l = cfg.swa_window if is_swa else None
        cos_l, sin_l = ((rope_swa if (is_swa and rope_swa is not None)
                         else (cos, sin)))
        fuse_pn = (_PRENORM and cfg.norm_type == "rms"
                   and not cfg.parallel_residual)
        if fuse_pn:
            # RMSNorm folds into the quantized matmuls' activation prep
            # (exact; ops.qmatmul.quantize_activations_g32) — h is only
            # needed by _finish_layer for parallel-residual archs, excluded
            pn = _prenorm_of(cfg, layer.attn_norm)
            h = None
            h2d = x.reshape(b * t, cfg.d_model)
        else:
            pn = None
            h = norm_fn(x, layer.attn_norm, cfg, layer.attn_norm_b)
            h2d = h.reshape(b * t, cfg.d_model)
        nq = cfg.n_heads * cfg.head_dim
        nkv = cfg.n_kv_heads * cfg.head_dim
        if cfg.kv_lora_rank:
            # deepseek2 MLA (multi-head latent attention), decompressed to
            # MHA for the cache — the reference's pinned llama.cpp
            # build_deepseek2 caches full roped K and full V the same way.
            # rope applies only to the qk_rope slice; k_pe is a SINGLE
            # shared head broadcast across all query heads.
            rd = cfg.rope_dim
            nope = cfg.qk_nope_dim
            if layer.wq_a is not None:
                qa = rmsnorm(_mm(h2d, layer.wq_a, prenorm=pn),
                             layer.q_a_norm, cfg.rms_eps)
                q = _mm(qa, layer.wq_b)
            else:
                q = _mm(h2d, layer.wq, prenorm=pn)
            q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
            kva = _mm(h2d, layer.wkv_a, prenorm=pn)
            compressed = rmsnorm(kva[:, :cfg.kv_lora_rank],
                                 layer.kv_a_norm, cfg.rms_eps)
            k_pe = kva[:, cfg.kv_lora_rank:].reshape(b, t, 1, rd)
            kv = _mm(compressed, layer.wkv_b).reshape(
                b, t, cfg.n_heads, nope + cfg.v_head_dim)
            q_pe = apply_rope(q[..., nope:], cos_l, sin_l, cfg.rope_neox)
            k_pe = apply_rope(k_pe, cos_l, sin_l, cfg.rope_neox)
            q = jnp.concatenate([q[..., :nope], q_pe], axis=-1)
            k = jnp.concatenate(
                [kv[..., :nope],
                 jnp.broadcast_to(k_pe, (b, t, cfg.n_heads, rd))], axis=-1)
            v = kv[..., nope:]
        else:
            if layer.wqkv is not None:
                qkv = _mm(h2d, layer.wqkv, prenorm=pn)
                q = qkv[:, :nq]
                k = qkv[:, nq:nq + nkv]
                v = qkv[:, nq + nkv:nq + 2 * nkv]
            else:
                q = _mm(h2d, layer.wq, prenorm=pn)
                k = _mm(h2d, layer.wk, prenorm=pn)
                v = _mm(h2d, layer.wv, prenorm=pn)
            if layer.bq is not None:
                q, k, v = q + layer.bq, k + layer.bk, v + layer.bv
            q, k, v = _clamp_qkv(q, k, v, cfg)
            q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
            k = k.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
            v = v.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
            if cfg.qk_norm:          # gemma3/qwen3 per-head RMSNorm pre-rope
                q = rmsnorm(q, _nw(layer.q_norm, cfg), cfg.rms_eps)
                k = rmsnorm(k, _nw(layer.k_norm, cfg), cfg.rms_eps)
            if cfg.qk_norm_flat:     # olmoe full-width q/k RMSNorm
                q = rmsnorm(q.reshape(b, t, nq), layer.q_norm,
                            cfg.rms_eps).reshape(b, t, cfg.n_heads,
                                                 cfg.head_dim)
                k = rmsnorm(k.reshape(b, t, nkv), layer.k_norm,
                            cfg.rms_eps).reshape(b, t, cfg.n_kv_heads,
                                                 cfg.head_dim)
            q, k = _rope_qk(q, k, cos_l, sin_l, cfg)
        # scatter new K/V rows into the cache at [pos, pos+T)
        idx = pos[:, None] + t_pos[None, :]                   # [B, T]
        bidx = jnp.arange(b)[:, None] * jnp.ones((1, t), jnp.int32)
        slopes = _alibi_local_slopes(cfg, tp_axis)
        from ..ops.attention import FLASH_DECODE, flash_decode_write_stacked
        if (t == 1 and FLASH_DECODE and not cache.quantized
                and not fresh_prefill and not cfg.kv_lora_rank
                and not cfg.alibi):
            # layer-indexed flash decode against the FULL [L,B,S,H*D] cache
            # with the KV row write FUSED into the kernel: read_layer slices
            # cost a per-layer K+V copy (~55 µs/layer by ablation) and the
            # two XLA dynamic_update_slices are two more launches per layer
            from ..runtime.kvcache import KVCache
            attn, k3n, v3n = flash_decode_write_stacked(
                q[:, 0], cache.k, cache.v, k[:, 0], v[:, 0],
                jnp.int32(li), pos, scale, hkv=cfg.n_kv_heads,
                s_limit=attn_len if (attn_len is not None
                                     and attn_len < s) else None,
                win_l=win_l, softcap=cfg.attn_softcap)
            attn = attn[:, None]
            cache = KVCache(k3n, v3n, None, None)
            o = _mm(attn.reshape(b * t, cfg.n_heads * cfg.head_dim),
                    layer.wo)
            x = _finish_layer(x, h, o, layer, cfg, tp_axis)
            continue
        cache = update_layer(cache, li, bidx, idx, k, v)
        kci, vci = read_layer(cache, li, cfg.n_kv_heads)
        if attn_len is not None and attn_len < s:
            # length bucketing: only the first attn_len cache positions can be
            # visible (pos + t < attn_len guaranteed by the caller) — skip
            # reading the padded tail of the KV cache
            kci = kci[:, :attn_len]
            vci = vci[:, :attn_len]
        if fresh_prefill:
            # no prior context: flash kernel over the fresh tokens only
            from ..ops.attention import flash_prefill
            if cfg.alibi:
                attn = attention(q, k, v, jnp.zeros_like(pos), t_pos, scale,
                                 alibi=slopes)
            elif cfg.attn_softcap or (is_swa and t > cfg.swa_window):
                attn = flash_prefill(q, k, v, scale, window=win_l,
                                     softcap=cfg.attn_softcap)
            else:
                attn = flash_prefill(q, k, v, scale)
        else:
            attn = attention(q, kci, vci, pos, t_pos, scale, window=win_l,
                             softcap=cfg.attn_softcap, alibi=slopes)
        o = _mm(attn.reshape(
            b * t, cfg.n_heads * (cfg.v_head_dim or cfg.head_dim)), layer.wo)
        x = _finish_layer(x, h, o, layer, cfg, tp_axis)

    out_cache = (cache.k, cache.v) if legacy else cache
    if return_hidden:
        return norm_fn(x, params.out_norm, cfg, params.out_norm_b), out_cache
    if last_idx is not None:       # next-token logits only (see scan branch)
        x = x[jnp.arange(b), last_idx][:, None]
        t_out = 1
    else:
        t_out = t
    if (_PRENORM and cfg.norm_type == "rms"
            and params.out_norm_b is None):
        logits = _mm(x.reshape(b * t_out, cfg.d_model), params.output,
                     prenorm=_prenorm_of(cfg, params.out_norm))
    else:
        x = norm_fn(x, params.out_norm, cfg, params.out_norm_b)
        logits = _mm(x.reshape(b * t_out, cfg.d_model), params.output)
    if params.out_b is not None:       # phi2-style lm-head bias
        logits = logits + params.out_b
    if tp_axis is not None:
        # vocab-sharded LM head -> gather the full distribution; padding (if
        # the head's N was tile-padded) sits at the global tail — slice it off
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
        logits = logits[:, : params.output.shape[0]]
    n_vocab = logits.shape[-1]
    return _finish_logits(logits, cfg).reshape(b, t_out, n_vocab), out_cache


def forward_paged_decode(params: LlamaParams, cfg: LlamaConfig,
                         tok: jax.Array, pos: jax.Array, paged, tables):
    """One decode step (T=1 per row) over a paged KV cache.

    tok/pos int32 [R]; paged: runtime.paged.PagedKV; tables int32 [R, MAXP].
    Per-row attention reads only `pos+1` positions through the block tables
    (the paged replacement for dense attn_len bucketing). Returns
    (logits [R, V], updated paged).
    """
    from ..runtime.paged import paged_attend, write_token_kv
    assert not (cfg.swa_window > 0 and cfg.swa_pattern > 1), \
        "paged decode does not support sliding-window models yet (use dense)"
    assert not cfg.alibi, "paged decode does not support ALiBi (use dense)"
    r = tok.shape[0]
    ps = paged.page_size
    x = jnp.take(params.tok_embd, tok, axis=0).astype(jnp.float32)  # [R, d]
    if cfg.embd_scale != 1.0:
        x = x * cfg.embd_scale
    if params.pos_embd is not None:     # gpt2 learned position embeddings
        x = x + jnp.take(params.pos_embd,
                         jnp.clip(pos, 0, params.pos_embd.shape[0] - 1),
                         axis=0).astype(jnp.float32)
    cos, sin = rope_cos_sin(pos[:, None], cfg.rope_dim or cfg.head_dim,
                            cfg.rope_theta, cfg.rope_scale, cfg)  # [R, 1, rd/2]
    pages = jnp.take_along_axis(tables, (pos // ps)[:, None], axis=1)[:, 0]
    offs = pos % ps
    lengths = pos + 1
    scale = cfg.attn_scale or 1.0 / np.sqrt(cfg.head_dim)
    nq = cfg.n_heads * cfg.head_dim
    nkv = cfg.n_kv_heads * cfg.head_dim

    quantized = paged.quantized

    def one_layer(xc, layer, kp, vp, ksp=None, vsp=None, li=None):
        pick = (lambda a: a) if li is None else (lambda a: a[li])
        h = norm_fn(xc, pick(layer.attn_norm), cfg,
                    None if layer.attn_norm_b is None
                    else pick(layer.attn_norm_b))
        if cfg.kv_lora_rank:
            # deepseek2 MLA (unrolled only — stack_layers refuses wkv_a):
            # mirror the dense path's decompress-to-MHA formulation
            rd, nope = cfg.rope_dim, cfg.qk_nope_dim
            if layer.wq_a is not None:
                qa = rmsnorm(_mm(h, layer.wq_a), layer.q_a_norm, cfg.rms_eps)
                q = _mm(qa, layer.wq_b)
            else:
                q = _mm(h, layer.wq)
            q = q.reshape(r, cfg.n_heads, cfg.head_dim)
            kva = _mm(h, layer.wkv_a)
            compressed = rmsnorm(kva[:, :cfg.kv_lora_rank],
                                 layer.kv_a_norm, cfg.rms_eps)
            k_pe = kva[:, cfg.kv_lora_rank:].reshape(r, 1, rd)
            kv = _mm(compressed, layer.wkv_b).reshape(
                r, cfg.n_heads, nope + cfg.v_head_dim)
            q_pe = apply_rope(q[..., nope:], cos, sin, cfg.rope_neox)
            k_pe = apply_rope(k_pe, cos, sin, cfg.rope_neox)
            q = jnp.concatenate([q[..., :nope], q_pe], axis=-1)
            k = jnp.concatenate(
                [kv[..., :nope],
                 jnp.broadcast_to(k_pe, (r, cfg.n_heads, rd))], axis=-1)
            v = kv[..., nope:]
        elif layer.wqkv is not None:
            qkv = _mm(h, layer.wqkv, li)
            q, k, v = (qkv[:, :nq], qkv[:, nq:nq + nkv],
                       qkv[:, nq + nkv:nq + 2 * nkv])
        else:
            q, k, v = (_mm(h, layer.wq, li), _mm(h, layer.wk, li),
                       _mm(h, layer.wv, li))
        if not cfg.kv_lora_rank:       # MLA built roped q/k/v above
            if layer.bq is not None:
                q, k, v = (q + pick(layer.bq), k + pick(layer.bk),
                           v + pick(layer.bv))
            q, k, v = _clamp_qkv(q, k, v, cfg)
            q = q.reshape(r, cfg.n_heads, cfg.head_dim)
            k = k.reshape(r, cfg.n_kv_heads, cfg.head_dim)
            if cfg.qk_norm:
                q = rmsnorm(q, _nw(pick(layer.q_norm), cfg), cfg.rms_eps)
                k = rmsnorm(k, _nw(pick(layer.k_norm), cfg), cfg.rms_eps)
            if cfg.qk_norm_flat:     # olmoe full-width q/k RMSNorm
                q = rmsnorm(q.reshape(r, nq), pick(layer.q_norm),
                            cfg.rms_eps).reshape(r, cfg.n_heads,
                                                 cfg.head_dim)
                k = rmsnorm(k.reshape(r, nkv), pick(layer.k_norm),
                            cfg.rms_eps).reshape(r, cfg.n_kv_heads,
                                                 cfg.head_dim)
            q, k = _rope_qk(q, k, cos, sin, cfg)   # partial-rotary aware
            v = v.reshape(r, cfg.n_kv_heads, cfg.head_dim)
        if quantized:
            kp, vp, ksp, vsp = write_token_kv(kp, vp, k, v, pages, offs,
                                              ksp, vsp)
        else:
            kp, vp = write_token_kv(kp, vp, k, v, pages, offs)
        attn = paged_attend((q * scale).astype(jnp.float32), kp, vp,
                            lengths, tables, k_scale_l=ksp, v_scale_l=vsp)
        o = _mm(attn.reshape(
            r, cfg.n_heads * (cfg.v_head_dim or cfg.head_dim)), layer.wo, li)
        if li is None:
            # unrolled archs (LN-family, MoE, parallel-residual, command-r
            # shared norm, gateless FFN, biases) share the dense path's layer
            # closer — _finish_layer/_ffn_core carry every branch
            x3 = _finish_layer(xc[:, None, :], h[:, None, :], o, layer, cfg,
                               None)
            return x3[:, 0], kp, vp, ksp, vsp
        # stacked fast path (homogeneous rms llama-family; see stack_layers)
        if cfg.post_norms:
            o = rmsnorm(o, _nw(pick(layer.attn_post_norm), cfg), cfg.rms_eps)
        xc = xc + cfg.residual_scale * o
        h = norm_fn(xc, pick(layer.ffn_norm), cfg)
        if cfg.n_experts > 0 and layer.experts is not None:
            # routed MoE under the paged layer scan (stack_layers merged
            # the expert stacks to [L*E, ...]; see moe_ffn's li path)
            f = moe_ffn(h, layer, cfg, li=li)
        elif layer.w_gate_up is not None:
            from ..ops.qmatmul import moe_fusable, qmatmul_moe, split_gu
            if (h.shape[0] == 1 and layer.w_gate_up.il and not cfg.ffn_gelu
                    and moe_fusable(layer.w_gate_up, layer.w_down,
                                    cfg.d_model, cfg.d_ff)):
                # single-row paged decode: fused FFN (see _layer_fwd)
                f = qmatmul_moe(h, layer.w_gate_up, layer.w_down,
                                jnp.full((1,), li, jnp.int32),
                                jnp.ones((1,), jnp.float32))
            else:
                gu = _mm(h, layer.w_gate_up, li)
                g, u = split_gu(gu, cfg.d_ff, layer.w_gate_up.il)
                act = (jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu
                       else jax.nn.silu(g))
                f = _mm(act * u, layer.w_down, li)
        else:
            g, u = _mm(h, layer.w_gate, li), _mm(h, layer.w_up, li)
            act = (jax.nn.gelu(g, approximate=True) if cfg.ffn_gelu
                   else jax.nn.silu(g))
            f = _mm(act * u, layer.w_down, li)
        if cfg.post_norms:
            f = rmsnorm(f, _nw(pick(layer.ffn_post_norm), cfg), cfg.rms_eps)
        return xc + cfg.residual_scale * f, kp, vp, ksp, vsp

    if isinstance(params.layers, LlamaLayer):
        sl = params.layers
        lids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        xs = ((lids, paged.k_pages, paged.v_pages, paged.k_scale,
               paged.v_scale) if quantized
              else (lids, paged.k_pages, paged.v_pages))

        def body(xc, per):
            li, kp, vp = per[0], per[1], per[2]
            ksp, vsp = (per[3], per[4]) if quantized else (None, None)
            xc, kp, vp, ksp, vsp = one_layer(xc, sl, kp, vp, ksp, vsp, li=li)
            return xc, ((kp, vp, ksp, vsp) if quantized else (kp, vp))
        x, ys = jax.lax.scan(body, x, xs)
        paged = (type(paged)(ys[0], ys[1], ys[2], ys[3]) if quantized
                 else type(paged)(ys[0], ys[1]))
    else:
        outs = []
        for li, layer in enumerate(params.layers):
            x, kp, vp, ksp, vsp = one_layer(
                x, layer, paged.k_pages[li], paged.v_pages[li],
                paged.k_scale[li] if quantized else None,
                paged.v_scale[li] if quantized else None)
            outs.append((kp, vp, ksp, vsp))
        paged = type(paged)(
            jnp.stack([o[0] for o in outs]), jnp.stack([o[1] for o in outs]),
            jnp.stack([o[2] for o in outs]) if quantized else None,
            jnp.stack([o[3] for o in outs]) if quantized else None)
    x = norm_fn(x, params.out_norm, cfg, params.out_norm_b)
    logits = _mm(x, params.output)
    if params.out_b is not None:       # phi2-style lm-head bias
        logits = logits + params.out_b
    return _finish_logits(logits, cfg), paged


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16):
    from ..runtime.kvcache import init_kv
    return init_kv(cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim,
                   dtype, v_head_dim=cfg.v_head_dim)
