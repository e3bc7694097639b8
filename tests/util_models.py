"""Factories for tiny test GGUFs — mirrors the reference CI's bundled
TinyLLama-v0.1-5M smoke-test pattern (.github/workflows/ci.yml:55-80)."""
from __future__ import annotations

import numpy as np

from llamafile_tpu.gguf import GGUFWriter
from llamafile_tpu.gguf import quants as Q


def byte_vocab():
    """Minimal byte-fallback vocab: specials + 256 byte tokens, padded to 264
    so the vocab dim shards evenly over tp<=8."""
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    token_type = [2, 3, 3] + [6] * 256
    while len(tokens) % 8:
        tokens.append(f"<pad{len(tokens)}>")
        token_type.append(5)  # unused
    scores = [0.0] * len(tokens)
    return tokens, scores, token_type


def make_tiny_llama_gguf(path: str, *, d_model=64, n_layers=2, n_heads=4,
                         n_kv_heads=2, d_ff=128, quant="F32", seed=0,
                         n_experts=0, n_experts_used=0, vocab=None):
    rng = np.random.default_rng(seed)
    tokens, scores, token_type = vocab or byte_vocab()
    n_vocab = len(tokens)
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.name", "tiny-test")
    w.add("llama.block_count", n_layers)
    w.add("llama.embedding_length", d_model)
    w.add("llama.attention.head_count", n_heads)
    w.add("llama.attention.head_count_kv", n_kv_heads)
    w.add("llama.feed_forward_length", d_ff)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.context_length", 512)
    w.add("llama.vocab_size", n_vocab)
    if n_experts:
        w.add("llama.expert_count", n_experts)
        w.add("llama.expert_used_count", n_experts_used)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", np.asarray(token_type, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale=0.08):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def add_w(name, arr):
        n, k = arr.shape
        if quant == "F32" or k % Q.TYPE_BY_NAME.get(quant, Q.TYPE_BY_NAME["F32"]).block_elems:
            w.add_tensor_f32(name, arr)
        elif quant == "F16":
            w.add_tensor_f16(name, arr)
        else:
            spec = Q.TYPE_BY_NAME[quant]
            raw = spec.quantize(arr.reshape(-1))
            w.add_tensor(name, arr.shape, quant, raw)

    w.add_tensor_f32("token_embd.weight", rand((n_vocab, d_model), 0.5))
    head_dim = d_model // n_heads
    for i in range(n_layers):
        p = f"blk.{i}."
        w.add_tensor_f32(p + "attn_norm.weight", np.ones(d_model, np.float32))
        add_w(p + "attn_q.weight", rand((n_heads * head_dim, d_model)))
        add_w(p + "attn_k.weight", rand((n_kv_heads * head_dim, d_model)))
        add_w(p + "attn_v.weight", rand((n_kv_heads * head_dim, d_model)))
        add_w(p + "attn_output.weight", rand((d_model, n_heads * head_dim)))
        w.add_tensor_f32(p + "ffn_norm.weight", np.ones(d_model, np.float32))
        if n_experts:
            add_w(p + "ffn_gate_inp.weight", rand((n_experts, d_model)))
            for e in range(n_experts):
                add_w(p + f"ffn_gate.{e}.weight", rand((d_ff, d_model)))
                add_w(p + f"ffn_up.{e}.weight", rand((d_ff, d_model)))
                add_w(p + f"ffn_down.{e}.weight", rand((d_model, d_ff)))
        else:
            add_w(p + "ffn_gate.weight", rand((d_ff, d_model)))
            add_w(p + "ffn_up.weight", rand((d_ff, d_model)))
            add_w(p + "ffn_down.weight", rand((d_model, d_ff)))
    w.add_tensor_f32("output_norm.weight", np.ones(d_model, np.float32))
    w.add_tensor_f32("output.weight", rand((n_vocab, d_model), 0.5))
    w.write()
    return path
