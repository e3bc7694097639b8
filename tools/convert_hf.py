#!/usr/bin/env python3
"""HF checkpoint -> GGUF converter (llamafile-convert analog).

Reference: build/llamafile-convert drives llama.cpp's convert scripts then
zipaligns (SURVEY.md §2.6). This converter reads a local HuggingFace llama-family
checkpoint (safetensors / pytorch .bin), maps tensors to GGUF names, applies the
classic q/k permutation for interleaved (NORM) RoPE, embeds the tokenizer from
tokenizer.json (vocab+merges or unigram scores), and writes F16 GGUF —
optionally quantizing in the same pass via --quant and packing a .llamafile ZIP
with --zip.

Usage: python tools/convert_hf.py /path/to/hf_dir out.gguf [--quant Q4_K] [--zip]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_state_dict(path):
    tensors = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    tensors[name] = sf.get_tensor(name)
        return tensors
    bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if bins:
        import torch
        for f in bins:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for name, t in sd.items():
                tensors[name] = t.to(torch.float32).numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors or .bin in {path}")


def permute_qk(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF half-split rope -> GGML interleaved rope weight permutation
    (convert.py permute): rows regrouped so pairs (i, i+d/2) become (2i, 2i+1)."""
    out_dim, in_dim = w.shape
    return (w.reshape(n_heads, 2, out_dim // n_heads // 2, in_dim)
            .swapaxes(1, 2).reshape(out_dim, in_dim))


def tokenizer_metadata(path, w):
    tj = os.path.join(path, "tokenizer.json")
    cfg_path = os.path.join(path, "tokenizer_config.json")
    tok_cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    if not os.path.exists(tj):
        print("warning: no tokenizer.json; GGUF will lack a tokenizer",
              file=sys.stderr)
        return
    tk = json.load(open(tj))
    model = tk.get("model", {})
    added = {t["content"]: t for t in tk.get("added_tokens", [])}
    if model.get("type") == "BPE":
        vocab = model["vocab"]
        tokens = [None] * len(vocab)
        for t, i in vocab.items():
            tokens[i] = t
        for t, info in added.items():
            i = info["id"]
            if i >= len(tokens):
                tokens.extend([None] * (i + 1 - len(tokens)))
            tokens[i] = t
        tokens = [t if t is not None else f"<unused{i}>"
                  for i, t in enumerate(tokens)]
        ttype = [3 if t in added and added[t].get("special") else 1
                 for t in tokens]
        merges = [" ".join(m) if isinstance(m, list) else m
                  for m in model.get("merges", [])]
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.tokens", tokens)
        w.add("tokenizer.ggml.merges", merges)
        w.add("tokenizer.ggml.token_type", np.asarray(ttype, np.int32))
    elif model.get("type") == "Unigram":
        pieces = model["vocab"]           # [ [piece, score], ... ]
        tokens = [p[0] for p in pieces]
        scores = [float(p[1]) for p in pieces]
        ttype = []
        for t in tokens:
            if t in added and added[t].get("special"):
                ttype.append(3)
            elif len(t) == 6 and t.startswith("<0x"):
                ttype.append(6)
            else:
                ttype.append(1)
        w.add("tokenizer.ggml.model", "llama")
        w.add("tokenizer.ggml.tokens", tokens)
        w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
        w.add("tokenizer.ggml.token_type", np.asarray(ttype, np.int32))
    template = tok_cfg.get("chat_template")
    if isinstance(template, str):
        w.add("tokenizer.chat_template", template)


# HF BertModel state-dict -> GGUF tensor names (llama.cpp bert mapping)
BERT_TENSOR_MAP = [
    ("embeddings.word_embeddings.weight", "token_embd.weight"),
    ("embeddings.position_embeddings.weight", "position_embd.weight"),
    ("embeddings.token_type_embeddings.weight", "token_types.weight"),
    ("embeddings.LayerNorm.weight", "token_embd_norm.weight"),
    ("embeddings.LayerNorm.bias", "token_embd_norm.bias"),
]
BERT_LAYER_MAP = [
    ("attention.self.query", "attn_q"),
    ("attention.self.key", "attn_k"),
    ("attention.self.value", "attn_v"),
    ("attention.output.dense", "attn_output"),
    ("attention.output.LayerNorm", "attn_output_norm"),
    ("intermediate.dense", "ffn_up"),
    ("output.dense", "ffn_down"),
    ("output.LayerNorm", "layer_output_norm"),
]


def convert_bert(args, cfg):
    """BERT-family embedding checkpoint (all-MiniLM class) -> GGUF.

    Reference loader arch `bert` (upstream llama.cpp build_bert); pooling
    defaults to mean (sentence-transformers MiniLM convention).
    """
    from llamafile_tpu.gguf import GGUFWriter

    sd = load_state_dict(args.hf_dir)
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}
    w = GGUFWriter(args.output)
    w.add("general.architecture", "bert")
    w.add("general.name", os.path.basename(os.path.abspath(args.hf_dir)))
    w.add("bert.block_count", cfg["num_hidden_layers"])
    w.add("bert.embedding_length", cfg["hidden_size"])
    w.add("bert.attention.head_count", cfg["num_attention_heads"])
    w.add("bert.feed_forward_length", cfg["intermediate_size"])
    w.add("bert.context_length", cfg.get("max_position_embeddings", 512))
    w.add("bert.attention.layer_norm_epsilon",
          float(cfg.get("layer_norm_eps", 1e-12)))
    w.add("bert.vocab_size", cfg["vocab_size"])
    w.add("bert.pooling_type", 1)        # mean
    # WordPiece vocab
    vj = os.path.join(args.hf_dir, "vocab.txt")
    tj = os.path.join(args.hf_dir, "tokenizer.json")
    tokens = None
    if os.path.exists(vj):
        tokens = [l.rstrip("\n") for l in open(vj, encoding="utf-8")]
    elif os.path.exists(tj):
        model = json.load(open(tj)).get("model", {})
        if model.get("type") == "WordPiece":
            vocab = model["vocab"]
            tokens = [None] * len(vocab)
            for t, i in vocab.items():
                tokens[i] = t
    if tokens:
        w.add("tokenizer.ggml.model", "bert")
        w.add("tokenizer.ggml.tokens",
              [t if t is not None else f"[unused{i}]"
               for i, t in enumerate(tokens)])
        for name, key in (("[UNK]", "unknown_token_id"),
                          ("[CLS]", "cls_token_id"),
                          ("[SEP]", "seperator_token_id"),
                          ("[PAD]", "padding_token_id")):
            if name in tokens:
                w.add(f"tokenizer.ggml.{key}", tokens.index(name))

    def emit(gname, arr):
        arr = np.asarray(arr, np.float32)
        w.add_tensor_f32(gname, arr)
        print(f"  {gname} {arr.shape}", file=sys.stderr)

    for hf, gg in BERT_TENSOR_MAP:
        emit(gg, sd[hf])
    for i in range(cfg["num_hidden_layers"]):
        for hf, gg in BERT_LAYER_MAP:
            for suf in ("weight", "bias"):
                emit(f"blk.{i}.{gg}.{suf}",
                     sd[f"encoder.layer.{i}.{hf}.{suf}"])
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_mamba(args, cfg):
    """HF MambaForCausalLM -> GGUF `mamba` arch (llama.cpp key/tensor
    conventions: ssm_a stores A_log; conv kernel stored [d_inner, d_conv])."""
    from llamafile_tpu.gguf import GGUFWriter, pack_zip, quants

    d = cfg["hidden_size"]
    di = cfg.get("intermediate_size", 2 * d)
    dtr = cfg.get("time_step_rank")
    if not isinstance(dtr, int):
        dtr = -(-d // 16)                 # HF "auto": ceil(d/16)
    n_layers = cfg["num_hidden_layers"]
    sd = load_state_dict(args.hf_dir)
    w = GGUFWriter(args.output)
    w.add("general.architecture", "mamba")
    w.add("general.name", os.path.basename(os.path.abspath(args.hf_dir)))
    w.add("mamba.block_count", n_layers)
    w.add("mamba.embedding_length", d)
    w.add("mamba.ssm.inner_size", di)
    w.add("mamba.ssm.conv_kernel", int(cfg.get("conv_kernel", 4)))
    w.add("mamba.ssm.state_size", int(cfg.get("state_size", 16)))
    w.add("mamba.ssm.time_step_rank", dtr)
    w.add("mamba.context_length", 2 ** 20)   # recurrent: no position limit
    w.add("mamba.attention.layer_norm_rms_epsilon",
          float(cfg.get("layer_norm_epsilon", 1e-5)))
    w.add("mamba.vocab_size", int(cfg["vocab_size"]))
    # mamba has no real FFN/attention, but strict readers want the keys
    w.add("mamba.feed_forward_length", 0)
    w.add("mamba.attention.head_count", 0)
    if isinstance(cfg.get("bos_token_id"), int):
        w.add("tokenizer.ggml.bos_token_id", cfg["bos_token_id"])
    if isinstance(cfg.get("eos_token_id"), int):
        w.add("tokenizer.ggml.eos_token_id", cfg["eos_token_id"])
    tokenizer_metadata(args.hf_dir, w)

    qspec = quants.TYPE_BY_NAME.get((args.quant or "").upper())

    def emit(gname, arr, quantizable=True):
        arr = np.asarray(arr, np.float32)
        if (qspec is not None and qspec.quantize is not None and quantizable
                and arr.ndim == 2 and arr.shape[-1] % qspec.block_elems == 0):
            w.add_tensor(gname, arr.shape, qspec.name,
                         qspec.quantize(arr.reshape(-1)))
        elif arr.ndim >= 2:
            w.add_tensor_f16(gname, arr)
        else:
            w.add_tensor_f32(gname, arr)
        print(f"  {gname} {arr.shape}", file=sys.stderr)

    emit("token_embd.weight", sd["backbone.embeddings.weight"], False)
    for i in range(n_layers):
        hp = f"backbone.layers.{i}.mixer."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight",
             sd[f"backbone.layers.{i}.norm.weight"], False)
        emit(gp + "ssm_in.weight", sd[hp + "in_proj.weight"])
        emit(gp + "ssm_conv1d.weight",
             np.asarray(sd[hp + "conv1d.weight"]).reshape(di, -1), False)
        emit(gp + "ssm_conv1d.bias", sd[hp + "conv1d.bias"], False)
        emit(gp + "ssm_x.weight", sd[hp + "x_proj.weight"])
        emit(gp + "ssm_dt.weight", sd[hp + "dt_proj.weight"], False)
        emit(gp + "ssm_dt.bias", sd[hp + "dt_proj.bias"], False)
        emit(gp + "ssm_a", sd[hp + "A_log"], False)
        emit(gp + "ssm_d", sd[hp + "D"], False)
        emit(gp + "ssm_out.weight", sd[hp + "out_proj.weight"])
    emit("output_norm.weight", sd["backbone.norm_f.weight"], False)
    if "lm_head.weight" in sd:
        emit("output.weight", sd["lm_head.weight"])
    w.write()
    if args.zip:
        zp = args.output + ".llamafile"
        pack_zip(zp, {os.path.basename(args.output): args.output})
        print(f"packed {zp}", file=sys.stderr)


def _ln_writer(args, garch, cfg, n_layers, d, n_heads, n_kv, eps):
    from llamafile_tpu.gguf import GGUFWriter
    w = GGUFWriter(args.output)
    w.add("general.architecture", garch)
    w.add("general.name", os.path.basename(os.path.abspath(args.hf_dir)))
    w.add(f"{garch}.block_count", n_layers)
    w.add(f"{garch}.embedding_length", d)
    w.add(f"{garch}.attention.head_count", n_heads)
    w.add(f"{garch}.attention.head_count_kv", n_kv)
    w.add(f"{garch}.feed_forward_length", cfg["intermediate_size"])
    w.add(f"{garch}.attention.layer_norm_epsilon", float(eps))
    w.add(f"{garch}.context_length",
          int(cfg.get("max_position_embeddings", 4096)))
    w.add(f"{garch}.vocab_size", int(cfg["vocab_size"]))
    w.add(f"{garch}.rope.freq_base", float(cfg.get("rope_theta", 10000.0)))
    if isinstance(cfg.get("bos_token_id"), int):
        w.add("tokenizer.ggml.bos_token_id", cfg["bos_token_id"])
    if isinstance(cfg.get("eos_token_id"), int):
        w.add("tokenizer.ggml.eos_token_id", cfg["eos_token_id"])
    tokenizer_metadata(args.hf_dir, w)
    return w


def _ln_emit(w, args):
    from llamafile_tpu.gguf import quants
    qspec = quants.TYPE_BY_NAME.get((args.quant or "").upper())

    def emit(gname, arr, quantizable=True):
        arr = np.asarray(arr, np.float32)
        if (qspec is not None and qspec.quantize is not None and quantizable
                and arr.ndim == 2 and arr.shape[-1] % qspec.block_elems == 0):
            w.add_tensor(gname, arr.shape, qspec.name,
                         qspec.quantize(arr.reshape(-1)))
        elif arr.ndim >= 2:
            w.add_tensor_f16(gname, arr)
        else:
            w.add_tensor_f32(gname, arr)
        print(f"  {gname} {arr.shape}", file=sys.stderr)
    return emit


def convert_gptneox(args, cfg):
    """HF GPTNeoXForCausalLM -> GGUF `gptneox` (pythia family): affine LN,
    fused interleaved QKV reordered to [q|k|v], parallel residual, partial
    rotary (rotary_pct)."""
    d = cfg["hidden_size"]
    n_heads = cfg["num_attention_heads"]
    n_layers = cfg["num_hidden_layers"]
    hd = d // n_heads
    sd = load_state_dict(args.hf_dir)
    w = _ln_writer(args, "gptneox", cfg, n_layers, d, n_heads, n_heads,
                   cfg.get("layer_norm_eps", 1e-5))
    w.add("gptneox.use_parallel_residual",
          bool(cfg.get("use_parallel_residual", True)))
    w.add("gptneox.rope.dimension_count",
          int(hd * float(cfg.get("rotary_pct", 0.25))))
    emit = _ln_emit(w, args)

    def reorder_qkv(t):
        # HF gpt_neox fuses qkv INTERLEAVED per head [h, (q,k,v), hd, ...];
        # the GGUF convention is grouped [q_all | k_all | v_all]
        t = np.asarray(t, np.float32)
        out_shape = t.shape
        t = t.reshape(n_heads, 3, hd, *t.shape[1:])
        return t.transpose(1, 0, 2, *range(3, t.ndim)).reshape(out_shape)

    emit("token_embd.weight", sd["gpt_neox.embed_in.weight"], False)
    for i in range(n_layers):
        hp = f"gpt_neox.layers.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "input_layernorm.weight"], False)
        emit(gp + "attn_norm.bias", sd[hp + "input_layernorm.bias"], False)
        emit(gp + "ffn_norm.weight",
             sd[hp + "post_attention_layernorm.weight"], False)
        emit(gp + "ffn_norm.bias",
             sd[hp + "post_attention_layernorm.bias"], False)
        emit(gp + "attn_qkv.weight",
             reorder_qkv(sd[hp + "attention.query_key_value.weight"]))
        emit(gp + "attn_qkv.bias",
             reorder_qkv(sd[hp + "attention.query_key_value.bias"]), False)
        emit(gp + "attn_output.weight", sd[hp + "attention.dense.weight"])
        emit(gp + "attn_output.bias", sd[hp + "attention.dense.bias"], False)
        emit(gp + "ffn_up.weight", sd[hp + "mlp.dense_h_to_4h.weight"])
        emit(gp + "ffn_up.bias", sd[hp + "mlp.dense_h_to_4h.bias"], False)
        emit(gp + "ffn_down.weight", sd[hp + "mlp.dense_4h_to_h.weight"])
        emit(gp + "ffn_down.bias", sd[hp + "mlp.dense_4h_to_h.bias"], False)
    emit("output_norm.weight", sd["gpt_neox.final_layer_norm.weight"], False)
    emit("output_norm.bias", sd["gpt_neox.final_layer_norm.bias"], False)
    emit("output.weight", sd.get("embed_out.weight",
                                 sd["gpt_neox.embed_in.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_gpt2(args, cfg):
    """HF GPT2LMHeadModel -> GGUF `gpt2`: learned position embeddings (wpe),
    affine LN, fused [q|k|v] Conv1D projections (stored transposed), tanh
    gelu FFN, tied lm head. Reference: llama.cpp build_gpt2."""
    d = cfg["n_embd"]
    n_heads = cfg["n_head"]
    n_layers = cfg["n_layer"]
    cfg2 = dict(cfg)
    cfg2.setdefault("intermediate_size", cfg.get("n_inner") or 4 * d)
    cfg2.setdefault("max_position_embeddings", cfg.get("n_positions", 1024))
    sd = load_state_dict(args.hf_dir)
    w = _ln_writer(args, "gpt2", cfg2, n_layers, d, n_heads, n_heads,
                   cfg.get("layer_norm_epsilon", 1e-5))
    emit = _ln_emit(w, args)
    T = lambda t: np.asarray(t, np.float32).T     # Conv1D stores [in, out]
    emit("token_embd.weight", sd["transformer.wte.weight"], False)
    emit("position_embd.weight", sd["transformer.wpe.weight"], False)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "ln_1.weight"], False)
        emit(gp + "attn_norm.bias", sd[hp + "ln_1.bias"], False)
        emit(gp + "attn_qkv.weight", T(sd[hp + "attn.c_attn.weight"]))
        emit(gp + "attn_qkv.bias", sd[hp + "attn.c_attn.bias"], False)
        emit(gp + "attn_output.weight", T(sd[hp + "attn.c_proj.weight"]))
        emit(gp + "attn_output.bias", sd[hp + "attn.c_proj.bias"], False)
        emit(gp + "ffn_norm.weight", sd[hp + "ln_2.weight"], False)
        emit(gp + "ffn_norm.bias", sd[hp + "ln_2.bias"], False)
        emit(gp + "ffn_up.weight", T(sd[hp + "mlp.c_fc.weight"]))
        emit(gp + "ffn_up.bias", sd[hp + "mlp.c_fc.bias"], False)
        emit(gp + "ffn_down.weight", T(sd[hp + "mlp.c_proj.weight"]))
        emit(gp + "ffn_down.bias", sd[hp + "mlp.c_proj.bias"], False)
    emit("output_norm.weight", sd["transformer.ln_f.weight"], False)
    emit("output_norm.bias", sd["transformer.ln_f.bias"], False)
    emit("output.weight", sd.get("lm_head.weight",
                                 sd["transformer.wte.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_mpt(args, cfg):
    """HF MptForCausalLM -> GGUF `mpt`: ALiBi attention (no rope), biasless
    LN, fused [q|k|v], gateless gelu FFN. Reference: llama.cpp build_mpt."""
    d = cfg["d_model"]
    n_heads = cfg["n_heads"]
    n_layers = cfg["n_layers"]
    attn = cfg.get("attn_config") or {}
    n_kv = int(attn.get("kv_n_heads") or n_heads)
    sd = load_state_dict(args.hf_dir)
    cfg2 = dict(cfg)
    # derive d_ff from the checkpoint (config.json may carry a generic
    # intermediate_size that disagrees with expansion_ratio * d_model)
    cfg2["intermediate_size"] = int(
        np.asarray(sd["transformer.blocks.0.ffn.up_proj.weight"]).shape[0])
    cfg2.setdefault("max_position_embeddings", cfg.get("max_seq_len", 2048))
    cfg2.setdefault("vocab_size", cfg["vocab_size"])
    w = _ln_writer(args, "mpt", cfg2, n_layers, d, n_heads, n_kv,
                   cfg.get("layer_norm_epsilon", 1e-5))
    if attn.get("clip_qkv"):
        w.add("mpt.attention.clamp_kqv", float(attn["clip_qkv"]))
    w.add("mpt.attention.alibi_bias_max",
          float(attn.get("alibi_bias_max", 8.0)))
    emit = _ln_emit(w, args)
    emit("token_embd.weight", sd["transformer.wte.weight"], False)

    def opt(gname, key):
        if key in sd:
            emit(gname, sd[key], False)

    for i in range(n_layers):
        hp = f"transformer.blocks.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "norm_1.weight"], False)
        opt(gp + "attn_norm.bias", hp + "norm_1.bias")
        emit(gp + "attn_qkv.weight", sd[hp + "attn.Wqkv.weight"])
        opt(gp + "attn_qkv.bias", hp + "attn.Wqkv.bias")
        emit(gp + "attn_output.weight", sd[hp + "attn.out_proj.weight"])
        opt(gp + "attn_output.bias", hp + "attn.out_proj.bias")
        emit(gp + "ffn_norm.weight", sd[hp + "norm_2.weight"], False)
        opt(gp + "ffn_norm.bias", hp + "norm_2.bias")
        emit(gp + "ffn_up.weight", sd[hp + "ffn.up_proj.weight"])
        opt(gp + "ffn_up.bias", hp + "ffn.up_proj.bias")
        emit(gp + "ffn_down.weight", sd[hp + "ffn.down_proj.weight"])
        opt(gp + "ffn_down.bias", hp + "ffn.down_proj.bias")
    emit("output_norm.weight", sd["transformer.norm_f.weight"], False)
    opt("output_norm.bias", "transformer.norm_f.bias")
    emit("output.weight", sd.get("lm_head.weight",
                                 sd["transformer.wte.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_dbrx(args, cfg):
    """HF DbrxForCausalLM -> GGUF `dbrx`: biasless LN, fused clamped QKV,
    16-expert MoE with flat w1/v1/w2 expert tensors (w2 stored transposed
    per expert). Reference: llama.cpp build_dbrx."""
    d = cfg["d_model"]
    n_heads = cfg["n_heads"]
    n_layers = cfg["n_layers"]
    attn = cfg.get("attn_config") or {}
    ffn = cfg.get("ffn_config") or {}
    n_kv = int(attn.get("kv_n_heads") or n_heads)
    n_exp = int(ffn.get("moe_num_experts", 16))
    d_ff = int(ffn.get("ffn_hidden_size", 4 * d))
    cfg2 = dict(cfg)
    cfg2.setdefault("intermediate_size", d_ff)
    cfg2.setdefault("max_position_embeddings", cfg.get("max_seq_len", 4096))
    cfg2.setdefault("rope_theta", attn.get("rope_theta", 10000.0))
    sd = load_state_dict(args.hf_dir)
    w = _ln_writer(args, "dbrx", cfg2, n_layers, d, n_heads, n_kv,
                   1e-5)
    if attn.get("clip_qkv"):
        w.add("dbrx.attention.clamp_kqv", float(attn["clip_qkv"]))
    w.add("dbrx.expert_count", n_exp)
    w.add("dbrx.expert_used_count", int(ffn.get("moe_top_k", 4)))
    emit = _ln_emit(w, args)
    emit("token_embd.weight", sd["transformer.wte.weight"], False)
    for i in range(n_layers):
        hp = f"transformer.blocks.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight",
             sd[hp + "norm_attn_norm.norm_1.weight"], False)
        emit(gp + "attn_qkv.weight",
             sd[hp + "norm_attn_norm.attn.Wqkv.weight"])
        emit(gp + "attn_output.weight",
             sd[hp + "norm_attn_norm.attn.out_proj.weight"])
        emit(gp + "ffn_norm.weight",
             sd[hp + "norm_attn_norm.norm_2.weight"], False)
        emit(gp + "ffn_gate_inp.weight", sd[hp + "ffn.router.layer.weight"])
        w1 = np.asarray(sd[hp + "ffn.experts.mlp.w1"],
                        np.float32).reshape(n_exp, d_ff, d)
        v1 = np.asarray(sd[hp + "ffn.experts.mlp.v1"],
                        np.float32).reshape(n_exp, d_ff, d)
        w2 = np.asarray(sd[hp + "ffn.experts.mlp.w2"],
                        np.float32).reshape(n_exp, d_ff, d)
        for e in range(n_exp):
            emit(gp + f"ffn_gate.{e}.weight", w1[e])
            emit(gp + f"ffn_up.{e}.weight", v1[e])
            emit(gp + f"ffn_down.{e}.weight", w2[e].T)  # stored transposed
    emit("output_norm.weight", sd["transformer.norm_f.weight"], False)
    emit("output.weight", sd["lm_head.weight"])
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_olmoe(args, cfg):
    """HF OlmoeForCausalLM -> GGUF `olmoe`: RMSNorm + FULL-WIDTH q/k norms
    (pre-split, unlike qwen3's per-head), 64-expert MoE with raw (un-
    renormalized) top-k router weights. Reference: llama.cpp build_olmoe."""
    d = cfg["hidden_size"]
    n_heads = cfg["num_attention_heads"]
    n_layers = cfg["num_hidden_layers"]
    n_kv = cfg.get("num_key_value_heads", n_heads)
    n_exp = int(cfg["num_experts"])
    sd = load_state_dict(args.hf_dir)
    from llamafile_tpu.gguf import GGUFWriter
    w = _ln_writer(args, "olmoe", cfg, n_layers, d, n_heads, n_kv,
                   cfg.get("rms_norm_eps", 1e-5))
    w.add("olmoe.attention.layer_norm_rms_epsilon",
          float(cfg.get("rms_norm_eps", 1e-5)))
    w.add("olmoe.expert_count", n_exp)
    w.add("olmoe.expert_used_count", int(cfg["num_experts_per_tok"]))
    emit = _ln_emit(w, args)
    emit("token_embd.weight", sd["model.embed_tokens.weight"], False)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "input_layernorm.weight"],
             False)
        emit(gp + "attn_q.weight", sd[hp + "self_attn.q_proj.weight"])
        emit(gp + "attn_k.weight", sd[hp + "self_attn.k_proj.weight"])
        emit(gp + "attn_v.weight", sd[hp + "self_attn.v_proj.weight"])
        emit(gp + "attn_q_norm.weight", sd[hp + "self_attn.q_norm.weight"],
             False)
        emit(gp + "attn_k_norm.weight", sd[hp + "self_attn.k_norm.weight"],
             False)
        emit(gp + "attn_output.weight", sd[hp + "self_attn.o_proj.weight"])
        emit(gp + "ffn_norm.weight",
             sd[hp + "post_attention_layernorm.weight"], False)
        emit(gp + "ffn_gate_inp.weight", sd[hp + "mlp.gate.weight"])
        for e in range(n_exp):
            ep = f"{hp}mlp.experts.{e}."
            emit(gp + f"ffn_gate.{e}.weight", sd[ep + "gate_proj.weight"])
            emit(gp + f"ffn_up.{e}.weight", sd[ep + "up_proj.weight"])
            emit(gp + f"ffn_down.{e}.weight", sd[ep + "down_proj.weight"])
    emit("output_norm.weight", sd["model.norm.weight"], False)
    emit("output.weight", sd.get("lm_head.weight",
                                 sd["model.embed_tokens.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_deepseek2(args, cfg):
    """HF DeepseekV2ForCausalLM -> GGUF `deepseek2` (MLA + fine-grained MoE).

    The HF rope treats the pe slice as INTERLEAVED pairs (modeling_deepseek
    views (d/2, 2) and transposes before rotate_half); our runtime applies
    plain NEOX rope, so the pe weight ROWS are de-interleaved here —
    numerically identical, converter-side (same trick as llama's permute_qk).
    """
    d = cfg["hidden_size"]
    n_heads = cfg["num_attention_heads"]
    n_layers = cfg["num_hidden_layers"]
    nope = cfg["qk_nope_head_dim"]
    rd = cfg["qk_rope_head_dim"]
    vd = cfg["v_head_dim"]
    r_kv = cfg["kv_lora_rank"]
    r_q = cfg.get("q_lora_rank") or 0
    sd = load_state_dict(args.hf_dir)
    from llamafile_tpu.gguf import GGUFWriter
    w = GGUFWriter(args.output)
    garch = "deepseek2"
    w.add("general.architecture", garch)
    w.add("general.name", os.path.basename(os.path.abspath(args.hf_dir)))
    w.add(f"{garch}.block_count", n_layers)
    w.add(f"{garch}.embedding_length", d)
    w.add(f"{garch}.attention.head_count", n_heads)
    w.add(f"{garch}.attention.head_count_kv", n_heads)
    w.add(f"{garch}.feed_forward_length", cfg["intermediate_size"])
    w.add(f"{garch}.attention.layer_norm_rms_epsilon",
          float(cfg.get("rms_norm_eps", 1e-6)))
    w.add(f"{garch}.context_length",
          int(cfg.get("max_position_embeddings", 4096)))
    w.add(f"{garch}.vocab_size", int(cfg["vocab_size"]))
    w.add(f"{garch}.rope.freq_base", float(cfg.get("rope_theta", 10000.0)))
    w.add(f"{garch}.attention.key_length", nope + rd)
    w.add(f"{garch}.attention.value_length", vd)
    w.add(f"{garch}.rope.dimension_count", rd)
    w.add(f"{garch}.attention.kv_lora_rank", r_kv)
    if r_q:
        w.add(f"{garch}.attention.q_lora_rank", r_q)
    if cfg.get("n_routed_experts"):
        w.add(f"{garch}.expert_count", cfg["n_routed_experts"])
        w.add(f"{garch}.expert_used_count", cfg["num_experts_per_tok"])
        w.add(f"{garch}.expert_shared_count",
              int(cfg.get("n_shared_experts", 0) or 0))
        w.add(f"{garch}.expert_feed_forward_length",
              cfg["moe_intermediate_size"])
        w.add(f"{garch}.expert_weights_scale",
              float(cfg.get("routed_scaling_factor", 1.0)))
        w.add(f"{garch}.expert_weights_norm",
              bool(cfg.get("norm_topk_prob", False)))
        w.add(f"{garch}.leading_dense_block_count",
              int(cfg.get("first_k_dense_replace", 0)))
    if isinstance(cfg.get("bos_token_id"), int):
        w.add("tokenizer.ggml.bos_token_id", cfg["bos_token_id"])
    if isinstance(cfg.get("eos_token_id"), int):
        w.add("tokenizer.ggml.eos_token_id", cfg["eos_token_id"])
    tokenizer_metadata(args.hf_dir, w)
    emit = _ln_emit(w, args)

    def deinterleave_pe(t, n_blocks, block, off):
        """Reorder pe rows from interleaved pairs to half-split, per block of
        `block` rows starting at `off` within each of n_blocks groups."""
        t = np.asarray(t, np.float32).copy()
        g = t.reshape(n_blocks, block + off, *t.shape[1:])
        pe = g[:, off:]
        idx = np.concatenate([np.arange(0, rd, 2), np.arange(1, rd, 2)])
        g[:, off:] = pe[:, idx]
        return g.reshape(t.shape)

    emit("token_embd.weight", sd["model.embed_tokens.weight"], False)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "input_layernorm.weight"],
             False)
        emit(gp + "ffn_norm.weight",
             sd[hp + "post_attention_layernorm.weight"], False)
        if r_q:
            emit(gp + "attn_q_a.weight", sd[hp + "self_attn.q_a_proj.weight"])
            emit(gp + "attn_q_a_norm.weight",
                 sd[hp + "self_attn.q_a_layernorm.weight"], False)
            emit(gp + "attn_q_b.weight",
                 deinterleave_pe(sd[hp + "self_attn.q_b_proj.weight"],
                                 n_heads, rd, nope))
        else:
            emit(gp + "attn_q.weight",
                 deinterleave_pe(sd[hp + "self_attn.q_proj.weight"],
                                 n_heads, rd, nope))
        emit(gp + "attn_kv_a_mqa.weight",
             deinterleave_pe(sd[hp + "self_attn.kv_a_proj_with_mqa.weight"],
                             1, rd, r_kv))
        emit(gp + "attn_kv_a_norm.weight",
             sd[hp + "self_attn.kv_a_layernorm.weight"], False)
        emit(gp + "attn_kv_b.weight", sd[hp + "self_attn.kv_b_proj.weight"])
        emit(gp + "attn_output.weight", sd[hp + "self_attn.o_proj.weight"])
        if hp + "mlp.gate_proj.weight" in sd:      # leading dense block
            emit(gp + "ffn_gate.weight", sd[hp + "mlp.gate_proj.weight"])
            emit(gp + "ffn_up.weight", sd[hp + "mlp.up_proj.weight"])
            emit(gp + "ffn_down.weight", sd[hp + "mlp.down_proj.weight"])
        else:
            emit(gp + "ffn_gate_inp.weight", sd[hp + "mlp.gate.weight"])
            for e in range(cfg["n_routed_experts"]):
                ep = hp + f"mlp.experts.{e}."
                emit(gp + f"ffn_gate.{e}.weight", sd[ep + "gate_proj.weight"])
                emit(gp + f"ffn_up.{e}.weight", sd[ep + "up_proj.weight"])
                emit(gp + f"ffn_down.{e}.weight", sd[ep + "down_proj.weight"])
            sp = hp + "mlp.shared_experts."
            emit(gp + "ffn_gate_shexp.weight", sd[sp + "gate_proj.weight"])
            emit(gp + "ffn_up_shexp.weight", sd[sp + "up_proj.weight"])
            emit(gp + "ffn_down_shexp.weight", sd[sp + "down_proj.weight"])
    emit("output_norm.weight", sd["model.norm.weight"], False)
    emit("output.weight", sd.get("lm_head.weight",
                                 sd["model.embed_tokens.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_falcon(args, cfg):
    """HF FalconForCausalLM -> GGUF `falcon`: affine LN, parallel residual,
    gateless GELU FFN, full neox rope. Old (7b/multi_query) fused QKV is
    already grouped [q...|k|v]; the new decoder architecture interleaves
    [ratio q | k | v] per kv group and is reordered here."""
    if cfg.get("alibi"):
        raise SystemExit("falcon alibi variants are not supported")
    d = cfg["hidden_size"]
    n_heads = cfg["num_attention_heads"]
    n_layers = cfg["num_hidden_layers"]
    hd = d // n_heads
    new_arch = bool(cfg.get("new_decoder_architecture", False))
    if new_arch:
        n_kv = int(cfg.get("num_kv_heads", n_heads))
    else:
        n_kv = 1 if cfg.get("multi_query", True) else n_heads
    sd = load_state_dict(args.hf_dir)
    lcfg = dict(cfg)
    lcfg.setdefault("intermediate_size", 4 * d)
    w = _ln_writer(args, "falcon", lcfg, n_layers, d, n_heads, n_kv,
                   cfg.get("layer_norm_epsilon", 1e-5))
    emit = _ln_emit(w, args)

    def reorder_qkv(t):
        if not new_arch:
            return t                      # already [q heads... | k | v]
        t = np.asarray(t, np.float32)
        ratio = n_heads // n_kv
        g = t.reshape(n_kv, ratio + 2, hd, *t.shape[1:])
        q = g[:, :ratio].reshape(n_heads * hd, *t.shape[1:])
        k = g[:, ratio].reshape(n_kv * hd, *t.shape[1:])
        v = g[:, ratio + 1].reshape(n_kv * hd, *t.shape[1:])
        return np.concatenate([q, k, v], axis=0)

    emit("token_embd.weight", sd["transformer.word_embeddings.weight"], False)
    for i in range(n_layers):
        hp = f"transformer.h.{i}."
        gp = f"blk.{i}."
        ln1 = "ln_attn" if hp + "ln_attn.weight" in sd else "input_layernorm"
        emit(gp + "attn_norm.weight", sd[hp + ln1 + ".weight"], False)
        emit(gp + "attn_norm.bias", sd[hp + ln1 + ".bias"], False)
        if hp + "ln_mlp.weight" in sd:   # 40b-class second norm
            emit(gp + "ffn_norm.weight", sd[hp + "ln_mlp.weight"], False)
            emit(gp + "ffn_norm.bias", sd[hp + "ln_mlp.bias"], False)
        emit(gp + "attn_qkv.weight",
             reorder_qkv(sd[hp + "self_attention.query_key_value.weight"]))
        emit(gp + "attn_output.weight", sd[hp + "self_attention.dense.weight"])
        emit(gp + "ffn_up.weight", sd[hp + "mlp.dense_h_to_4h.weight"])
        emit(gp + "ffn_down.weight", sd[hp + "mlp.dense_4h_to_h.weight"])
    emit("output_norm.weight", sd["transformer.ln_f.weight"], False)
    emit("output_norm.bias", sd["transformer.ln_f.bias"], False)
    emit("output.weight", sd.get("lm_head.weight",
                                 sd["transformer.word_embeddings.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_phi2(args, cfg):
    """HF PhiForCausalLM (phi-1/1.5/2) -> GGUF `phi2`: affine LN, single
    shared norm feeding parallel attention+gateless-GELU branches, partial
    rotary, biases everywhere incl. the lm head."""
    d = cfg["hidden_size"]
    n_heads = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads") or n_heads
    n_layers = cfg["num_hidden_layers"]
    hd = d // n_heads
    sd = load_state_dict(args.hf_dir)
    w = _ln_writer(args, "phi2", cfg, n_layers, d, n_heads, n_kv,
                   cfg.get("layer_norm_eps", 1e-5))
    w.add("phi2.rope.dimension_count",
          int(hd * float(cfg.get("partial_rotary_factor", 0.5))))
    emit = _ln_emit(w, args)
    emit("token_embd.weight", sd["model.embed_tokens.weight"], False)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "input_layernorm.weight"], False)
        emit(gp + "attn_norm.bias", sd[hp + "input_layernorm.bias"], False)
        for role, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            emit(gp + f"attn_{role}.weight", sd[hp + f"self_attn.{hf}.weight"])
            emit(gp + f"attn_{role}.bias", sd[hp + f"self_attn.{hf}.bias"],
                 False)
        emit(gp + "attn_output.weight", sd[hp + "self_attn.dense.weight"])
        emit(gp + "attn_output.bias", sd[hp + "self_attn.dense.bias"], False)
        emit(gp + "ffn_up.weight", sd[hp + "mlp.fc1.weight"])
        emit(gp + "ffn_up.bias", sd[hp + "mlp.fc1.bias"], False)
        emit(gp + "ffn_down.weight", sd[hp + "mlp.fc2.weight"])
        emit(gp + "ffn_down.bias", sd[hp + "mlp.fc2.bias"], False)
    emit("output_norm.weight", sd["model.final_layernorm.weight"], False)
    emit("output_norm.bias", sd["model.final_layernorm.bias"], False)
    emit("output.weight", sd["lm_head.weight"])
    if "lm_head.bias" in sd:
        emit("output.bias", sd["lm_head.bias"], False)
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def convert_starcoder2(args, cfg):
    """HF Starcoder2ForCausalLM -> GGUF `starcoder2`: affine LN + biases,
    gateless gelu_pytorch_tanh FFN, sequential residual, full neox rope."""
    d = cfg["hidden_size"]
    n_heads = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_heads)
    n_layers = cfg["num_hidden_layers"]
    sd = load_state_dict(args.hf_dir)
    w = _ln_writer(args, "starcoder2", cfg, n_layers, d, n_heads, n_kv,
                   cfg.get("norm_epsilon", 1e-5))
    emit = _ln_emit(w, args)
    emit("token_embd.weight", sd["model.embed_tokens.weight"], False)
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        emit(gp + "attn_norm.weight", sd[hp + "input_layernorm.weight"], False)
        emit(gp + "attn_norm.bias", sd[hp + "input_layernorm.bias"], False)
        emit(gp + "ffn_norm.weight",
             sd[hp + "post_attention_layernorm.weight"], False)
        emit(gp + "ffn_norm.bias",
             sd[hp + "post_attention_layernorm.bias"], False)
        for role, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            emit(gp + f"attn_{role}.weight", sd[hp + f"self_attn.{hf}.weight"])
            emit(gp + f"attn_{role}.bias", sd[hp + f"self_attn.{hf}.bias"],
                 False)
        emit(gp + "attn_output.weight", sd[hp + "self_attn.o_proj.weight"])
        emit(gp + "attn_output.bias", sd[hp + "self_attn.o_proj.bias"], False)
        emit(gp + "ffn_up.weight", sd[hp + "mlp.c_fc.weight"])
        emit(gp + "ffn_up.bias", sd[hp + "mlp.c_fc.bias"], False)
        emit(gp + "ffn_down.weight", sd[hp + "mlp.c_proj.weight"])
        emit(gp + "ffn_down.bias", sd[hp + "mlp.c_proj.bias"], False)
    emit("output_norm.weight", sd["model.norm.weight"], False)
    emit("output_norm.bias", sd["model.norm.bias"], False)
    emit("output.weight", sd.get("lm_head.weight",
                                 sd["model.embed_tokens.weight"]))
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hf_dir")
    ap.add_argument("output")
    ap.add_argument("--quant", default=None, help="also quantize (e.g. Q4_K)")
    ap.add_argument("--zip", action="store_true",
                    help="pack into a zipaligned .llamafile-style archive")
    args = ap.parse_args()

    from llamafile_tpu.gguf import GGUFWriter, pack_zip, quants

    cfg = json.load(open(os.path.join(args.hf_dir, "config.json")))
    arch = cfg.get("model_type", "llama")
    if arch == "bert":
        return convert_bert(args, cfg)
    if arch == "mamba":
        return convert_mamba(args, cfg)
    if arch == "gpt_neox":
        return convert_gptneox(args, cfg)
    if arch in ("deepseek_v2", "deepseek_v3"):
        return convert_deepseek2(args, cfg)
    if arch == "starcoder2":
        return convert_starcoder2(args, cfg)
    if arch == "falcon":
        return convert_falcon(args, cfg)
    if arch == "phi":
        return convert_phi2(args, cfg)
    if arch == "gpt2":
        return convert_gpt2(args, cfg)
    if arch == "mpt":
        return convert_mpt(args, cfg)
    if arch == "dbrx":
        return convert_dbrx(args, cfg)
    if arch == "olmoe":
        return convert_olmoe(args, cfg)
    known = ("llama", "mistral", "mixtral", "qwen2", "qwen3", "qwen2_moe",
             "qwen3_moe", "gemma2", "gemma3", "gemma3_text", "granite",
             "cohere", "glm4", "minicpm", "baichuan")
    if arch not in known:
        print(f"warning: model_type {arch}; treating as llama", file=sys.stderr)
    n_layers = cfg["num_hidden_layers"]
    n_heads = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_heads)
    d = cfg["hidden_size"]

    sd = load_state_dict(args.hf_dir)
    if arch == "baichuan":
        # baichuan stores one fused W_pack [3d, d]; split into q/k/v so the
        # generic loop (incl. the NORM-rope permute) applies (llama.cpp
        # convert_hf_to_gguf BaichuanModel W_pack handling). Note: Baichuan2
        # checkpoints must have their NormHead pre-normalized (the official
        # repo's export step), matching upstream converter expectations.
        for i in range(n_layers):
            hp = f"model.layers.{i}.self_attn."
            wp = sd.pop(hp + "W_pack.weight")
            sd[hp + "q_proj.weight"] = wp[:d]
            sd[hp + "k_proj.weight"] = wp[d:2 * d]
            sd[hp + "v_proj.weight"] = wp[2 * d:]
    w = GGUFWriter(args.output)
    # archs with their own GGUF architecture key keep it: qwen2 (q/k/v
    # biases + NEOX rope), qwen3 (q/k norms), gemma2/3 (SWA, sandwich norms,
    # softcaps), granite (scale multipliers) — writing them as 'llama' would
    # silently drop their defining features (reference: llama.cpp
    # convert-hf-to-gguf per-arch Model classes).
    garch = {"qwen2": "qwen2", "qwen3": "qwen3", "qwen2_moe": "qwen2moe",
             "qwen3_moe": "qwen3moe", "gemma2": "gemma2",
             "gemma3": "gemma3", "gemma3_text": "gemma3",
             "granite": "granite", "cohere": "command-r",
             "glm4": "glm4", "minicpm": "minicpm",
             "baichuan": "baichuan"}.get(arch, "llama")
    gemma = garch in ("gemma2", "gemma3")
    w.add("general.architecture", garch)
    w.add("general.name", os.path.basename(os.path.abspath(args.hf_dir)))
    w.add(f"{garch}.block_count", n_layers)
    w.add(f"{garch}.embedding_length", d)
    w.add(f"{garch}.attention.head_count", n_heads)
    w.add(f"{garch}.attention.head_count_kv", n_kv)
    w.add(f"{garch}.feed_forward_length", cfg["intermediate_size"])
    w.add(f"{garch}.rope.freq_base", float(cfg.get("rope_theta", 10000.0)))
    w.add(f"{garch}.attention.layer_norm_rms_epsilon",
          float(cfg.get("rms_norm_eps", 1e-5)))
    w.add(f"{garch}.context_length",
          int(cfg.get("max_position_embeddings", 4096)))
    w.add(f"{garch}.vocab_size", int(cfg["vocab_size"]))
    # newer transformers serializes explicit `head_dim: null` — treat as absent
    head_dim = int(cfg.get("head_dim") or d // n_heads)
    if garch == "glm4":
        w.add("glm4.rope.dimension_count",
              int(head_dim * float(cfg.get("partial_rotary_factor", 0.5))))
    if head_dim != d // n_heads or garch in ("qwen3", "gemma2", "gemma3",
                                             "glm4"):
        w.add(f"{garch}.attention.key_length", head_dim)
        w.add(f"{garch}.attention.value_length", head_dim)
    if gemma:
        w.add(f"{garch}.attention.sliding_window",
              int(cfg.get("sliding_window", 4096)))
        if garch == "gemma2":
            w.add(f"{garch}.attn_logit_softcapping",
                  float(cfg.get("attn_logit_softcapping", 50.0)))
            w.add(f"{garch}.final_logit_softcapping",
                  float(cfg.get("final_logit_softcapping", 30.0)))
    if garch == "command-r":
        # cohere: logits are MULTIPLIED by logit_scale; LayerNorm (no bias)
        w.add("command-r.logit_scale", float(cfg.get("logit_scale", 1.0)))
        w.add("command-r.attention.layer_norm_epsilon",
              float(cfg.get("layer_norm_eps", 1e-5)))
    if garch == "minicpm":
        # minicpm scale knobs (llama.cpp MiniCPMModel): embeddings * scale_emb,
        # residual * scale_depth/sqrt(L), logits / (hidden/dim_model_base)
        w.add("minicpm.embedding_scale", float(cfg.get("scale_emb", 1.0)))
        w.add("minicpm.residual_scale",
              float(cfg.get("scale_depth", 1.0)) / float(n_layers) ** 0.5)
        w.add("minicpm.logit_scale",
              float(d) / float(cfg.get("dim_model_base", d)))
    if garch == "granite":
        # granite scale multipliers (llama.cpp GraniteModel metadata)
        w.add("granite.embedding_scale",
              float(cfg.get("embedding_multiplier", 1.0)))
        w.add("granite.residual_scale",
              float(cfg.get("residual_multiplier", 1.0)))
        w.add("granite.logit_scale", float(cfg.get("logits_scaling", 1.0)))
        w.add("granite.attention.scale",
              float(cfg.get("attention_multiplier", 0.0)))
    rs = cfg.get("rope_scaling") or {}
    if isinstance(rs, dict) and rs.get("factor") and \
            rs.get("rope_type", rs.get("type", "linear")) == "linear":
        w.add(f"{garch}.rope.scaling.type", "linear")
        w.add(f"{garch}.rope.scaling.factor", float(rs["factor"]))
    if "num_local_experts" in cfg:    # mixtral: once, NOT per layer
        w.add(f"{garch}.expert_count", cfg["num_local_experts"])
        w.add(f"{garch}.expert_used_count", cfg["num_experts_per_tok"])
    elif "num_experts" in cfg:        # qwen2moe/qwen3moe
        w.add(f"{garch}.expert_count", cfg["num_experts"])
        w.add(f"{garch}.expert_used_count", cfg["num_experts_per_tok"])
        if "moe_intermediate_size" in cfg:
            w.add(f"{garch}.expert_feed_forward_length",
                  cfg["moe_intermediate_size"])
    bos = cfg.get("bos_token_id")
    eos = cfg.get("eos_token_id")
    if isinstance(bos, int):
        w.add("tokenizer.ggml.bos_token_id", bos)
    if isinstance(eos, int):
        w.add("tokenizer.ggml.eos_token_id", eos)
    tokenizer_metadata(args.hf_dir, w)

    qspec = quants.TYPE_BY_NAME.get((args.quant or "").upper())

    def emit(gname, arr, quantizable=True):
        arr = np.asarray(arr)
        if arr.dtype != np.float32:
            arr = arr.astype(np.float32)
        if (qspec is not None and qspec.quantize is not None and quantizable
                and arr.ndim == 2 and arr.shape[-1] % qspec.block_elems == 0):
            w.add_tensor(gname, arr.shape, qspec.name,
                         qspec.quantize(arr.reshape(-1)))
        elif arr.ndim >= 2:
            w.add_tensor_f16(gname, arr)
        else:
            w.add_tensor_f32(gname, arr)
        print(f"  {gname} {arr.shape}", file=sys.stderr)

    # NORM-mode (interleaved) rope needs the classic q/k row permutation;
    # NEOX-mode archs (qwen2/3, gemma*) use the HF half-split layout as-is.
    neox = garch in ("qwen2", "qwen3", "qwen2moe", "qwen3moe", "gemma2",
                     "gemma3", "command-r", "glm4", "minicpm")
    permute = (lambda t, h: t) if neox else permute_qk

    def norm(gname, arr):
        # gemma checkpoints store RMSNorm weights as (w - 1); the GGUF bakes
        # the +1 (llama.cpp convert_hf_to_gguf GemmaModel.modify_tensors) so
        # runtimes use them as-is
        emit(gname, np.asarray(arr, np.float32) + 1.0 if gemma else arr,
             False)

    emit("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(n_layers):
        hp = f"model.layers.{i}."
        gp = f"blk.{i}."
        norm(gp + "attn_norm.weight", sd[hp + "input_layernorm.weight"])
        emit(gp + "attn_q.weight",
             permute(sd[hp + "self_attn.q_proj.weight"], n_heads))
        emit(gp + "attn_k.weight",
             permute(sd[hp + "self_attn.k_proj.weight"], n_kv))
        emit(gp + "attn_v.weight", sd[hp + "self_attn.v_proj.weight"])
        if hp + "self_attn.q_norm.weight" in sd:   # gemma3/qwen3 q/k norms
            norm(gp + "attn_q_norm.weight", sd[hp + "self_attn.q_norm.weight"])
            norm(gp + "attn_k_norm.weight", sd[hp + "self_attn.k_norm.weight"])
        if hp + "self_attn.q_proj.bias" in sd:     # qwen2's defining feature
            emit(gp + "attn_q.bias",
                 permute(sd[hp + "self_attn.q_proj.bias"].reshape(-1, 1),
                         n_heads).reshape(-1))
            emit(gp + "attn_k.bias",
                 permute(sd[hp + "self_attn.k_proj.bias"].reshape(-1, 1),
                         n_kv).reshape(-1))
            emit(gp + "attn_v.bias", sd[hp + "self_attn.v_proj.bias"])
        emit(gp + "attn_output.weight", sd[hp + "self_attn.o_proj.weight"])
        if gemma:
            # gemma2/3 sandwich norms: HF post_attention_layernorm is the
            # attn POST-norm; pre_feedforward_layernorm is the FFN pre-norm
            norm(gp + "post_attention_norm.weight",
                 sd[hp + "post_attention_layernorm.weight"])
            norm(gp + "ffn_norm.weight",
                 sd[hp + "pre_feedforward_layernorm.weight"])
            norm(gp + "post_ffw_norm.weight",
                 sd[hp + "post_feedforward_layernorm.weight"])
        elif garch == "command-r":
            pass    # single shared input norm (parallel residual)
        elif garch == "glm4":
            # HF glm4: post_attention_layernorm is the FFN PRE-norm;
            # post_self_attn/post_mlp are gemma2-style sandwich norms
            norm(gp + "ffn_norm.weight",
                 sd[hp + "post_attention_layernorm.weight"])
            norm(gp + "post_attention_norm.weight",
                 sd[hp + "post_self_attn_layernorm.weight"])
            norm(gp + "post_ffw_norm.weight",
                 sd[hp + "post_mlp_layernorm.weight"])
        else:
            norm(gp + "ffn_norm.weight",
                 sd[hp + "post_attention_layernorm.weight"])
        if hp + "mlp.gate_up_proj.weight" in sd:
            # glm4 fused gate|up wire tensor (phi3-style: gate rows first)
            emit(gp + "ffn_up.weight", sd[hp + "mlp.gate_up_proj.weight"])
            emit(gp + "ffn_down.weight", sd[hp + "mlp.down_proj.weight"])
        elif hp + "mlp.gate_proj.weight" in sd:
            emit(gp + "ffn_gate.weight", sd[hp + "mlp.gate_proj.weight"])
            emit(gp + "ffn_up.weight", sd[hp + "mlp.up_proj.weight"])
            emit(gp + "ffn_down.weight", sd[hp + "mlp.down_proj.weight"])
        elif hp + "mlp.gate.weight" in sd:
            # qwen2moe/qwen3moe experts (+ qwen2moe's shared expert)
            emit(gp + "ffn_gate_inp.weight", sd[hp + "mlp.gate.weight"])
            for e in range(cfg["num_experts"]):
                ep = hp + f"mlp.experts.{e}."
                emit(gp + f"ffn_gate.{e}.weight", sd[ep + "gate_proj.weight"])
                emit(gp + f"ffn_up.{e}.weight", sd[ep + "up_proj.weight"])
                emit(gp + f"ffn_down.{e}.weight", sd[ep + "down_proj.weight"])
            if hp + "mlp.shared_expert.gate_proj.weight" in sd:
                sp = hp + "mlp.shared_expert."
                emit(gp + "ffn_gate_shexp.weight", sd[sp + "gate_proj.weight"])
                emit(gp + "ffn_up_shexp.weight", sd[sp + "up_proj.weight"])
                emit(gp + "ffn_down_shexp.weight", sd[sp + "down_proj.weight"])
                emit(gp + "ffn_gate_inp_shexp.weight",
                     sd[hp + "mlp.shared_expert_gate.weight"])
        else:  # mixtral experts
            emit(gp + "ffn_gate_inp.weight",
                 sd[hp + "block_sparse_moe.gate.weight"])
            for e in range(cfg["num_local_experts"]):
                ep = hp + f"block_sparse_moe.experts.{e}."
                emit(gp + f"ffn_gate.{e}.weight", sd[ep + "w1.weight"])
                emit(gp + f"ffn_down.{e}.weight", sd[ep + "w2.weight"])
                emit(gp + f"ffn_up.{e}.weight", sd[ep + "w3.weight"])
    norm("output_norm.weight", sd["model.norm.weight"])
    out_w = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    emit("output.weight", out_w)
    w.write()
    print(f"wrote {args.output}", file=sys.stderr)
    if args.zip:
        zpath = os.path.splitext(args.output)[0] + ".llamafile"
        pack_zip(zpath, {os.path.basename(args.output): args.output})
        print(f"packed {zpath}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
