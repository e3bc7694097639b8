#!/usr/bin/env python3
"""Model-scale quantization quality gate -> QUALITY_r{N}.json.

The reference gates quantization quality with WikiText-2 perplexity deltas
and --kl-divergence runs (llamafile-files/perplexity/perplexity.1;
BASELINE.json demands ppl delta <= 0.05 vs F16). With zero egress there is
no WikiText-2 and no pretrained checkpoint, so this gate TRAINS a
deterministic llama in pure JAX (AdamW on the synthetic Zipf+motif stream,
review r4 #5: a random-init model's near-uniform logits make NLL deltas
structurally easy and top-1 agreement meaningless; a few hundred optimizer
steps peak the logits and make both discriminative), exports it straight
to GGUF F16, quantizes with tools/quantize.py, and measures on a held-out
continuation of the same stream:

  - sliding-window ppl (NLL over the second half of each window) for
    F16, Q4_K planes (bf16 dequant), Q4_K txn (int8-activation MXU path)
  - mean KL(F16 || variant) per token + top-1 agreement — the
    reference's --kl-divergence methodology.

--moe gates a small trained MoE instead (routed int8 decode kernels —
the path a quant-quality surprise would hide in). --untrained keeps the
old random-init HF-convert path (also exercises tools/convert_hf.py).

Usage: python scripts/quality_gate.py [--small|--micro] [--moe]
       [--out QUALITY_r5.json]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_hf(tmp, *, hidden, layers, heads, kv, dff, vocab):
    import torch
    import transformers
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=dff,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, max_position_embeddings=2048,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = os.path.join(tmp, "hf")
    model.save_pretrained(d, safe_serialization=True)
    n_params = sum(p.numel() for p in model.parameters())
    del model
    return d, n_params


def token_stream(vocab, n_tokens, seed=0):
    """Deterministic structured ids: Zipf-weighted draws with periodic
    n-gram repetition, so windows contain learnable-looking regularity
    rather than uniform noise."""
    import numpy as np
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = 1.0 / ranks ** 1.1
    p /= p.sum()
    ids = rng.choice(vocab, size=n_tokens, p=p)
    # splice in repeated 16-gram motifs every 64 tokens
    motif = rng.choice(vocab, size=16, p=p)
    for i in range(0, n_tokens - 16, 64):
        ids[i:i + 16] = motif
    return ids.astype(np.int32)


def init_train_params(dims, seed=0, experts=0):
    """Random f32 params keyed by GGUF tensor names (the pytree IS the
    export dict)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    d, dff, v = dims["hidden"], dims["dff"], dims["vocab"]
    hd = d // dims["heads"]

    def r(*shape, s=None):
        s = s if s is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * s).astype(np.float32)

    P = {"token_embd.weight": r(v, d, s=0.02),
         "output_norm.weight": np.ones(d, np.float32),
         "output.weight": r(v, d)}
    for i in range(dims["layers"]):
        p = f"blk.{i}."
        P[p + "attn_norm.weight"] = np.ones(d, np.float32)
        P[p + "attn_q.weight"] = r(dims["heads"] * hd, d)
        P[p + "attn_k.weight"] = r(dims["kv"] * hd, d)
        P[p + "attn_v.weight"] = r(dims["kv"] * hd, d)
        P[p + "attn_output.weight"] = r(d, dims["heads"] * hd)
        P[p + "ffn_norm.weight"] = np.ones(d, np.float32)
        if experts:
            P[p + "ffn_gate_inp.weight"] = r(experts, d)
            for e in range(experts):
                P[p + f"ffn_gate.{e}.weight"] = r(dff, d)
                P[p + f"ffn_up.{e}.weight"] = r(dff, d)
                P[p + f"ffn_down.{e}.weight"] = r(d, dff)
        else:
            P[p + "ffn_gate.weight"] = r(dff, d)
            P[p + "ffn_up.weight"] = r(dff, d)
            P[p + "ffn_down.weight"] = r(d, dff)
    return P


def make_train_fwd(dims, experts=0, topk=0):
    """Pure-JAX forward matching llamafile_tpu's GGUF-llama semantics
    exactly (interleaved NORM rope, rmsnorm eps 1e-5, SwiGLU, GQA,
    norm-topk MoE) so exported weights mean the same thing at load time —
    the gate asserts post-export NLL parity to pin this."""
    import jax
    import jax.numpy as jnp
    d, nh, nkv = dims["hidden"], dims["heads"], dims["kv"]
    hd = d // nh

    def rms(x, w):
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + 1e-5)) * w

    def rope(x, cos, sin):          # interleaved pairs (llama NORM mode)
        shp = x.shape
        x2 = x.reshape(*shp[:-1], hd // 2, 2)
        a, b = x2[..., 0], x2[..., 1]
        return jnp.stack([a * cos - b * sin, a * sin + b * cos],
                         axis=-1).reshape(shp)

    def fwd(P, toks):
        B, T = toks.shape
        x = P["token_embd.weight"][toks]
        pos = jnp.arange(T)
        inv = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, dtype=jnp.float32)
                                 / hd))
        ang = pos[:, None] * inv[None, :]
        cos, sin = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]  # [T,1,hd/2]
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e30)
        for i in range(dims["layers"]):
            p = f"blk.{i}."
            h = rms(x, P[p + "attn_norm.weight"])
            q = (h @ P[p + "attn_q.weight"].T).reshape(B, T, nh, hd)
            k = (h @ P[p + "attn_k.weight"].T).reshape(B, T, nkv, hd)
            v = (h @ P[p + "attn_v.weight"].T).reshape(B, T, nkv, hd)
            q, k = rope(q, cos, sin), rope(k, cos, sin)
            k = jnp.repeat(k, nh // nkv, axis=2)
            v = jnp.repeat(v, nh // nkv, axis=2)
            s = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
                jnp.float32(hd))
            a = jax.nn.softmax(s + mask[None, None], axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", a, v).reshape(B, T, nh * hd)
            x = x + o @ P[p + "attn_output.weight"].T
            h = rms(x, P[p + "ffn_norm.weight"])
            if experts:
                router = h @ P[p + "ffn_gate_inp.weight"].T     # [B,T,E]
                w = jax.nn.softmax(router, axis=-1)
                topw, topi = jax.lax.top_k(w, topk)
                topw = topw / jnp.sum(topw, -1, keepdims=True)
                f = jnp.zeros_like(x)
                for e in range(experts):
                    g = h @ P[p + f"ffn_gate.{e}.weight"].T
                    u = h @ P[p + f"ffn_up.{e}.weight"].T
                    y = (jax.nn.silu(g) * u) @ P[p + f"ffn_down.{e}.weight"].T
                    w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
                    f = f + y * w_e[..., None]
            else:
                g = h @ P[p + "ffn_gate.weight"].T
                u = h @ P[p + "ffn_up.weight"].T
                f = (jax.nn.silu(g) * u) @ P[p + "ffn_down.weight"].T
            x = x + f
        x = rms(x, P["output_norm.weight"])
        return x @ P["output.weight"].T
    return fwd


def train_jax(dims, steps, *, batch=8, ctx=256, lr=3e-4, seed=0,
              experts=0, topk=0, log=None):
    """AdamW training on the Zipf+motif stream; returns trained GGUF-named
    param dict (numpy f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    P = init_train_params(dims, seed=seed, experts=experts)
    fwd = make_train_fwd(dims, experts=experts, topk=topk)
    opt = optax.adamw(lr, weight_decay=0.01)
    P = jax.tree.map(jnp.asarray, P)
    state = opt.init(P)

    def loss_fn(P, toks):
        lg = fwd(P, toks[:, :-1])
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)
        return nll.mean()

    @jax.jit
    def step_fn(P, state, toks):
        loss, grads = jax.value_and_grad(loss_fn)(P, toks)
        upd, state = opt.update(grads, state, P)
        return optax.apply_updates(P, upd), state, loss

    # training stream continues PAST the eval range (same motif/unigram
    # structure, disjoint tokens): eval windows are a held-out continuation
    eval_reserve = 64 * 1024
    stream = token_stream(dims["vocab"],
                          eval_reserve + steps * batch * (ctx + 1))
    stream = stream[eval_reserve:]
    for it in range(steps):
        lo = it * batch * (ctx + 1)
        toks = jnp.asarray(stream[lo:lo + batch * (ctx + 1)]
                           .reshape(batch, ctx + 1))
        P, state, loss = step_fn(P, state, toks)
        if log and (it % 50 == 0 or it == steps - 1):
            log(f"train step {it}: loss {float(loss):.3f}")
    return jax.tree.map(lambda a: np.asarray(a, np.float32), P), fwd


def export_gguf(path, P, dims, experts=0, topk=0):
    """Write trained params as a GGUF F16 llama (norms stay F32)."""
    import numpy as np
    from llamafile_tpu.gguf.writer import GGUFWriter
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.name", "quality-gate-trained")
    w.add("llama.block_count", dims["layers"])
    w.add("llama.embedding_length", dims["hidden"])
    w.add("llama.attention.head_count", dims["heads"])
    w.add("llama.attention.head_count_kv", dims["kv"])
    w.add("llama.feed_forward_length", dims["dff"])
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.context_length", 2048)
    w.add("llama.vocab_size", dims["vocab"])
    if experts:
        w.add("llama.expert_count", experts)
        w.add("llama.expert_used_count", topk)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(dims["vocab"])])
    w.add("tokenizer.ggml.scores",
          np.zeros(dims["vocab"], np.float32))
    w.add("tokenizer.ggml.token_type",
          np.ones(dims["vocab"], np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", False)
    for name, arr in P.items():
        if name.endswith("norm.weight"):
            w.add_tensor_f32(name, arr)
        else:
            w.add_tensor_f16(name, arr)
    w.write()


def main():
    # honor JAX_PLATFORMS even though the site plugin pre-registers the
    # TPU backend (env alone latches too late; see utils/platform.py) —
    # without this a JAX_PLATFORMS=cpu run silently lands on the tunnel
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="~20M params (plumbing-test scale)")
    ap.add_argument("--micro", action="store_true",
                    help="~3M params (CI slow-test scale)")
    ap.add_argument("--moe", action="store_true",
                    help="gate a trained MoE (routed int8 decode path)")
    ap.add_argument("--untrained", action="store_true",
                    help="legacy random-init HF-convert path")
    ap.add_argument("--steps", type=int, default=0,
                    help="AdamW steps (0 = scale default)")
    ap.add_argument("--out", default="QUALITY_r5.json")
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()

    experts, topk = (8, 2) if args.moe else (0, 0)
    if args.micro:
        dims = dict(hidden=256, layers=2, heads=4, kv=2, dff=512,
                    vocab=2048)
        steps = args.steps or 120
    elif args.small:
        dims = dict(hidden=512, layers=4, heads=8, kv=4, dff=1536,
                    vocab=8192)
        steps = args.steps or 300
    elif args.untrained:
        # legacy random-init scale (QUALITY_r4 comparability)
        dims = dict(hidden=1536, layers=16, heads=16, kv=8, dff=6144,
                    vocab=32000)
        steps = 0
    else:
        # trained default: ~0.4B with QUALITY_r4's exact per-layer shapes
        # (hidden 1536 / dff 6144 / 16h / 8kv) at 8 layers — the largest
        # depth whose params + AdamW f32 moments + grads (~4 f32 copies,
        # 6.4 GB) + activations fit beside the eval variants on one 16 GB
        # v5e (16 layers = 0.66B OOMed: 10.6 GB of optimizer state alone)
        dims = dict(hidden=1536, layers=8, heads=16, kv=8, dff=6144,
                    vocab=32000)
        steps = args.steps or 600
    if args.moe:
        # routed decode kernel wants d and d_ff multiples of 256; keep the
        # per-expert FFN smaller so total params stay comparable — and
        # halve the depth at the trained default (8 experts multiply the
        # FFN param count; AdamW f32 state must still fit one v5e)
        dims["dff"] = max(256, (dims["dff"] // 4) // 256 * 256)
        if not (args.micro or args.small or args.untrained):
            dims["layers"] = max(2, dims["layers"] // 2)

    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        f16 = os.path.join(tmp, "f16.gguf")
        q4k = os.path.join(tmp, "q4k.gguf")
        trained_fwd = trained_P = None
        if args.untrained:
            assert not args.moe, "--untrained has no MoE variant"
            hf_dir, n_params = build_hf(tmp, **dims)
            print(f"HF model {n_params/1e6:.0f}M params built "
                  f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True)
            r = subprocess.run([sys.executable,
                                os.path.join(here, "tools/convert_hf.py"),
                                hf_dir, f16], capture_output=True, text=True)
            assert r.returncode == 0, r.stderr[-2000:]
        else:
            trained_P, trained_fwd = train_jax(
                dims, steps, ctx=min(args.ctx, 256), experts=experts,
                topk=topk,
                log=lambda m: print(f"{m} {time.time()-t0:.0f}s",
                                    file=sys.stderr, flush=True))
            n_params = sum(a.size for a in trained_P.values())
            export_gguf(f16, trained_P, dims, experts=experts, topk=topk)
            print(f"trained {n_params/1e6:.0f}M params, {steps} steps, "
                  f"exported {time.time()-t0:.0f}s", file=sys.stderr,
                  flush=True)
        r = subprocess.run([sys.executable,
                            os.path.join(here, "tools/quantize.py"),
                            f16, q4k, "Q4_K"], capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        print(f"quantized {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)

        import jax
        import jax.numpy as jnp
        from llamafile_tpu.models.llama import forward, init_cache
        from llamafile_tpu.models.loader import load_llama
        from llamafile_tpu.ops import qmatmul as QM

        ids = token_stream(dims["vocab"], args.windows * args.ctx)
        half = args.ctx // 2

        def logprob_fn(cfg):
            # the SERVING math: prefill the first half (planes prefill
            # kernel), then decode the second half token by token — the
            # decode steps run the M=1 kernels (txn int8 vs planes bf16),
            # which is the path the quality question is about
            def f(params, toks):
                cache = init_cache(cfg, 1, args.ctx)
                lg, cache = forward(params, cfg, toks[None, :half],
                                    jnp.zeros((1,), jnp.int32), cache,
                                    fresh_prefill=True)
                lp0 = jax.nn.log_softmax(lg[0, -1].astype(jnp.float32))

                def step(cache, i):
                    tok = jax.lax.dynamic_slice(toks, (i,), (1,))
                    lg, cache = forward(params, cfg, tok[None],
                                        jnp.asarray([0], jnp.int32) + i,
                                        cache)
                    return cache, jax.nn.log_softmax(
                        lg[0, -1].astype(jnp.float32))

                _, lps = jax.lax.scan(
                    step, cache, jnp.arange(half, args.ctx - 1))
                return jnp.concatenate([lp0[None], lps])   # predicts
                # toks[half], ..., toks[ctx-1]
            return jax.jit(f)

        variants = [("f16", f16, None), ("q4k_planes", q4k, "planes"),
                    ("q4k_txn", q4k, "txn"),
                    # int8-g256 prefill companion (two-level scheme): the
                    # requantized-scale path must stay within the NLL gate
                    # before adoption (docs/prefill_analysis.md §2)
                    ("q4k_i8p", q4k, "txn+i8p")]
        loaded = {}
        for name, path, kern in variants:
            cfg, params, _tok, _ = load_llama(path)
            if kern and kern.endswith("+i8p"):
                from llamafile_tpu.models.llama import int8_prefill_params
                params = int8_prefill_params(params)
                kern = kern[:-4]
            loaded[name] = (cfg, params, kern)

        nll = {n: [] for n, *_ in variants}
        kl = {n: [] for n, *_ in variants if n != "f16"}
        top1 = {n: [] for n, *_ in variants if n != "f16"}
        fns = {}
        for name, (cfg, params, kern) in loaded.items():
            QM.Q4B_KERNEL = kern or "txn"
            fns[name] = logprob_fn(cfg)

        for w in range(args.windows):
            toks = jnp.asarray(ids[w * args.ctx:(w + 1) * args.ctx])
            lps = {}
            for name, (cfg, params, kern) in loaded.items():
                QM.Q4B_KERNEL = kern or "txn"
                lps[name] = fns[name](params, toks)
            tgt = np.asarray(toks[half:])           # [ctx - half]
            base = np.asarray(lps["f16"], np.float64)
            for name in lps:
                lp = np.asarray(lps[name], np.float64)
                nll[name].append(-lp[np.arange(len(tgt)), tgt].mean())
                if name != "f16":
                    kl[name].append(
                        np.sum(np.exp(base) * (base - lp), axis=-1).mean())
                    top1[name].append(
                        (base.argmax(-1) == lp.argmax(-1)).mean())
            print(f"window {w+1}/{args.windows} {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)

        out = {"n_params": n_params, "dims": dims, "windows": args.windows,
               "ctx": args.ctx, "trained_steps": 0 if args.untrained
               else steps, "moe": bool(args.moe),
               "scored_tokens": args.windows * (args.ctx - half)}
        if trained_fwd is not None:
            # export-parity pin: the pure-JAX trainer and the framework's
            # F16 load must agree on NLL (catches any rope/norm/layout
            # semantic drift between trainer and runtime)
            import jax
            import jax.numpy as jnp
            toks0 = jnp.asarray(ids[: args.ctx])[None]
            lg = jax.jit(trained_fwd)(jax.tree.map(jnp.asarray, trained_P),
                                      toks0)
            lp = np.asarray(jax.nn.log_softmax(
                lg[0].astype(jnp.float32), axis=-1), np.float64)
            tgt0 = np.asarray(ids[half:args.ctx])
            tr_nll = -lp[np.arange(half - 1, args.ctx - 1), tgt0].mean()
            out["trainer_vs_f16_nll_delta"] = float(
                tr_nll - float(np.asarray(nll["f16"][0])))
            assert abs(out["trainer_vs_f16_nll_delta"]) < 0.03, out
        ppl = {n: float(np.exp(np.mean(v))) for n, v in nll.items()}
        out["ppl"] = ppl
        out["ppl_delta"] = {n: ppl[n] - ppl["f16"] for n in ppl
                            if n != "f16"}
        out["nll_delta_nats"] = {
            n: float(np.mean(nll[n]) - np.mean(nll["f16"]))
            for n in nll if n != "f16"}
        out["mean_kl_vs_f16"] = {n: float(np.mean(v))
                                 for n, v in kl.items()}
        out["top1_agree_vs_f16"] = {n: float(np.mean(v))
                                    for n, v in top1.items()}
        # gate: the reference's criterion is "ppl delta <= 0.05 vs F16",
        # stated on WikiText-2 ppl ~6, i.e. |dNLL| <= 0.05/6 = 0.0083 nats
        # — the nat form transfers to any absolute ppl, so it gates here
        # (0.01 with margin). On TRAINED runs top-1 agreement is also
        # gated (>= 0.90, review r4 #5): peaked logits make argmax
        # stability a real quant-noise signal. Untrained runs only report
        # it (near-uniform logits flip argmax on noise).
        nll_ok = all(abs(d) <= 0.01
                     for d in out["nll_delta_nats"].values())
        gate = {"nll_delta_nats_max": 0.01, "nll_pass": nll_ok}
        if not args.untrained:
            gate["top1_agree_min"] = 0.90
            gate["top1_pass"] = all(v >= 0.90
                                    for v in out["top1_agree_vs_f16"]
                                    .values())
            gate["pass"] = nll_ok and gate["top1_pass"]
        else:
            gate["pass"] = nll_ok
        out["gate"] = gate
        with open(os.path.join(here, args.out), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
