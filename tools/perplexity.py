#!/usr/bin/env python3
"""Perplexity + evaluation suite — the quantization-quality gate.

Analog of the reference's llamafile-perplexity tool (SURVEY.md §2.7;
llamafile-files/perplexity/ ships upstream perplexity.cpp with --hellaswag,
--winogrande and --kl-divergence modes). Modes:

  default            WikiText-2-style sliding-window perplexity: NLL over the
                     second half of each n_ctx window, ppl = exp(mean nll)
  --hellaswag F      6-lines-per-task file (context / gold index / 4 endings,
                     the reference's hellaswag_val format): accuracy of
                     max-logprob ending selection
  --winogrande F     CSV sentence-with-underscore,option1,option2,answer(1|2):
                     accuracy of the lower-NLL substitution
  --save-logits F    save per-token log-probs (f16 .npz) for a base model
  --kl-divergence F  compare against a saved base run: mean KL(base||model)
                     per token plus same-top1 agreement

Usage: python tools/perplexity.py -m model.gguf -f wiki.test.raw [-c 512]
"""
import argparse
import csv
import io
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chunk_logprob_fn(cfg, n_ctx):
    import jax
    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache

    @jax.jit
    def chunk_logp(params, toks):
        cache = init_cache(cfg, 1, n_ctx)
        logits, _ = forward(params, cfg, toks[None, :-1],
                            jnp.zeros((1,), jnp.int32), cache)
        return jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)

    return chunk_logp


def run_perplexity(args, cfg, params, tok):
    import jax.numpy as jnp
    import numpy as np
    text = open(args.file, errors="replace").read()
    ids = tok.encode(text)
    n_ctx = args.ctx
    n_chunks = len(ids) // n_ctx
    if args.max_chunks:
        n_chunks = min(n_chunks, args.max_chunks)
    if n_chunks == 0:
        print("text too short", file=sys.stderr)
        return 1
    print(f"{len(ids)} tokens, {n_chunks} chunks of {n_ctx}", file=sys.stderr)
    chunk_logp = _chunk_logprob_fn(cfg, n_ctx)
    total_nll, total_cnt = 0.0, 0
    saved = []
    t0 = time.time()
    for i in range(n_chunks):
        chunk = np.asarray(ids[i * n_ctx:(i + 1) * n_ctx], np.int32)
        logp = np.asarray(chunk_logp(params, jnp.asarray(chunk)))
        tgt = chunk[1:]
        nll = -logp[np.arange(len(tgt)), tgt]
        start = n_ctx // 2
        total_nll += float(nll[start:].sum())
        total_cnt += len(tgt) - start
        if args.save_logits or args.kl_divergence:
            saved.append(logp.astype(np.float16))
        ppl = math.exp(total_nll / total_cnt)
        print(f"[{i + 1}/{n_chunks}] ppl={ppl:.4f} "
              f"({(i+1)*n_ctx/(time.time()-t0):.0f} tok/s)", file=sys.stderr)
    ppl = math.exp(total_nll / total_cnt)
    out = {"ppl": ppl, "tokens": total_cnt, "ctx": n_ctx}
    if args.save_logits:
        np.savez_compressed(args.save_logits,
                            logp=np.stack(saved), ctx=n_ctx)
        print(f"saved base log-probs -> {args.save_logits}", file=sys.stderr)
    if args.kl_divergence:
        base = np.load(args.kl_divergence)
        bl = base["logp"].astype(np.float32)[: len(saved)]
        ml = np.stack(saved).astype(np.float32)[: bl.shape[0]]
        # KL(base || model) per position, averaged
        kl = np.sum(np.exp(bl) * (bl - ml), axis=-1)
        out["kl_divergence"] = float(kl.mean())
        out["same_top1"] = float(
            (bl.argmax(-1) == ml.argmax(-1)).mean())
        print(f"mean KL(base||model) = {out['kl_divergence']:.6f}, "
              f"top-1 agreement = {out['same_top1']*100:.2f}%",
              file=sys.stderr)
    if args.json:
        import json
        print(json.dumps(out))
    else:
        print(f"Final perplexity: {ppl:.4f} over {total_cnt} tokens")
        if "kl_divergence" in out:
            print(f"KL divergence vs base: {out['kl_divergence']:.6f}")
    return 0


def _completion_nll(cfg, params, tok, context_ids, full_ids, chunk_logp_cache,
                    n_ctx):
    """Sum NLL of full_ids[len(context_ids):] given the preceding tokens."""
    import jax.numpy as jnp
    import numpy as np
    ids = full_ids[:n_ctx]
    toks = np.zeros((n_ctx,), np.int32)
    toks[:len(ids)] = ids
    logp = np.asarray(chunk_logp_cache(params, jnp.asarray(toks)))
    s = max(1, len(context_ids))
    tgt = np.asarray(ids[1:], np.int32)
    nll = -logp[np.arange(len(tgt)), tgt]
    return float(nll[s - 1:len(ids) - 1].sum())


def run_hellaswag(args, cfg, params, tok):
    lines = [l.rstrip("\n") for l in open(args.hellaswag, errors="replace")]
    tasks = [lines[i:i + 6] for i in range(0, len(lines) - 5, 6)]
    if args.max_chunks:
        tasks = tasks[:args.max_chunks]
    chunk_logp = _chunk_logprob_fn(cfg, args.ctx)
    correct = 0
    t0 = time.time()
    for n, t in enumerate(tasks):
        ctx, gold, endings = t[0], int(t[1]), t[2:6]
        ctx_ids = tok.encode(ctx)
        scores = []
        for e in endings:
            full = tok.encode(ctx + " " + e.strip())
            scores.append(-_completion_nll(cfg, params, tok, ctx_ids, full,
                                           chunk_logp, args.ctx))
        correct += int(max(range(4), key=lambda i: scores[i]) == gold)
        acc = 100.0 * correct / (n + 1)
        print(f"[{n + 1}/{len(tasks)}] hellaswag acc={acc:.2f}% "
              f"({(n+1)/(time.time()-t0):.2f} task/s)", file=sys.stderr)
    acc = 100.0 * correct / max(1, len(tasks))
    if args.json:
        import json
        print(json.dumps({"hellaswag_acc": acc, "tasks": len(tasks)}))
    else:
        print(f"HellaSwag accuracy: {acc:.2f}% over {len(tasks)} tasks")
    return 0


def run_winogrande(args, cfg, params, tok):
    rows = list(csv.reader(open(args.winogrande, errors="replace")))
    rows = [r for r in rows if len(r) >= 4 and "_" in r[0]]
    if args.max_chunks:
        rows = rows[:args.max_chunks]
    chunk_logp = _chunk_logprob_fn(cfg, args.ctx)
    correct = 0
    t0 = time.time()
    for n, (sentence, o1, o2, answer) in enumerate(
            (r[0], r[1], r[2], r[3]) for r in rows):
        pre = sentence.split("_", 1)[0]
        nlls = []
        for opt in (o1, o2):
            full = sentence.replace("_", opt, 1)
            ctx_ids = tok.encode(pre.strip() or full[:1])
            nlls.append(_completion_nll(cfg, params, tok, ctx_ids,
                                        tok.encode(full), chunk_logp,
                                        args.ctx))
        pick = 1 if nlls[0] <= nlls[1] else 2
        correct += int(pick == int(answer))
        acc = 100.0 * correct / (n + 1)
        print(f"[{n + 1}/{len(rows)}] winogrande acc={acc:.2f}% "
              f"({(n+1)/(time.time()-t0):.2f} task/s)", file=sys.stderr)
    acc = 100.0 * correct / max(1, len(rows))
    if args.json:
        import json
        print(json.dumps({"winogrande_acc": acc, "tasks": len(rows)}))
    else:
        print(f"Winogrande accuracy: {acc:.2f}% over {len(rows)} tasks")
    return 0


def run_multiple_choice(args, cfg, params, tok):
    """Generic multiple-choice eval (reference perplexity --multiple-choice,
    llamafile-files/perplexity/: TruthfulQA/MMLU-class tasks). Input: JSONL
    with {"question": str, "choices": [str, ...], "answer": int}. Each
    choice is scored by its LENGTH-NORMALIZED log-probability given the
    question (the upstream tool's per-token averaging)."""
    import json as _json
    tasks = []
    for line in open(args.multiple_choice, errors="replace"):
        line = line.strip()
        if line:
            tasks.append(_json.loads(line))
    if args.max_chunks:
        tasks = tasks[:args.max_chunks]
    chunk_logp = _chunk_logprob_fn(cfg, args.ctx)
    correct = 0
    t0 = time.time()
    for n, t in enumerate(tasks):
        ctx_ids = tok.encode(t["question"])
        scores = []
        for c in t["choices"]:
            full = tok.encode(t["question"] + " " + c.strip())
            ntok = max(1, len(full) - len(ctx_ids))
            nll = _completion_nll(cfg, params, tok, ctx_ids, full,
                                  chunk_logp, args.ctx)
            scores.append(-nll / ntok)
        pick = max(range(len(scores)), key=lambda i: scores[i])
        correct += int(pick == int(t["answer"]))
        acc = 100.0 * correct / (n + 1)
        print(f"[{n + 1}/{len(tasks)}] multiple-choice acc={acc:.2f}% "
              f"({(n+1)/(time.time()-t0):.2f} task/s)", file=sys.stderr)
    acc = 100.0 * correct / max(1, len(tasks))
    if args.json:
        import json
        print(json.dumps({"multiple_choice_acc": acc, "tasks": len(tasks)}))
    else:
        print(f"Multiple-choice accuracy: {acc:.2f}% over {len(tasks)} tasks")
    return 0


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", help="raw text file (perplexity mode)")
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=0,
                    help="limit chunks/tasks")
    ap.add_argument("--hellaswag", help="hellaswag task file (6 lines/task)")
    ap.add_argument("--winogrande", help="winogrande CSV")
    ap.add_argument("--multiple-choice", dest="multiple_choice",
                    help="generic MC eval: JSONL of "
                         "{question, choices[], answer}")
    ap.add_argument("--save-logits", dest="save_logits",
                    help="save base log-probs (.npz)")
    ap.add_argument("--kl-divergence", dest="kl_divergence",
                    help="compare against saved base log-probs (.npz)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(args.model)
    if args.hellaswag:
        return run_hellaswag(args, cfg, params, tok)
    if args.multiple_choice:
        return run_multiple_choice(args, cfg, params, tok)
    if args.winogrande:
        return run_winogrande(args, cfg, params, tok)
    if not args.file:
        print("need -f FILE (or --hellaswag/--winogrande)", file=sys.stderr)
        return 1
    return run_perplexity(args, cfg, params, tok)


if __name__ == "__main__":
    sys.exit(main())
