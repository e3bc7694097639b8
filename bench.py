#!/usr/bin/env python3
"""Benchmark entry point: decode throughput of the flagship quantized model.

Run on real TPU hardware by the driver; prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline = Llama-3-8B-shaped Q4_K decode tokens/s/chip (BASELINE.json's north
star config), measured against the HBM bandwidth roofline for the quantized
weight bytes: roofline_tok_s = HBM_BW / weight_bytes_read_per_token; the
baseline target is 80% of roofline (BASELINE.md), so vs_baseline =
value / (0.8 * roofline). Model weights are synthetic (random block bytes
through the real repack + kernels) — identical compute/memory behavior to real
checkpoints. Extra diagnostic metrics go to stderr.

Usage: python bench.py [--preset llama3-8b] [--quant Q4_K] [--batch 1]
       [--steps 64] [--prefill 512]
"""
import argparse
import json
import os
import sys
import time

HBM_BW_GBS = {"v5e": 819.0, "v5litepod": 819.0, "v4": 1228.0, "v5p": 2765.0,
              "v6e": 1640.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--quant", default="Q4_K")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()

    import jax
    try:  # persistent compile cache: repeat bench runs skip 100s+ compiles
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from llamafile_tpu.models.llama import forward, init_cache, stack_layers
    from llamafile_tpu.models.synthetic import (decode_read_bytes,
                                                make_synthetic_llama,
                                                param_bytes)

    # a dead axon tunnel makes jax.devices() block forever inside a C call
    # (signals don't interrupt it). Probe in a KILLABLE subprocess and retry
    # across a transient-outage window (the round-2 headline number was lost
    # to a tunnel blip at capture time) before enumerating in this process.
    import subprocess
    import threading
    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        deadline = time.time() + float(
            os.environ.get("BENCH_TUNNEL_WAIT_S", "1800"))
        attempt = 0
        while True:
            attempt += 1
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; jax.devices(); print('TUNNEL_OK')"],
                    capture_output=True, text=True, timeout=120)
                if "TUNNEL_OK" in r.stdout:
                    break
            except subprocess.TimeoutExpired:
                pass
            remaining = deadline - time.time()
            if remaining <= 0:
                print("FATAL: TPU tunnel unreachable after retry window "
                      f"({attempt} probes) — axon remote endpoint down?",
                      file=sys.stderr, flush=True)
                sys.exit(3)
            print(f"tunnel probe {attempt} failed; retrying for "
                  f"{remaining:.0f}s more", file=sys.stderr, flush=True)
            time.sleep(min(60, max(1, remaining)))
    # watchdog still guards the in-process enumeration (tunnel can die
    # between the successful probe and this call)
    probe_done = threading.Event()

    def _watchdog():
        if not probe_done.wait(300):
            print("FATAL: device enumeration hung >300s — TPU tunnel "
                  "unreachable (axon remote endpoint down?)",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    dev = jax.devices()[0]
    probe_done.set()
    print(f"device: {dev.device_kind} backend={jax.default_backend()}",
          file=sys.stderr)
    t0 = time.time()
    cfg, params = make_synthetic_llama(args.preset, quant=args.quant, fuse=True)
    if os.environ.get("LLAMAFILE_TPU_STACK", "0") != "0":
        # the bench measures the UNROLLED form by default: with the txn
        # kernel it decodes ~13% faster than the scan-over-layers form
        # (model-level A/B, probe_decode --exp abtail); serving engines
        # still stack by default for the ~20x faster compiles — the
        # persistent compilation cache amortizes the bench's unrolled
        # compile across runs
        params = stack_layers(params)
    wbytes = param_bytes(params)
    print(f"built {args.preset} {args.quant}: {wbytes/1e9:.2f} GB in "
          f"{time.time()-t0:.0f}s", file=sys.stderr)

    b = args.batch
    cache = init_cache(cfg, b, args.ctx)
    cache2 = cache     # decode starts from the empty cache (same cost shape)
    pos0 = jnp.zeros((b,), jnp.int32)

    # decode throughput: steps fully on device via fori_loop with a RUNTIME
    # trip count (one compile serves all step counts), measured DIFFERENTIALLY
    # — t(3N) - t(N) over 2N — so fixed dispatch overheads and any remote-
    # runtime caching artifacts cancel. np.asarray forces a host sync.
    n_small = max(16, args.steps // 3)
    n_large = 3 * n_small

    # attention-length bucketing like the serving engine: the flash-decode
    # kernel streams only the bucket covering the live positions, not the
    # whole allocated cache (KV bytes are a real cost at batch > 1)
    from llamafile_tpu.runtime.engine import attn_bucket
    abucket = attn_bucket(args.prefill + n_large + 2, args.ctx)

    @jax.jit
    def decode_n(p, tok0, pos0, c, n_steps):
        def body(i, carry):
            tok, q, cc = carry
            logits, cc = forward(p, cfg, tok[:, None], q, cc,
                                 attn_len=abucket)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, q + 1, cc)
        tok, q, cc = jax.lax.fori_loop(0, n_steps, body,
                                       (tok0, pos0, c))
        return tok

    pos = jnp.full((b,), args.prefill, jnp.int32)
    t0 = time.time()
    np.asarray(decode_n(params, jnp.ones((b,), jnp.int32), pos, cache2,
                        jnp.int32(2)))
    compile_decode = time.time() - t0
    times = {}
    for n_steps in (n_small, n_large):
        best = float("inf")
        # 4 reps spread over ~10s: the axon-tunneled chip has multi-minute
        # slow phases (other tenants); best-of over a wider window is the
        # only defense a one-shot bench has
        for rep in range(2, 6):
            tok0 = jnp.full((b,), rep + n_steps, jnp.int32)
            t1 = time.time()
            np.asarray(decode_n(params, tok0, pos, cache2, jnp.int32(n_steps)))
            best = min(best, time.time() - t1)
        times[n_steps] = best
    decode_s = max(times[n_large] - times[n_small], 1e-9) / (n_large - n_small)
    decode_tps = b / decode_s

    kind = dev.device_kind.lower()
    bw = next((v for k, v in HBM_BW_GBS.items() if k in kind), 819.0)
    # decode reads every weight byte except the embedding table (one row
    # gather); routed MoE reads only top-k experts' bytes per layer
    read_bytes = decode_read_bytes(params, cfg)
    if b > 1:
        # batch-aware roofline (VERDICT r3 item 2): weights once + each
        # row's LIVE KV span per step (pos at the midpoint of the measured
        # differential window — bucket padding is the kernel's cost, not
        # roofline credit)
        pos_mid = args.prefill + 2 * n_small
        kv_row = (pos_mid * cfg.n_kv_heads * cfg.head_dim * 2
                  * cache.k.dtype.itemsize * cfg.n_layers)
        read_bytes += b * kv_row
        roofline_steps = bw * 1e9 / read_bytes
        roofline = roofline_steps * b          # aggregate tok/s
    else:
        roofline = bw * 1e9 / read_bytes
    target = 0.8 * roofline
    # headline metric goes out FIRST — the prefill diagnostics below involve a
    # large extra compile that must never cost us the recorded result
    bsuf = f"_b{b}" if b > 1 else ""
    print(json.dumps({
        "metric": f"{args.preset}_{args.quant}_decode_tok_s_chip{bsuf}",
        "value": round(decode_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(decode_tps / target, 4),
    }), flush=True)
    print(f"decode: {decode_tps:.1f} tok/s/chip (compile {compile_decode:.0f}s); "
          f"roofline {roofline:.1f} tok/s, target(80%) {target:.1f}"
          + (f" [batch {b}: weights + {b}xKV@pos{args.prefill + 2 * n_small}]"
             if b > 1 else ""),
          file=sys.stderr)
    if args.prefill > 0:
        # measured differentially inside one program (like decode): per-call
        # tunnel dispatch (~30 ms on axon) must not be billed as prefill time
        last = jnp.full((b,), args.prefill - 1, jnp.int32)
        if os.environ.get("LLAMAFILE_TPU_I8P", "1") != "0":
            # int8-MXU prefill (two-level scheme): attach int8-g256 weight
            # companions AFTER the decode measurement — decode streams the
            # 4.5-bit base unchanged; prefill matmuls switch to int8 dots
            # (394 TOPS vs 197 bf16). ~+1 byte/weight HBM residency.
            from llamafile_tpu.models.llama import int8_prefill_params
            t0 = time.time()
            params = int8_prefill_params(params)
            jax.block_until_ready(params.layers[0].w_gate_up.qs8
                                  if params.layers[0].w_gate_up is not None
                                  else params.layers[0].wq.qs8)
            print(f"attached int8-g256 prefill companions in "
                  f"{time.time()-t0:.0f}s", file=sys.stderr)

        @jax.jit
        def prefill_n(p, c, n_iter):
            def body(i, carry):
                acc, cc = carry
                toks = (jnp.arange(args.prefill, dtype=jnp.int32)[None]
                        * (i + 3)) % cfg.n_vocab
                toks = jnp.tile(toks, (b, 1))
                logits, cc = forward(p, cfg, toks, pos0, cc,
                                     fresh_prefill=True, last_idx=last)
                return acc + logits[0, 0, 0], cc
            acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                       (jnp.float32(0), c))
            return acc

        t0 = time.time()
        np.asarray(prefill_n(params, cache, jnp.int32(1)))
        compile_prefill = time.time() - t0
        times = {}
        for n in (4, 12):
            bst = float("inf")
            for _ in range(2):
                t0 = time.time()
                np.asarray(prefill_n(params, cache, jnp.int32(n)))
                bst = min(bst, time.time() - t0)
            times[n] = bst
        dt = max(times[12] - times[4], 1e-9) / 8
        # matmul flops per prefill (head sliced to last_idx ≈ free);
        # MXU% vs bf16 peak — see docs/prefill_analysis.md for the ceiling
        pf_flops = 2 * b * args.prefill * cfg.n_layers * (
            cfg.d_model * (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
            + cfg.n_heads * cfg.head_dim * cfg.d_model
            + 3 * cfg.d_model * cfg.d_ff * max(1, cfg.n_experts_used or 1))
        i8p = os.environ.get("LLAMAFILE_TPU_I8P", "1") != "0"
        print(f"prefill: {b * args.prefill / dt:.0f} tok/s "
              f"(compile {compile_prefill:.0f}s, "
              f"{pf_flops / dt / 197e12 * 100:.0f}% bf16-MXU"
              f"{', int8 prefill kernels' if i8p else ''})",
              file=sys.stderr)

    if args.preset == "llama3-8b" and args.batch == 1:
        # routed-MoE diagnostic (VERDICT r3 item 1): Mixtral-8x7B layer
        # shapes, decode vs the ROUTED-bytes roofline (top-2-of-8 experts'
        # bytes per layer, not all 8 — decode_read_bytes accounts it)
        del params
        mcfg, mparams = make_synthetic_llama("mixtral-8x7b-8l",
                                             quant=args.quant, fuse=True)
        mread = decode_read_bytes(mparams, mcfg)   # pre-stack: layers list
        # layer scan over merged [L*E, ...] expert stacks: one MoE layer
        # body in the HLO instead of 8 inlined copies (compile ~8x down)
        mparams = stack_layers(mparams)
        mcache = init_cache(mcfg, 1, 512)

        @jax.jit
        def mdecode_n(p, tok0, q0, c, n_steps):
            def body(i, carry):
                tok, q, cc = carry
                logits, cc = forward(p, mcfg, tok[:, None], q, cc)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt, q + 1, cc)
            tok, q, cc = jax.lax.fori_loop(0, n_steps, body, (tok0, q0, c))
            return tok

        mpos = jnp.full((1,), 16, jnp.int32)
        t0 = time.time()
        np.asarray(mdecode_n(mparams, jnp.ones((1,), jnp.int32), mpos,
                             mcache, jnp.int32(2)))
        mcompile = time.time() - t0
        mtimes = {}
        for n_steps in (n_small, n_large):
            best = float("inf")
            for rep in range(2, 5):
                tok0 = jnp.full((1,), rep, jnp.int32)
                t1 = time.time()
                np.asarray(mdecode_n(mparams, tok0, mpos, mcache,
                                     jnp.int32(n_steps)))
                best = min(best, time.time() - t1)
            mtimes[n_steps] = best
        mdec_s = max(mtimes[n_large] - mtimes[n_small], 1e-9) / (n_large - n_small)
        mtps = 1.0 / mdec_s
        mroof = bw * 1e9 / mread
        print(json.dumps({
            "metric": f"mixtral-8x7b-8l_{args.quant}_decode_tok_s_chip",
            "value": round(mtps, 2),
            "unit": "tok/s",
            "vs_baseline": round(mtps / (0.8 * mroof), 4),
        }), flush=True)
        print(f"mixtral decode: {mtps:.1f} tok/s/chip (compile "
              f"{mcompile:.0f}s); routed roofline {mroof:.1f} tok/s "
              f"({mread/1e9:.2f} GB/step: top-2-of-8 expert bytes)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
