"""Inference engine: jit'd prefill/decode steps + generation loop.

Analog of the reference's llama_decode + sampling driver (SURVEY.md §3.1 hot
loop; slot eval loop server/slot.cpp:156-187). All device work is two compiled
functions — `prefill` (batched prompt ingestion, bucketed lengths to bound
recompiles) and `decode_step` (one token per sequence) — so the Python host
loop only moves single token ids, never logits.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, LlamaParams, forward, init_cache
from .sampling import SamplingParams, sample
from .tokenizer import Tokenizer


def model_forward(cfg):
    """Architecture dispatch (trace-time only: cfg is a static jit arg)."""
    if type(cfg).__name__ == "MambaConfig":
        from ..models.mamba import forward as mamba_forward
        return mamba_forward
    return forward


def model_init_cache(cfg):
    if type(cfg).__name__ == "MambaConfig":
        from ..models.mamba import init_cache as mamba_init_cache
        return mamba_init_cache
    return init_cache

PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
# 1.5x half-steps between the powers of two: decode streams the covering
# bucket's whole KV span, and at batch > 1 that padding is a first-order
# bandwidth cost (e.g. pos ~600 read the 1024 bucket = +70% KV bytes).
# Every bucket is a multiple of 256 so the flash-decode KV block divides it.
ATTN_BUCKETS = (256, 512, 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192,
                12288, 16384, 24576, 32768)


def attn_bucket(needed: int, max_len: int) -> int:
    """Smallest attention-window bucket covering `needed` positions."""
    for b in ATTN_BUCKETS:
        if b >= needed:
            return min(b, max_len)
    return max_len


def bucket_len(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return ((n + 4095) // 4096) * 4096


@functools.partial(jax.jit, static_argnames=("cfg", "fresh"))
def _prefill_jit(params, cfg: LlamaConfig, tokens, pos, cache, fresh=False,
                 last_idx=None, rope_pos=None):
    return model_forward(cfg)(params, cfg, tokens, pos, cache,
                              fresh_prefill=fresh, last_idx=last_idx,
                              rope_pos=rope_pos)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _embed_tokens(params, cfg: LlamaConfig, ids):
    return params.tok_embd[ids]


@functools.partial(jax.jit, static_argnames=("cfg", "fresh"))
def _prefill_embeds_jit(params, cfg: LlamaConfig, embeds, pos, cache,
                        fresh=False, last_idx=None):
    b, t, _ = embeds.shape
    tokens = jnp.zeros((b, t), jnp.int32)
    return model_forward(cfg)(params, cfg, tokens, pos, cache,
                              fresh_prefill=fresh, embeds=embeds,
                              last_idx=last_idx)


@functools.partial(jax.jit, static_argnames=("cfg", "sp"), donate_argnums=(5,))
def _decode_jit(params, cfg: LlamaConfig, sp: SamplingParams, token, pos, cache,
                key, counts):
    logits, cache = model_forward(cfg)(params, cfg, token[:, None], pos, cache)
    nxt = sample(logits[:, -1, :], key, sp, counts)
    return nxt, cache


@functools.partial(jax.jit, static_argnames=("cfg", "sp", "n_steps", "attn_len"),
                   donate_argnums=(5,))
def _decode_scan(params, cfg: LlamaConfig, sp: SamplingParams, token, pos, cache,
                 key, pw, n_steps: int, attn_len=None, mu=None,
                 rope_off=None):
    """n_steps decode iterations fully on device (lax.scan) — one dispatch.

    This is the TPU answer to the reference's per-token llama_decode loop:
    dispatch latency is amortized over the chunk, the KV cache buffer is
    donated so steps update in place. attn_len (static) buckets the attention
    window so short sequences never read the padded KV tail. Mirostat mu (when
    sp.mirostat) and the penalty window pw (sampling.PenaltyWindow, when
    sp.penalized) ride the scan carry — adaptive sampling without host trips.
    Returns tokens [B, n_steps]."""
    from .sampling import penalty_window_push, sample_stateful

    def step(carry, _):
        tok, p, c, k, w, m = carry
        k, sub = jax.random.split(k)
        logits, c = model_forward(cfg)(params, cfg, tok[:, None], p, c,
                                       attn_len=attn_len,
                                       rope_pos=(None if rope_off is None
                                                 else p - rope_off))
        nxt, m = sample_stateful(logits[:, -1, :], sub, sp,
                                 w.counts if w is not None else None, m)
        if w is not None:
            w = penalty_window_push(w, nxt)
        return (nxt, p + 1, c, k, w, m), nxt

    (token, pos, cache, key, pw, mu), toks = jax.lax.scan(
        step, (token, pos, cache, key, pw, mu), None, length=n_steps)
    return jnp.transpose(toks), token, pos, cache, key, pw, mu


@functools.partial(jax.jit, static_argnames=("cfg", "fresh", "attn_len"))
def _row_prefill_jit(params, cfg, tokens, pos0, row_cache, fresh=False,
                     attn_len=None, last_idx=None):
    return model_forward(cfg)(params, cfg, tokens, pos0, row_cache,
                              fresh_prefill=fresh, attn_len=attn_len,
                              last_idx=last_idx)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "attn_len"),
                   donate_argnums=(4, 5))
def _fused_decode_rows(params, cfg, tok, pos, cache, pw, keys,
                       rp, n_steps: int, attn_len=None):
    """Row-batched fused decode for the continuous batcher: tok/pos [R];
    cache row-batched; pw PenaltyWindow; keys typed [R]; rp RowParams.
    Returns (toks [n_steps, R], tok, pos, cache, pw, keys)."""
    from .sampling import penalty_window_push, sample_batched

    def step(carry, _):
        t, p, c, w, k = carry
        logits, c = model_forward(cfg)(params, cfg, t[:, None], p, c,
                                       attn_len=attn_len)
        k2 = jax.vmap(jax.random.split, in_axes=0, out_axes=0)(k)
        k, sub = k2[:, 0], k2[:, 1]
        nxt = sample_batched(logits[:, -1, :], sub, rp, w.counts)
        w = penalty_window_push(w, nxt)
        return (nxt, p + 1, c, w, k), nxt

    (tok, pos, cache, pw, keys), toks = jax.lax.scan(
        step, (tok, pos, cache, pw, keys), None, length=n_steps)
    return toks, tok, pos, cache, pw, keys


class Engine:
    """Single-model inference engine over one device (sharded engines build on
    this via parallel/)."""

    def __init__(self, cfg: LlamaConfig, params: LlamaParams, tokenizer: Tokenizer,
                 max_seq_len: int = 2048, batch_size: int = 1,
                 kv_dtype=jnp.bfloat16, grp_attn_n: int = 1,
                 grp_attn_w: int = 512):
        self.cfg = cfg
        # stack homogeneous layers for lax.scan over layers (one compiled
        # layer body: ~20x faster decode compiles; set LLAMAFILE_TPU_STACK=0
        # to keep the unrolled form)
        import os
        from ..models.llama import stack_layers
        if (os.environ.get("LLAMAFILE_TPU_I8P", "0") == "1"
                and isinstance(params, LlamaParams)):
            # opt-in int8-MXU prefill (two-level scheme): ~2.2x weight HBM
            # residency buys ~2x prefill/TTFT MXU rate; decode unchanged
            from ..models.llama import int8_prefill_params
            params = int8_prefill_params(params)
        if (os.environ.get("LLAMAFILE_TPU_STACK", "1") != "0"
                and isinstance(params, LlamaParams)):
            params = stack_layers(params)
        self.params = params
        self.tokenizer = tokenizer
        # self-extend legitimately runs past the trained context (positions
        # are grouped back into range) — the clamp scales with ga_n
        ctx_limit = cfg.max_context * max(1, grp_attn_n)
        self.max_seq_len = min(max_seq_len, ctx_limit)
        self.batch_size = batch_size
        if isinstance(kv_dtype, str):
            kv_dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16,
                        "f32": jnp.float32, "i8": jnp.int8,
                        "int8": jnp.int8}[kv_dtype]
        self.kv_dtype = kv_dtype
        # recurrent archs (mamba): O(1) state, no attention-window bucketing,
        # and no mid-sequence cache rewind (prefix reuse must be an extension)
        self.recurrent = type(cfg).__name__ == "MambaConfig"
        # group-attention self-extend (reference --grp-attn-n/--grp-attn-w)
        self.grp_attn_n = grp_attn_n
        self.grp_attn_w = grp_attn_w
        # tokens per on-device decode dispatch (stream latency vs dispatch cost)
        self.decode_chunk = 8

    def new_cache(self):
        return model_init_cache(self.cfg)(self.cfg, self.batch_size,
                                          self.max_seq_len, self.kv_dtype)

    # -- row-batched serving hooks (driven by server.batcher.Batcher; the
    # -- TP engine overrides these with shard_map'd equivalents so the
    # -- batcher itself stays topology-agnostic) ----------------------------

    supports_paged = True          # paged KV pool (single-chip pool layout)

    def init_row_cache(self, rows: int, dtype=None):
        """Row-batched KV cache [L, R, S, ...] for the continuous batcher."""
        return model_init_cache(self.cfg)(self.cfg, rows, self.max_seq_len,
                                          dtype or self.kv_dtype)

    def new_row_cache(self, dtype=None):
        """Single-row admission cache [L, 1, S, ...]."""
        return model_init_cache(self.cfg)(self.cfg, 1, self.max_seq_len,
                                          dtype or self.kv_dtype)

    def row_prefill(self, tokens, pos0, row_cache, fresh=False,
                    attn_len=None, last_idx=None):
        return _row_prefill_jit(self.params, self.cfg, tokens, pos0,
                                row_cache, fresh=fresh, attn_len=attn_len,
                                last_idx=last_idx)

    def fused_decode(self, tok, pos, cache, pw, keys, rp, n_steps: int,
                     attn_len=None):
        return _fused_decode_rows(self.params, self.cfg, tok, pos, cache,
                                  pw, keys, rp, n_steps, attn_len=attn_len)

    def prefill(self, cache, token_ids: List[int], pos0: int = 0,
                rope_off: int = 0):
        """Feed prompt tokens; returns (last_logits [V], cache, n_tokens).

        rope_off: subtract from index positions for rope (self-extend)."""
        n = len(token_ids)
        b = bucket_len(n)
        toks = np.zeros((self.batch_size, b), np.int32)
        toks[0, :n] = token_ids
        pos = np.full((self.batch_size,), pos0, np.int32)
        last = jnp.full((self.batch_size,), n - 1, jnp.int32)
        rp = (None if rope_off == 0 else
              jnp.full((self.batch_size,), pos0 - rope_off, jnp.int32))
        logits, cache = _prefill_jit(self.params, self.cfg, jnp.asarray(toks),
                                     jnp.asarray(pos), cache,
                                     fresh=(pos0 == 0), last_idx=last,
                                     rope_pos=rp)
        return logits[0, 0], cache

    def prefill_atoms(self, cache, atoms, pos0: int = 0):
        """Multimodal prefill: atoms = token ids and ImageAtoms (llava embd
        batches, reference: slot.cpp eval_image). Returns (last_logits, cache,
        n_positions)."""
        from .atoms import atom_count
        segs = []
        run: List[int] = []

        def flush():
            if run:
                segs.append(_embed_tokens(self.params, self.cfg,
                                          jnp.asarray(run, jnp.int32)))
                run.clear()

        for a in atoms:
            if isinstance(a, int):
                run.append(a)
            else:
                flush()
                segs.append(jnp.asarray(a.embeds).astype(self.params.tok_embd.dtype))
        flush()
        embeds = jnp.concatenate(segs, axis=0)
        n = embeds.shape[0]
        b = bucket_len(n)
        if b > n:
            embeds = jnp.pad(embeds, ((0, b - n), (0, 0)))
        embeds = embeds[None]
        pos = jnp.full((1,), pos0, jnp.int32)
        logits, cache = _prefill_embeds_jit(
            self.params, self.cfg, embeds, pos, cache, fresh=(pos0 == 0),
            last_idx=jnp.full((1,), n - 1, jnp.int32))
        return logits[0, 0], cache, n

    def step(self, cache, tok, pos, sp: SamplingParams, key, counts=None):
        """One decode step: (next_token [B], cache). tok [B] int32, pos [B]."""
        return _decode_jit(self.params, self.cfg, sp, tok, pos, cache, key, counts)

    def generate(self, prompt: str, max_tokens: int = 128,
                 sampling: Optional[SamplingParams] = None,
                 stop_on_eog: bool = True,
                 prompt_ids: Optional[List[int]] = None,
                 prompt_cache: Optional[str] = None) -> Iterator[Tuple[int, str]]:
        """Stream (token_id, text_piece) pairs.

        prompt_cache: session file (reference main.cpp --prompt-cache /
        llama_state_load_file): reuse the saved KV for the common prompt
        prefix and save the new prompt state after prefill."""
        sp = sampling or SamplingParams()
        ids = prompt_ids if prompt_ids is not None else self.tokenizer.encode(prompt)
        if len(ids) >= self.max_seq_len:
            # keep-length clamped to >= 1: max_tokens >= max_seq_len-1 would
            # otherwise flip the slice sign and skip truncation entirely
            ids = ids[-max(1, self.max_seq_len - max_tokens - 1):]
        max_tokens = min(max_tokens, self.max_seq_len - len(ids))
        cache = self.new_cache()
        se = None
        if self.grp_attn_n > 1:
            # group-attention self-extend: prefill in slices so the position
            # remap fires mid-prompt exactly like the reference slot loop
            from .selfextend import SelfExtend
            se = SelfExtend(self, self.grp_attn_n, self.grp_attn_w)
            fed = 0
            while fed < len(ids):
                sl = ids[fed:fed + 512]
                cache, off = se.advance(cache, len(sl))
                last_logits, cache = self.prefill(cache, sl, pos0=fed,
                                                  rope_off=off)
                fed += len(sl)
        else:
            keep = 0
            if prompt_cache and os.path.exists(prompt_cache) \
                    and self.batch_size == 1:
                try:
                    from .state import load_state
                    c0, hist = load_state(prompt_cache,
                                          max_len=self.max_seq_len)
                    n = min(len(hist), len(ids))
                    while keep < n and hist[keep] == ids[keep]:
                        keep += 1
                    keep = min(keep, len(ids) - 1)   # >=1 token must prefill
                    if keep > 0 and (jax.tree.structure(c0)
                                     == jax.tree.structure(cache)):
                        cache = jax.tree.map(
                            lambda s, d: s.astype(d.dtype), c0, cache)
                    else:
                        keep = 0
                except Exception:
                    keep = 0                         # corrupt file: recompute
            last_logits, cache = self.prefill(cache, ids[keep:], pos0=keep)
            if prompt_cache and self.batch_size == 1 and keep < len(ids):
                from .state import save_state
                save_state(prompt_cache, cache, ids)
        key = jax.random.PRNGKey(sp.seed)
        from .sampling import (mirostat_init, penalty_window_init,
                               penalty_window_push, sample_stateful)
        pw = (penalty_window_init(ids, self.cfg.n_vocab, sp.penalty_last_n)
              if sp.penalized else None)
        key, sub = jax.random.split(key)
        mu = mirostat_init(sp, self.batch_size) if sp.mirostat else None
        tok, mu = sample_stateful(last_logits[None, :], sub, sp,
                                  pw.counts if pw is not None else None, mu)
        pos = jnp.full((self.batch_size,), len(ids), jnp.int32)
        first = int(tok[0])
        if stop_on_eog and self.tokenizer.is_eog(first):
            return
        yield first, self.tokenizer.decode_token(first).decode("utf-8", errors="replace")
        if pw is not None:
            pw = penalty_window_push(pw, tok)
        emitted = 1
        # chunked on-device decode: CHUNK steps per dispatch, streamed after
        while emitted < max_tokens and int(pos[0]) + 1 < self.max_seq_len:
            chunk = min(self.decode_chunk, max_tokens - emitted,
                        self.max_seq_len - 1 - int(pos[0]))
            alen = (None if self.recurrent else
                    attn_bucket(int(pos[0]) + chunk + 1, self.max_seq_len))
            roff = None
            if se is not None:
                cache, off = se.advance(cache, chunk)
                roff = jnp.full((self.batch_size,), off, jnp.int32)
            toks, tok, pos, cache, key, pw, mu = _decode_scan(
                self.params, self.cfg, sp, tok, pos, cache, key, pw, chunk,
                attn_len=alen, mu=mu, rope_off=roff)
            for tid in np.asarray(toks)[0].tolist():
                if stop_on_eog and self.tokenizer.is_eog(tid):
                    return
                yield tid, self.tokenizer.decode_token(tid).decode(
                    "utf-8", errors="replace")
                emitted += 1
                if emitted >= max_tokens:
                    return

    def complete(self, prompt: str, max_tokens: int = 128,
                 sampling: Optional[SamplingParams] = None, **kw) -> str:
        return "".join(piece for _, piece in
                       self.generate(prompt, max_tokens, sampling, **kw))


class ChatSession:
    """Stateful multi-turn wrapper: keeps the KV cache between turns and
    prefills only the prompt suffix beyond the common prefix with the
    previous turn (reference chatbot behavior — llamafile's chatbot keeps
    its llama context across turns instead of re-ingesting the whole
    conversation)."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.cache = engine.new_cache()
        self.ids: List[int] = []
        self.cached_len = 0        # positions actually written to the cache
        self.reused_last = 0       # prefix tokens reused on the last turn

    def generate(self, prompt_ids: List[int], max_tokens: int = 512,
                 sampling: Optional[SamplingParams] = None,
                 stop_on_eog: bool = True) -> Iterator[Tuple[int, str]]:
        from ..server.slots import common_prefix_len
        eng = self.engine
        sp = sampling or SamplingParams()
        ids = list(prompt_ids)
        if len(ids) >= eng.max_seq_len:
            ids = ids[-max(1, eng.max_seq_len - max_tokens - 1):]
        max_tokens = min(max_tokens, eng.max_seq_len - len(ids))
        # the LAST sampled token of a turn is yielded but its K/V is only
        # written when the next step consumes it — reuse can't extend past
        # the positions actually in the cache
        keep = min(common_prefix_len(self.ids, ids), self.cached_len)
        if keep == len(ids):
            keep = len(ids) - 1
        if eng.recurrent and keep < self.cached_len:
            # recurrent state can't rewind to a shorter prefix — reuse only
            # when the new prompt extends everything already in the state
            keep = 0
        if keep == 0:
            self.cache = eng.new_cache()
        self.reused_last = keep
        last_logits, self.cache = eng.prefill(self.cache, ids[keep:],
                                              pos0=keep)
        self.cached_len = len(ids)
        self.ids = list(ids)
        key = jax.random.PRNGKey(sp.seed)
        from .sampling import (mirostat_init, penalty_window_init,
                               penalty_window_push, sample_stateful)
        pw = (penalty_window_init(ids, eng.cfg.n_vocab, sp.penalty_last_n)
              if sp.penalized else None)
        key, sub = jax.random.split(key)
        mu = mirostat_init(sp, eng.batch_size) if sp.mirostat else None
        tok, mu = sample_stateful(last_logits[None, :], sub, sp,
                                  pw.counts if pw is not None else None, mu)
        pos = jnp.full((eng.batch_size,), len(ids), jnp.int32)
        first = int(tok[0])
        if stop_on_eog and eng.tokenizer.is_eog(first):
            return
        self.ids.append(first)
        yield first, eng.tokenizer.decode_token(first).decode(
            "utf-8", errors="replace")
        if pw is not None:
            pw = penalty_window_push(pw, tok)
        emitted = 1
        while emitted < max_tokens and int(pos[0]) + 1 < eng.max_seq_len:
            chunk = min(eng.decode_chunk, max_tokens - emitted,
                        eng.max_seq_len - 1 - int(pos[0]))
            alen = (None if eng.recurrent else
                    attn_bucket(int(pos[0]) + chunk + 1, eng.max_seq_len))
            toks, tok, pos, self.cache, key, pw, mu = _decode_scan(
                eng.params, eng.cfg, sp, tok, pos, self.cache, key, pw,
                chunk, attn_len=alen, mu=mu)
            self.cached_len = int(pos[0])
            for tid in np.asarray(toks)[0].tolist():
                if stop_on_eog and eng.tokenizer.is_eog(tid):
                    return
                self.ids.append(tid)
                yield tid, eng.tokenizer.decode_token(tid).decode(
                    "utf-8", errors="replace")
                emitted += 1
                if emitted >= max_tokens:
                    return


def load_engine(path: str, **kw) -> Engine:
    from ..gguf.reader import GGUFReader
    if GGUFReader(path).architecture == "mamba":
        from ..models.mamba import load_mamba
        cfg, params, tok, _reader = load_mamba(path)
        # recurrent state: no attention window, no KV budget
        kw.setdefault("max_seq_len", cfg.max_context)
        return Engine(cfg, params, tok, **kw)
    from ..models.loader import load_llama
    cfg, params, tok, _reader = load_llama(path)
    return Engine(cfg, params, tok, **kw)
