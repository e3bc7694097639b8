"""Continuous batcher: one fused decode step across all active requests.

This is the TPU re-design of the old llama.cpp server's continuous batching
(reference: SURVEY.md §2.5b — update_slots accumulates tokens for all active
slots into one llama_batch; llamafiler v2 instead used independent slots). Here
both ideas combine the TPU way:

- a statically-shaped row-batched KV cache [L, R, S, H, D] (R = --slots rows);
- admission prefills a request into its row (single-row forward + row insert),
  reusing the row's previous history as a prefix cache (slot behavior);
- every active row advances together in chunked on-device lax.scan decode with
  per-row positions and per-row sampling params (sample_batched);
- inactive rows park their write position on a reserved trash slot (S-1) so
  the fused step never corrupts real cache rows. Static shapes throughout: no
  recompiles as requests come and go.
"""
from __future__ import annotations

import functools
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, forward, init_cache
from ..runtime.sampling import SamplingParams, sample_batched
from .slots import common_prefix_len

DECODE_CHUNK = 8


@functools.partial(jax.jit, static_argnames=("cfg", "fresh"))
def _row_prefill(params, cfg, tokens, pos0, row_cache, fresh=False):
    return forward(params, cfg, tokens, pos0, row_cache, fresh_prefill=fresh)


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_row(batch_cache, row_cache, r):
    return jax.tree.map(lambda b, rw: b.at[:, r].set(rw[:, 0]),
                        batch_cache, row_cache)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"), donate_argnums=(4,))
def _fused_decode(params, cfg: LlamaConfig, tok, pos, cache, keys,
                  temps, top_ps, min_ps, n_steps: int):
    """tok/pos [R]; cache row-batched; keys typed [R]. Returns toks [n_steps, R]."""
    def step(carry, _):
        t, p, c, k = carry
        logits, c = forward(params, cfg, t[:, None], p, c)
        k2 = jax.vmap(jax.random.split, in_axes=0, out_axes=0)(k)
        k, sub = k2[:, 0], k2[:, 1]
        nxt = sample_batched(logits[:, -1, :], sub, temps, top_ps, min_ps)
        return (nxt, p + 1, c, k), nxt

    (tok, pos, cache, keys), toks = jax.lax.scan(
        step, (tok, pos, cache, keys), None, length=n_steps)
    return toks, tok, pos, cache, keys


@dataclass
class Request:
    ids: List[int]
    sp: SamplingParams
    max_tokens: int
    out: "queue.Queue" = field(default_factory=queue.Queue)
    stop: bool = False                # cooperative cancel


@dataclass
class Row:
    history: List[int] = field(default_factory=list)
    pos: int = 0
    req: Optional[Request] = None
    emitted: int = 0


class Batcher:
    """Background device thread running admission + fused decode."""

    def __init__(self, engine, rows: int = 4):
        self.engine = engine
        self.cfg = engine.cfg
        self.rows = [Row() for _ in range(rows)]
        self.n_rows = rows
        self.max_len = engine.max_seq_len
        self.cache = init_cache(self.cfg, rows, self.max_len, engine.kv_dtype)
        self.queue: "queue.Queue[Request]" = queue.Queue()
        # X-Priority: batch requests admit only when the normal queue is empty
        # (reference: client.cpp deprioritization, worker.cpp begin() ordering)
        self.batch_queue: "queue.Queue[Request]" = queue.Queue()
        self.wake = threading.Event()
        self._stop = False
        self._key = jax.random.PRNGKey(0)
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    # -- public API ---------------------------------------------------------

    def submit(self, ids: List[int], sp: SamplingParams, max_tokens: int,
               low_priority: bool = False) -> Request:
        req = Request(ids=list(ids), sp=sp, max_tokens=max_tokens)
        (self.batch_queue if low_priority else self.queue).put(req)
        self.wake.set()
        return req

    def shutdown(self):
        self._stop = True
        self.wake.set()
        self.thread.join(timeout=10)

    # -- device loop --------------------------------------------------------

    def _admit_one(self, req: Request) -> bool:
        free = [r for r in self.rows if r.req is None]
        if not free:
            return False
        row = max(free, key=lambda r: common_prefix_len(r.history, req.ids))
        ids = req.ids
        if len(ids) >= self.max_len - 2:
            # keep-length clamped >= 1 (see engine.generate): huge max_tokens
            # must not flip the slice sign and skip truncation
            ids = ids[-max(1, self.max_len - req.max_tokens - 2):]
        keep = common_prefix_len(row.history, ids)
        if keep == len(ids):
            keep = len(ids) - 1
        new = ids[keep:]
        # single-row prefill into a fresh row cache, then insert into the batch
        from ..runtime.engine import bucket_len
        b = bucket_len(len(new))
        toks = np.zeros((1, b), np.int32)
        toks[0, : len(new)] = new
        row_cache = init_cache(self.cfg, 1, self.max_len, self.engine.kv_dtype)
        ridx = self.rows.index(row)
        if keep:
            row_cache = jax.tree.map(
                lambda rc, bc: rc.at[:, 0].set(bc[:, ridx]),
                row_cache, self.cache)
        logits, row_cache = _row_prefill(
            self.engine.params, self.cfg, jnp.asarray(toks),
            jnp.asarray([keep], jnp.int32), row_cache, fresh=(keep == 0))
        self.cache = _insert_row(self.cache, row_cache, ridx)
        row.req = req
        row.history = list(ids)
        row.pos = len(ids)
        row.emitted = 0
        # emit the first sampled token
        last = logits[0, len(new) - 1]
        self._key, sub = jax.random.split(self._key)
        from ..runtime.sampling import sample
        tok0 = int(sample(last[None, :], sub, req.sp)[0])
        self._deliver(row, tok0)
        return True

    def _deliver(self, row: Row, tid: int):
        req = row.req
        tok = self.engine.tokenizer
        if tok.is_eog(tid) or row.pos + 1 >= self.max_len \
                or row.emitted + 1 > req.max_tokens or req.stop:
            reason = "stop" if tok.is_eog(tid) else "length"
            if not tok.is_eog(tid) and row.emitted < req.max_tokens and not req.stop:
                # emit the last token before closing on length
                row.history.append(tid)
                row.emitted += 1
                req.out.put(("token", tid))
            req.out.put(("done", reason))
            row.req = None
            return
        row.history.append(tid)
        row.pos += 1
        row.emitted += 1
        req.out.put(("token", tid))

    def _loop(self):
        while not self._stop:
            # admission: normal queue first, then deprioritized batch queue
            admitted = False
            while not self.queue.empty():
                if not self._admit_one(self.queue.queue[0]):
                    break
                self.queue.get()
                admitted = True
            while self.queue.empty() and not self.batch_queue.empty():
                if not self._admit_one(self.batch_queue.queue[0]):
                    break
                self.batch_queue.get()
                admitted = True
            active = [i for i, r in enumerate(self.rows) if r.req is not None]
            if not active:
                self.wake.wait(timeout=0.05)
                self.wake.clear()
                continue
            # fused decode chunk over ALL rows (inactive park on trash slot)
            tok = np.zeros((self.n_rows,), np.int32)
            pos = np.full((self.n_rows,), self.max_len - 1, np.int32)
            temps = np.zeros((self.n_rows,), np.float32)
            top_ps = np.ones((self.n_rows,), np.float32)
            min_ps = np.zeros((self.n_rows,), np.float32)
            for i in active:
                r = self.rows[i]
                tok[i] = r.history[-1]
                pos[i] = r.pos - 1          # position of the last token
                temps[i] = r.req.sp.temperature
                top_ps[i] = r.req.sp.top_p
                min_ps[i] = r.req.sp.min_p
            self._key, sub = jax.random.split(self._key)
            keys = jax.random.split(sub, self.n_rows)
            toks, _t, _p, self.cache, _k = _fused_decode(
                self.engine.params, self.cfg, jnp.asarray(tok),
                jnp.asarray(pos), self.cache, keys,
                jnp.asarray(temps), jnp.asarray(top_ps), jnp.asarray(min_ps),
                DECODE_CHUNK)
            host_toks = np.asarray(toks)     # [chunk, R]
            for step in range(DECODE_CHUNK):
                for i in active:
                    row = self.rows[i]
                    if row.req is None:
                        continue
                    self._deliver(row, int(host_toks[step, i]))

    def describe(self):
        return [{"row": i, "busy": r.req is not None,
                 "history_tokens": len(r.history), "pos": r.pos}
                for i, r in enumerate(self.rows)]
