"""Continuous batcher: one fused decode step across all active requests.

This is the TPU re-design of the old llama.cpp server's continuous batching
(reference: SURVEY.md §2.5b — update_slots accumulates tokens for all active
slots into one llama_batch; llamafiler v2 instead used independent slots). Here
both ideas combine the TPU way:

- a statically-shaped row-batched KV cache [L, R, S, H, D] (R = --slots rows);
- admission prefills a request into its row in PREFILL_CHUNK slices that
  interleave with decode chunks, so a long prompt never stalls active streams
  for more than one slice (reference: server_server.cpp.patch:1731-1762
  interleaves prompt n_batch slices with decode); the row's previous history
  serves as a prefix cache (slot behavior);
- every active row advances together in chunked on-device lax.scan decode with
  per-row positions, per-row sampling params (temperature/top_k/top_p/min_p,
  repeat/presence/frequency penalties over per-row context counts) and
  per-request PRNG streams derived from each request's seed (sample_batched);
- the attention window is bucketed (attn_len) so short sequences never read
  the padded KV tail;
- inactive rows park their write position on a reserved trash slot (S-1) so
  the fused step never corrupts real cache rows. Static shapes throughout: no
  recompiles as requests come and go (admission slices + window buckets hit a
  small closed set of shapes).
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

from ..models.llama import LlamaConfig
from ..runtime.sampling import (PenaltyWindow, RowParams, SamplingParams,
                                penalty_window_init, penalty_window_push,
                                sample_batched)
from .slots import common_prefix_len

DECODE_CHUNK = 8
PREFILL_CHUNK = 512        # admission slice (reference n_batch analog)
PAGE_SIZE = 64             # KV page granularity (paged mode)
PENALTY_RING = 256         # shared ring width (per-row last_n clamps to it)
RELOC_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _reloc_bucket(n: int) -> int:
    for b in RELOC_BUCKETS:
        if n <= b:
            return b
    return RELOC_BUCKETS[-1]


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_row(batch_cache, row_cache, r):
    return jax.tree.map(lambda b, rw: b.at[:, r].set(rw[:, 0]),
                        batch_cache, row_cache)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _set_row_pw(pw, bias, r, row_pw, row_bias):
    """Scatter one row's penalty window + logit-bias table into the batched
    carriers (admission finalize)."""
    return (PenaltyWindow(pw.counts.at[r].set(row_pw.counts[0]),
                          pw.ring.at[r].set(row_pw.ring[0]),
                          pw.rlen.at[r].set(row_pw.rlen[0]),
                          pw.last_n.at[r].set(row_pw.last_n[0])),
            bias.at[r].set(row_bias))


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"),
                   donate_argnums=(4, 6))
def _fused_decode_paged(params, cfg: LlamaConfig, tok, pos, pages, tables,
                        pw, keys, rp, n_steps: int):
    """Paged-cache variant: per-row attention reads only the row's used pages
    (block tables), replacing window bucketing with exact per-row lengths.
    pw: PenaltyWindow over all rows; rp: RowParams per-row sampling knobs."""
    from ..models.llama import forward_paged_decode

    def step(carry, _):
        t, p, pg, w, k = carry
        logits, pg = forward_paged_decode(params, cfg, t, p, pg, tables)
        k2 = jax.vmap(jax.random.split, in_axes=0, out_axes=0)(k)
        k, sub = k2[:, 0], k2[:, 1]
        nxt = sample_batched(logits, sub, rp, w.counts)
        w = penalty_window_push(w, nxt)
        return (nxt, p + 1, pg, w, k), nxt

    (tok, pos, pages, pw, keys), toks = jax.lax.scan(
        step, (tok, pos, pages, pw, keys), None, length=n_steps)
    return toks, tok, pos, pages, pw, keys


@dataclass
class Request:
    ids: List[int]
    sp: SamplingParams
    max_tokens: int
    out: "queue.Queue" = field(default_factory=queue.Queue)
    stop: bool = False                # cooperative cancel
    low_priority: bool = False        # X-Priority: batch (preempted first)
    started: float = 0.0              # admission time (preempt-oldest order)
    preempted: bool = False           # finished by preemption, not EOG/len


@dataclass
class Row:
    history: List[int] = field(default_factory=list)
    pos: int = 0
    req: Optional[Request] = None
    active: bool = False              # False while admission prefill runs
    emitted: int = 0
    last_used: float = 0.0            # LRU tie-break for row selection


@dataclass
class Admission:
    """In-flight chunked prefill (state between loop iterations)."""
    req: Request
    ridx: int
    ids: List[int]
    keep: int
    fed: int = 0
    row_cache: object = None


class Batcher:
    """Background device thread running admission + fused decode."""

    def __init__(self, engine, rows: int = 4, paged: Optional[bool] = None,
                 prefill_chunk: int = PREFILL_CHUNK,
                 preempt_after: float = -1.0):
        self.engine = engine
        self.cfg = engine.cfg
        self.prefill_chunk = prefill_chunk
        self.rows = [Row() for _ in range(rows)]
        self.n_rows = rows
        self.max_len = engine.max_seq_len
        # paged KV is the default (bf16 pages, or int8 pages + scales when
        # the engine's kv_dtype is int8 — the kernel's QuantizedTensor path).
        # Recurrent archs (mamba) have no KV: rows hold the O(1) state pytree,
        # and a finished row's state is invalidated (inactive rows still run
        # through the fused step, so their recurrent state is not reusable —
        # unlike KV rows, which stay valid for prefix-cache affinity).
        self.recurrent = bool(getattr(engine, "recurrent", False))
        # Sharded engines (TPEngine) opt out of the paged pool via
        # supports_paged; MLA rides it with asymmetric k/v page widths.
        can_page = (getattr(engine, "supports_paged", True)
                    and not self.recurrent
                    and not getattr(engine.cfg, "alibi", False))
        if paged is None:
            paged = can_page
        self.paged_mode = paged and can_page
        self._init_device_state()
        self.queue: "queue.Queue[Request]" = queue.Queue()
        # X-Priority: batch requests admit only when the normal queue is empty
        # (reference: client.cpp deprioritization, worker.cpp begin() ordering)
        self.batch_queue: "queue.Queue[Request]" = queue.Queue()
        self.wake = threading.Event()
        # control commands (row state save/restore) execute ON the device
        # thread between steps — they read/mutate self.pages/self.cache,
        # which the loop owns (reference llama_state_seq_* runs on the
        # single llama_context thread for the same reason)
        self.control: "queue.Queue" = queue.Queue()
        self._stop = False
        self._admissions = 0
        self.stats = {"prefilled_tokens": 0, "reused_tokens": 0,
                      "shifted_tokens": 0, "shared_prefix_tokens": 0,
                      "last_chunk": 0, "full_chunks": 0}
        self.admission: Optional[Admission] = None
        # popped-but-unadmitted request (all rows busy): a real slot instead
        # of peeking queue.Queue internals
        self._pending: Optional[Request] = None
        # preempt-oldest-when-busy (reference worker.cpp:59-65 "all threads
        # active! dropping oldest client"): a normal-priority request waiting
        # longer than preempt_after seconds cancels the oldest active stream
        # — deprioritized (X-Priority: batch) streams are dropped first, like
        # the reference's dll_make_last ordering. < 0 disables (default:
        # queueing is the TPU-native behavior; the fixed-thread reference
        # can't queue, so it must kill).
        self.preempt_after = preempt_after
        self._pending_since = 0.0
        self.stats["preempted"] = 0
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _init_device_state(self, seed: int = 0):
        """(Re)build every device-resident array: the KV pool/row cache,
        penalty windows, logit-bias table, per-row PRNG keys. Called at
        construction and by _recover after a device fault."""
        rows = self.n_rows
        if self.paged_mode:
            from ..runtime.paged import PageAllocator, init_paged
            maxp = -(-self.max_len // PAGE_SIZE)
            n_pages = 1 + rows * maxp
            self.pages = init_paged(self.cfg.n_layers, self.cfg.n_kv_heads,
                                    n_pages, PAGE_SIZE, self.cfg.head_dim,
                                    dtype=self.engine.kv_dtype,
                                    v_head_dim=getattr(self.cfg, "v_head_dim",
                                                       0))
            self.alloc = PageAllocator(n_pages, PAGE_SIZE, rows, self.max_len)
            self.cache = None
        else:
            self.cache = self.engine.init_row_cache(rows)
        self.pw = PenaltyWindow(
            jnp.zeros((rows, self.cfg.n_vocab), jnp.float32),
            jnp.zeros((rows, PENALTY_RING), jnp.int32),
            jnp.zeros((rows,), jnp.int32),
            jnp.zeros((rows,), jnp.int32))
        self.bias = jnp.zeros((rows, self.cfg.n_vocab), jnp.float32)
        self.row_keys = jax.random.split(jax.random.PRNGKey(seed), rows)

    # -- public API ---------------------------------------------------------

    def submit(self, ids: List[int], sp: SamplingParams, max_tokens: int,
               low_priority: bool = False) -> Request:
        req = Request(ids=list(ids), sp=sp, max_tokens=max_tokens,
                      low_priority=low_priority)
        (self.batch_queue if low_priority else self.queue).put(req)
        self.wake.set()
        return req

    def save_row(self, ridx: int, path: str) -> dict:
        """Persist an idle row's KV + history (llama_state_seq_save_file
        analog; SURVEY §5 checkpoint/resume). Runs on the device thread."""
        return self._run_control(lambda: self._save_row_sync(ridx, path))

    def restore_row(self, path: str) -> dict:
        """Load a saved sequence into a free row as a warm prefix cache:
        the next request sharing the prompt skips its prefill."""
        return self._run_control(lambda: self._restore_row_sync(path))

    def erase_row(self, ridx: int) -> dict:
        """Drop an idle row's retained prefix cache (slot erase)."""
        return self._run_control(lambda: self._erase_row_sync(ridx))

    def _run_control(self, fn):
        done: "queue.Queue" = queue.Queue()
        self.control.put((fn, done))
        self.wake.set()
        ok, val = done.get()
        if not ok:
            raise val
        return val

    def _save_row_sync(self, ridx: int, path: str) -> dict:
        row = self.rows[ridx]
        if row.req is not None:
            raise RuntimeError(f"row {ridx} is busy")
        if not row.history:
            raise RuntimeError(f"row {ridx} has no cached state")
        if self.recurrent:
            raise RuntimeError("recurrent rows are not saveable "
                               "(state invalidated by parked steps)")
        from ..runtime.state import save_state
        if self.paged_mode:
            from ..runtime.kvcache import KVCache
            from ..runtime.paged import gather_pages_to_row
            k, v = gather_pages_to_row(
                self.pages, jnp.asarray(self.alloc.tables[ridx], jnp.int32),
                ps=PAGE_SIZE, max_len=self.max_len)
            cache = KVCache(k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                            None, None)
        else:
            cache = jax.tree.map(lambda a: a[:, ridx:ridx + 1], self.cache)
        save_state(path, cache, row.history)
        return {"row": ridx, "tokens": len(row.history), "filename": path}

    def _restore_row_sync(self, path: str) -> dict:
        from ..runtime.state import load_state
        cache, hist = load_state(path, max_len=self.max_len)
        if not hist or len(hist) > self.max_len:
            raise RuntimeError("saved state empty or longer than context")
        free = [i for i, r in enumerate(self.rows) if r.req is None]
        if not free:
            raise RuntimeError("all rows busy")
        # prefer overwriting an empty row, then the least-recently-used
        ridx = min(free, key=lambda i: (bool(self.rows[i].history),
                                        self.rows[i].last_used))
        row = self.rows[ridx]
        if self.paged_mode:
            if cache.quantized:
                raise RuntimeError("int8 row state cannot restore into a "
                                   "paged pool (save from paged mode)")
            from ..runtime.paged import copy_row_to_pages
            self.alloc.release(ridx)
            self.alloc.ensure(ridx, len(hist))
            self.alloc.lengths[ridx] = len(hist)
            self.pages = copy_row_to_pages(
                self.pages, cache.k, cache.v,
                jnp.asarray(self.alloc.tables[ridx], jnp.int32),
                ps=PAGE_SIZE)
        else:
            want = jax.tree.structure(self.cache)
            got = jax.tree.structure(cache)
            if want != got:
                raise RuntimeError("saved state quantization does not match "
                                   "this server's --kv-dtype")
            self.cache = _insert_row(self.cache, cache, ridx)
        row.history = list(hist)
        row.pos = len(hist)
        row.active = False
        row.emitted = 0
        row.last_used = time.time()
        return {"row": ridx, "tokens": len(hist), "filename": path}

    def _erase_row_sync(self, ridx: int) -> dict:
        row = self.rows[ridx]
        if row.req is not None:
            raise RuntimeError(f"row {ridx} is busy")
        n = len(row.history)
        row.history = []
        row.pos = 0
        if self.paged_mode:
            self.alloc.release(ridx)
        return {"row": ridx, "erased_tokens": n}

    def shutdown(self):
        self._stop = True
        self.wake.set()
        self.thread.join(timeout=10)

    # -- admission (chunked prefill state machine) --------------------------

    def _req_key(self, req: Request):
        """Per-request PRNG stream: deterministic for an explicit seed,
        unique-per-admission otherwise (seed < 0 = random, reference
        LLAMA_DEFAULT_SEED semantics)."""
        if req.sp.seed < 0:
            return jax.random.fold_in(
                jax.random.PRNGKey(int(time.time_ns()) & 0x7FFFFFFF),
                self._admissions)
        return jax.random.PRNGKey(req.sp.seed)

    def _start_admission(self, req: Request) -> bool:
        free = [r for r in self.rows if r.req is None]
        if not free:
            return False
        # row selection (reference server slot policy): longest matching
        # prefix wins; with no match prefer an EMPTY row over evicting another
        # request's retained prefix cache, then the least-recently-used row
        row = max(free, key=lambda r: (common_prefix_len(r.history, req.ids),
                                       not r.history, -r.last_used))
        row.last_used = time.time()
        ids = req.ids
        if len(ids) >= self.max_len - 2:
            # keep-length clamped >= 1 (see engine.generate): huge max_tokens
            # must not flip the slice sign and skip truncation
            ids = ids[-max(1, self.max_len - req.max_tokens - 2):]
        keep = common_prefix_len(row.history, ids)
        ridx = self.rows.index(row)
        if self.paged_mode:
            keep = self._maybe_share_prefix(ridx, row, ids, keep)
            keep = self._paged_prepare(ridx, row, ids, keep)
        if keep == len(ids):
            keep = len(ids) - 1
        row_dtype = (jnp.bfloat16 if self.paged_mode
                     else self.engine.kv_dtype)
        row_cache = self.engine.new_row_cache(dtype=row_dtype)
        if keep:
            if self.paged_mode:
                from ..runtime.paged import gather_pages_to_row
                self.alloc.truncate(ridx, keep)
                k, v = gather_pages_to_row(
                    self.pages, jnp.asarray(self.alloc.tables[ridx],
                                            jnp.int32),
                    ps=PAGE_SIZE, max_len=self.max_len)
                row_cache = type(row_cache)(k.astype(row_cache.k.dtype),
                                            v.astype(row_cache.v.dtype),
                                            None, None)
            else:
                row_cache = jax.tree.map(
                    lambda rc, bc: rc.at[:, 0].set(bc[:, ridx]),
                    row_cache, self.cache)
        row.req = req
        row.active = False
        req.started = time.time()
        self._admissions += 1
        self.stats["reused_tokens"] += keep
        self.admission = Admission(req, ridx, ids, keep, 0, row_cache)
        return True

    def _maybe_share_prefix(self, ridx: int, row: Row, ids: List[int],
                            keep: int) -> int:
        """Cross-row shared-prefix admission (reference: the system prompt's
        KV is computed once and referenced by every slot,
        server_server.cpp.patch:883,1713-1731): when another row's history
        shares a longer FULL-PAGE prefix with the new prompt than this row
        does, alias the donor's prefix pages into this row's table
        (refcounted, copy-on-write discipline) — the shared span is neither
        recomputed nor copied. Also rounds keep down to a page boundary when
        the boundary page is shared, so later prefill/decode writes never
        land inside an aliased page."""
        ps = PAGE_SIZE
        best, bkeep = None, keep
        for r2 in self.rows:
            if r2 is row or not r2.history:
                continue
            # clamp to len-1: the donor's TRAILING history token (sampled at
            # the end of a decode chunk, or appended on a length-stop close)
            # has no KV written until a later step feeds it — if the new
            # prompt matches the donor's entire history at a page boundary,
            # aliasing that page would attend to an unwritten KV slot
            cmatch = min(common_prefix_len(r2.history, ids),
                         len(r2.history) - 1)
            cfull = (cmatch // ps) * ps
            if cfull > bkeep:
                best, bkeep = r2, cfull
        if best is not None:
            ridx2 = self.rows.index(best)
            self.alloc.release(ridx)
            self.alloc.share_prefix(ridx2, ridx, bkeep // ps)
            row.history = list(ids[:bkeep])
            self.stats["shared_prefix_tokens"] = (
                self.stats.get("shared_prefix_tokens", 0) + bkeep)
            keep = bkeep
        # never keep a PARTIAL boundary page that is aliased: the next
        # prefill would write into it
        kp = keep // ps
        tbl = self.alloc.tables[ridx]
        if keep % ps and kp < len(tbl) and self.alloc.is_shared(tbl[kp]):
            keep = kp * ps
        if keep == 0 and self.alloc.tables[ridx]:
            # nothing reusable: drop the whole table NOW — stale aliased
            # pages would otherwise survive (truncate only runs under
            # `if keep:`) and the write-back masking would divert the
            # freshly computed KV to trash while attention read the
            # donor's old pages
            self.alloc.release(ridx)
            row.history = []
        return keep

    def _paged_prepare(self, ridx: int, row: Row, ids: List[int],
                       keep: int) -> int:
        """Context-shift reuse beyond the common prefix: when the new prompt
        deletes a middle span of the row's history but keeps its suffix
        (reference slot.cpp:291-424), relocate the cached suffix down by the
        delta (rope-shifted K) instead of recomputing it. Returns the new
        keep length."""
        from ..runtime.paged import find_mid_delete, relocate_span
        hit = find_mid_delete(row.history, ids, keep)
        if hit is None:
            return keep
        # relocation WRITES the shifted span starting at position `keep` —
        # refuse when that destination reaches into aliased (shared-prefix)
        # pages (relocate_span has no trash-page masking; it would rewrite
        # the donor's KV in place)
        if keep // PAGE_SIZE < self.alloc.shared_page_count(ridx):
            return keep
        j, reuse = hit
        self.stats["shifted_tokens"] += reuse
        n_move = _reloc_bucket(reuse)
        tables_row = jnp.asarray(
            self.alloc.tables[ridx] + [0] * 4, jnp.int32)
        self.pages = relocate_span(self.pages, self.cfg, tables_row,
                                   jnp.int32(j), jnp.int32(keep),
                                   n_move=n_move)
        row.history = list(ids[:keep + reuse])
        self.alloc.lengths[ridx] = keep + reuse
        return keep + reuse

    def _advance_admission(self):
        """Feed ONE prefill slice; on completion activate the row."""
        from ..runtime.engine import attn_bucket, bucket_len
        a = self.admission
        row = self.rows[a.ridx]
        if a.req.stop:                 # cancelled mid-admission
            a.req.out.put(("done",
                           "preempted" if a.req.preempted else "stop"))
            row.req = None
            self.admission = None
            return
        pos0 = a.keep + a.fed
        new = a.ids[pos0:pos0 + self.prefill_chunk]
        b = bucket_len(len(new))
        toks = np.zeros((1, b), np.int32)
        toks[0, :len(new)] = new
        alen = (None if pos0 == 0 or self.recurrent
                else attn_bucket(pos0 + b + 1, self.max_len))
        logits, a.row_cache = self.engine.row_prefill(
            jnp.asarray(toks), jnp.asarray([pos0], jnp.int32), a.row_cache,
            fresh=(pos0 == 0), attn_len=alen,
            last_idx=jnp.asarray([max(0, len(new) - 1)], jnp.int32))
        a.fed += len(new)
        self.stats["prefilled_tokens"] += len(new)
        if a.keep + a.fed < len(a.ids):
            # stream prefill progress so long prompts aren't silent until the
            # first token (reference x_prefill_progress SSE events,
            # v1_chat_completions.cpp:630-644)
            a.req.out.put(("progress", (a.keep + a.fed, len(a.ids))))
            return                     # more slices to feed
        # finalize: penalty window from the context tail, per-request key,
        # first token
        self.admission = None
        sp = a.req.sp
        row_pw = penalty_window_init(a.ids, self.cfg.n_vocab,
                                     sp.penalty_last_n,
                                     ring_size=PENALTY_RING)
        key = self._req_key(a.req)
        key, sub = jax.random.split(key)
        from ..runtime.sampling import sample
        last = logits[0, 0]          # _row_prefill slices to the last token
        tok0 = int(sample(last[None, :], sub, sp, row_pw.counts)[0])
        row_pw = penalty_window_init(a.ids + [tok0], self.cfg.n_vocab,
                                     sp.penalty_last_n,
                                     ring_size=PENALTY_RING)
        if self.paged_mode:
            from ..runtime.paged import copy_row_to_pages
            self.alloc.ensure(a.ridx, len(a.ids))
            self.alloc.lengths[a.ridx] = len(a.ids)
            # aliased (shared-prefix) pages are read-only: their dense-row
            # values round-tripped from those very pages, so divert their
            # writes to the trash page instead of re-writing shared storage
            tbl = [0 if self.alloc.is_shared(p) else p
                   for p in self.alloc.tables[a.ridx]]
            self.pages = copy_row_to_pages(
                self.pages, a.row_cache.k, a.row_cache.v,
                jnp.asarray(tbl, jnp.int32), ps=PAGE_SIZE)
        else:
            self.cache = _insert_row(self.cache, a.row_cache, a.ridx)
        bias_row = np.zeros((self.cfg.n_vocab,), np.float32)
        for t, x in sp.logit_bias:
            if 0 <= t < self.cfg.n_vocab:
                bias_row[t] += x
        self.pw, self.bias = _set_row_pw(self.pw, self.bias, a.ridx, row_pw,
                                         jnp.asarray(bias_row))
        self.row_keys = self.row_keys.at[a.ridx].set(key)
        row.history = list(a.ids)
        row.pos = len(a.ids)
        row.emitted = 0
        row.active = True
        self._deliver(row, tok0)

    def _preempt_oldest(self):
        """Drop the oldest active stream to make room (reference
        worker.cpp:59-65). Victim order: deprioritized batch streams first,
        then earliest-admitted. The cancel lands within the current decode
        chunk (<=2 tokens when a lone row streams)."""
        victims = [r for r in self.rows
                   if r.req is not None and not r.req.stop]
        if not victims:
            return
        v = min(victims, key=lambda r: (not r.req.low_priority,
                                        r.req.started))
        v.req.preempted = True
        v.req.stop = True
        self.stats["preempted"] += 1

    def _deliver(self, row: Row, tid: int):
        req = row.req
        tok = self.engine.tokenizer
        if tok.is_eog(tid) or row.pos + 1 >= self.max_len \
                or row.emitted + 1 > req.max_tokens or req.stop:
            reason = ("preempted" if req.preempted
                      else "stop" if tok.is_eog(tid) else "length")
            if not tok.is_eog(tid) and row.emitted < req.max_tokens and not req.stop:
                # emit the last token before closing on length
                row.history.append(tid)
                row.emitted += 1
                req.out.put(("token", tid))
            req.out.put(("done", reason))
            row.req = None
            row.active = False
            if self.recurrent:
                # the row's state keeps mutating while parked in the fused
                # step — it no longer corresponds to any token history
                row.history = []
                row.pos = 0
            return
        row.history.append(tid)
        row.pos += 1
        row.emitted += 1
        req.out.put(("token", tid))

    # -- device loop --------------------------------------------------------

    def _loop(self):
        from ..utils.crash import _is_device_fault
        while not self._stop:
            while not self.control.empty():
                fn, done = self.control.get()
                try:
                    done.put((True, fn()))
                except Exception as e:      # surface to the caller, keep loop
                    done.put((False, e))
            try:
                self._tick()
            except Exception as e:          # noqa: BLE001 — classified below
                if not _is_device_fault(e):
                    raise
                self._recover(e)
        while not self.control.empty():    # don't strand a waiting caller
            _fn, done = self.control.get()
            done.put((False, RuntimeError("batcher shut down")))

    def _recover(self, err: BaseException):
        """Slice-restart seed (SURVEY §5 failure handling; crash.py is the
        request-boundary analog): a device fault mid-step poisons the
        device-resident state but not the host bookkeeping. Rebuild the
        device arrays and re-queue every interrupted request FROM ITS
        HOST-SIDE TOKEN HISTORY into the same client stream — already-
        emitted tokens are not resent, the continuation re-prefills and
        resumes; clients see a pause, not an error."""
        import sys
        print(f"batcher: device fault mid-step — recovering "
              f"({str(err)[:200]})", file=sys.stderr, flush=True)
        requeue: List[Request] = []
        if self.admission is not None:     # prefill restarts from scratch
            requeue.append(self.admission.req)
            self.admission = None
        for r in self.rows:
            if r.req is not None:
                req = r.req
                req.ids = list(r.history)  # prompt + already-emitted tokens
                req.max_tokens = max(1, req.max_tokens - r.emitted)
                requeue.append(req)
            r.req = None
            r.active = False
            r.history = []                 # cached KV is gone with the device
            r.pos = 0
            r.emitted = 0
        if self._pending is not None:
            requeue.append(self._pending)
            self._pending = None
        self._init_device_state(seed=int(time.time()) & 0x7FFFFFFF)
        self.stats["recoveries"] = self.stats.get("recoveries", 0) + 1
        for req in requeue:
            if not req.stop:
                self.queue.put(req)
        self.wake.set()

    def _tick(self):
        from ..runtime.engine import attn_bucket
        # start a new admission when none is in flight (normal queue
        # first, then the deprioritized batch queue)
        if self.admission is None:
            if self._pending is None:
                if not self.queue.empty():
                    self._pending = self.queue.get()
                elif not self.batch_queue.empty():
                    self._pending = self.batch_queue.get()
                if self._pending is not None:
                    self._pending_since = time.time()
            if self._pending is not None and self._pending.stop:
                self._pending.out.put(("done", "stop"))
                self._pending = None
            if self._pending is not None:
                if self._start_admission(self._pending):
                    self._pending = None
                elif (self.preempt_after >= 0
                      and not self._pending.low_priority
                      and time.time() - self._pending_since
                      >= self.preempt_after):
                    self._preempt_oldest()
        # one prefill slice per iteration — decode interleaves below
        if self.admission is not None:
            self._advance_admission()
        active = [i for i, r in enumerate(self.rows)
                  if r.req is not None and r.active]
        if not active:
            if self.admission is None:
                self.wake.wait(timeout=0.05)
                self.wake.clear()
            return
        # fused decode chunk over ALL rows (inactive rows park: dense
        # mode on the trash slot S-1, paged mode on the trash page 0).
        # Adaptive chunking: a lone stream with nothing queued gets
        # 2-token chunks (SSE latency + at most 1 wasted token past EOG);
        # concurrent load amortizes dispatch over the full chunk.
        lone = (len(active) == 1 and self.admission is None
                and self._pending is None and self.queue.empty()
                and self.batch_queue.empty())
        chunk = 2 if lone else DECODE_CHUNK
        self.stats["last_chunk"] = chunk
        if chunk == DECODE_CHUNK:
            self.stats["full_chunks"] += 1
        tok = np.zeros((self.n_rows,), np.int32)
        park = 0 if self.paged_mode else self.max_len - 1
        pos = np.full((self.n_rows,), park, np.int32)
        # parked rows sample greedily over trash logits (output discarded)
        parked = SamplingParams(temperature=0.0)
        sps = [parked] * self.n_rows
        for i in active:
            r = self.rows[i]
            tok[i] = r.history[-1]
            pos[i] = r.pos - 1          # position of the last token
            sps[i] = r.req.sp
        from ..runtime.sampling import row_params_from_sp
        rp = row_params_from_sp(sps, self.cfg.n_vocab)
        # per-request logit_bias lives in the device-resident table
        # (scattered at admission) — not rebuilt per chunk
        rp = rp._replace(bias=self.bias)
        if self.paged_mode:
            # pre-allocate pages covering the whole chunk per active row
            for i in active:
                self.alloc.ensure(i, self.rows[i].pos + chunk + 1)
            # parked (inactive) rows keep their real tables host-side for
            # prefix reuse, but the device copy must NOT expose them: a
            # parked row writes at pos=0..chunk, and a live first page
            # there would be overwritten with garbage KV that a later
            # prefix-reusing admission would silently inherit. Zeroed
            # entries resolve to the reserved trash page 0.
            tables = self.alloc.device_tables(
                self.n_rows, only_rows=active)
            toks, _t, _p, self.pages, self.pw, self.row_keys = \
                _fused_decode_paged(
                    self.engine.params, self.cfg, jnp.asarray(tok),
                    jnp.asarray(pos), self.pages, tables, self.pw,
                    self.row_keys, rp, chunk)
        else:
            alen = (None if self.recurrent else
                    attn_bucket(int(pos[active].max()) + chunk + 1,
                                self.max_len))
            toks, _t, _p, self.cache, self.pw, self.row_keys = \
                self.engine.fused_decode(
                    jnp.asarray(tok), jnp.asarray(pos), self.cache,
                    self.pw, self.row_keys, rp, chunk,
                    attn_len=alen)
        host_toks = np.asarray(toks)     # [chunk, R]
        for step in range(chunk):
            for i in active:
                row = self.rows[i]
                if row.req is None:
                    continue
                self._deliver(row, int(host_toks[step, i]))
        if self.paged_mode:
            for i in active:
                self.alloc.lengths[i] = max(self.alloc.lengths[i],
                                            self.rows[i].pos)

    def describe(self):
        rows = [{"row": i, "busy": r.req is not None,
                 "history_tokens": len(r.history), "pos": r.pos}
                for i, r in enumerate(self.rows)]
        if self.paged_mode:
            for i, row in enumerate(rows):
                row["pages"] = len(self.alloc.tables[i])
        return rows

    def describe_stats(self):
        out = dict(self.stats)
        if self.paged_mode:
            out["free_pages"] = len(self.alloc.free)
            out["page_size"] = PAGE_SIZE
        return out
