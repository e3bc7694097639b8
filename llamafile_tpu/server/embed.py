"""Cross-request embedding micro-batcher.

The reference's headline serving number is 2,427 req/s on /embedding with
50-token prompts (llamafile/server/doc/technical_details.md:9-47) — earned
with many CPU worker threads. The TPU equivalent is batch width, not threads:
concurrent requests collect into ONE padded forward per tick (length- and
batch-bucketed so the jit cache stays small), and each request gets its slice
of the result. A single MXU pass over [64, T] costs barely more than [1, T],
so throughput scales with concurrency until the batch bucket saturates.
"""
from __future__ import annotations

import functools
import queue
import threading
import time
from typing import Callable, List, Optional

import numpy as np

BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
MAX_BATCH = BATCH_BUCKETS[-1]


def batch_bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    return MAX_BATCH


class _Pending:
    __slots__ = ("texts", "event", "result", "error")

    def __init__(self, texts):
        self.texts = texts
        self.event = threading.Event()
        self.result: Optional[list] = None
        self.error: Optional[BaseException] = None


class EmbedBatcher:
    """Collects concurrent embed() calls into one forward per tick.

    embed_many: List[str|ids] -> List[vector] (one padded batched forward).
    tokenize: when given, embed() pre-tokenizes in the CALLER's thread —
    the pool's request threads parallelize tokenization instead of the
    single collector thread serializing it in front of the device step.
    window_ms: extra wait for stragglers after the first request (2 ms
    default); while the device executes a batch, new arrivals pile in the
    queue and the next tick DRAINS them all at once, so steady-state
    batches grow to the concurrency level without added latency."""

    def __init__(self, embed_many: Callable[[List[str]], list],
                 max_batch: int = MAX_BATCH, window_ms: float = 2.0,
                 tokenize: Optional[Callable[[str], list]] = None):
        self.embed_many = embed_many
        self.max_batch = max_batch
        self.window_ms = window_ms
        self.tokenize = tokenize
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "texts": 0}
        self._stop = False
        self._carry: List[_Pending] = []   # overflow past a bucket boundary
        self._prev = None                  # pipelined batch awaiting pull
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def embed(self, texts: List[str]) -> list:
        """Blocking: returns one vector per text (called from pool threads)."""
        if not texts:
            return []
        items = ([self.tokenize(t) for t in texts] if self.tokenize
                 else list(texts))
        p = _Pending(items)
        self.q.put(p)
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    def shutdown(self):
        self._stop = True
        self.q.put(None)
        self._thread.join(timeout=5)

    def _loop(self):
        while not self._stop:
            if self._carry:
                batch = self._carry
                self._carry = []
                n = sum(len(p.texts) for p in batch)
            else:
                try:
                    first = self.q.get_nowait()
                except queue.Empty:
                    # going idle: flush the pipelined batch before blocking
                    if self._prev is not None:
                        self._finalize(*self._prev)
                    first = self.q.get()
                if first is None:
                    break
                batch = [first]
                n = len(first.texts)
            # drain whatever piled up while the previous batch computed,
            # then wait at most window_ms for stragglers
            deadline = time.time() + self.window_ms / 1000.0
            while n < self.max_batch:
                try:
                    p = self.q.get_nowait()
                except queue.Empty:
                    left = deadline - time.time()
                    if left <= 0:
                        break
                    try:
                        p = self.q.get(timeout=left)
                    except queue.Empty:
                        break
                if p is None:
                    self._stop = True
                    break
                batch.append(p)
                n += len(p.texts)
            # split at the floor bucket: a 34-text batch would pad to the
            # 64 bucket (47% dead MXU rows) — dispatch an exact 32 and roll
            # the rest into the IMMEDIATE next tick, which also drains any
            # new arrivals (steady state converges to exact buckets)
            floor_b = max((b for b in BATCH_BUCKETS if b <= n), default=n)
            if n > floor_b:
                take, cnt = [], 0
                for i, p in enumerate(batch):
                    if cnt + len(p.texts) > floor_b and cnt > 0:
                        self._carry = batch[i:]
                        batch, n = take, cnt
                        break
                    take.append(p)
                    cnt += len(p.texts)
            texts = [t for p in batch for t in p.texts]
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["texts"] += len(texts)
            dev_fn = getattr(self.embed_many, "device", None)
            try:
                if dev_fn is not None:
                    # PIPELINED: dispatch this batch's compute (async under
                    # jax), then finalize the PREVIOUS batch — its
                    # device->host pull and waiter wakeups overlap with the
                    # device executing the current batch
                    vecs = dev_fn(texts)
                    if self._prev is not None:
                        self._finalize(*self._prev)
                    self._prev = (batch, vecs)
                    continue
                vecs = self.embed_many(texts)
                i = 0
                for p in batch:
                    p.result = list(vecs[i:i + len(p.texts)])
                    i += len(p.texts)
            except BaseException as e:          # deliver, don't kill the loop
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    if not p.event.is_set() and (p.result is not None
                                                 or p.error is not None):
                        p.event.set()
        if self._prev is not None:
            self._finalize(*self._prev)
            self._prev = None
        if self._carry:                 # overflow rolled past shutdown:
            # fail them loudly rather than leaving embed() callers blocked
            for p in self._carry:
                p.error = RuntimeError("EmbedBatcher shut down")
                p.event.set()
            self._carry = []

    def _finalize(self, batch, vecs):
        try:
            a = np.asarray(vecs, np.float64)
            i = 0
            for p in batch:
                p.result = a[i:i + len(p.texts)].tolist()
                i += len(p.texts)
        except BaseException as e:
            for p in batch:
                p.error = e
        finally:
            for p in batch:
                p.event.set()
            self._prev = None


@functools.partial(__import__("jax").jit, static_argnames=("cfg",))
def _pooled_jit(params, cfg, tokens, lens, cache):
    """Masked-mean + unit-normalize ON DEVICE: only [B, d] crosses the
    host link (the [B, T, d] hidden tensor is ~T x larger — on a tethered
    TPU the transfer dominated the whole request, measured 9 req/s)."""
    import jax.numpy as jnp

    from ..models.llama import forward
    b, t = tokens.shape
    hidden, _ = forward(params, cfg, tokens,
                        jnp.zeros((b,), jnp.int32), cache,
                        return_hidden=True, fresh_prefill=True)
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    # f32 accumulation (not the reference's f64 host pooling): for T<=8192
    # and unit-scale hiddens the masked-mean roundoff is ~1e-6 relative,
    # far under embedding-retrieval tolerance; normalization re-scales any
    # shared error. Accepted precision trade for on-device pooling.
    v = (hidden * mask[:, :, None]).sum(1) / mask.sum(1)[:, None]
    return v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)


def llama_embed_many(engine) -> Callable[[List[str]], list]:
    """Batched causal-LM embeddings: ONE padded forward for the whole batch
    (masked mean over each row's real tokens, unit-normalized — reference
    server embedding.cpp:44-57 semantics), replacing round 2's
    one-text-per-forward loop with a fresh cache per call."""
    import jax.numpy as jnp

    from ..models.llama import init_cache
    from ..runtime.engine import bucket_len

    caches = {}                  # (bb, t) -> reusable zero cache: forward is
    #                              functional, so the input cache is never
    #                              mutated; re-allocating one per batch cost
    #                              a device roundtrip on a tethered chip

    def _device(texts: List[str]):
        """One padded batched forward -> DEVICE [n, d] (async under jax:
        returns before the TPU finishes, so the batcher can overlap the
        previous batch's host pull with this batch's compute)."""
        idl = [t if isinstance(t, list) else
               engine.tokenizer.encode(t)[: engine.max_seq_len - 1]
               for t in texts]
        idl = [i[: engine.max_seq_len - 1] for i in idl]
        t = bucket_len(max(1, max(len(i) for i in idl)))
        bb = batch_bucket(len(texts))
        toks = np.zeros((bb, t), np.int32)
        lens = np.ones((bb,), np.int32)     # pad rows: avoid 0-div in the mean
        for r, ids in enumerate(idl):
            toks[r, : len(ids)] = ids
            lens[r] = max(1, len(ids))
        if (bb, t) not in caches:
            caches[(bb, t)] = init_cache(engine.cfg, bb, t)
        v = _pooled_jit(engine.params, engine.cfg, jnp.asarray(toks),
                        jnp.asarray(lens), caches[(bb, t)])       # [bb, d]
        return v[: len(texts)]

    def embed_many(texts: List[str]) -> list:
        return np.asarray(_device(texts), np.float64).tolist()

    embed_many.device = _device
    return embed_many


def bert_embed_many(bert) -> Callable[[List[str]], list]:
    """Pad the batch dim to a bucket so the jit cache stays bounded."""
    def embed_many(texts: List[str]) -> list:
        bb = batch_bucket(len(texts))
        padded = texts + [""] * (bb - len(texts))
        return bert.embed(padded).tolist()[: len(texts)]

    return embed_many
