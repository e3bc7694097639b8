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

    embed_many: List[str] -> List[vector] (one padded batched forward).
    window_ms: how long the collector waits for more requests after the
    first one arrives (2 ms default — well under the reference's 12.66 ms
    p50, and one decode-step of latency at most)."""

    def __init__(self, embed_many: Callable[[List[str]], list],
                 max_batch: int = MAX_BATCH, window_ms: float = 2.0):
        self.embed_many = embed_many
        self.max_batch = max_batch
        self.window_ms = window_ms
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "texts": 0}
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def embed(self, texts: List[str]) -> list:
        """Blocking: returns one vector per text (called from pool threads)."""
        if not texts:
            return []
        p = _Pending(list(texts))
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
            first = self.q.get()
            if first is None:
                return
            batch = [first]
            n = len(first.texts)
            deadline = time.time() + self.window_ms / 1000.0
            while n < self.max_batch:
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
            texts = [t for p in batch for t in p.texts]
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["texts"] += len(texts)
            try:
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
                    p.event.set()


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

    def embed_many(texts: List[str]) -> list:
        idl = [engine.tokenizer.encode(t)[: engine.max_seq_len - 1]
               for t in texts]
        t = bucket_len(max(1, max(len(i) for i in idl)))
        bb = batch_bucket(len(texts))
        toks = np.zeros((bb, t), np.int32)
        lens = np.ones((bb,), np.int32)     # pad rows: avoid 0-div in the mean
        for r, ids in enumerate(idl):
            toks[r, : len(ids)] = ids
            lens[r] = max(1, len(ids))
        cache = init_cache(engine.cfg, bb, t)
        v = np.asarray(_pooled_jit(engine.params, engine.cfg,
                                   jnp.asarray(toks), jnp.asarray(lens),
                                   cache), np.float64)   # [bb, d] only
        return v[: len(texts)].tolist()

    return embed_many


def bert_embed_many(bert) -> Callable[[List[str]], list]:
    """Pad the batch dim to a bucket so the jit cache stays bounded."""
    def embed_many(texts: List[str]) -> list:
        bb = batch_bucket(len(texts))
        padded = texts + [""] * (bb - len(texts))
        return bert.embed(padded).tolist()[: len(texts)]

    return embed_many
