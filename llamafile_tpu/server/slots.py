"""Slot scoring algorithms + a standalone slot manager.

Serving goes through server/batcher.py (the continuous batcher owns rows,
prefix reuse and preemption); this module remains the home of the shared
`common_prefix_len` helper and a self-contained Slots manager that unit
tests exercise for the reference take/give scoring semantics.

Behavioral port of llamafiler's Slot/Slots (reference: llamafile/server/
slot.cpp:291-424 `prefill` with common-prefix keep, slots.cpp:76-140 take/give
scoring: LRU decay + common-prefix length). TPU adaptation: the KV cache is a
functional device array per slot; "keep" means starting evaluation at the
common-prefix boundary — positions never move, so the reference's mid-delete
context-shift (llama_kv_cache_seq_rm + seq_add relocation) is replaced by
prefix-only reuse + client-side message forgetting (v1_chat_completions.cpp:565
behavior lives in the endpoint layer).
"""
from __future__ import annotations

import threading
import time
from typing import List, Optional, Tuple

import numpy as np


def common_prefix_len(a: List[int], b: List[int]) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


class Slot:
    def __init__(self, sid: int, engine):
        self.id = sid
        self.engine = engine
        self.cache = engine.new_cache()
        self.history: List[int] = []       # token ids whose KV is materialized
        self.last_used = 0.0
        self.busy = False

    def prefill(self, ids: List[int]) -> Tuple[object, int]:
        """Evaluate `ids`, reusing the cached common prefix.

        Returns (last_logits, n_reused). Evaluates at least the final token so
        the caller always gets logits for ids[-1].
        """
        keep = common_prefix_len(self.history, ids)
        if keep == len(ids):
            keep = len(ids) - 1            # force re-eval of the last token
        new = ids[keep:]
        logits, self.cache = self.engine.prefill(self.cache, new, pos0=keep)
        self.history = list(ids)
        return logits, keep

    def append_token(self, tid: int) -> None:
        self.history.append(tid)


class Slots:
    """Pool with prefix-affinity take()/give() and condvar blocking
    (reference semantics: slots.cpp:76-140)."""

    def __init__(self, engine, count: int):
        self.slots = [Slot(i, engine) for i in range(count)]
        self.cv = threading.Condition()

    def take(self, ids: List[int]) -> Slot:
        with self.cv:
            while True:
                free = [s for s in self.slots if not s.busy]
                if free:
                    def score(s: Slot):
                        return (common_prefix_len(s.history, ids),
                                -s.last_used)   # prefer prefix match, then LRU
                    best = max(free, key=score)
                    best.busy = True
                    return best
                self.cv.wait()

    def give(self, slot: Slot) -> None:
        with self.cv:
            slot.busy = False
            slot.last_used = time.time()
            self.cv.notify()

    def describe(self) -> list:
        return [{
            "id": s.id,
            "busy": s.busy,
            "history_tokens": len(s.history),
            "last_used": s.last_used,
        } for s in self.slots]
