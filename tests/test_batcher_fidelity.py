"""Batched-path sampling fidelity + admission scheduling.

VERDICT r1 weak #3/#4: the fused continuous-batching path must honor
per-request top_k / penalties / seed (reference sampling chain,
llamafile-files/sampling.cpp), and a long admission prefill must not stall
active decode streams (reference: server_server.cpp.patch:1731-1762 interleaves
prompt slices with decode).
"""
import queue
import time

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.runtime.engine import Engine
from llamafile_tpu.runtime.sampling import SamplingParams
from llamafile_tpu.server.batcher import Batcher
from tests.util_models import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    make_tiny_llama_gguf(str(path))
    cfg, params, tok, _ = load_llama(str(path))
    return Engine(cfg, params, tok, max_seq_len=192)


def _collect(req, timeout=120):
    toks = []
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            kind, val = req.out.get(timeout=timeout)
        except queue.Empty:
            break
        if kind == "token":
            toks.append(val)
        elif kind == "done":
            return toks, val
    raise TimeoutError(f"incomplete: {toks}")


def test_seeded_reproducibility_batched(engine):
    b = Batcher(engine, rows=2)
    try:
        sp = SamplingParams(temperature=1.0, top_k=0, seed=1234)
        ids = [1, 5, 9, 13]
        t1, _ = _collect(b.submit(ids, sp, 8))
        t2, _ = _collect(b.submit(ids, sp, 8))
        assert t1 == t2, (t1, t2)
        # a different seed must (overwhelmingly) give a different stream
        t3, _ = _collect(b.submit(ids, SamplingParams(
            temperature=1.0, top_k=0, seed=999), 8))
        assert t1 != t3
    finally:
        b.shutdown()


def test_per_row_top_k_respected(engine):
    """top_k=1 at temp>0 must equal greedy decoding of the same context."""
    b = Batcher(engine, rows=2)
    try:
        ids = [2, 4, 6, 8]
        tk1, _ = _collect(b.submit(ids, SamplingParams(
            temperature=1.3, top_k=1, seed=7), 6))
        greedy, _ = _collect(b.submit(ids, SamplingParams(temperature=0.0), 6))
        assert tk1 == greedy, (tk1, greedy)
    finally:
        b.shutdown()


def test_penalties_apply_on_batched_path(engine):
    """A huge repeat+presence penalty must prevent immediate repetition of
    a greedy loop token (compare with penalty off)."""
    b = Batcher(engine, rows=1)
    try:
        ids = [3, 3, 3, 3, 3, 3]
        base, _ = _collect(b.submit(ids, SamplingParams(temperature=0.0), 8))
        pen, _ = _collect(b.submit(ids, SamplingParams(
            temperature=0.0, repeat_penalty=50.0, presence_penalty=50.0,
            frequency_penalty=2.0), 8))
        # with penalties, the context tokens (incl. every generated one)
        # cannot all repeat identically
        assert len(set(pen)) >= len(set(base)) or pen != base
    finally:
        b.shutdown()


def test_decode_continues_during_admission(engine):
    """While a long prompt admits in slices, an active stream keeps
    receiving tokens (no head-of-line blocking)."""
    import llamafile_tpu.server.batcher as B
    old_chunk = B.PREFILL_CHUNK
    B.PREFILL_CHUNK = 16          # force many slices for the long prompt
    b = Batcher(engine, rows=2)
    try:
        # warm up the compile caches for both shapes first
        _collect(b.submit([1, 2, 3], SamplingParams(temperature=0.0), 2))
        _collect(b.submit(list(range(2, 130)),
                          SamplingParams(temperature=0.0), 2))
        # active stream
        r1 = b.submit([1, 2, 3], SamplingParams(temperature=0.0), 64)
        first = r1.out.get(timeout=60)
        assert first[0] == "token"
        # long admission (128 tokens = 8 slices) racing the active stream
        r2 = b.submit(list(range(2, 130)), SamplingParams(temperature=0.0), 4)
        got_during = 0
        r1_done = False
        deadline = time.time() + 120
        while time.time() < deadline and not r1_done and r2.out.empty():
            try:
                kind, _ = r1.out.get(timeout=0.5)
                if kind == "token":
                    got_during += 1
                elif kind == "done":
                    r1_done = True
            except queue.Empty:
                pass
        # the active stream made progress while r2 was admitting
        assert got_during >= 2, got_during
        _collect(r2)
        if not r1_done:
            _collect(r1)
    finally:
        B.PREFILL_CHUNK = old_chunk
        b.shutdown()


def test_chat_session_prefix_reuse(engine):
    """ChatSession keeps the KV across turns: the second turn prefills only
    the suffix, and its output matches a from-scratch generation of the same
    prompt (reference chatbot keeps its context between turns)."""
    from llamafile_tpu.runtime.engine import ChatSession
    sess = ChatSession(engine)
    sp = SamplingParams(temperature=0.0)
    t1 = [tid for tid, _ in sess.generate([5, 9, 13, 17], 4, sp)]
    assert len(t1) >= 1
    prompt2 = [5, 9, 13, 17] + t1 + [21, 25]
    t2 = [tid for tid, _ in sess.generate(prompt2, 4, sp)]
    assert sess.reused_last >= 4 + len(t1) - 1  # prefix actually reused
    # ground truth: same prompt, fresh engine-level generation
    ref = [tid for tid, _ in engine.generate("", max_tokens=4, sampling=sp,
                                             prompt_ids=prompt2)]
    assert t2 == ref, (t2, ref)


def test_parked_row_kv_survives_other_rows_decoding(engine):
    """A finished row's retained KV (kept for prefix reuse) must not be
    corrupted while OTHER rows decode: parked rows ride the fused paged step
    at pos=0, and before the only_rows table masking their writes landed in
    the retained row's FIRST page — a later prefix-reusing admission then
    inherited garbage KV (ADVICE r2 high #2)."""
    b = Batcher(engine, rows=2, paged=True)
    try:
        sp = SamplingParams(temperature=0.0)
        pa = [3, 7, 11, 15, 19, 23, 27, 31]
        ta, _ = _collect(b.submit(pa, sp, 4))       # row finishes, parks
        # another request decodes long enough for many fused chunks to run
        # while row A sits parked with its history retained
        _collect(b.submit([2, 4, 6, 8], sp, 40))
        # now a request sharing A's prefix reuses A's pages
        pc = pa + ta + [35, 39]
        tc, _ = _collect(b.submit(pc, sp, 4))
        assert b.stats["reused_tokens"] > 0         # reuse actually happened
        ref = [tid for tid, _ in engine.generate(
            "", max_tokens=4, sampling=sp, prompt_ids=pc)]
        assert tc == ref, (tc, ref)
    finally:
        b.shutdown()


def test_preempt_oldest_when_busy(engine):
    """--preempt: a queued request preempts the oldest active stream
    (reference worker.cpp:59-65 'all threads active! dropping oldest')."""
    b = Batcher(engine, rows=1, preempt_after=0.0)
    sp = SamplingParams(temperature=0.0)
    try:
        victim = b.submit([1, 5, 9], sp, 150)
        newer = b.submit([2, 6, 10], sp, 4)
        vt, vreason = _collect(victim)
        assert vreason == "preempted"
        assert len(vt) < 150                   # actually cut short
        nt, nreason = _collect(newer)
        assert nreason in ("stop", "length") and len(nt) >= 1
        assert b.stats["preempted"] == 1
    finally:
        b.shutdown()


def test_preempt_prefers_batch_priority(engine):
    """Deprioritized (X-Priority: batch) streams are preempted before
    normal ones (reference dll_make_last ordering)."""
    b = Batcher(engine, rows=2, preempt_after=0.0)
    sp = SamplingParams(temperature=0.0)
    try:
        normal = b.submit([1, 5, 9], sp, 60)
        lp = b.submit([2, 6, 10], sp, 60, low_priority=True)
        # wait until both are admitted so victim choice is meaningful
        deadline = time.time() + 60
        while time.time() < deadline and any(r.req is None for r in b.rows):
            time.sleep(0.01)
        third = b.submit([3, 7, 11], sp, 4)
        lt, lreason = _collect(lp)
        assert lreason == "preempted"          # batch victim, not the normal
        nt, nreason = _collect(normal)
        assert nreason in ("stop", "length")
        _collect(third)
    finally:
        b.shutdown()


class _FakeXlaError(Exception):
    pass


_FakeXlaError.__name__ = "XlaRuntimeError"


def test_device_fault_recovery_requeues(engine, monkeypatch):
    """SURVEY §5 failure handling: a device fault mid-decode rebuilds the
    device state and resumes every interrupted stream from its host-side
    history — the client sees an identical (greedy) stream, no error."""
    import llamafile_tpu.server.batcher as bmod
    sp = SamplingParams(temperature=0.0)
    ids = [1, 5, 9, 13]
    b0 = Batcher(engine, rows=2)
    try:
        want, _ = _collect(b0.submit(ids, sp, 12))
    finally:
        b0.shutdown()

    real = bmod._fused_decode_paged
    state = {"calls": 0}

    def flaky(*a, **kw):
        state["calls"] += 1
        if state["calls"] == 2:
            raise _FakeXlaError("INTERNAL: device halted (injected)")
        return real(*a, **kw)

    monkeypatch.setattr(bmod, "_fused_decode_paged", flaky)
    b = Batcher(engine, rows=2)
    try:
        got, reason = _collect(b.submit(ids, sp, 12))
        assert b.stats.get("recoveries") == 1
        assert reason in ("stop", "length")
        assert got == want, (got, want)
    finally:
        b.shutdown()
