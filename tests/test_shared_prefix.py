"""Cross-row shared-prefix KV pages (copy-on-write).

Reference: the server computes the system prompt's KV once and every slot
references it (server_server.cpp.patch:883,1713-1731). Here the paged
batcher aliases a donor row's full prefix pages into a new row's table via
refcounts: the shared span is neither recomputed nor copied, writes are
diverted from aliased pages, and pages free only when the last reference
drops."""
import queue
import time

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.runtime.engine import Engine
from llamafile_tpu.runtime.paged import PageAllocator
from llamafile_tpu.runtime.sampling import SamplingParams
from llamafile_tpu.server.batcher import Batcher
from tests.util_models import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    make_tiny_llama_gguf(str(path))
    cfg, params, tok, _ = load_llama(str(path))
    return Engine(cfg, params, tok, max_seq_len=192)


def _collect(req, timeout=180):
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


def test_allocator_refcounts():
    a = PageAllocator(n_pages=8, page_size=4, n_rows=3, max_len=16)
    a.ensure(0, 12)                       # 3 pages
    donor = list(a.tables[0])
    a.share_prefix(0, 1, 2)
    assert a.tables[1] == donor[:2]
    assert a.shared_page_count(1) == 2 and a.shared_page_count(0) == 2
    free0 = len(a.free)
    a.release(0)                          # donor gone: shared pages survive
    assert len(a.free) == free0 + 1       # only the unshared 3rd page freed
    assert a.shared_page_count(1) == 0    # refs dropped to 1
    a.release(1)
    assert len(a.free) == free0 + 3


def test_shared_prefix_cross_row_parity(engine):
    """Second request with the same long system prompt admits by aliasing
    the donor row's full prefix pages — no recompute — and both streams
    stay token-exact vs the sequential engine reference."""
    b = Batcher(engine, rows=2, paged=True)
    try:
        sp = SamplingParams(temperature=0.0)
        sys_prompt = [(7 + 3 * i) % 200 + 2 for i in range(80)]  # >1 page
        # A must still be DECODING when B admits (else B would reuse A's
        # row same-row style): sync on A's FIRST token (activation), then
        # submit B; cancel A once B is done
        ra = b.submit(sys_prompt + [211], sp, 150)
        kind, first = ra.out.get(timeout=180)
        assert kind == "token"
        rb = b.submit(sys_prompt + [223], sp, 6)    # lands on row 1
        tb, _ = _collect(rb)
        ra.stop = True
        ta, _ = _collect(ra)
        ta = [first] + ta
        assert b.stats.get("shared_prefix_tokens", 0) >= 64, b.stats
        ref_a = [t for t, _ in engine.generate(
            "", max_tokens=len(ta), sampling=sp,
            prompt_ids=sys_prompt + [211])]
        ref_b = [t for t, _ in engine.generate(
            "", max_tokens=6, sampling=sp, prompt_ids=sys_prompt + [223])]
        assert len(ta) >= 1 and ta == ref_a, (ta, ref_a)
        assert tb == ref_b, (tb, ref_b)
    finally:
        b.shutdown()


def test_shared_prefix_then_full_divergence(engine):
    """A request sharing NOTHING with the aliased prefix (keep == 0) must
    drop the stale aliased pages before prefill — otherwise the masked
    write-back trashes the fresh KV while attention reads the donor's old
    pages (review r4 finding #1)."""
    b = Batcher(engine, rows=2, paged=True)
    try:
        sp = SamplingParams(temperature=0.0)
        p = [(3 + 2 * i) % 190 + 2 for i in range(96)]
        ra = b.submit(p, sp, 150)
        kind, first = ra.out.get(timeout=180)
        assert kind == "token"
        rb = b.submit(p[:70] + [9, 9], sp, 4)        # aliases 1 page
        _collect(rb)
        q = [(150 - i) % 190 + 3 for i in range(40)]  # disjoint prompt
        rc = b.submit(q, sp, 5)                       # keep == 0 on row 1
        tc, _ = _collect(rc)
        ra.stop = True
        _collect(ra)
        ref_c = [t for t, _ in engine.generate(
            "", max_tokens=5, sampling=sp, prompt_ids=q)]
        assert tc == ref_c, (tc, ref_c)
    finally:
        b.shutdown()


def test_shared_prefix_divergence_then_reuse(engine):
    """After sharing, a third request diverging INSIDE the shared span must
    not corrupt the donor: boundary-page writes are diverted, and the
    donor's retained prefix still admits exactly."""
    b = Batcher(engine, rows=2, paged=True)
    try:
        sp = SamplingParams(temperature=0.0)
        p = [(5 + 2 * i) % 190 + 2 for i in range(96)]
        ra = b.submit(p, sp, 150)                    # row 0, long decode
        kind, first = ra.out.get(timeout=180)        # A is decoding now
        assert kind == "token"
        rb = b.submit(p[:70] + [3, 9, 4], sp, 4)     # shares 1 full page
        _collect(rb)
        # diverge within the shared first page on the SAME row (row 1)
        rc = b.submit(p[:30] + [8, 8, 8], sp, 4)
        tc, _ = _collect(rc)
        ra.stop = True
        ta, _ = _collect(ra)
        ta = [first] + ta
        ref_a = [t for t, _ in engine.generate(
            "", max_tokens=len(ta), sampling=sp, prompt_ids=p)]
        ref_c = [t for t, _ in engine.generate(
            "", max_tokens=4, sampling=sp, prompt_ids=p[:30] + [8, 8, 8])]
        assert len(ta) >= 1 and ta == ref_a, (ta, ref_a)
        assert tc == ref_c, (tc, ref_c)
    finally:
        b.shutdown()
