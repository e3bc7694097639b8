"""Paged KV cache: block-table decode parity, per-row lengths, and
context-shift (mid-delete + rope-shifted suffix relocation).

Reference behavior: llamafile/server/slot.cpp:291-424 keeps a common prefix,
deletes a middle span and relocates the tail; BASELINE names paged KV
attention as the north-star serving design. Here relocation is a page-table +
rope-rotation operation (runtime/paged.py).
"""
import queue
import time

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamafile_tpu.models.llama import (forward, forward_paged_decode,
                                        init_cache, stack_layers)
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.models.synthetic import make_synthetic_llama
from llamafile_tpu.runtime.engine import Engine
from llamafile_tpu.runtime.paged import (PageAllocator, copy_row_to_pages,
                                         find_mid_delete, gather_pages_to_row,
                                         init_paged)
from llamafile_tpu.runtime.sampling import SamplingParams
from llamafile_tpu.server.batcher import Batcher
from tests.util_models import make_tiny_llama_gguf


def test_paged_decode_matches_dense():
    cfg, params = make_synthetic_llama("tiny", quant="Q4_K", fuse=True)
    params = stack_layers(params)
    ps, max_len, r = 16, 64, 2
    npages = 1 + r * (max_len // ps)
    alloc = PageAllocator(npages, ps, r, max_len)
    paged = init_paged(cfg.n_layers, cfg.n_kv_heads, npages, ps, cfg.head_dim)
    dense = init_cache(cfg, r, max_len)
    toks = jnp.asarray([[1, 2, 3, 4, 5, 0, 0, 0],
                        [6, 7, 8, 9, 10, 11, 12, 13]], jnp.int32)
    lens = [5, 8]
    _, dense = forward(params, cfg, toks, jnp.asarray([0, 0]), dense)
    for i in range(r):
        alloc.ensure(i, lens[i])
        alloc.lengths[i] = lens[i]
        paged = copy_row_to_pages(
            paged, dense.k[:, i:i + 1], dense.v[:, i:i + 1],
            jnp.asarray(alloc.tables[i], jnp.int32), ps=ps)
    tables = alloc.device_tables(r)
    tok = jnp.asarray([20, 21], jnp.int32)
    pos = jnp.asarray(lens, jnp.int32)
    l_dense, _ = forward(params, cfg, tok[:, None], pos, dense)
    l_paged, _ = forward_paged_decode(params, cfg, tok, pos, paged, tables)
    np.testing.assert_allclose(np.asarray(l_dense[:, 0]), np.asarray(l_paged),
                               atol=2e-2, rtol=1e-3)


def test_gather_pages_roundtrip():
    cfg, params = make_synthetic_llama("tiny", quant="Q8_0")
    ps, max_len = 16, 64
    alloc = PageAllocator(9, ps, 1, max_len)
    paged = init_paged(cfg.n_layers, cfg.n_kv_heads, 9, ps, cfg.head_dim)
    dense = init_cache(cfg, 1, max_len)
    k = jax.random.normal(jax.random.PRNGKey(0), dense.k.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), dense.v.shape, jnp.bfloat16)
    alloc.ensure(0, 40)
    pages = jnp.asarray(alloc.tables[0], jnp.int32)
    paged = copy_row_to_pages(paged, k, v, pages, ps=ps)
    k2, v2 = gather_pages_to_row(paged, pages, ps=ps, max_len=max_len)
    n = len(alloc.tables[0]) * ps
    np.testing.assert_array_equal(np.asarray(k[:, :, :n], np.float32),
                                  np.asarray(k2[:, :, :n], np.float32))


def test_find_mid_delete():
    h = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]
    # user deleted [3,4,5]: prefix [1,2], suffix [6..14] kept, new tail [99]
    ids = [1, 2] + h[5:] + [99]
    assert find_mid_delete(h, ids, 2, min_reuse=4) == (5, 9)
    # no overlap
    assert find_mid_delete(h, [1, 2, 77, 78], 2, min_reuse=4) is None


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


def test_batcher_paged_mode_default(engine):
    b = Batcher(engine, rows=2)
    try:
        assert b.paged_mode
        toks, reason = _collect(b.submit([1, 2, 3, 4],
                                         SamplingParams(temperature=0.0), 6))
        assert len(toks) >= 1
    finally:
        b.shutdown()


def test_context_shift_mid_delete_keeps_suffix(engine):
    """Edit mid-conversation: the suffix cache must be reused (relocated),
    only genuinely-new tokens prefilled, and greedy output must match a
    from-scratch prefill of the edited prompt."""
    import llamafile_tpu.server.batcher as B
    b = Batcher(engine, rows=1)
    b2 = Batcher(engine, rows=1)
    try:
        history = list(range(2, 122))        # 120 tokens
        _collect(b.submit(history, SamplingParams(temperature=0.0), 2))
        pre0 = b.stats["prefilled_tokens"]
        # edit: delete history[40:80], keep prefix 40 + suffix 40, add 2 new
        edited = history[:40] + history[80:] + [150, 151]
        out_shift, _ = _collect(b.submit(edited,
                                         SamplingParams(temperature=0.0), 6))
        assert b.stats["shifted_tokens"] == 40
        # only the new tail was prefilled (2 new tokens, bucketed prefill)
        assert b.stats["prefilled_tokens"] - pre0 <= 16
        # ground truth: same edited prompt from scratch
        out_fresh, _ = _collect(b2.submit(edited,
                                          SamplingParams(temperature=0.0), 6))
        assert out_shift == out_fresh, (out_shift, out_fresh)
    finally:
        b.shutdown()
        b2.shutdown()


def test_int8_paged_batcher_end_to_end(engine):
    """INT8 paged KV (north-star: paged F16/INT8): quantized pages + scales,
    close to the bf16-paged greedy output."""
    from llamafile_tpu.runtime.engine import Engine
    e8 = Engine(engine.cfg, engine.params, engine.tokenizer,
                max_seq_len=192, kv_dtype="i8")
    b = Batcher(e8, rows=2)
    try:
        assert b.paged_mode and b.pages.quantized
        toks, _ = _collect(b.submit([1, 5, 9, 13, 17, 21],
                                    SamplingParams(temperature=0.0), 6))
        assert len(toks) >= 4
        bb = Batcher(engine, rows=2)    # bf16 reference
        try:
            ref, _ = _collect(bb.submit([1, 5, 9, 13, 17, 21],
                                        SamplingParams(temperature=0.0), 6))
        finally:
            bb.shutdown()
        # int8 KV rounding may flip late tokens; the first must agree
        assert toks[0] == ref[0], (toks, ref)
    finally:
        b.shutdown()
