"""Per-sequence KV state save/restore across rows, servers, and CLI runs.

Reference: llama_state_seq_{save,load}_file (prompt/session persistence;
SURVEY §5 checkpoint/resume — "restore without re-prefilling long prompts");
main.cpp --prompt-cache. VERDICT r2 partial 2.4 "llama_state_*": dense-only
before this — now batcher rows (paged + dense) save/restore too.
"""
import queue
import time

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


GREEDY = SamplingParams(temperature=0.0)
IDS = [1, 5, 9, 13, 17, 21, 25, 29]


@pytest.mark.parametrize("paged", [True, False])
def test_row_save_restore_roundtrip(engine, tmp_path, paged):
    """Continuation from a restored row must equal greedy from scratch."""
    f = str(tmp_path / f"row_{paged}.npz")
    b = Batcher(engine, rows=2, paged=paged)
    try:
        want, _ = _collect(b.submit(IDS, GREEDY, 8))
        info = b.save_row(0, f)
        assert info["tokens"] == len(IDS) + 8
        erased = b.erase_row(0)
        assert erased["erased_tokens"] == len(IDS) + 8
        assert b.describe()[0]["history_tokens"] == 0
    finally:
        b.shutdown()
    # a FRESH batcher (server restart) restores the row and reuses it
    b2 = Batcher(engine, rows=2, paged=paged)
    try:
        r = b2.restore_row(f)
        assert r["tokens"] == len(IDS) + 8
        got, _ = _collect(b2.submit(IDS, GREEDY, 8))
        assert got == want
        # the restored prefix was actually REUSED, not recomputed
        assert b2.stats["reused_tokens"] >= len(IDS) - 1
    finally:
        b2.shutdown()


def test_row_save_busy_refused(engine, tmp_path):
    b = Batcher(engine, rows=1)
    try:
        req = b.submit(IDS, GREEDY, 32)
        # wait for admission so the row is busy
        deadline = time.time() + 60
        while time.time() < deadline and b.rows[0].req is None:
            time.sleep(0.01)
        with pytest.raises(RuntimeError, match="busy"):
            b.save_row(0, str(tmp_path / "x.npz"))
        req.stop = True
        _collect(req)
    finally:
        b.shutdown()


def test_prompt_cache_cli_resume(engine, tmp_path):
    """Engine.generate --prompt-cache: second run reuses the saved prompt
    KV (identical greedy output; only the suffix is prefilled)."""
    f = str(tmp_path / "session.npz")
    prompt_ids = IDS * 3
    want = [t for t, _ in engine.generate("", max_tokens=6, sampling=GREEDY,
                                          prompt_ids=prompt_ids,
                                          stop_on_eog=False)]
    import os
    assert os.path.exists(f) is False
    got_cold = [t for t, _ in engine.generate(
        "", max_tokens=6, sampling=GREEDY, prompt_ids=prompt_ids,
        stop_on_eog=False, prompt_cache=f)]
    assert os.path.exists(f)
    got_warm = [t for t, _ in engine.generate(
        "", max_tokens=6, sampling=GREEDY, prompt_ids=prompt_ids,
        stop_on_eog=False, prompt_cache=f)]
    assert got_cold == want
    assert got_warm == want
    # extended prompt: cached prefix + new suffix still exact
    ext = prompt_ids + [2, 6, 10]
    want_ext = [t for t, _ in engine.generate(
        "", max_tokens=6, sampling=GREEDY, prompt_ids=ext,
        stop_on_eog=False)]
    got_ext = [t for t, _ in engine.generate(
        "", max_tokens=6, sampling=GREEDY, prompt_ids=ext,
        stop_on_eog=False, prompt_cache=f)]
    assert got_ext == want_ext
