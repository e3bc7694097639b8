"""Mamba (SSM) architecture: HF converter round-trip + transformers logit
parity + prefill/decode consistency + Engine generation.

Reference: the llamafile runtime inherits mamba from its pinned llama.cpp
(LLM_ARCH_MAMBA in llama.cpp.patches/patches/llama.cpp.patch:138). Our
runtime is models/mamba.py (associative-scan prefill, O(1) recurrent decode).
"""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf") / "tinymamba"
    cfg = transformers.MambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        state_size=16, conv_kernel=4, time_step_rank=8,
        num_hidden_layers=2, layer_norm_epsilon=1e-5,
        use_cache=False)
    torch.manual_seed(0)
    model = transformers.MambaForCausalLM(cfg)
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


@pytest.fixture(scope="module")
def gguf_path(hf_dir, tmp_path_factory):
    d, _ = hf_dir
    out = tmp_path_factory.mktemp("gguf") / "mamba.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d), str(out)],
                       capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    return str(out)


def test_logit_parity(hf_dir, gguf_path):
    _, model = hf_dir
    ids = [[3, 17, 42, 99, 7, 120, 11]]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()

    import jax.numpy as jnp
    from llamafile_tpu.models.mamba import forward, init_cache, load_mamba
    cfg, params, tok, _ = load_mamba(gguf_path)
    assert cfg.d_inner == 128 and cfg.d_state == 16 and cfg.dt_rank == 8
    cache = init_cache(cfg, 1)
    got, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    assert np.array_equal(want.argmax(-1), got.argmax(-1))


def test_prefill_decode_consistency(gguf_path):
    """Bucket-padded prefill state == token-by-token decode state."""
    import jax.numpy as jnp
    from llamafile_tpu.models.mamba import forward, init_cache, load_mamba
    cfg, params, _, _ = load_mamba(gguf_path)
    ids = [5, 9, 200, 43, 1]

    # padded prefill (pad to 16, last_idx masks the tail)
    toks = np.zeros((1, 16), np.int32)
    toks[0, :len(ids)] = ids
    cache = init_cache(cfg, 1)
    lp, cache_p = forward(params, cfg, jnp.asarray(toks), jnp.asarray([0]),
                          cache, last_idx=jnp.asarray([len(ids) - 1]))

    # step-by-step decode
    cache = init_cache(cfg, 1)
    for t, tid in enumerate(ids):
        ld, cache = forward(params, cfg, jnp.asarray([[tid]]),
                            jnp.asarray([t]), cache)

    np.testing.assert_allclose(np.asarray(cache_p.ssm), np.asarray(cache.ssm),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_p.conv),
                               np.asarray(cache.conv), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lp[0, 0]), np.asarray(ld[0, 0]),
                               rtol=2e-2, atol=2e-2)


def test_engine_generate(gguf_path):
    from llamafile_tpu.runtime.engine import load_engine
    from llamafile_tpu.runtime.sampling import SamplingParams
    eng = load_engine(gguf_path)
    assert eng.recurrent
    sp = SamplingParams(temperature=0.0)
    out1 = [t for t, _ in eng.generate("", max_tokens=12, sampling=sp,
                                       stop_on_eog=False, prompt_ids=[3, 5, 7])]
    out2 = [t for t, _ in eng.generate("", max_tokens=12, sampling=sp,
                                       stop_on_eog=False, prompt_ids=[3, 5, 7])]
    assert out1 == out2 and len(out1) == 12

    # greedy generation must agree with the HF-parity forward chain:
    # generate continuation matches argmax chain from raw forwards
    import jax.numpy as jnp
    from llamafile_tpu.models.mamba import forward, init_cache
    cache = init_cache(eng.cfg, 1)
    toks = np.zeros((1, 16), np.int32)
    toks[0, :3] = [3, 5, 7]
    lg, cache = forward(eng.params, eng.cfg, jnp.asarray(toks),
                        jnp.asarray([0]), cache,
                        last_idx=jnp.asarray([2]))
    want = []
    tok = int(np.asarray(lg[0, 0]).argmax())
    want.append(tok)
    for t in range(3, 3 + 11):
        lg, cache = forward(eng.params, eng.cfg, jnp.asarray([[tok]]),
                            jnp.asarray([t]), cache)
        tok = int(np.asarray(lg[0, -1]).argmax())
        want.append(tok)
    assert out1 == want


def test_server_serves_mamba(gguf_path):
    """The batcher's recurrent mode serves mamba over HTTP (the reference
    serves mamba through its llama.cpp server)."""
    import asyncio
    import json
    import socket
    import threading
    import time
    import urllib.request

    from llamafile_tpu.runtime.engine import load_engine
    from llamafile_tpu.server.http import Server, _amain
    from llamafile_tpu.utils.flags import Flags

    eng = load_engine(gguf_path, max_seq_len=128)
    srv = Server(Flags(model="mamba.gguf", slots=2, temp=0.0), eng)
    assert srv.batcher.recurrent and not srv.batcher.paged_mode
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(_amain(srv, "127.0.0.1", port))

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                   timeout=1)
            break
        except Exception:
            time.sleep(0.05)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": "ab", "max_tokens": 4,
                         "temperature": 1.0, "seed": 7}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["choices"][0]["finish_reason"] in ("stop", "length")
    assert out["usage"]["prompt_tokens"] >= 1
    loop.call_soon_threadsafe(loop.stop)


def test_chat_session_extension_reuse(gguf_path):
    """ChatSession reuses the recurrent state only for pure extensions."""
    from llamafile_tpu.runtime.engine import ChatSession, load_engine
    from llamafile_tpu.runtime.sampling import SamplingParams
    eng = load_engine(gguf_path)
    cs = ChatSession(eng)
    sp = SamplingParams(temperature=0.0)
    first = [t for t, _ in cs.generate([3, 5, 7], max_tokens=4, sampling=sp,
                                       stop_on_eog=False)]
    # extension: previous ids + generated + new tokens -> state reuse
    ext = cs.ids + [9, 11]
    out = [t for t, _ in cs.generate(ext, max_tokens=4, sampling=sp,
                                     stop_on_eog=False)]
    assert cs.reused_last > 0 and len(out) == 4
    # divergent prompt -> full re-prefill (no rewind of recurrent state)
    out2 = [t for t, _ in cs.generate([8, 2], max_tokens=4, sampling=sp,
                                      stop_on_eog=False)]
    assert cs.reused_last == 0 and len(out2) == 4
    assert len(first) == 4
