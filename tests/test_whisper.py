"""Whisper sibling-engine tests on a tiny random ggml-bin model."""
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

from llamafile_tpu.models.whisper import (WHISPER_MAGIC, WhisperModel,
                                          read_wav, SAMPLE_RATE)


def make_tiny_whisper(path, n_vocab=51865, state=32, heads=2, layers=1,
                      n_mels=80):
    rng = np.random.default_rng(0)
    out = bytearray()
    out += struct.pack("<i", WHISPER_MAGIC)
    hp = (n_vocab, 1500, state, heads, layers, 448, state, heads, layers,
          n_mels, 0)
    out += struct.pack("<11i", *hp)
    # mel filters
    n_fft = 201
    out += struct.pack("<2i", n_mels, n_fft)
    out += (rng.random((n_mels, n_fft)).astype(np.float32) * 0.01).tobytes()
    # vocab
    out += struct.pack("<i", n_vocab)
    for i in range(n_vocab):
        tok = f"t{i}".encode()
        out += struct.pack("<i", len(tok)) + tok

    def add(name, arr):
        nonlocal out
        arr = arr.astype(np.float32)
        dims = list(reversed(arr.shape))
        out += struct.pack("<3i", len(dims), len(name), 0)
        out += struct.pack(f"<{len(dims)}i", *dims)
        out += name.encode()
        out += arr.tobytes()

    def r(*shape, s=0.05):
        return rng.standard_normal(shape).astype(np.float32) * s

    add("encoder.conv1.weight", r(state, n_mels, 3))
    add("encoder.conv1.bias", r(state))
    add("encoder.conv2.weight", r(state, state, 3))
    add("encoder.conv2.bias", r(state))
    add("encoder.positional_embedding", r(1500, state))
    add("encoder.ln_post.weight", np.ones(state))
    add("encoder.ln_post.bias", np.zeros(state))
    add("decoder.token_embedding.weight", r(n_vocab, state, s=0.2))
    add("decoder.positional_embedding", r(448, state))
    add("decoder.ln.weight", np.ones(state))
    add("decoder.ln.bias", np.zeros(state))
    for enc, L in (("encoder", layers), ("decoder", layers)):
        for i in range(L):
            p = f"{enc}.blocks.{i}"
            for att in ([".attn"] + ([".cross_attn"] if enc == "decoder" else [])):
                add(p + att + ".query.weight", r(state, state))
                add(p + att + ".query.bias", r(state))
                add(p + att + ".key.weight", r(state, state))
                add(p + att + ".value.weight", r(state, state))
                add(p + att + ".value.bias", r(state))
                add(p + att + ".out.weight", r(state, state))
                add(p + att + ".out.bias", r(state))
                add(p + att + "_ln.weight", np.ones(state))
                add(p + att + "_ln.bias", np.zeros(state))
            add(p + ".mlp.0.weight", r(4 * state, state))
            add(p + ".mlp.0.bias", r(4 * state))
            add(p + ".mlp.2.weight", r(state, 4 * state))
            add(p + ".mlp.2.bias", r(state))
            add(p + ".mlp_ln.weight", np.ones(state))
            add(p + ".mlp_ln.bias", np.zeros(state))
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_whisper_end_to_end(tmp_path):
    path = tmp_path / "tiny.bin"
    make_tiny_whisper(str(path))
    m = WhisperModel(str(path))
    assert m.hparams.n_mels == 80 and m.multilingual
    samples = (np.sin(np.linspace(0, 440 * 2 * np.pi, SAMPLE_RATE))
               .astype(np.float32))
    mel = m.log_mel(samples)
    assert mel.shape == (80, 3000)
    text = m.transcribe(samples, max_tokens=4)
    assert isinstance(text, str)


def test_read_wav(tmp_path):
    import wave
    path = tmp_path / "a.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        data = (np.sin(np.linspace(0, 100, 8000)) * 10000).astype(np.int16)
        stereo = np.stack([data, data], axis=1).reshape(-1)
        w.writeframes(stereo.tobytes())
    x = read_wav(str(path))
    assert x.dtype == np.float32
    assert abs(len(x) - SAMPLE_RATE) < 10      # resampled 1s
    assert np.abs(x).max() <= 1.0


def test_cached_decode_matches_full_prefix(tmp_path):
    """Incremental KV-cached decoding must reproduce full-prefix logits."""
    import jax.numpy as jnp
    import jax
    path = tmp_path / "tiny2.bin"
    make_tiny_whisper(str(path), n_vocab=600, state=32, heads=2, layers=2)
    m = WhisperModel(str(path))
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (10, 32)).astype(np.float32) * 0.1)
    toks = [5, 9, 13, 21]
    full = np.asarray(m._dec(jnp.asarray(toks, jnp.int32), audio))
    cross = m._cross_kv(audio)
    ck = jnp.stack([c[0] for c in cross])
    cv = jnp.stack([c[1] for c in cross])
    hp = m.hparams
    kc = jnp.zeros((hp.n_text_layer, hp.n_text_ctx, hp.n_text_state))
    vc = jnp.zeros_like(kc)
    step = jax.jit(m._decode_step_impl)
    for pos, tk in enumerate(toks):
        logits, kc, vc = step(jnp.asarray([tk], jnp.int32), jnp.int32(pos),
                              kc, vc, ck, cv)
        np.testing.assert_allclose(np.asarray(logits), full[pos],
                                   rtol=2e-4, atol=2e-4)


def test_timestamp_rules():
    """Constraint semantics of whisper timestamp decoding
    (whisper.cpp whisper_process_logits)."""
    path_model = None  # rules are pure logic; build a stub carrier
    class Stub:
        timestamp_begin = 100
        no_timestamps = 99
        eot = 50
    from llamafile_tpu.models.whisper import WhisperModel
    rules = WhisperModel._apply_timestamp_rules
    V = 160
    # first token must be a timestamp (bounded initial window)
    lg = np.zeros(V, np.float32)
    rules(Stub, lg, [], max_initial_ts=10)
    assert np.isinf(lg[:100]).all() and not np.isinf(lg[100])
    assert np.isinf(lg[111:]).all()
    # completed pair -> next must be text
    lg = np.zeros(V, np.float32)
    rules(Stub, lg, [101, 5, 102, 103])
    assert np.isinf(lg[100:]).all() and not np.isinf(lg[0])
    # lone timestamp -> next must be timestamp or EOT
    lg = np.zeros(V, np.float32)
    rules(Stub, lg, [101, 5, 106])
    assert np.isinf(lg[:50]).all() and not np.isinf(lg[106])
    # monotonicity: earlier timestamps masked
    lg = np.zeros(V, np.float32)
    rules(Stub, lg, [101, 5, 106, 106, 7])
    assert np.isinf(lg[100:107]).all()


def test_transcribe_segments_structure(tmp_path):
    path = tmp_path / "tiny.bin"
    make_tiny_whisper(str(path))
    m = WhisperModel(str(path))
    samples = (np.sin(np.linspace(0, 440 * 2 * np.pi, SAMPLE_RATE))
               .astype(np.float32))
    segs = m.transcribe_segments(samples, max_tokens=8,
                                 temperatures=(0.0,))
    assert isinstance(segs, list)
    for s in segs:
        assert set(s) == {"t0", "t1", "text"}
        assert 0.0 <= s["t0"] <= s["t1"] <= 31.0


def test_beam_search_decode(tmp_path):
    """Beam search (whisper.cpp --beam-size): deterministic, structurally
    valid, and its best hypothesis scores at least as well as greedy's (beam
    explores a superset of greedy's single path under the same scoring)."""
    path = tmp_path / "tiny.bin"
    make_tiny_whisper(str(path))
    m = WhisperModel(str(path))
    rng = np.random.default_rng(0)
    samples = rng.standard_normal(SAMPLE_RATE).astype(np.float32) * 0.1
    mel = m.log_mel(samples)
    cross = m._cross_kv(m.encode(mel))
    import jax.numpy as jnp
    ck = jnp.stack([c[0] for c in cross])
    cv = jnp.stack([c[1] for c in cross])

    g_toks, g_lp = m._decode_window(ck, cv, "en", False, 0.0,
                                    np.random.default_rng(0), 8, True)
    b_toks, b_lp = m._decode_window_beam(ck, cv, "en", False, 8, True,
                                         beam_size=3)
    b2_toks, b2_lp = m._decode_window_beam(ck, cv, "en", False, 8, True,
                                           beam_size=3)
    assert b_toks == b2_toks and b_lp == b2_lp      # deterministic
    assert all(isinstance(t, int) for t in b_toks)
    assert b_lp >= g_lp - 1e-4                       # never worse than greedy

    # segments API accepts beam_size
    segs = m.transcribe_segments(samples, max_tokens=8, temperatures=(0.0,),
                                 beam_size=3)
    assert isinstance(segs, list)


def test_whisper_http_server(tmp_path):
    """POST a wav to /inference; timestamped verbose_json comes back
    (reference: 001-server-llamafile-integration.patch)."""
    import io
    import json
    import socket
    import threading
    import time
    import urllib.request
    import wave as wavmod

    path = tmp_path / "tiny.bin"
    make_tiny_whisper(str(path))
    m = WhisperModel(str(path))
    from llamafile_tpu.server.whisper_http import run_server
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    t = threading.Thread(target=run_server, args=(m, f"127.0.0.1:{port}"),
                         daemon=True)
    t.start()
    time.sleep(1.0)
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        data = (np.sin(np.linspace(0, 300, 16000)) * 8000).astype(np.int16)
        w.writeframes(data.tobytes())
    wav = buf.getvalue()
    boundary = "xxBOUNDxx"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n").encode() + wav + (
        f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
        f'name="response_format"\r\n\r\nverbose_json'
        f"\r\n--{boundary}--\r\n").encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/inference", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        out = json.loads(resp.read())
    assert "text" in out and "segments" in out
    for seg in out["segments"]:
        assert seg["start"] <= seg["end"]
    # health endpoint
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                timeout=10) as resp:
        assert json.loads(resp.read())["status"] == "ok"


# ---------------------------------------------------------------------------
# Numeric parity vs HuggingFace WhisperModel on identical random weights
# (VERDICT r1 weak #8: turn "runs" into "right" without real checkpoints)
# ---------------------------------------------------------------------------

def _hf_whisper_to_ggml(path, model, cfg):
    """Write an HF WhisperModel's weights in whisper.cpp ggml-bin layout
    under the openai tensor names our parser reads."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    ren = {}

    def blockmap(side, n):
        for i in range(n):
            hp, op = f"{side}.layers.{i}.", f"{side}.blocks.{i}."
            ren[hp + "self_attn.q_proj.weight"] = op + "attn.query.weight"
            ren[hp + "self_attn.q_proj.bias"] = op + "attn.query.bias"
            ren[hp + "self_attn.k_proj.weight"] = op + "attn.key.weight"
            ren[hp + "self_attn.v_proj.weight"] = op + "attn.value.weight"
            ren[hp + "self_attn.v_proj.bias"] = op + "attn.value.bias"
            ren[hp + "self_attn.out_proj.weight"] = op + "attn.out.weight"
            ren[hp + "self_attn.out_proj.bias"] = op + "attn.out.bias"
            ren[hp + "self_attn_layer_norm.weight"] = op + "attn_ln.weight"
            ren[hp + "self_attn_layer_norm.bias"] = op + "attn_ln.bias"
            ren[hp + "fc1.weight"] = op + "mlp.0.weight"
            ren[hp + "fc1.bias"] = op + "mlp.0.bias"
            ren[hp + "fc2.weight"] = op + "mlp.2.weight"
            ren[hp + "fc2.bias"] = op + "mlp.2.bias"
            ren[hp + "final_layer_norm.weight"] = op + "mlp_ln.weight"
            ren[hp + "final_layer_norm.bias"] = op + "mlp_ln.bias"
            if side == "decoder":
                ren[hp + "encoder_attn.q_proj.weight"] = op + "cross_attn.query.weight"
                ren[hp + "encoder_attn.q_proj.bias"] = op + "cross_attn.query.bias"
                ren[hp + "encoder_attn.k_proj.weight"] = op + "cross_attn.key.weight"
                ren[hp + "encoder_attn.v_proj.weight"] = op + "cross_attn.value.weight"
                ren[hp + "encoder_attn.v_proj.bias"] = op + "cross_attn.value.bias"
                ren[hp + "encoder_attn.out_proj.weight"] = op + "cross_attn.out.weight"
                ren[hp + "encoder_attn.out_proj.bias"] = op + "cross_attn.out.bias"
                ren[hp + "encoder_attn_layer_norm.weight"] = op + "cross_attn_ln.weight"
                ren[hp + "encoder_attn_layer_norm.bias"] = op + "cross_attn_ln.bias"

    blockmap("encoder", cfg.encoder_layers)
    blockmap("decoder", cfg.decoder_layers)
    ren.update({
        "encoder.conv1.weight": "encoder.conv1.weight",
        "encoder.conv1.bias": "encoder.conv1.bias",
        "encoder.conv2.weight": "encoder.conv2.weight",
        "encoder.conv2.bias": "encoder.conv2.bias",
        "encoder.embed_positions.weight": "encoder.positional_embedding",
        "encoder.layer_norm.weight": "encoder.ln_post.weight",
        "encoder.layer_norm.bias": "encoder.ln_post.bias",
        "decoder.embed_tokens.weight": "decoder.token_embedding.weight",
        "decoder.embed_positions.weight": "decoder.positional_embedding",
        "decoder.layer_norm.weight": "decoder.ln.weight",
        "decoder.layer_norm.bias": "decoder.ln.bias",
    })
    tensors = {ren[k]: v for k, v in sd.items() if k in ren}
    out = bytearray()
    out += struct.pack("<i", WHISPER_MAGIC)
    hp = (cfg.vocab_size, cfg.max_source_positions, cfg.d_model,
          cfg.encoder_attention_heads, cfg.encoder_layers,
          cfg.max_target_positions, cfg.d_model,
          cfg.decoder_attention_heads, cfg.decoder_layers,
          cfg.num_mel_bins, 0)
    out += struct.pack("<11i", *hp)
    out += struct.pack("<2i", cfg.num_mel_bins, 201)
    out += np.zeros((cfg.num_mel_bins, 201), np.float32).tobytes()
    out += struct.pack("<i", cfg.vocab_size)
    for i in range(cfg.vocab_size):
        tok = f"t{i}".encode()
        out += struct.pack("<i", len(tok)) + tok
    for name, arr in tensors.items():
        arr = np.asarray(arr, np.float32)
        dims = list(reversed(arr.shape))
        out += struct.pack("<3i", len(dims), len(name), 0)
        out += struct.pack(f"<{len(dims)}i", *dims)
        out += name.encode()
        out += arr.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_whisper_matches_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.WhisperConfig(
        vocab_size=600, num_mel_bins=80, d_model=32, encoder_layers=2,
        encoder_attention_heads=2, decoder_layers=2,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    torch.manual_seed(0)
    hf = transformers.WhisperModel(cfg)
    hf.eval()
    path = tmp_path / "w.bin"
    _hf_whisper_to_ggml(str(path), hf, cfg)
    m = WhisperModel(str(path))
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((80, 3000)) * 0.3).astype(np.float32)
    # encoder parity
    ours_enc = np.asarray(m.encode(mel))                    # [1500, d]
    with torch.no_grad():
        hf_enc = hf.encoder(torch.tensor(mel[None])).last_hidden_state[0]
    np.testing.assert_allclose(ours_enc, hf_enc.numpy(), atol=2e-4, rtol=1e-3)
    # decoder logits parity (full prefix path)
    toks = np.array([5, 9, 17, 3], np.int64)
    import jax.numpy as jnp
    ours_logits = np.asarray(m._dec(jnp.asarray(toks, jnp.int32),
                                    jnp.asarray(ours_enc)))
    with torch.no_grad():
        dec = hf.decoder(input_ids=torch.tensor(toks[None]),
                         encoder_hidden_states=hf_enc[None]).last_hidden_state
        hf_logits = (dec[0] @ hf.decoder.embed_tokens.weight.T).numpy()
    np.testing.assert_allclose(ours_logits, hf_logits, atol=3e-3, rtol=1e-2)
