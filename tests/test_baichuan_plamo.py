"""baichuan + plamo architectures (GGUF-level).

Neither family ships in-library transformers classes (both need
trust_remote_code), so unlike the other arch tests these validate against
structural oracles instead of HF logits:

- baichuan 7B-style IS llama with NORM rope (llama.cpp build_baichuan's
  non-13B branch is line-for-line build_llama): same weights under both
  architecture keys must produce identical logits.
- baichuan 13B-style (>= 40 layers) switches to ALiBi + no rope
  (build_baichuan MODEL_13B branch); checked via config flags, a
  prefill/decode consistency drive, and divergence from the roped run.
- plamo (build_plamo): parallel attention+FFN residual fed from ONE shared
  RMSNorm, NORM rope, SwiGLU — validated against a from-scratch numpy
  forward.
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from llamafile_tpu.gguf import GGUFWriter
from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from tests.util_models import byte_vocab

RNG = np.random.default_rng(11)


def _write_gguf(path, arch, *, d=32, n_layers=2, n_heads=2, n_kv=2, d_ff=64,
                shared_norm=False, seed=3, extra=None):
    rng = np.random.default_rng(seed)
    tokens, scores, token_type = byte_vocab()
    w = GGUFWriter(str(path))
    w.add("general.architecture", arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.block_count", n_layers)
    w.add(f"{arch}.embedding_length", d)
    w.add(f"{arch}.attention.head_count", n_heads)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.feed_forward_length", d_ff)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.vocab_size", len(tokens))
    for k, v in (extra or {}).items():
        w.add(k, v)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", np.asarray(token_type, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)

    def rand(shape, scale=0.15):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    hd = d // n_heads
    tensors = {"token_embd.weight": rand((len(tokens), d), 0.5)}
    for i in range(n_layers):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = 1.0 + rand((d,), 0.05)
        tensors[p + "attn_q.weight"] = rand((n_heads * hd, d))
        tensors[p + "attn_k.weight"] = rand((n_kv * hd, d))
        tensors[p + "attn_v.weight"] = rand((n_kv * hd, d))
        tensors[p + "attn_output.weight"] = rand((d, n_heads * hd))
        if not shared_norm:
            tensors[p + "ffn_norm.weight"] = 1.0 + rand((d,), 0.05)
        tensors[p + "ffn_gate.weight"] = rand((d_ff, d))
        tensors[p + "ffn_up.weight"] = rand((d_ff, d))
        tensors[p + "ffn_down.weight"] = rand((d, d_ff))
    tensors["output_norm.weight"] = 1.0 + rand((d,), 0.05)
    tensors["output.weight"] = rand((len(tokens), d), 0.5)
    for name, arr in tensors.items():
        w.add_tensor_f32(name, arr)
    w.write()
    return tensors


def _logits(path, ids):
    cfg, params, tok, _ = load_llama(str(path))
    cache = init_cache(cfg, 1, 32)
    out, cache = forward(params, cfg, jnp.asarray([ids]), jnp.asarray([0]),
                         cache)
    return cfg, params, cache, np.asarray(out[0], np.float64)


def test_baichuan_7b_is_llama(tmp_path):
    ids = [1, 5, 9, 200]
    _write_gguf(tmp_path / "b.gguf", "baichuan", seed=3)
    _write_gguf(tmp_path / "l.gguf", "llama", seed=3)
    cfg_b, *_, got_b = _logits(tmp_path / "b.gguf", ids)
    cfg_l, *_, got_l = _logits(tmp_path / "l.gguf", ids)
    assert not cfg_b.alibi and not cfg_b.no_rope
    np.testing.assert_allclose(got_b, got_l, rtol=1e-5, atol=1e-5)


def test_baichuan_13b_alibi(tmp_path):
    # 40 tiny layers trip the MODEL_13B detection: ALiBi on, rope off
    ids = [1, 7, 40, 99]
    _write_gguf(tmp_path / "b40.gguf", "baichuan", n_layers=40, seed=5)
    cfg, params, cache, got = _logits(tmp_path / "b40.gguf", ids)
    assert cfg.alibi and cfg.no_rope
    assert np.isfinite(got).all()
    # decode consistency: prefill(ids) + decode(nxt) == full forward
    nxt = int(got[-1].argmax())
    g2, _ = forward(params, cfg, jnp.asarray([[nxt]], jnp.int32),
                    jnp.asarray([len(ids)]), cache)
    cache2 = init_cache(cfg, 1, 32)
    full, _ = forward(params, cfg, jnp.asarray([ids + [nxt]]),
                      jnp.asarray([0]), cache2)
    np.testing.assert_allclose(np.asarray(g2[0, 0]),
                               np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4)


def _np_rmsnorm(x, w, eps=1e-5):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def _np_rope_interleaved(x, pos, theta=10000.0):
    # pairs (2i, 2i+1); freq_i = theta^(-i/(D/2))  (models/llama.py rope_angles)
    t, h, dd = x.shape
    half = dd // 2
    freqs = theta ** (-np.arange(half) / half)
    ang = np.asarray(pos)[:, None] * freqs          # [T, half]
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    even, odd = x[..., 0::2], x[..., 1::2]
    out = np.empty_like(x)
    out[..., 0::2] = even * cos - odd * sin
    out[..., 1::2] = even * sin + odd * cos
    return out


def test_plamo_matches_numpy_reference(tmp_path):
    d, n_heads, d_ff = 32, 2, 64
    hd = d // n_heads
    ids = [1, 9, 77]
    tensors = _write_gguf(tmp_path / "p.gguf", "plamo", d=d,
                          n_heads=n_heads, n_kv=n_heads, d_ff=d_ff,
                          shared_norm=True, seed=8)
    cfg, params, cache, got = _logits(tmp_path / "p.gguf", ids)
    assert cfg.parallel_residual and cfg.norm_type == "rms" \
        and not cfg.rope_neox

    # from-scratch reference: x + attn(h) + ffn(h), ONE shared norm
    emb = tensors["token_embd.weight"]
    x = emb[ids].astype(np.float64)
    t = len(ids)
    pos = np.arange(t)
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        h = _np_rmsnorm(x, tensors[p + "attn_norm.weight"])
        q = (h @ tensors[p + "attn_q.weight"].T).reshape(t, n_heads, hd)
        k = (h @ tensors[p + "attn_k.weight"].T).reshape(t, n_heads, hd)
        v = (h @ tensors[p + "attn_v.weight"].T).reshape(t, n_heads, hd)
        q = _np_rope_interleaved(q, pos)
        k = _np_rope_interleaved(k, pos)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask, scores, -1e30)
        pr = np.exp(scores - scores.max(-1, keepdims=True))
        pr = pr / pr.sum(-1, keepdims=True)
        attn = np.einsum("hts,shd->thd", pr, v).reshape(t, d)
        o = attn @ tensors[p + "attn_output.weight"].T
        g = h @ tensors[p + "ffn_gate.weight"].T
        u = h @ tensors[p + "ffn_up.weight"].T
        f = (g / (1 + np.exp(-g)) * u) @ tensors[p + "ffn_down.weight"].T
        x = x + o + f
    x = _np_rmsnorm(x, tensors["output_norm.weight"])
    want = x @ tensors["output.weight"].T
    # dense-path matmuls run in bf16 (ops/qmatmul dense branch), so compare
    # at bf16 accumulation tolerance like the HF-parity arch tests
    for ti in range(t):
        corr = np.corrcoef(want[ti], got[ti])[0, 1]
        assert corr > 0.9999, (ti, corr)
    assert (want.argmax(-1) == got.argmax(-1)).mean() == 1.0
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 3e-2


def test_plamo_decode_consistency(tmp_path):
    ids = [1, 9, 77]
    _write_gguf(tmp_path / "p.gguf", "plamo", shared_norm=True, seed=9)
    cfg, params, cache, got = _logits(tmp_path / "p.gguf", ids)
    nxt = int(got[-1].argmax())
    g2, _ = forward(params, cfg, jnp.asarray([[nxt]], jnp.int32),
                    jnp.asarray([len(ids)]), cache)
    cache2 = init_cache(cfg, 1, 32)
    full, _ = forward(params, cfg, jnp.asarray([ids + [nxt]]),
                      jnp.asarray([0]), cache2)
    np.testing.assert_allclose(np.asarray(g2[0, 0]),
                               np.asarray(full[0, -1]), rtol=2e-4, atol=2e-4)
