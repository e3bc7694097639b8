"""GGUF LoRA adapters: runtime low-rank application must match merging
scale*B@A into the base weights (golden computed through HF transformers).

Reference: --lora/--lora-scaled (llamafile-files/server/README.md:20-21);
adapter GGUF tensor naming <base>.lora_a/.lora_b + adapter.lora.alpha
(llama.cpp.patch llama_lora_adapter_init_internal)."""
import json
import subprocess
import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llamafile_tpu.gguf.writer import GGUFWriter

RANK = 4
ALPHA = 8.0


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf") / "tiny"
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(str(d), safe_serialization=True)
    gguf = tmp_path_factory.mktemp("g") / "base.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d),
                        str(gguf)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-1500:]
    return cfg, model, str(gguf)


def _make_adapter(path, deltas, alpha=ALPHA):
    """deltas: {gguf_base_name: (A [r,K], B [N,r])} -> adapter GGUF."""
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", alpha)
    for base_name, (a, b) in deltas.items():
        w.add_tensor_f32(base_name + ".lora_a", a.astype(np.float32))
        w.add_tensor_f32(base_name + ".lora_b", b.astype(np.float32))
    w.write()


def test_lora_parity_vs_merged_hf(base, tmp_path):
    cfg, model, gguf = base
    rng = np.random.default_rng(3)
    # adapt q-proj of layer 0 and down-proj of layer 1
    # (q_proj needs the same interleaved-rope permutation the converter
    # applies to the base weight: permute B's output rows)
    a_q = rng.standard_normal((RANK, 64)).astype(np.float32) * 0.05
    b_q = rng.standard_normal((64, RANK)).astype(np.float32) * 0.05
    a_d = rng.standard_normal((RANK, 128)).astype(np.float32) * 0.05
    b_d = rng.standard_normal((64, RANK)).astype(np.float32) * 0.05
    s = ALPHA / RANK

    # golden: merge into the HF model and run transformers
    import copy
    m2 = copy.deepcopy(model)
    with torch.no_grad():
        m2.model.layers[0].self_attn.q_proj.weight += torch.tensor(
            s * (b_q @ a_q))
        m2.model.layers[1].mlp.down_proj.weight += torch.tensor(
            s * (b_d @ a_d))
    ids = [[3, 17, 42, 99, 7]]
    with torch.no_grad():
        want = m2(torch.tensor(ids)).logits[0].float().numpy()

    # our side: the converter permutes q rows for interleaved rope, so the
    # adapter's q-side B must be permuted the same way
    sys.path.insert(0, "tools")
    from convert_hf import permute_qk
    adapter = str(tmp_path / "adapter.gguf")
    _make_adapter(adapter, {
        "blk.0.attn_q.weight": (a_q, permute_qk(b_q, 4)),
        "blk.1.ffn_down.weight": (a_d, b_d),
    })

    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.models.lora import apply_lora
    mcfg, params, tok, _ = load_llama(gguf, fuse=False)
    params = apply_lora(params, mcfg, adapter)
    cache = init_cache(mcfg, 1, 16)
    got, _ = forward(params, mcfg, jnp.asarray(ids), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    assert np.array_equal(want.argmax(-1), got.argmax(-1))


def test_lora_scale_and_stacking(base, tmp_path):
    """--lora-scaled semantics: scale 0 is a no-op; two adapters stack."""
    cfg, model, gguf = base
    rng = np.random.default_rng(5)
    a = rng.standard_normal((RANK, 64)).astype(np.float32) * 0.1
    b = rng.standard_normal((128, RANK)).astype(np.float32) * 0.1
    adapter = str(tmp_path / "a.gguf")
    _make_adapter(adapter, {"blk.0.ffn_up.weight": (a, b)})

    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.models.lora import apply_lora
    ids = jnp.asarray([[5, 9, 2]])
    mcfg, params, tok, _ = load_llama(gguf, fuse=False)
    base_lg, _ = forward(params, mcfg, ids, jnp.asarray([0]),
                         init_cache(mcfg, 1, 8))
    z = apply_lora(params, mcfg, adapter, scale=0.0)
    z_lg, _ = forward(z, mcfg, ids, jnp.asarray([0]), init_cache(mcfg, 1, 8))
    np.testing.assert_allclose(np.asarray(z_lg), np.asarray(base_lg),
                               atol=1e-4)
    one = apply_lora(params, mcfg, adapter, scale=1.0)
    one_lg, _ = forward(one, mcfg, ids, jnp.asarray([0]),
                        init_cache(mcfg, 1, 8))
    assert np.abs(np.asarray(one_lg) - np.asarray(base_lg)).max() > 1e-3
    # stacking the same adapter at 0.5 + 0.5 == applying once at 1.0
    half2 = apply_lora(apply_lora(params, mcfg, adapter, 0.5),
                       mcfg, adapter, 0.5)
    h_lg, _ = forward(half2, mcfg, ids, jnp.asarray([0]),
                      init_cache(mcfg, 1, 8))
    np.testing.assert_allclose(np.asarray(h_lg), np.asarray(one_lg),
                               atol=2e-2, rtol=2e-2)
