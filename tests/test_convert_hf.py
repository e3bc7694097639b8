"""HF -> GGUF converter test: logits parity against transformers' forward.

This is the strongest correctness check in the suite: a real (tiny) HF llama
checkpoint converted through tools/convert_hf.py must reproduce transformers'
logits through our whole stack (GGUF parse -> repack -> kernels -> runtime).
"""
import json
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
    d = tmp_path_factory.mktemp("hf") / "tinyllama"
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def test_convert_and_logit_parity(hf_dir, tmp_path):
    d, model = hf_dir
    out = tmp_path / "m.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d), str(out)],
                       capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]

    ids = [[3, 17, 42, 99, 7]]
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits[0].float().numpy()

    import jax.numpy as jnp
    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    cfg, params, tok, _ = load_llama(str(out))
    cache = init_cache(cfg, 1, 16)
    got, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray([0]), cache)
    got = np.asarray(got[0], np.float64)
    # F16 storage + bf16 matmuls: compare correlation & argmax agreement
    for t in range(len(ids[0])):
        corr = np.corrcoef(want[t], got[t])[0, 1]
        assert corr > 0.999, (t, corr)
    assert np.array_equal(want.argmax(-1), got.argmax(-1))
