"""OLMo arch: non-parametric LayerNorm + clamp_kqv, parity vs transformers.

Reference loader coverage (upstream llama.cpp build_olmo via llama.cpp.patch):
olmo GGUFs carry NO norm weight tensors (build_norm gets a NULL weight —
plain mean/variance LayerNorm) and clamp q/k/v to +-clamp_kqv.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from llamafile_tpu.gguf import GGUFWriter
from llamafile_tpu.models.llama import forward, init_cache
from llamafile_tpu.models.loader import load_llama
from tests.util_models import byte_vocab


def test_olmo_matches_transformers(tmp_path):
    cfg = transformers.OlmoConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, clip_qkv=0.4, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    hf = transformers.OlmoModel(cfg)
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    path = str(tmp_path / "olmo.gguf")
    tokens, scores, token_type = byte_vocab()
    w = GGUFWriter(path)
    w.add("general.architecture", "olmo")
    w.add("olmo.block_count", 2)
    w.add("olmo.embedding_length", 64)
    w.add("olmo.attention.head_count", 4)
    w.add("olmo.attention.head_count_kv", 4)
    w.add("olmo.feed_forward_length", 128)
    w.add("olmo.rope.freq_base", 10000.0)
    w.add("olmo.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("olmo.attention.clamp_kqv", 0.4)
    w.add("olmo.context_length", 128)
    w.add("olmo.vocab_size", len(tokens))
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", np.asarray(token_type, np.int32))
    layer_map = [("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
                 ("self_attn.v_proj", "attn_v"),
                 ("self_attn.o_proj", "attn_output"),
                 ("mlp.gate_proj", "ffn_gate"), ("mlp.up_proj", "ffn_up"),
                 ("mlp.down_proj", "ffn_down")]
    w.add_tensor_f32("token_embd.weight", sd["embed_tokens.weight"])
    for i in range(2):
        for hfn, ggn in layer_map:
            w.add_tensor_f32(f"blk.{i}.{ggn}.weight",
                             sd[f"layers.{i}.{hfn}.weight"])
    w.add_tensor_f32("output.weight", sd["embed_tokens.weight"])
    w.write()

    mcfg, params, _t, _ = load_llama(path, fuse=False)
    assert mcfg.norm_type == "ln_np"
    assert mcfg.clamp_qkv == pytest.approx(0.4)
    assert mcfg.rope_neox
    ids = np.array([[3, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        hfh = hf(torch.tensor(ids)).last_hidden_state.numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids, jnp.int32),
                      jnp.zeros((1,), jnp.int32), init_cache(mcfg, 1, 16),
                      return_hidden=True)
    # our dense weights round to bf16 at load (QTensor storage); HF is f32
    np.testing.assert_allclose(np.asarray(ours)[0], hfh[0],
                               atol=3e-2, rtol=3e-2)
