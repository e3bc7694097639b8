"""Paged decode parity for non-llama arch families.

Round-2 served every non-MLA/non-recurrent arch through the paged batcher,
but forward_paged_decode's layer body only carried the rms-llama branches —
MoE crashed at trace time and the LN family (gptneox/falcon/phi2/starcoder2)
decoded silently wrong (full-head rope on partial-rotary heads, dropped LN
biases, sequentialized parallel residual). The body now routes through
_rope_qk/_finish_layer/_ffn_core; this locks dense-vs-paged logits together
per family.

Reference: upstream build_gptneox/build_mixtral (arch registry, SURVEY §2.4).
"""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _paged_vs_dense(gguf_path, ids):
    import jax.numpy as jnp

    from llamafile_tpu.models.llama import (forward, forward_paged_decode,
                                            init_cache)
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.runtime.paged import (PageAllocator, copy_row_to_pages,
                                             init_paged)
    cfg, params, tok, _ = load_llama(str(gguf_path))
    ps, max_len = 16, 64
    alloc = PageAllocator(1 + max_len // ps, ps, 1, max_len)
    paged = init_paged(cfg.n_layers, cfg.n_kv_heads, 1 + max_len // ps, ps,
                       cfg.head_dim, v_head_dim=getattr(cfg, "v_head_dim", 0))
    dense = init_cache(cfg, 1, max_len)
    n = len(ids)
    _, dense = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                       jnp.asarray([0]), dense)
    alloc.ensure(0, n)
    alloc.lengths[0] = n
    paged = copy_row_to_pages(paged, dense.k[:, 0:1], dense.v[:, 0:1],
                              jnp.asarray(alloc.tables[0], jnp.int32), ps=ps)
    tables = alloc.device_tables(1)
    tok_next = jnp.asarray([ids[-1]], jnp.int32)
    pos = jnp.asarray([n], jnp.int32)
    l_dense, _ = forward(params, cfg, tok_next[:, None], pos, dense)
    l_paged, _ = forward_paged_decode(params, cfg, tok_next, pos, paged,
                                      tables)
    np.testing.assert_allclose(np.asarray(l_dense[:, 0], np.float32),
                               np.asarray(l_paged, np.float32),
                               atol=3e-2, rtol=1e-3)
    return cfg


def _convert(model, tmp_path):
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d),
                        str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    return out


def test_paged_gptneox(tmp_path):
    """LN biases + parallel residual + partial rotary + gateless GELU FFN."""
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=True, max_position_embeddings=128,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(0)
    out = _convert(transformers.GPTNeoXForCausalLM(cfg), tmp_path)
    lcfg = _paged_vs_dense(out, [3, 17, 42, 99, 7])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual
    assert lcfg.rope_dim == 4


def test_paged_mixtral(tmp_path):
    """Sparse MoE FFN in the paged layer body (previously trace-crashed)."""
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(1)
    out = _convert(transformers.MixtralForCausalLM(cfg), tmp_path)
    lcfg = _paged_vs_dense(out, [5, 9, 200, 31, 77])
    assert lcfg.n_experts == 4


def test_paged_deepseek2_mla(tmp_path):
    """MLA in the paged pool: asymmetric k/v page widths (qk heads nope+rope
    wide, V heads v_head_dim wide), rope only on the shared k_pe slice."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=24,
        kv_lora_rank=32, n_routed_experts=4, num_experts_per_tok=2,
        n_shared_experts=1, first_k_dense_replace=1, topk_method="greedy",
        norm_topk_prob=False, routed_scaling_factor=2.0,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False, q_lora_rank=None)
    torch.manual_seed(0)
    out = _convert(transformers.DeepseekV2ForCausalLM(cfg), tmp_path)
    lcfg = _paged_vs_dense(out, [3, 17, 42, 99, 7])
    assert lcfg.kv_lora_rank == 32 and lcfg.v_head_dim == 24


def test_paged_cohere(tmp_path):
    """Shared input norm (ffn_norm=None) + parallel residual + logit scale."""
    cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, logit_scale=0.25,
        tie_word_embeddings=True, use_qk_norm=False)
    torch.manual_seed(2)
    out = _convert(transformers.CohereForCausalLM(cfg), tmp_path)
    lcfg = _paged_vs_dense(out, [8, 30, 90, 111, 2])
    assert lcfg.parallel_residual
