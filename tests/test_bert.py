"""BERT embedding model: logit parity vs transformers, pooling, WordPiece.

Reference context: the llamafile server's flagship embedding benchmark is
all-MiniLM-L6-v2 (server/doc/technical_details.md:9-47), a bert-arch GGUF.
Parity gate: our GGUF-loaded encoder must match HuggingFace BertModel on the
same random weights.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llamafile_tpu.gguf import GGUFWriter
from llamafile_tpu.models.bert import (WordPieceTokenizer, bert_forward,
                                       load_bert)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "brown", "fox",
         "jump", "##s", "##ing", "over", "lazy", "dog", "!", "a", "b", "hello",
         "world"]


def _make_hf(tmp_path, n_layers=2, d=32, heads=2, dff=64):
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB) + 80, hidden_size=d, num_hidden_layers=n_layers,
        num_attention_heads=heads, intermediate_size=dff,
        max_position_embeddings=64, hidden_act="gelu")
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return cfg, model


def _write_gguf(path, cfg, model):
    w = GGUFWriter(str(path))
    w.add("general.architecture", "bert")
    w.add("bert.block_count", cfg.num_hidden_layers)
    w.add("bert.embedding_length", cfg.hidden_size)
    w.add("bert.attention.head_count", cfg.num_attention_heads)
    w.add("bert.feed_forward_length", cfg.intermediate_size)
    w.add("bert.context_length", cfg.max_position_embeddings)
    w.add("bert.attention.layer_norm_epsilon", float(cfg.layer_norm_eps))
    w.add("bert.pooling_type", 1)
    toks = VOCAB + [f"[unused{i}]" for i in range(80)]
    w.add("tokenizer.ggml.model", "bert")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.unknown_token_id", 1)
    w.add("tokenizer.ggml.cls_token_id", 2)
    w.add("tokenizer.ggml.seperator_token_id", 3)
    w.add("tokenizer.ggml.padding_token_id", 0)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    mapping = [
        ("embeddings.word_embeddings.weight", "token_embd.weight"),
        ("embeddings.position_embeddings.weight", "position_embd.weight"),
        ("embeddings.token_type_embeddings.weight", "token_types.weight"),
        ("embeddings.LayerNorm.weight", "token_embd_norm.weight"),
        ("embeddings.LayerNorm.bias", "token_embd_norm.bias"),
    ]
    layer_map = [
        ("attention.self.query", "attn_q"),
        ("attention.self.key", "attn_k"),
        ("attention.self.value", "attn_v"),
        ("attention.output.dense", "attn_output"),
        ("attention.output.LayerNorm", "attn_output_norm"),
        ("intermediate.dense", "ffn_up"),
        ("output.dense", "ffn_down"),
        ("output.LayerNorm", "layer_output_norm"),
    ]
    for hf, gg in mapping:
        w.add_tensor_f32(gg, sd[hf])
    for i in range(cfg.num_hidden_layers):
        for hf, gg in layer_map:
            for suf in ("weight", "bias"):
                w.add_tensor_f32(f"blk.{i}.{gg}.{suf}",
                                 sd[f"encoder.layer.{i}.{hf}.{suf}"])
    w.write()


def test_bert_matches_transformers(tmp_path):
    cfg, model = _make_hf(tmp_path)
    path = tmp_path / "bert.gguf"
    _write_gguf(path, cfg, model)
    emb = load_bert(str(path))
    ids = np.array([[2, 4, 5, 6, 7, 3], [2, 17, 18, 3, 0, 0]], np.int64)
    mask = (ids != 0).astype(np.float32)
    with torch.no_grad():
        hf = model(torch.tensor(ids),
                   attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    import jax.numpy as jnp
    ours = np.asarray(bert_forward(emb.params, emb.cfg,
                                   jnp.asarray(ids, jnp.int32),
                                   jnp.asarray(mask)))
    # compare only real (unmasked) positions
    for r in range(2):
        n = int(mask[r].sum())
        np.testing.assert_allclose(ours[r, :n], hf[r, :n],
                                   atol=3e-4, rtol=1e-3)


def test_bert_embed_pooling_and_norm(tmp_path):
    cfg, model = _make_hf(tmp_path)
    path = tmp_path / "bert.gguf"
    _write_gguf(path, cfg, model)
    emb = load_bert(str(path))
    vecs = emb.embed(["the quick brown fox", "hello world"])
    assert vecs.shape == (2, cfg.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)
    # similarity sanity: same text ~ identical
    v2 = emb.embed(["the quick brown fox"])
    assert float(vecs[0] @ v2[0]) > 0.999


def test_wordpiece_tokenizer():
    tok = WordPieceTokenizer({
        "tokenizer.ggml.tokens": VOCAB,
        "tokenizer.ggml.unknown_token_id": 1,
        "tokenizer.ggml.cls_token_id": 2,
        "tokenizer.ggml.seperator_token_id": 3,
        "tokenizer.ggml.padding_token_id": 0,
    })
    # greedy longest-match with ## continuations
    ids = tok.encode("The jumps!")
    # [CLS] the jump ##s ! [SEP]
    assert ids == [2, 4, 8, 9, 14, 3]
    assert tok.encode("zzz") == [2, 1, 3]        # unknown word -> [UNK]


def test_server_embeddings_bert(tmp_path):
    """End-to-end: bert GGUF served over /v1/embeddings; generation 400s."""
    import json
    import socket
    import threading
    import time
    import urllib.request
    import urllib.error

    cfg, model = _make_hf(tmp_path)
    path = tmp_path / "bert.gguf"
    _write_gguf(path, cfg, model)
    from llamafile_tpu.server.http import Server
    from llamafile_tpu.utils.flags import Flags
    import asyncio
    flags = Flags(model=str(path), listen="127.0.0.1:0")
    srv = Server(flags)
    assert srv.bert is not None and srv.engine is None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    async def serve():
        server = await asyncio.start_server(srv.handle, "127.0.0.1", port)
        async with server:
            await server.serve_forever()

    t = threading.Thread(target=lambda: asyncio.run(serve()), daemon=True)
    t.start()
    time.sleep(1.0)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/embeddings",
        data=json.dumps({"input": ["hello world", "the fox"]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        out = json.loads(resp.read())
    assert len(out["data"]) == 2
    assert len(out["data"][0]["embedding"]) == cfg.hidden_size
    # generation endpoint refuses politely
    req2 = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({"messages": []}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req2, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
