"""BERT-family embedding models (all-MiniLM class) from GGUF.

The reference's flagship serving benchmark is all-MiniLM-L6-v2 embeddings
(llamafile/server/doc/technical_details.md:9-47); its loader covers the
`bert` GGUF architecture (upstream llama.cpp build_bert graph). TPU-native
version: one jit'd bidirectional encoder — learned position embeddings +
token-type embeddings, post-attention LayerNorm (not RMSNorm), GELU FFN —
with pooling (none/mean/cls/last) selected from GGUF metadata, plus the
WordPiece tokenizer the bert vocab uses.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

# llama.cpp llama_pooling_type values
POOLING = {0: "none", 1: "mean", 2: "cls", 3: "last"}


@dataclass(frozen=True)
class BertConfig:
    n_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    n_vocab: int
    max_pos: int
    eps: float = 1e-12
    pooling: str = "mean"

    @classmethod
    def from_gguf(cls, reader) -> "BertConfig":
        f = reader.field
        return cls(
            n_layers=int(f("{arch}.block_count")),
            d_model=int(f("{arch}.embedding_length")),
            n_heads=int(f("{arch}.attention.head_count")),
            d_ff=int(f("{arch}.feed_forward_length")),
            n_vocab=len(reader.metadata.get("tokenizer.ggml.tokens", []))
            or int(f("{arch}.vocab_size", 0)),
            max_pos=int(f("{arch}.context_length", 512)),
            eps=float(f("{arch}.attention.layer_norm_epsilon", 1e-12)),
            pooling=POOLING.get(int(f("{arch}.pooling_type", 1) or 1), "mean"),
        )


class WordPieceTokenizer:
    """BERT WordPiece (tokenizer.ggml.model == "bert"): greedy
    longest-match-first with ## continuation pieces, basic lowercasing +
    punctuation/CJK splitting (upstream llm_tokenizer_wpm semantics)."""

    def __init__(self, metadata: Dict):
        toks = metadata.get("tokenizer.ggml.tokens", [])
        self.tokens = [t.decode() if isinstance(t, bytes) else t
                       for t in toks]
        self.vocab = {t: i for i, t in enumerate(self.tokens)}
        self.unk = int(metadata.get("tokenizer.ggml.unknown_token_id", 100))
        self.cls = int(metadata.get("tokenizer.ggml.cls_token_id",
                                    metadata.get("tokenizer.ggml.bos_token_id",
                                                 101)))
        self.sep = int(metadata.get("tokenizer.ggml.seperator_token_id",
                                    metadata.get("tokenizer.ggml.eos_token_id",
                                                 102)))
        self.pad = int(metadata.get("tokenizer.ggml.padding_token_id", 0))

    def _words(self, text: str) -> List[str]:
        out, cur = [], []
        for ch in text.lower():
            if ch.isspace():
                if cur:
                    out.append("".join(cur))
                    cur = []
            elif not (ch.isalnum() or ch == "'"):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def encode(self, text: str, max_len: Optional[int] = None) -> List[int]:
        ids = [self.cls]
        for w in self._words(text):
            start, pieces = 0, []
            while start < len(w):
                end = len(w)
                piece = None
                while end > start:
                    cand = ("##" if start else "") + w[start:end]
                    if cand in self.vocab:
                        piece = self.vocab[cand]
                        break
                    end -= 1
                if piece is None:
                    pieces = [self.unk]
                    break
                pieces.append(piece)
                start = end
            ids.extend(pieces)
        ids.append(self.sep)
        if max_len and len(ids) > max_len:
            ids = ids[:max_len - 1] + [self.sep]
        return ids

    def is_eog(self, tid: int) -> bool:          # Engine-compat surface
        return tid == self.sep


@functools.partial(jax.jit, static_argnames=("cfg",))
def bert_forward(params: Dict, cfg: BertConfig, tokens: jax.Array,
                 mask: jax.Array) -> jax.Array:
    """tokens int32 [B, T], mask f32 [B, T] (1 = real) -> [B, T, d] hidden."""
    b, t = tokens.shape

    def ln(x, name):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return ((x - mu) * jax.lax.rsqrt(var + cfg.eps)
                * params[name + ".weight"] + params[name + ".bias"])

    x = (params["token_embd.weight"][tokens]
         + params["position_embd.weight"][jnp.arange(t)][None]
         + params["token_types.weight"][0][None, None])
    x = ln(x.astype(jnp.float32), "token_embd_norm")
    hd = cfg.d_model // cfg.n_heads
    neg = (1.0 - mask)[:, None, None, :] * -1e30       # [B, 1, 1, T]
    for li in range(cfg.n_layers):
        p = f"blk.{li}."

        def proj(name, y):
            return y @ params[p + name + ".weight"].T + params[p + name + ".bias"]

        q = proj("attn_q", x).reshape(b, t, cfg.n_heads, hd)
        k = proj("attn_k", x).reshape(b, t, cfg.n_heads, hd)
        v = proj("attn_v", x).reshape(b, t, cfg.n_heads, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd) + neg
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, cfg.d_model)
        x = ln(x + proj("attn_output", o), p + "attn_output_norm")
        h = jax.nn.gelu(proj("ffn_up", x), approximate=False)
        x = ln(x + proj("ffn_down", h), p + "layer_output_norm")
    return x


class BertEmbedder:
    """Loaded bert model: tokenize + encode + pool + normalize."""

    def __init__(self, reader):
        self.cfg = BertConfig.from_gguf(reader)
        self.tokenizer = WordPieceTokenizer(reader.metadata)
        self.params = {}
        for name in reader.tensors:
            self.params[name] = jnp.asarray(reader.tensor_f32(name))

    def embed(self, texts: List[str], normalize: bool = True) -> np.ndarray:
        """-> [N, d] float32 (unit-normalized by default, reference server
        embedding behavior)."""
        if not texts:
            return np.zeros((0, self.cfg.d_model), np.float32)
        idlists = [self.tokenizer.encode(t, self.cfg.max_pos) for t in texts]
        t = max(8, max(len(i) for i in idlists))
        t = min(self.cfg.max_pos, -(-t // 8) * 8)
        toks = np.full((len(texts), t), self.tokenizer.pad, np.int32)
        mask = np.zeros((len(texts), t), np.float32)
        for r, ids in enumerate(idlists):
            toks[r, :len(ids)] = ids[:t]
            mask[r, :len(ids)] = 1.0
        hidden = bert_forward(self.params, self.cfg, jnp.asarray(toks),
                              jnp.asarray(mask))
        hidden = np.asarray(hidden, np.float32)
        if self.cfg.pooling == "cls":
            out = hidden[:, 0]
        elif self.cfg.pooling == "last":
            idx = mask.sum(1).astype(int) - 1
            out = hidden[np.arange(len(texts)), idx]
        else:                                      # mean (masked)
            w = mask[:, :, None]
            out = (hidden * w).sum(1) / np.maximum(w.sum(1), 1e-9)
        if normalize:
            out = out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True),
                                   1e-12)
        return out


def load_bert(path: str) -> BertEmbedder:
    from ..gguf.reader import GGUFReader
    r = GGUFReader(path)
    if r.architecture not in ("bert", "nomic-bert", "jina-bert-v2"):
        raise ValueError(f"not a bert-family GGUF: {r.architecture}")
    return BertEmbedder(r)
