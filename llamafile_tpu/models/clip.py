"""CLIP vision encoder + LLaVA projector (multimodal tower).

TPU-native re-design of the reference's clip.cpp/llava.cpp
(SURVEY.md §2.4: llava_clip.cpp.patch; llava_image_embed_make_with_bytes feeds
image embeddings as embd batches). A functional ViT in JAX consuming the
standard mmproj GGUF (clip.cpp tensor naming: v.blk.N.*, mm.* projector;
note clip.cpp's historical quirk that mlp.fc1 is stored as ffn_down and fc2 as
ffn_up). Output embeddings are spliced into the LLM prompt as image atoms.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader


@dataclass(frozen=True)
class ClipConfig:
    image_size: int = 336
    patch_size: int = 14
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    d_ff: int = 4096
    proj_dim: int = 4096
    eps: float = 1e-5
    projector_type: str = "mlp"
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    select_layer: int = -2          # llava uses penultimate layer features

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "ClipConfig":
        g = r.metadata.get
        return cls(
            image_size=int(g("clip.vision.image_size", 336)),
            patch_size=int(g("clip.vision.patch_size", 14)),
            d_model=int(g("clip.vision.embedding_length", 1024)),
            n_layers=int(g("clip.vision.block_count", 24)),
            n_heads=int(g("clip.vision.attention.head_count", 16)),
            d_ff=int(g("clip.vision.feed_forward_length", 4096)),
            proj_dim=int(g("clip.vision.projection_dim", 4096)),
            eps=float(g("clip.vision.attention.layer_norm_epsilon", 1e-5)),
            projector_type=str(g("clip.projector_type", "mlp")),
            image_mean=tuple(np.asarray(g("clip.vision.image_mean",
                                          cls.image_mean), np.float32)),
            image_std=tuple(np.asarray(g("clip.vision.image_std",
                                         cls.image_std), np.float32)),
        )


def load_clip(path: str):
    """Load an mmproj GGUF -> (ClipConfig, params dict of jnp arrays)."""
    r = GGUFReader(path)
    cfg = ClipConfig.from_gguf(r)
    p = {}
    for name in r.tensors:
        p[name] = jnp.asarray(r.tensor_f32(name))
    return cfg, p


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _gelu_quick(x):
    # clip.cpp uses quick-gelu (x * sigmoid(1.702x)) for the ViT MLP
    return x * jax.nn.sigmoid(1.702 * x)


def preprocess_image(img, cfg: ClipConfig) -> np.ndarray:
    """PIL image / ndarray -> normalized f32 [H, W, 3] (square resize,
    clip.cpp clip_image_preprocess behavior for llava-1.5)."""
    from PIL import Image
    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    img = img.convert("RGB").resize((cfg.image_size, cfg.image_size),
                                    Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    return (x - mean) / std


def encode_image(cfg: ClipConfig, p: dict, pixels: jax.Array) -> jax.Array:
    """pixels [H, W, 3] f32 normalized -> image embeddings [n_patches, proj_dim].

    ViT: conv patch embed + class token + learned positions, pre-LN blocks,
    penultimate-layer features, then the LLaVA mlp projector (mm.0 / mm.2).
    """
    ps = cfg.patch_size
    n_side = cfg.image_size // ps
    n_patch = n_side * n_side
    # patch embedding: conv with stride ps == unfold + matmul
    kernel = p["v.patch_embd.weight"]          # [d, 3, ps, ps]
    x = pixels.reshape(n_side, ps, n_side, ps, 3).transpose(0, 2, 1, 3, 4)
    x = x.reshape(n_patch, ps * ps * 3)
    kmat = jnp.transpose(kernel, (0, 2, 3, 1)).reshape(cfg.d_model, ps * ps * 3)
    x = x @ kmat.T                             # [n_patch, d]
    cls = p["v.class_embd"].reshape(1, cfg.d_model)
    x = jnp.concatenate([cls, x], axis=0)      # [1+n_patch, d]
    x = x + p["v.position_embd.weight"][: 1 + n_patch]
    if "v.pre_ln.weight" in p:
        x = _ln(x, p["v.pre_ln.weight"], p["v.pre_ln.bias"], cfg.eps)

    n_keep = cfg.n_layers + cfg.select_layer + 1   # run up to penultimate layer
    hd = cfg.d_model // cfg.n_heads
    for i in range(n_keep):
        pre = f"v.blk.{i}."
        h = _ln(x, p[pre + "ln1.weight"], p[pre + "ln1.bias"], cfg.eps)
        q = h @ p[pre + "attn_q.weight"].T + p[pre + "attn_q.bias"]
        k = h @ p[pre + "attn_k.weight"].T + p[pre + "attn_k.bias"]
        v = h @ p[pre + "attn_v.weight"].T + p[pre + "attn_v.bias"]
        t = x.shape[0]
        q = q.reshape(t, cfg.n_heads, hd).transpose(1, 0, 2)
        k = k.reshape(t, cfg.n_heads, hd).transpose(1, 0, 2)
        v = v.reshape(t, cfg.n_heads, hd).transpose(1, 0, 2)
        att = jax.nn.softmax((q @ k.transpose(0, 2, 1)) / np.sqrt(hd), axis=-1)
        o = (att @ v).transpose(1, 0, 2).reshape(t, cfg.d_model)
        x = x + (o @ p[pre + "attn_out.weight"].T + p[pre + "attn_out.bias"])
        h = _ln(x, p[pre + "ln2.weight"], p[pre + "ln2.bias"], cfg.eps)
        # clip.cpp quirk: fc1 stored as ffn_down, fc2 as ffn_up
        h = _gelu_quick(h @ p[pre + "ffn_down.weight"].T + p[pre + "ffn_down.bias"])
        h = h @ p[pre + "ffn_up.weight"].T + p[pre + "ffn_up.bias"]
        x = x + h

    feats = x[1:]                               # drop class token (llava mlp)
    if cfg.projector_type.startswith("mlp"):
        y = feats @ p["mm.0.weight"].T + p["mm.0.bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = y @ p["mm.2.weight"].T + p["mm.2.bias"]
        return y
    raise NotImplementedError(f"projector {cfg.projector_type}")


class LlavaEncoder:
    """Image -> language-model embedding tokens (llava_image_embed analog)."""

    def __init__(self, mmproj_path: str):
        self.cfg, self.params = load_clip(mmproj_path)
        self._jit = jax.jit(lambda px: encode_image(self.cfg, self.params, px))

    def embed(self, image) -> np.ndarray:
        px = preprocess_image(image, self.cfg)
        return np.asarray(self._jit(jnp.asarray(px)))

    def embed_bytes(self, data: bytes) -> np.ndarray:
        import io
        from PIL import Image
        return self.embed(Image.open(io.BytesIO(data)))
