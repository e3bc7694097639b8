"""Stable Diffusion 1.x txt2img: CLIP-L text encoder + UNet + VAE decoder.

TPU-native re-design of sdfile (reference: stable-diffusion.cpp.patches/ —
SURVEY.md §2.9 sibling engines). Consumes SD 1.x weights in GGUF form
(stable-diffusion.cpp convention: original checkpoint tensor names —
cond_stage_model.*, model.diffusion_model.*, first_stage_model.*) or any GGUF
carrying those names; all three networks run as jit'd JAX functions; sampling
is DDIM with classifier-free guidance.

Status: v1 — architecture complete and pipeline-tested on synthetic weights
(shape/flow correctness); numerical parity against reference outputs awaits a
real checkpoint in the test environment (zero egress).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------

def load_sd(path: str) -> Dict[str, jnp.ndarray]:
    r = GGUFReader(path)
    params = {}
    for name in r.tensors:
        params[name] = jnp.asarray(r.tensor_f32(name))
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def conv2d(x, w, b=None, stride=1, padding=1):
    """x [B, H, W, C]; w [O, I, kh, kw] (checkpoint layout)."""
    out = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)),          # HWIO
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def group_norm(x, w, b, groups=32, eps=1e-6):
    bshape, c = x.shape[:-1], x.shape[-1]
    g = x.reshape(*bshape, groups, c // groups)
    axes = tuple(range(1, len(bshape))) + (len(bshape) + 1,)
    # normalize over spatial dims and within-group channels
    flat = g.reshape(g.shape[0], -1, groups, c // groups)
    mu = flat.mean(axis=(1, 3), keepdims=True)
    var = ((flat - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    out = ((flat - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return out * w + b


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def silu(x):
    return x * jax.nn.sigmoid(x)


def attn(q, k, v, heads):
    b, tq, c = q.shape
    tk = k.shape[1]
    hd = c // heads
    q = q.reshape(b, tq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
    s = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
    return (s @ v).transpose(0, 2, 1, 3).reshape(b, tq, c)


# ---------------------------------------------------------------------------
# CLIP-L text encoder (cond_stage_model)
# ---------------------------------------------------------------------------

CLIP_LAYERS = 12
CLIP_D = 768
CLIP_HEADS = 12
CLIP_CTX = 77
BOS, EOS = 49406, 49407


def clip_text(params, tokens, clip_skip: int = 1):
    """tokens int32 [B, 77] -> [B, 77, 768] (final LN, SD1.x uses last layer).

    clip_skip follows the reference semantics (sdfile --clip-skip,
    main.cpp:203): 1 uses the last layer, 2 drops one layer, etc. The final
    LayerNorm always applies."""
    p = "cond_stage_model.transformer.text_model."
    x = params[p + "embeddings.token_embedding.weight"][tokens]
    x = x + params[p + "embeddings.position_embedding.weight"][: tokens.shape[1]]
    t = tokens.shape[1]
    causal = jnp.tril(jnp.ones((t, t), bool))
    n_layers = CLIP_LAYERS - max(0, int(clip_skip) - 1)
    for i in range(n_layers):
        lp = p + f"encoder.layers.{i}."
        h = layer_norm(x, params[lp + "layer_norm1.weight"],
                       params[lp + "layer_norm1.bias"])
        q = h @ params[lp + "self_attn.q_proj.weight"].T + params[lp + "self_attn.q_proj.bias"]
        k = h @ params[lp + "self_attn.k_proj.weight"].T + params[lp + "self_attn.k_proj.bias"]
        v = h @ params[lp + "self_attn.v_proj.weight"].T + params[lp + "self_attn.v_proj.bias"]
        b, tq, c = q.shape
        hd = c // CLIP_HEADS
        qh = q.reshape(b, tq, CLIP_HEADS, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, tq, CLIP_HEADS, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, tq, CLIP_HEADS, hd).transpose(0, 2, 1, 3)
        s = qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(hd)
        s = jnp.where(causal[None, None], s, -1e30)
        o = (jax.nn.softmax(s, axis=-1) @ vh).transpose(0, 2, 1, 3).reshape(b, tq, c)
        x = x + (o @ params[lp + "self_attn.out_proj.weight"].T
                 + params[lp + "self_attn.out_proj.bias"])
        h = layer_norm(x, params[lp + "layer_norm2.weight"],
                       params[lp + "layer_norm2.bias"])
        h = h @ params[lp + "mlp.fc1.weight"].T + params[lp + "mlp.fc1.bias"]
        h = h * jax.nn.sigmoid(1.702 * h)            # quick-gelu
        x = x + (h @ params[lp + "mlp.fc2.weight"].T + params[lp + "mlp.fc2.bias"])
    return layer_norm(x, params[p + "final_layer_norm.weight"],
                      params[p + "final_layer_norm.bias"])


# ---------------------------------------------------------------------------
# UNet (model.diffusion_model)
# ---------------------------------------------------------------------------

def timestep_embedding(t, dim=320):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    ang = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _resblock(params, pre, x, emb):
    h = group_norm(x, params[pre + "in_layers.0.weight"],
                   params[pre + "in_layers.0.bias"])
    h = conv2d(silu(h), params[pre + "in_layers.2.weight"],
               params[pre + "in_layers.2.bias"])
    e = silu(emb) @ params[pre + "emb_layers.1.weight"].T \
        + params[pre + "emb_layers.1.bias"]
    h = h + e[:, None, None, :]
    h = group_norm(h, params[pre + "out_layers.0.weight"],
                   params[pre + "out_layers.0.bias"])
    h = conv2d(silu(h), params[pre + "out_layers.3.weight"],
               params[pre + "out_layers.3.bias"])
    if pre + "skip_connection.weight" in params:
        w = params[pre + "skip_connection.weight"]
        x = conv2d(x, w, params[pre + "skip_connection.bias"], padding=0)
    return x + h


def _spatial_transformer(params, pre, x, ctx, heads=8):
    b, hh, ww, c = x.shape
    h = group_norm(x, params[pre + "norm.weight"], params[pre + "norm.bias"])
    h = conv2d(h, params[pre + "proj_in.weight"], params[pre + "proj_in.bias"],
               padding=0)
    h = h.reshape(b, hh * ww, c)
    tb = pre + "transformer_blocks.0."
    hn = layer_norm(h, params[tb + "norm1.weight"], params[tb + "norm1.bias"])
    q = hn @ params[tb + "attn1.to_q.weight"].T
    k = hn @ params[tb + "attn1.to_k.weight"].T
    v = hn @ params[tb + "attn1.to_v.weight"].T
    h = h + (attn(q, k, v, heads) @ params[tb + "attn1.to_out.0.weight"].T
             + params[tb + "attn1.to_out.0.bias"])
    hn = layer_norm(h, params[tb + "norm2.weight"], params[tb + "norm2.bias"])
    q = hn @ params[tb + "attn2.to_q.weight"].T
    k = ctx @ params[tb + "attn2.to_k.weight"].T
    v = ctx @ params[tb + "attn2.to_v.weight"].T
    h = h + (attn(q, k, v, heads) @ params[tb + "attn2.to_out.0.weight"].T
             + params[tb + "attn2.to_out.0.bias"])
    hn = layer_norm(h, params[tb + "norm3.weight"], params[tb + "norm3.bias"])
    ff = hn @ params[tb + "ff.net.0.proj.weight"].T + params[tb + "ff.net.0.proj.bias"]
    a, g = jnp.split(ff, 2, axis=-1)                 # geglu
    h = h + ((a * jax.nn.gelu(g)) @ params[tb + "ff.net.2.weight"].T
             + params[tb + "ff.net.2.bias"])
    h = h.reshape(b, hh, ww, c)
    h = conv2d(h, params[pre + "proj_out.weight"], params[pre + "proj_out.bias"],
               padding=0)
    return x + h


# SD1.x input blocks layout: index -> (kind, ...) with channel_mult [1,2,4,4],
# 2 res blocks per level, spatial transformer at the first three levels.
def unet(params, x, t, ctx):
    """x [B, h, w, 4] latent; t [B] timesteps; ctx [B, 77, 768]."""
    P = "model.diffusion_model."
    emb = timestep_embedding(t)
    emb = silu(emb @ params[P + "time_embed.0.weight"].T + params[P + "time_embed.0.bias"])
    emb = emb @ params[P + "time_embed.2.weight"].T + params[P + "time_embed.2.bias"]

    hs = []
    h = conv2d(x, params[P + "input_blocks.0.0.weight"],
               params[P + "input_blocks.0.0.bias"])
    hs.append(h)
    idx = 1
    for level in range(4):
        has_attn = level < 3
        for _ in range(2):
            pre = P + f"input_blocks.{idx}.0."
            h = _resblock(params, pre, h, emb)
            if has_attn:
                h = _spatial_transformer(params, P + f"input_blocks.{idx}.1.", h, ctx)
            hs.append(h)
            idx += 1
        if level < 3:  # downsample
            h = conv2d(h, params[P + f"input_blocks.{idx}.0.op.weight"],
                       params[P + f"input_blocks.{idx}.0.op.bias"], stride=2)
            hs.append(h)
            idx += 1

    h = _resblock(params, P + "middle_block.0.", h, emb)
    h = _spatial_transformer(params, P + "middle_block.1.", h, ctx)
    h = _resblock(params, P + "middle_block.2.", h, emb)

    idx = 0
    for level in range(3, -1, -1):
        has_attn = level < 3
        for blk in range(3):
            skip = hs.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            pre = P + f"output_blocks.{idx}.0."
            h = _resblock(params, pre, h, emb)
            if has_attn:
                h = _spatial_transformer(params, P + f"output_blocks.{idx}.1.", h, ctx)
            if level > 0 and blk == 2:   # upsample at the end of the level
                up = f"output_blocks.{idx}.{2 if has_attn else 1}.conv."
                b2, hh, ww, c = h.shape
                h = jax.image.resize(h, (b2, hh * 2, ww * 2, c), "nearest")
                h = conv2d(h, params[P + up + "weight"], params[P + up + "bias"])
            idx += 1

    h = group_norm(h, params[P + "out.0.weight"], params[P + "out.0.bias"])
    return conv2d(silu(h), params[P + "out.2.weight"], params[P + "out.2.bias"])


# ---------------------------------------------------------------------------
# VAE decoder (first_stage_model)
# ---------------------------------------------------------------------------

def _vae_res(params, pre, x):
    h = group_norm(x, params[pre + "norm1.weight"], params[pre + "norm1.bias"])
    h = conv2d(silu(h), params[pre + "conv1.weight"], params[pre + "conv1.bias"])
    h = group_norm(h, params[pre + "norm2.weight"], params[pre + "norm2.bias"])
    h = conv2d(silu(h), params[pre + "conv2.weight"], params[pre + "conv2.bias"])
    if pre + "nin_shortcut.weight" in params:
        x = conv2d(x, params[pre + "nin_shortcut.weight"],
                   params[pre + "nin_shortcut.bias"], padding=0)
    return x + h


def _vae_attn(params, pre, x):
    b, hh, ww, c = x.shape
    h = group_norm(x, params[pre + "norm.weight"], params[pre + "norm.bias"])
    flat = h.reshape(b, hh * ww, c)
    q = conv2d(h, params[pre + "q.weight"], params[pre + "q.bias"], padding=0).reshape(b, -1, c)
    k = conv2d(h, params[pre + "k.weight"], params[pre + "k.bias"], padding=0).reshape(b, -1, c)
    v = conv2d(h, params[pre + "v.weight"], params[pre + "v.bias"], padding=0).reshape(b, -1, c)
    o = attn(q, k, v, heads=1).reshape(b, hh, ww, c)
    o = conv2d(o, params[pre + "proj_out.weight"], params[pre + "proj_out.bias"],
               padding=0)
    return x + o


def vae_decode(params, z):
    """z [B, h, w, 4] -> image [B, 8h, 8w, 3] in [-1, 1]."""
    P = "first_stage_model."
    z = z / 0.18215
    z = conv2d(z, params[P + "post_quant_conv.weight"],
               params[P + "post_quant_conv.bias"], padding=0)
    D = P + "decoder."
    h = conv2d(z, params[D + "conv_in.weight"], params[D + "conv_in.bias"])
    h = _vae_res(params, D + "mid.block_1.", h)
    h = _vae_attn(params, D + "mid.attn_1.", h)
    h = _vae_res(params, D + "mid.block_2.", h)
    for level in range(3, -1, -1):
        for blk in range(3):
            h = _vae_res(params, D + f"up.{level}.block.{blk}.", h)
        if level > 0:
            b2, hh, ww, c = h.shape
            h = jax.image.resize(h, (b2, hh * 2, ww * 2, c), "nearest")
            h = conv2d(h, params[D + f"up.{level}.upsample.conv.weight"],
                       params[D + f"up.{level}.upsample.conv.bias"])
    h = group_norm(h, params[D + "norm_out.weight"], params[D + "norm_out.bias"])
    return jnp.tanh(conv2d(silu(h), params[D + "conv_out.weight"],
                           params[D + "conv_out.bias"]))


def vae_encode(params, img, key=None):
    """image [B, H, W, 3] in [-1, 1] -> scaled latent z [B, H/8, W/8, 4].

    first_stage_model.encoder: conv_in -> 4 down levels (2 resblocks each,
    stride-2 downsample with the asymmetric (0,1) pad between levels) ->
    mid res/attn/res -> norm/conv_out (8ch moments) -> quant_conv.
    key=None returns the posterior MEAN (the reference img2img's default
    deterministic encode); pass a PRNG key to sample mean + std*eps.
    """
    P = "first_stage_model."
    E = P + "encoder."
    h = conv2d(img, params[E + "conv_in.weight"], params[E + "conv_in.bias"])
    for level in range(4):
        for blk in range(2):
            h = _vae_res(params, E + f"down.{level}.block.{blk}.", h)
        if level < 3:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(h, params[E + f"down.{level}.downsample.conv.weight"],
                       params[E + f"down.{level}.downsample.conv.bias"],
                       stride=2, padding=0)
    h = _vae_res(params, E + "mid.block_1.", h)
    h = _vae_attn(params, E + "mid.attn_1.", h)
    h = _vae_res(params, E + "mid.block_2.", h)
    h = group_norm(h, params[E + "norm_out.weight"],
                   params[E + "norm_out.bias"])
    h = conv2d(silu(h), params[E + "conv_out.weight"],
               params[E + "conv_out.bias"])
    m = conv2d(h, params[P + "quant_conv.weight"],
               params[P + "quant_conv.bias"], padding=0)     # [B, h, w, 8]
    mean, logvar = m[..., :4], m[..., 4:]
    z = mean
    if key is not None:
        z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) \
            * jax.random.normal(key, mean.shape, mean.dtype)
    return z * 0.18215


# ---------------------------------------------------------------------------
# Samplers + pipeline
# ---------------------------------------------------------------------------
# The reference sdfile exposes stable-diffusion.cpp's full sampler set
# (stable-diffusion.cpp.patches/llamafile-files/main.cpp:38-46: euler_a,
# euler, heun, dpm2, dpm++2s_a, dpm++2m, dpm++2mv2, lcm; default euler_a).
# All are implemented here from the published k-diffusion / DPM-Solver++
# math over the model's own discrete alphas (sigma_t = sqrt((1-a)/a)):
#   ddim       deterministic DDIM update in alpha space (extra, for parity
#              with diffusers-style pipelines)
#   euler      k-diffusion Euler: x' = x + (s_next - s) * eps in sigma space
#   euler_a    Euler ancestral (adds per-step noise; seed-keyed)
#   heun       Karras 2nd-order: averages eps at (x, s) and (x_pred, s_next)
#   dpm2       Karras DPM-2: midpoint eval at geometric-mean sigma
#   dpm++2s_a  DPM-Solver++(2S) ancestral: single-step 2nd order + noise
#   dpm++2m    DPM-Solver++(2M): 2nd-order multistep on denoised estimates
#   dpm++2mv2  2M variant with averaged step size h_d=(h_max+h_min)/2
#              (the community "v2" tweak stable-diffusion.cpp ships)
#   lcm        latent consistency: jump to denoised + renoise to s_next
# Mid-step sigmas (heun uses s_next; dpm2/dpm++2s_a use geometric means)
# are mapped back to the nearest discrete timestep for the eps model.
SAMPLERS = ("ddim", "euler", "euler_a", "heun", "dpm2", "dpm++2s_a",
            "dpm++2m", "dpm++2mv2", "lcm")


@dataclass
class SDPipeline:
    params: Dict[str, jnp.ndarray]
    steps: int = 20
    guidance: float = 7.5
    sampler: str = "ddim"
    clip_skip: int = 1      # reference --clip-skip: 1 = use last CLIP layer
    vae_tiling: bool = False  # reference --vae-tiling: decode VAE in tiles

    def __post_init__(self):
        betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
        self.alphas_cum = np.cumprod(1.0 - betas)
        self._sigmas = np.sqrt((1.0 - self.alphas_cum) / self.alphas_cum)
        self._unet = jax.jit(lambda x, t, c: unet(self.params, x, t, c))
        self._clip = jax.jit(lambda t: clip_text(self.params, t,
                                                 self.clip_skip))
        self._vae_full = jax.jit(lambda z: vae_decode(self.params, z))
        if self.sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {self.sampler!r}; "
                             f"choose from {SAMPLERS}")

    def _vae(self, z):
        """VAE decode, whole-latent or tiled (reference --vae-tiling,
        main.cpp:113,205: process vae in tiles to reduce memory usage).

        Tiles are 32x32 latent (256px) with an 8-latent overlap; overlapping
        bands blend with a linear feather so seams vanish. One compiled
        decode is reused for every full tile."""
        if not self.vae_tiling:
            return self._vae_full(z)
        tz, oz = 32, 8
        b, h, w, c = z.shape
        if h <= tz and w <= tz:
            return self._vae_full(z)
        step = tz - oz
        out = np.zeros((b, h * 8, w * 8, 3), np.float32)
        wsum = np.zeros((1, h * 8, w * 8, 1), np.float32)
        ramp = np.minimum(np.arange(tz * 8, dtype=np.float32) / (oz * 8 - 1),
                          1.0)
        feather2d = np.minimum.reduce([
            np.broadcast_to(ramp[:, None], (tz * 8, tz * 8)),
            np.broadcast_to(ramp[None, :], (tz * 8, tz * 8)),
            np.broadcast_to(ramp[::-1][:, None], (tz * 8, tz * 8)),
            np.broadcast_to(ramp[::-1][None, :], (tz * 8, tz * 8)),
        ]) + 1e-4
        ys = sorted({min(y, max(0, h - tz)) for y in range(0, h, step)})
        xs = sorted({min(x, max(0, w - tz)) for x in range(0, w, step)})
        for y0 in ys:
            for x0 in xs:
                zt = z[:, y0:y0 + tz, x0:x0 + tz]
                img = np.asarray(self._vae_full(zt))
                fh, fw = img.shape[1], img.shape[2]
                fe = feather2d[:fh, :fw][None, :, :, None]
                out[:, y0 * 8:y0 * 8 + fh, x0 * 8:x0 * 8 + fw] += img * fe
                wsum[:, y0 * 8:y0 * 8 + fh, x0 * 8:x0 * 8 + fw] += fe
        return out / wsum

    def encode_prompt(self, token_ids: List[int]) -> jnp.ndarray:
        toks = [BOS] + token_ids[: CLIP_CTX - 2] + [EOS]
        toks = toks + [EOS] * (CLIP_CTX - len(toks))
        return self._clip(jnp.asarray([toks], jnp.int32))

    def _eps(self, x, t, cond, uncond):
        tv = jnp.asarray([t], jnp.int32)
        e_c = self._unet(x, tv, cond)
        e_u = self._unet(x, tv, uncond)
        return e_u + self.guidance * (e_c - e_u)

    def _t_of_sigma(self, s: float) -> int:
        """Nearest discrete timestep whose sigma matches s (mid-step evals
        of the 2nd-order samplers on a discrete-timestep eps model)."""
        return int(np.abs(self._sigmas - s).argmin())

    def _denoise(self, x, ts, cond, uncond, key):
        """Run the chosen sampler over timestep schedule ts (descending).

        All updates work in the k-diffusion space xh = x / sqrt(a_t) where
        the ODE derivative of an eps-model is just eps: d = (xh - x0)/s = e.
        """
        sig = lambda t: math.sqrt((1 - self.alphas_cum[t])
                                  / self.alphas_cum[t])

        def eps_at(xh_val, t2):
            # model-space eval of kd-space state at discrete timestep t2
            a2 = self.alphas_cum[t2]
            return self._eps(xh_val * math.sqrt(a2), t2, cond, uncond)

        old_d0 = None
        h_last = None
        for i, t in enumerate(ts):
            e = self._eps(x, t, cond, uncond)
            a_t = self.alphas_cum[t]
            last = i + 1 >= len(ts)
            a_prev = 1.0 if last else self.alphas_cum[ts[i + 1]]
            x0 = (x - math.sqrt(1 - a_t) * e) / math.sqrt(a_t)
            if self.sampler == "ddim" or last:
                # every sampler's final step lands on the denoised estimate
                x = math.sqrt(a_prev) * x0 + math.sqrt(1 - a_prev) * e
                continue
            s, s_n = sig(t), sig(ts[i + 1])
            xh = x / math.sqrt(a_t)
            if self.sampler == "euler":
                xh = xh + (s_n - s) * e
            elif self.sampler == "euler_a":
                s_up = min(s_n, math.sqrt(s_n ** 2 * (s ** 2 - s_n ** 2)
                                          / s ** 2))
                s_dn = math.sqrt(s_n ** 2 - s_up ** 2)
                key, sub = jax.random.split(key)
                xh = (xh + (s_dn - s) * e
                      + s_up * jax.random.normal(sub, x.shape, jnp.float32))
            elif self.sampler == "heun":
                # 2nd order: average the derivative at (xh, s) with the
                # derivative at the Euler-predicted (x_pred, s_next)
                x_pred = xh + (s_n - s) * e
                e2 = eps_at(x_pred, ts[i + 1])
                xh = xh + (s_n - s) * 0.5 * (e + e2)
            elif self.sampler == "dpm2":
                # Karras DPM-2: midpoint derivative at the geometric-mean
                # sigma between s and s_next
                s_mid = math.exp(0.5 * (math.log(s) + math.log(s_n)))
                x_mid = xh + (s_mid - s) * e
                e2 = eps_at(x_mid, self._t_of_sigma(s_mid))
                xh = xh + (s_n - s) * e2
            elif self.sampler == "dpm++2s_a":
                # DPM-Solver++(2S) ancestral: 2nd-order single step to the
                # ancestral sigma_down, then renoise by sigma_up
                s_up = min(s_n, math.sqrt(s_n ** 2 * (s ** 2 - s_n ** 2)
                                          / s ** 2))
                s_dn = math.sqrt(s_n ** 2 - s_up ** 2)
                if s_dn <= 0:
                    xh = xh + (s_dn - s) * e
                else:
                    h = -math.log(s_dn) + math.log(s)     # t_next - t
                    r = 0.5
                    s_mid = math.exp(-(-math.log(s) + r * h))
                    x2 = ((s_mid / s) * xh
                          - (math.exp(-r * h) - 1) * x0)
                    e2 = eps_at(x2, self._t_of_sigma(s_mid))
                    d2 = x2 - s_mid * e2                  # denoised @ s_mid
                    xh = (s_dn / s) * xh - (math.exp(-h) - 1) * d2
                key, sub = jax.random.split(key)
                xh = xh + s_up * jax.random.normal(sub, x.shape, jnp.float32)
            elif self.sampler in ("dpm++2m", "dpm++2mv2"):
                lt, ln = -math.log(s), -math.log(s_n)
                h = ln - lt
                if old_d0 is None:
                    d0 = x0
                    h_eff = h
                elif self.sampler == "dpm++2m":
                    r = h_last / h
                    d0 = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * old_d0
                    h_eff = h
                else:                                     # dpm++2mv2
                    h_min, h_max = min(h_last, h), max(h_last, h)
                    r = h_max / h_min
                    d0 = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * old_d0
                    h_eff = 0.5 * (h_max + h_min)
                xh = (s_n / s) * xh - (math.exp(-h_eff) - 1) * d0
                old_d0, h_last = x0, h
            elif self.sampler == "lcm":
                # latent consistency: jump straight to the denoised estimate
                # and renoise to the next sigma level
                key, sub = jax.random.split(key)
                xh = x0 + s_n * jax.random.normal(sub, x.shape, jnp.float32)
            x = xh * math.sqrt(a_prev)
        return x

    def txt2img(self, cond: jnp.ndarray, uncond: jnp.ndarray,
                height: int = 512, width: int = 512, seed: int = 0):
        h, w = height // 8, width // 8
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (1, h, w, 4), jnp.float32)
        ts = np.linspace(999, 0, self.steps).astype(np.int64)
        x = self._denoise(x, ts, cond, uncond, jax.random.fold_in(key, 1))
        img = self._vae(x)
        return np.asarray((img[0] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)

    def img2img(self, init_img: np.ndarray, cond: jnp.ndarray,
                uncond: jnp.ndarray, strength: float = 0.75, seed: int = 0):
        """init_img uint8 [H, W, 3] (H, W multiples of 8); strength in (0, 1]
        is the fraction of the schedule actually denoised (reference sdfile
        img2img semantics: t_enc = strength * steps)."""
        img = (np.asarray(init_img, np.float32) / 127.5 - 1.0)[None]
        if not hasattr(self, "_vae_enc"):
            self._vae_enc = jax.jit(
                lambda im: vae_encode(self.params, im))
        z0 = self._vae_enc(jnp.asarray(img))
        ts = np.linspace(999, 0, self.steps).astype(np.int64)
        t_enc = max(1, min(self.steps, int(round(self.steps * strength))))
        ts_run = ts[self.steps - t_enc:]
        key = jax.random.PRNGKey(seed)
        a0 = self.alphas_cum[ts_run[0]]
        noise = jax.random.normal(key, z0.shape, jnp.float32)
        x = math.sqrt(a0) * z0 + math.sqrt(1 - a0) * noise
        x = self._denoise(x, ts_run, cond, uncond,
                          jax.random.fold_in(key, 1))
        img = self._vae(x)
        return np.asarray((img[0] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
