"""Stable-diffusion sibling engine: pipeline test on a miniature synthetic model.

Validates the full txt2img flow (CLIP-L text encoding, UNet denoising with
classifier-free guidance over DDIM steps, VAE decode) for shape/flow
correctness. Numerical parity vs reference outputs requires real checkpoints
(zero-egress environment) and is round-2 scope.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from llamafile_tpu.models import sd as SD

RNG = np.random.default_rng(0)


def r(*shape, s=0.05):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * s)


def ones(*shape):
    return jnp.ones(shape, jnp.float32)


def zeros(*shape):
    return jnp.zeros(shape, jnp.float32)


def make_tiny_sd(mc=32, ctx_d=24, clip_d=24):
    """Miniature SD1.x-structured weights (channel_mult [1,2,4,4])."""
    p = {}
    ch = [mc, 2 * mc, 4 * mc, 4 * mc]
    emb = 4 * mc
    P = "model.diffusion_model."
    p[P + "time_embed.0.weight"] = r(emb, 320)
    p[P + "time_embed.0.bias"] = zeros(emb)
    p[P + "time_embed.2.weight"] = r(emb, emb)
    p[P + "time_embed.2.bias"] = zeros(emb)

    def resblock(pre, cin, cout):
        p[pre + "in_layers.0.weight"] = ones(cin)
        p[pre + "in_layers.0.bias"] = zeros(cin)
        p[pre + "in_layers.2.weight"] = r(cout, cin, 3, 3)
        p[pre + "in_layers.2.bias"] = zeros(cout)
        p[pre + "emb_layers.1.weight"] = r(cout, emb)
        p[pre + "emb_layers.1.bias"] = zeros(cout)
        p[pre + "out_layers.0.weight"] = ones(cout)
        p[pre + "out_layers.0.bias"] = zeros(cout)
        p[pre + "out_layers.3.weight"] = r(cout, cout, 3, 3)
        p[pre + "out_layers.3.bias"] = zeros(cout)
        if cin != cout:
            p[pre + "skip_connection.weight"] = r(cout, cin, 1, 1)
            p[pre + "skip_connection.bias"] = zeros(cout)

    def st(pre, c):
        p[pre + "norm.weight"] = ones(c)
        p[pre + "norm.bias"] = zeros(c)
        p[pre + "proj_in.weight"] = r(c, c, 1, 1)
        p[pre + "proj_in.bias"] = zeros(c)
        tb = pre + "transformer_blocks.0."
        for n in ("norm1", "norm2", "norm3"):
            p[tb + n + ".weight"] = ones(c)
            p[tb + n + ".bias"] = zeros(c)
        for a, kdim in (("attn1", c), ("attn2", ctx_d)):
            p[tb + a + ".to_q.weight"] = r(c, c)
            p[tb + a + ".to_k.weight"] = r(c, kdim)
            p[tb + a + ".to_v.weight"] = r(c, kdim)
            p[tb + a + ".to_out.0.weight"] = r(c, c)
            p[tb + a + ".to_out.0.bias"] = zeros(c)
        p[tb + "ff.net.0.proj.weight"] = r(8 * c, c)
        p[tb + "ff.net.0.proj.bias"] = zeros(8 * c)
        p[tb + "ff.net.2.weight"] = r(c, 4 * c)
        p[tb + "ff.net.2.bias"] = zeros(c)
        p[pre + "proj_out.weight"] = r(c, c, 1, 1)
        p[pre + "proj_out.bias"] = zeros(c)

    p[P + "input_blocks.0.0.weight"] = r(ch[0], 4, 3, 3)
    p[P + "input_blocks.0.0.bias"] = zeros(ch[0])
    idx = 1
    cur = ch[0]
    skips = [ch[0]]
    for level in range(4):
        for _ in range(2):
            resblock(P + f"input_blocks.{idx}.0.", cur, ch[level])
            cur = ch[level]
            if level < 3:
                st(P + f"input_blocks.{idx}.1.", cur)
            skips.append(cur)
            idx += 1
        if level < 3:
            p[P + f"input_blocks.{idx}.0.op.weight"] = r(cur, cur, 3, 3)
            p[P + f"input_blocks.{idx}.0.op.bias"] = zeros(cur)
            skips.append(cur)
            idx += 1
    resblock(P + "middle_block.0.", cur, cur)
    st(P + "middle_block.1.", cur)
    resblock(P + "middle_block.2.", cur, cur)
    idx = 0
    for level in range(3, -1, -1):
        for blk in range(3):
            cin = cur + skips.pop()
            resblock(P + f"output_blocks.{idx}.0.", cin, ch[level])
            cur = ch[level]
            if level < 3:
                st(P + f"output_blocks.{idx}.1.", cur)
            if level > 0 and blk == 2:
                up = f"output_blocks.{idx}.{2 if level < 3 else 1}.conv."
                p[P + up + "weight"] = r(cur, cur, 3, 3)
                p[P + up + "bias"] = zeros(cur)
            idx += 1
    p[P + "out.0.weight"] = ones(cur)
    p[P + "out.0.bias"] = zeros(cur)
    p[P + "out.2.weight"] = r(4, cur, 3, 3)
    p[P + "out.2.bias"] = zeros(4)

    # CLIP text (12 layers, tiny d)
    C = "cond_stage_model.transformer.text_model."
    p[C + "embeddings.token_embedding.weight"] = r(49408, clip_d, s=0.3)
    p[C + "embeddings.position_embedding.weight"] = r(77, clip_d, s=0.1)
    for i in range(SD.CLIP_LAYERS):
        lp = C + f"encoder.layers.{i}."
        for n in ("layer_norm1", "layer_norm2"):
            p[lp + n + ".weight"] = ones(clip_d)
            p[lp + n + ".bias"] = zeros(clip_d)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p[lp + f"self_attn.{proj}.weight"] = r(clip_d, clip_d)
            p[lp + f"self_attn.{proj}.bias"] = zeros(clip_d)
        p[lp + "mlp.fc1.weight"] = r(4 * clip_d, clip_d)
        p[lp + "mlp.fc1.bias"] = zeros(4 * clip_d)
        p[lp + "mlp.fc2.weight"] = r(clip_d, 4 * clip_d)
        p[lp + "mlp.fc2.bias"] = zeros(clip_d)
    p[C + "final_layer_norm.weight"] = ones(clip_d)
    p[C + "final_layer_norm.bias"] = zeros(clip_d)
    # context projection dim must match ctx_d for cross-attn
    assert clip_d == ctx_d

    # VAE decoder
    V = "first_stage_model."
    p[V + "post_quant_conv.weight"] = r(4, 4, 1, 1)
    p[V + "post_quant_conv.bias"] = zeros(4)
    D = V + "decoder."
    vch = [32, 32, 64, 64]            # up.0 .. up.3 channels (multiples of 32 for GN)
    p[D + "conv_in.weight"] = r(64, 4, 3, 3)
    p[D + "conv_in.bias"] = zeros(64)

    def vres(pre, cin, cout):
        p[pre + "norm1.weight"] = ones(cin)
        p[pre + "norm1.bias"] = zeros(cin)
        p[pre + "conv1.weight"] = r(cout, cin, 3, 3)
        p[pre + "conv1.bias"] = zeros(cout)
        p[pre + "norm2.weight"] = ones(cout)
        p[pre + "norm2.bias"] = zeros(cout)
        p[pre + "conv2.weight"] = r(cout, cout, 3, 3)
        p[pre + "conv2.bias"] = zeros(cout)
        if cin != cout:
            p[pre + "nin_shortcut.weight"] = r(cout, cin, 1, 1)
            p[pre + "nin_shortcut.bias"] = zeros(cout)

    vres(D + "mid.block_1.", 64, 64)
    for n in ("norm", "q", "k", "v", "proj_out"):
        if n == "norm":
            p[D + "mid.attn_1.norm.weight"] = ones(64)
            p[D + "mid.attn_1.norm.bias"] = zeros(64)
        else:
            p[D + f"mid.attn_1.{n}.weight"] = r(64, 64, 1, 1)
            p[D + f"mid.attn_1.{n}.bias"] = zeros(64)
    vres(D + "mid.block_2.", 64, 64)
    cur = 64
    for level in range(3, -1, -1):
        for blk in range(3):
            vres(D + f"up.{level}.block.{blk}.", cur, vch[level])
            cur = vch[level]
        if level > 0:
            p[D + f"up.{level}.upsample.conv.weight"] = r(cur, cur, 3, 3)
            p[D + f"up.{level}.upsample.conv.bias"] = zeros(cur)
    p[D + "norm_out.weight"] = ones(cur)
    p[D + "norm_out.bias"] = zeros(cur)
    p[D + "conv_out.weight"] = r(3, cur, 3, 3)
    p[D + "conv_out.bias"] = zeros(3)

    # VAE encoder (img2img)
    E = V + "encoder."
    ech = [32, 32, 64, 64]
    p[E + "conv_in.weight"] = r(32, 3, 3, 3)
    p[E + "conv_in.bias"] = zeros(32)
    cur = 32
    for level in range(4):
        for blk in range(2):
            vres(E + f"down.{level}.block.{blk}.", cur, ech[level])
            cur = ech[level]
        if level < 3:
            p[E + f"down.{level}.downsample.conv.weight"] = r(cur, cur, 3, 3)
            p[E + f"down.{level}.downsample.conv.bias"] = zeros(cur)
    vres(E + "mid.block_1.", cur, cur)
    p[E + "mid.attn_1.norm.weight"] = ones(cur)
    p[E + "mid.attn_1.norm.bias"] = zeros(cur)
    for n in ("q", "k", "v", "proj_out"):
        p[E + f"mid.attn_1.{n}.weight"] = r(cur, cur, 1, 1)
        p[E + f"mid.attn_1.{n}.bias"] = zeros(cur)
    vres(E + "mid.block_2.", cur, cur)
    p[E + "norm_out.weight"] = ones(cur)
    p[E + "norm_out.bias"] = zeros(cur)
    p[E + "conv_out.weight"] = r(8, cur, 3, 3)
    p[E + "conv_out.bias"] = zeros(8)
    p[V + "quant_conv.weight"] = r(8, 8, 1, 1)
    p[V + "quant_conv.bias"] = zeros(8)
    return p


@pytest.fixture(scope="module")
def tiny_sd():
    return make_tiny_sd()


def test_clip_text_shapes(tiny_sd):
    out = SD.clip_text(tiny_sd, jnp.asarray([[SD.BOS, 100, SD.EOS] + [SD.EOS] * 74],
                                            jnp.int32))
    assert out.shape == (1, 77, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_denoise_step(tiny_sd):
    ctx = jnp.asarray(RNG.standard_normal((1, 77, 24)).astype(np.float32))
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 4)).astype(np.float32))
    eps = SD.unet(tiny_sd, x, jnp.asarray([500], jnp.int32), ctx)
    assert eps.shape == x.shape
    assert np.isfinite(np.asarray(eps)).all()


def test_txt2img_pipeline(tiny_sd):
    pipe = SD.SDPipeline(tiny_sd, steps=2, guidance=4.0)
    cond = pipe.encode_prompt([100, 200])
    uncond = pipe.encode_prompt([])
    img = pipe.txt2img(cond, uncond, height=64, width=64, seed=1)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


def test_vae_encode_shapes(tiny_sd):
    img = jnp.asarray(RNG.standard_normal((1, 64, 64, 3)).astype(np.float32))
    z = SD.vae_encode(tiny_sd, img)
    assert z.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(z)).all()
    # sampled encode differs from the mean encode but stays close in scale
    import jax
    zs = SD.vae_encode(tiny_sd, img, key=jax.random.PRNGKey(0))
    assert zs.shape == z.shape and not np.allclose(np.asarray(zs),
                                                   np.asarray(z))


def test_img2img_pipeline(tiny_sd):
    """img2img (reference sdfile mode): strength controls how much of the
    DDIM schedule runs; strength ~0 must stay close to the init image's
    round-trip, full strength may diverge."""
    pipe = SD.SDPipeline(tiny_sd, steps=4, guidance=4.0)
    cond = pipe.encode_prompt([100, 200])
    uncond = pipe.encode_prompt([])
    init = (RNG.standard_normal((64, 64, 3)) * 40 + 128).clip(
        0, 255).astype(np.uint8)
    out = pipe.img2img(init, cond, uncond, strength=0.5, seed=2)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # determinism
    out2 = pipe.img2img(init, cond, uncond, strength=0.5, seed=2)
    np.testing.assert_array_equal(out, out2)


@pytest.mark.parametrize("sampler", ["euler", "euler_a", "heun", "dpm2",
                                     "dpm++2s_a", "dpm++2m", "dpm++2mv2",
                                     "lcm"])
def test_samplers_run_and_differ(tiny_sd, sampler):
    """Each sampler (the reference sdfile --sampling-method set,
    main.cpp:38-46) produces a finite image; deterministic per seed;
    ancestral samplers differ from ddim at few steps."""
    ids = [100, 101]
    pipe = SD.SDPipeline(tiny_sd, steps=4, guidance=4.0, sampler=sampler)
    cond, uncond = pipe.encode_prompt(ids), pipe.encode_prompt([])
    img = pipe.txt2img(cond, uncond, height=64, width=64, seed=3)
    img2 = pipe.txt2img(cond, uncond, height=64, width=64, seed=3)
    assert img.shape == (64, 64, 3) and np.array_equal(img, img2)
    if sampler in ("euler_a", "dpm++2s_a", "lcm"):
        # ancestral noise guarantees divergence; deterministic samplers can
        # collide with ddim after uint8 rounding on the tiny model (math
        # parity is pinned in the numpy test below)
        ddim = SD.SDPipeline(tiny_sd, steps=4, guidance=4.0)
        ref = ddim.txt2img(cond, uncond, height=64, width=64, seed=3)
        assert not np.array_equal(img, ref)


def test_sampler_math_vs_numpy_reference(tiny_sd):
    """Euler and DPM++2M steps vs an independent numpy k-diffusion
    implementation, driven by a synthetic eps model (eps = 0.1*x + const):
    the pipeline's alpha-space updates must match sigma-space math."""
    import math as m
    pipe = SD.SDPipeline(tiny_sd, steps=5, guidance=0.0, sampler="euler")
    ac = pipe.alphas_cum
    ts = np.linspace(999, 0, 5).astype(np.int64)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    const = rng.standard_normal((1, 4, 4, 4)).astype(np.float32) * 0.1

    def eps_fn(x, t):
        return 0.1 * x + const

    for sampler in ("euler", "dpm++2m"):
        pipe.sampler = sampler
        pipe._eps = lambda x, t, c, u: jnp.asarray(eps_fn(np.asarray(x), t))
        got = np.asarray(pipe._denoise(jnp.asarray(x0), ts, None, None,
                                       __import__("jax").random.PRNGKey(0)))
        # independent numpy reference in k-diffusion sigma space
        sig = lambda t: m.sqrt((1 - ac[t]) / ac[t])
        xh = x0 / m.sqrt(ac[ts[0]])
        old_d0, h_last = None, None
        for i, t in enumerate(ts):
            s = sig(t)
            xt = xh * m.sqrt(ac[t])          # model-space input
            e = eps_fn(xt, t)
            d0 = xh - s * e                  # denoised in kd space
            if i + 1 >= len(ts):
                xh = d0 + m.sqrt(1 - 1.0) * e    # a_prev=1: x = x0
                break
            s_n = sig(ts[i + 1])
            if sampler == "euler":
                xh = xh + (s_n - s) * e
            else:                            # dpm++2m
                lt, ln = -m.log(s), -m.log(s_n)
                h = ln - lt
                if old_d0 is None:
                    d = d0
                else:
                    r = h_last / h
                    d = (1 + 1 / (2 * r)) * d0 - (1 / (2 * r)) * old_d0
                xh = (s_n / s) * xh - (m.exp(-h) - 1) * d
                old_d0, h_last = d0, h
        want = xh                            # a_prev=1 -> model space == kd
        assert np.allclose(got, want, rtol=1e-4, atol=1e-4), sampler


def test_new_sampler_math_vs_numpy_reference(tiny_sd):
    """heun/dpm2/dpm++2s_a/dpm++2mv2/lcm vs independent numpy k-diffusion
    math (same synthetic eps model as the euler/dpm++2m test above);
    ancestral samplers mirror the pipeline's PRNG split sequence so noise
    draws are identical and only the update math is under test."""
    import math as m
    import jax
    import jax.numpy as jnp
    pipe = SD.SDPipeline(tiny_sd, steps=5, guidance=0.0, sampler="heun")
    ac = pipe.alphas_cum
    sigs = np.sqrt((1 - ac) / ac)
    ts = np.linspace(999, 0, 5).astype(np.int64)
    rng = np.random.default_rng(0)
    x0in = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    const = rng.standard_normal((1, 4, 4, 4)).astype(np.float32) * 0.1

    def eps_fn(x, t):
        return 0.1 * np.asarray(x, np.float32) + const

    t_of = lambda s: int(np.abs(sigs - s).argmin())
    sig = lambda t: m.sqrt((1 - ac[t]) / ac[t])

    for sampler in ("heun", "dpm2", "dpm++2mv2", "dpm++2s_a", "lcm"):
        pipe.sampler = sampler
        pipe._eps = lambda x, t, c, u: jnp.asarray(eps_fn(np.asarray(x), t))
        key0 = jax.random.PRNGKey(7)
        got = np.asarray(pipe._denoise(jnp.asarray(x0in), ts, None, None,
                                       key0))
        # independent numpy reference in k-diffusion sigma space
        xh = x0in / m.sqrt(ac[ts[0]])
        key = key0
        old_d0, h_last = None, None
        for i, t in enumerate(ts):
            s = sig(t)
            e = eps_fn(xh * m.sqrt(ac[t]), t)
            d0 = xh - s * e
            if i + 1 >= len(ts):
                xh = d0
                break
            s_n = sig(ts[i + 1])
            if sampler == "heun":
                x_pred = xh + (s_n - s) * e
                e2 = eps_fn(x_pred * m.sqrt(ac[ts[i + 1]]), ts[i + 1])
                xh = xh + (s_n - s) * 0.5 * (e + e2)
            elif sampler == "dpm2":
                s_mid = m.exp(0.5 * (m.log(s) + m.log(s_n)))
                x_mid = xh + (s_mid - s) * e
                t2 = t_of(s_mid)
                e2 = eps_fn(x_mid * m.sqrt(ac[t2]), t2)
                xh = xh + (s_n - s) * e2
            elif sampler == "dpm++2mv2":
                h = -m.log(s_n) + m.log(s)
                if old_d0 is None:
                    d, h_eff = d0, h
                else:
                    h_min, h_max = min(h_last, h), max(h_last, h)
                    r = h_max / h_min
                    d = (1 + 1 / (2 * r)) * d0 - (1 / (2 * r)) * old_d0
                    h_eff = 0.5 * (h_max + h_min)
                xh = (s_n / s) * xh - (m.exp(-h_eff) - 1) * d
                old_d0, h_last = d0, h
            elif sampler == "dpm++2s_a":
                s_up = min(s_n, m.sqrt(s_n**2 * (s**2 - s_n**2) / s**2))
                s_dn = m.sqrt(s_n**2 - s_up**2)
                if s_dn <= 0:
                    xh = xh + (s_dn - s) * e
                else:
                    h = -m.log(s_dn) + m.log(s)
                    s_mid = m.exp(-(-m.log(s) + 0.5 * h))
                    x2 = (s_mid / s) * xh - (m.exp(-0.5 * h) - 1) * d0
                    t2 = t_of(s_mid)
                    e2 = eps_fn(x2 * m.sqrt(ac[t2]), t2)
                    d2 = x2 - s_mid * e2
                    xh = (s_dn / s) * xh - (m.exp(-h) - 1) * d2
                key, sub = jax.random.split(key)
                xh = xh + s_up * np.asarray(
                    jax.random.normal(sub, xh.shape, jnp.float32))
            elif sampler == "lcm":
                key, sub = jax.random.split(key)
                xh = d0 + s_n * np.asarray(
                    jax.random.normal(sub, xh.shape, jnp.float32))
        assert np.allclose(got, xh, rtol=1e-4, atol=1e-4), sampler


def test_vae_tiling_matches_full_decode(tiny_sd):
    """--vae-tiling: tiled decode must match the whole-latent decode away
    from tolerance noise (the feathered overlap blend is seam-free). 48x48
    latent forces a 2x2 tile grid with overlaps."""
    pipe = SD.SDPipeline(tiny_sd, steps=2, guidance=1.0)
    z = jnp.asarray(RNG.standard_normal((1, 48, 48, 4)).astype(np.float32))
    full = np.asarray(pipe._vae_full(z))
    pipe.vae_tiling = True
    tiled = np.asarray(pipe._vae(z))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    # tiled decode is APPROXIMATE by construction (the mid-block attention
    # is global; each tile only attends within itself — same tradeoff as
    # diffusers' enable_vae_tiling): assert strong agreement, not equality
    corr = np.corrcoef(full.ravel(), tiled.ravel())[0, 1]
    assert corr > 0.98, corr
    rms = float(np.sqrt(((full - tiled) ** 2).mean()))
    assert rms < 0.1, rms      # output range is [-1, 1]


def test_clip_skip_changes_embedding(tiny_sd):
    """--clip-skip 2 must drop the last CLIP layer: embeddings differ from
    the default, and clip_skip=1 equals the original path."""
    p1 = SD.SDPipeline(tiny_sd, steps=2, clip_skip=1)
    p2 = SD.SDPipeline(tiny_sd, steps=2, clip_skip=2)
    e1 = np.asarray(p1.encode_prompt([100, 101]))
    e2 = np.asarray(p2.encode_prompt([100, 101]))
    assert e1.shape == e2.shape
    assert not np.allclose(e1, e2)
