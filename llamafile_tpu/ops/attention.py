"""Attention paths: flash (prefill), fused flash-decode, cache-masked einsum.

LLAMAFILE_TPU_FLASH_DECODE=0 disables the fused decode kernel (einsum path).

The reference's attention is ggml's soft-max attention with optional flash-attn
flag (SURVEY.md §5 long-context notes). TPU-native: full prompts run through
the Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu) so the
[T, S] score matrix never hits HBM; incremental decode attends to the padded KV
cache with a position mask (the cache read is the bandwidth floor either way).

GQA: KV heads are broadcast to query heads for the flash path; the decode path
keeps grouped heads and never materializes the expansion.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

FLASH_DECODE = os.environ.get("LLAMAFILE_TPU_FLASH_DECODE", "1") != "0"


def _use_flash(t: int, head_dim: int) -> bool:
    if jax.default_backend() != "tpu":
        return False               # pallas op is TPU-only; tests run einsum path
    return t >= 128 and t % 128 == 0 and head_dim in (64, 128, 256)



def _decode_bs(s_eff: int) -> int:
    """KV streaming block for the decode kernels: 512 halves the per-call
    grid-step count vs 256 (same bytes, ~2 us/layer less fixed overhead on
    v5e); falls back until it divides the cache length."""
    bs = int(os.environ.get("LLAMAFILE_TPU_FLASH_DECODE_BS", "512") or 512)
    bs = min(bs, 1024)      # cap: larger tiles inflate VMEM scratch past the
    #                         budget and die with an opaque Mosaic error
    while bs > 256 and s_eff % bs:
        bs //= 2
    if bs < 256 or s_eff % bs:
        bs = 256            # overrides that don't divide s_eff are unsafe:
    return bs               # a non-dividing bs silently truncates the KV read

def flash_prefill(q, k, v, scale: float, window=None, softcap: float = 0.0):
    """Causal self-attention over fresh prompt tokens.

    q: [B, T, Hq, D]; k, v: [B, T, Hkv, D]. Returns [B, T, Hq, D] f32.

    window (int or traced scalar) restricts key j to i - window < j <= i
    (gemma sliding window); softcap applies gemma2's tanh score cap. Either
    forces the einsum path (the upstream pallas flash kernel supports causal
    only) — callers skip passing window when T <= window, where SWA == causal.
    """
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    if window is None and not softcap and _use_flash(t, d):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)
        qT = q.transpose(0, 2, 1, 3).astype(jnp.bfloat16)       # [B, H, T, D]
        kT = k.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
        vT = v.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
        if hkv != hq:
            rep = hq // hkv
            kT = jnp.repeat(kT, rep, axis=1)
            vT = jnp.repeat(vT, rep, axis=1)
        # 256-wide q/k blocks beat the upstream defaults on v5e prefill
        # (8.6k -> 9.1k tok/s end-to-end on the 8B Q4_K bench at T=512)
        bq = int(os.environ.get("LLAMAFILE_TPU_FLASH_BQ", "256") or 0)
        bs = None
        if bq:
            bq = min(bq, t)
            bs = BlockSizes(block_q=bq, block_k_major=bq, block_k=bq,
                            block_b=1, block_q_major_dkv=bq,
                            block_k_major_dkv=bq, block_k_dkv=bq,
                            block_q_dkv=bq, block_k_major_dq=bq,
                            block_k_dq=bq, block_q_dq=bq)
        out = flash_attention(qT, kT, vT, causal=True, sm_scale=scale,
                              block_sizes=bs)
        return out.transpose(0, 2, 1, 3).astype(jnp.float32)
    # einsum fallback (CPU tests, odd shapes, SWA/softcap layers)
    group = hq // hkv
    qg = q.reshape(b, t, hkv, group, d).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k.astype(jnp.float32)) * scale
    if softcap:
        scores = softcap * jnp.tanh(scores / softcap)
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    mask = j <= i
    if window is not None:
        mask = mask & (j > i - window)
    scores = jnp.where(mask[None, None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, hq, d)


# ---------------------------------------------------------------------------
# Fused decode attention (T = 1): one pallas kernel instead of the einsum op
# chain. The GQA structure is expressed as TWO plain matmuls per KV tile via
# a block-diagonal query operand:
#
#   scores[s, hq]   = K2[s, (h d)] @ Q2[(h d), hq]   (Q2 zero off own head)
#   acc[hq, (h d)] += P[s, hq]^T-contraction V2[s, (h d)]
#
# so the kernel never transposes or reshapes the [BS, Hkv, D] cache tiles
# (their natural minor layout IS (Hkv*D)); the h==h' diagonal of acc is
# extracted outside on a tiny [Hq, Hkv*D] array. Streaming-softmax carries
# (m, l, acc) in VMEM scratch across KV tiles.
# ---------------------------------------------------------------------------

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_decode_kernel(pos_ref, q2_ref, k_ref, v_ref, acc_ref, l_ref,
                         m_ref, accs_ref, *, bs: int, n_s: int, scale: float,
                         softcap: float = 0.0, win=None):
    """win: None (no sliding window), a python int, or a traced int32 scalar
    read from a prefetch ref by the caller — key j visible iff
    pos - win < j <= pos (gemma2/3 SWA). softcap: gemma2 tanh score cap."""
    b = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        accs_ref[...] = jnp.zeros_like(accs_ref)

    k2 = k_ref[...]                                     # (BS, Hkv*D)
    v2 = v_ref[...]
    q2 = q2_ref[...]                                    # (Hkv*D, Hq)
    s = jax.lax.dot_general(k2, q2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    jglob = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    vis = jglob <= pos_ref[b]
    if win is not None:
        vis = vis & (jglob > pos_ref[b] - win)
    s = jnp.where(vis, s, -1e30)                        # (BS, Hq)
    m_prev = m_ref[0:1, :]                              # (1, Hq)
    bm = jnp.max(s, axis=0, keepdims=True)
    new_m = jnp.maximum(m_prev, bm)
    corr = jnp.exp(m_prev - new_m)
    p = jnp.exp(s - new_m)                              # masked rows ~ 0
    l_ref[0:1, :] = l_ref[0:1, :] * corr + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    accs_ref[...] = accs_ref[...] * corr.T + pv         # (Hq, Hkv*D)
    m_ref[0:1, :] = new_m

    @pl.when(si == n_s - 1)
    def _done():
        acc_ref[...] = accs_ref[...]
        # final l rides out through l_out (row 0)


def _flash_decode_qt_kernel(pos_ref, li_ref, qt_ref, k_ref, v_ref, acc_ref,
                            l_ref, m_ref, accs_ref, q2_ref, *, bs: int,
                            n_s: int, scale: float, grp: int, dh: int,
                            softcap: float = 0.0, win=None):
    """Transposed-query variant of _flash_decode_kernel: takes qT (D, Hq),
    builds the block-diagonal (Hkv*D, Hq) operand in VMEM scratch at si==0 and
    extracts the head-diagonal of the accumulator in-kernel at si==n_s-1, so
    the XLA glue (eye-einsum on the way in, gather-einsum + Hkv-times-larger
    output write on the way out) disappears — same treatment that took the
    write-fused kernel from 144 to 146.3 tok/s."""
    b = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        accs_ref[...] = jnp.zeros_like(accs_ref)
        qt = qt_ref[...]                                # (D, Hq)
        hkv2 = q2_ref.shape[0] // dh
        q2t = jnp.concatenate([qt] * hkv2, axis=0)      # (Hkv*D, Hq)
        rows = jax.lax.broadcasted_iota(jnp.int32, q2t.shape, 0) // dh
        cols = jax.lax.broadcasted_iota(jnp.int32, q2t.shape, 1) // grp
        q2_ref[...] = jnp.where(rows == cols, q2t, 0)

    k2 = k_ref[...]                                     # (BS, Hkv*D)
    v2 = v_ref[...]
    q2 = q2_ref[...]                                    # (Hkv*D, Hq)
    s = jax.lax.dot_general(k2, q2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    jglob = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    vis = jglob <= pos_ref[b]
    if win is not None:
        vis = vis & (jglob > pos_ref[b] - win)
    s = jnp.where(vis, s, -1e30)                        # (BS, Hq)
    m_prev = m_ref[0:1, :]                              # (1, Hq)
    bm = jnp.max(s, axis=0, keepdims=True)
    new_m = jnp.maximum(m_prev, bm)
    corr = jnp.exp(m_prev - new_m)
    p = jnp.exp(s - new_m)                              # masked rows ~ 0
    l_ref[0:1, :] = l_ref[0:1, :] * corr + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    accs_ref[...] = accs_ref[...] * corr.T + pv         # (Hq, Hkv*D)
    m_ref[0:1, :] = new_m

    @pl.when(si == n_s - 1)
    def _done():
        accf = accs_ref[...]
        acc_ref[...] = jnp.concatenate(
            [accf[j * grp:(j + 1) * grp, j * dh:(j + 1) * dh]
             for j in range(accf.shape[1] // dh)], axis=0)


def _flash_decode_write_kernel(pos_ref, li_ref, qt_ref, k_ref, v_ref,
                               kn_ref, vn_ref, acc_ref, l_ref, ko_ref,
                               vo_ref, m_ref, accs_ref, blkk_ref, blkv_ref,
                               q2_ref, *, bs: int, n_s: int, scale: float,
                               grp: int, dh: int,
                               softcap: float = 0.0, win=None):
    """flash decode + fused KV-cache row write. Cache blocks mask j <= pos-1
    (the row at pos in HBM is stale — this kernel IS its writer); the new
    token's k/v contribute from VMEM with the same streaming-softmax merge,
    and land in the cache through the pos-indexed aliased 8-row out block.
    The written block's other 7 rows are captured from the STREAMING tile
    that contains pos (single pass over the cache — a second block input of
    the same buffer would defeat XLA's in-place aliasing and copy the whole
    cache per call, measured 2.5x slower end-to-end)."""
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        accs_ref[...] = jnp.zeros_like(accs_ref)
        # block-diagonal query operand built IN-KERNEL from qT (D, Hq):
        # row r of Q2 belongs to kv head r//D; query column h attends its
        # own kv head h//grp only (replaces the XLA eye-einsum + reshape)
        qt = qt_ref[...]                                # (D, Hq)
        hkv2 = q2_ref.shape[0] // dh
        q2t = jnp.concatenate([qt] * hkv2, axis=0)      # (Hkv*D, Hq)
        rows = jax.lax.broadcasted_iota(jnp.int32, q2t.shape, 0) // dh
        cols = jax.lax.broadcasted_iota(jnp.int32, q2t.shape, 1) // grp
        q2_ref[...] = jnp.where(rows == cols, q2t, 0)

    b = pl.program_id(0)
    kn = kn_ref[pl.ds(b, 1), :]                         # (1, Hkv*D)
    vn = vn_ref[pl.ds(b, 1), :]
    k2 = k_ref[...]                                     # (BS, Hkv*D)
    v2 = v_ref[...]

    @pl.when(si == pos_ref[b] // bs)
    def _capture():
        # 8-row-aligned window holding row pos, from the streaming tile.
        # Offset written as (x)*8 so Mosaic can prove the 8-alignment.
        rel = ((pos_ref[b] % bs) // 8) * 8
        blkk_ref[...] = k_ref[pl.ds(rel, 8), :]
        blkv_ref[...] = v_ref[pl.ds(rel, 8), :]

    @pl.when(si == n_s - 1)
    def _write_row():
        row8 = pos_ref[b] % 8
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, ko_ref.shape, 0)
                  == row8)
        ko_ref[...] = jnp.where(rowsel, kn.astype(ko_ref.dtype),
                                blkk_ref[...])
        vo_ref[...] = jnp.where(rowsel, vn.astype(vo_ref.dtype),
                                blkv_ref[...])
    q2 = q2_ref[...]                                    # (Hkv*D, Hq)
    s = jax.lax.dot_general(k2, q2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    jglob = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    vis = jglob <= pos_ref[b] - 1                       # stale row excluded
    if win is not None:
        vis = vis & (jglob > pos_ref[b] - win)
    s = jnp.where(vis, s, -1e30)                        # (BS, Hq)
    m_prev = m_ref[0:1, :]                              # (1, Hq)
    bm = jnp.max(s, axis=0, keepdims=True)
    new_m = jnp.maximum(m_prev, bm)
    corr = jnp.exp(m_prev - new_m)
    p = jnp.exp(s - new_m)                              # masked rows ~ 0
    l_ref[0:1, :] = l_ref[0:1, :] * corr + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    accs_ref[...] = accs_ref[...] * corr.T + pv         # (Hq, Hkv*D)
    m_ref[0:1, :] = new_m

    @pl.when(si == n_s - 1)
    def _done():
        # merge the new token's contribution (j == pos, always visible)
        sn = jax.lax.dot_general(kn, q2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        if softcap:
            sn = softcap * jnp.tanh(sn / softcap)
        m_prev2 = m_ref[0:1, :]
        new_m2 = jnp.maximum(m_prev2, sn)
        corr2 = jnp.exp(m_prev2 - new_m2)
        pn = jnp.exp(sn - new_m2)                       # (1, Hq)
        l_ref[0:1, :] = l_ref[0:1, :] * corr2 + pn
        pvn = jax.lax.dot_general(pn.astype(vn.dtype), vn,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        accf = accs_ref[...] * corr2.T + pvn            # (Hq, Hkv*D)
        # extract the block diagonal IN-KERNEL (query-head group j only
        # attends its own kv head j): output (Hq, D) instead of
        # (Hq, Hkv*D) — drops the XLA gather einsum and a Hkv x larger
        # output write per layer
        acc_ref[...] = jnp.concatenate(
            [accf[j * grp:(j + 1) * grp, j * dh:(j + 1) * dh]
             for j in range(accf.shape[1] // dh)], axis=0)


def flash_decode_write_stacked(q, k3, v3, k_new, v_new, li, pos,
                               scale: float, hkv: int,
                               s_limit: int | None = None, win_l=None,
                               softcap: float = 0.0):
    """flash_decode_stacked + fused cache-row write (decode t=1 path).

    k_new/v_new [B, Hkv, D] ROPED new rows; k3/v3 are donated and returned
    updated (cache[li, b, pos[b]] = new row). Replaces the two XLA
    dynamic_update_slices per layer AND the kernel's stale-row hazard is
    handled by masking j <= pos-1 and merging the new token from VMEM.
    Returns (attn [B, Hq, D] f32, k3', v3')."""
    b, hq, d = q.shape
    n_l, _, s_len, _ = k3.shape
    s_eff = s_limit if s_limit is not None and s_limit < s_len else s_len
    group = hq // hkv
    kn2 = k_new.reshape(b, hkv * d).astype(jnp.float32)
    vn2 = v_new.reshape(b, hkv * d).astype(jnp.float32)
    if (jax.default_backend() != "tpu" or s_eff % 256 or d % 128
            or hq > 256):
        bidx = jnp.arange(b)
        k3 = k3.at[li, bidx, pos].set(kn2.astype(k3.dtype))
        v3 = v3.at[li, bidx, pos].set(vn2.astype(v3.dtype))
        out = flash_decode_stacked(q, k3, v3, li, pos, scale, hkv,
                                   s_limit=s_limit, win_l=win_l,
                                   softcap=softcap)
        return out, k3, v3
    bs = _decode_bs(s_eff)
    n_s = s_eff // bs
    qt = q.transpose(0, 2, 1).astype(k3.dtype)          # (B, D, Hq)
    grid = (b, n_s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, d, hq), lambda bi, si, pr, lr: (bi, 0, 0)),
            pl.BlockSpec((None, None, bs, hkv * d),
                         lambda bi, si, pr, lr: (lr[0], bi, si, 0)),
            pl.BlockSpec((None, None, bs, hkv * d),
                         lambda bi, si, pr, lr: (lr[0], bi, si, 0)),
            pl.BlockSpec((b, hkv * d), lambda bi, si, pr, lr: (0, 0)),
            pl.BlockSpec((b, hkv * d), lambda bi, si, pr, lr: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, hq, d), lambda bi, si, pr, lr: (bi, 0, 0)),
            pl.BlockSpec((None, 8, hq), lambda bi, si, pr, lr: (bi, 0, 0)),
            pl.BlockSpec((None, None, 8, hkv * d),
                         lambda bi, si, pr, lr: (lr[0], bi, pr[bi] // 8, 0)),
            pl.BlockSpec((None, None, 8, hkv * d),
                         lambda bi, si, pr, lr: (lr[0], bi, pr[bi] // 8, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, hq), jnp.float32),
                        pltpu.VMEM((hq, hkv * d), jnp.float32),
                        pltpu.VMEM((8, hkv * d), k3.dtype),
                        pltpu.VMEM((8, hkv * d), v3.dtype),
                        pltpu.VMEM((hkv * d, hq), k3.dtype)],
    )
    windowed = win_l is not None

    def kern(pos_ref, li_ref, qt_ref, k_ref, v_ref, kn_ref, vn_ref,
             acc_ref, l_ref, ko_ref, vo_ref, m_ref, accs_ref, blkk_ref,
             blkv_ref, q2s_ref):
        _flash_decode_write_kernel(
            pos_ref, li_ref, qt_ref, k_ref, v_ref, kn_ref, vn_ref, acc_ref,
            l_ref, ko_ref, vo_ref, m_ref, accs_ref, blkk_ref, blkv_ref,
            q2s_ref, bs=bs, n_s=n_s, scale=scale, grp=group, dh=d,
            softcap=softcap, win=li_ref[1] if windowed else None)

    acc, l_out, k3o, v3o = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, hq, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, 8, hq), jnp.float32),
                   jax.ShapeDtypeStruct(k3.shape, k3.dtype),
                   jax.ShapeDtypeStruct(v3.shape, v3.dtype)],
        grid_spec=grid_spec,
        input_output_aliases={3: 2, 4: 3},   # k3 -> k3o, v3 -> v3o in place
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(pos.astype(jnp.int32),
      jnp.stack([jnp.asarray(li, jnp.int32),
                 (jnp.asarray(win_l, jnp.int32) if windowed
                  else jnp.int32(0))]), qt, k3, v3, kn2, vn2)
    l = jnp.maximum(l_out[:, 0, :], 1e-30)          # (b, hq)
    return acc / l[..., None], k3o, v3o


def flash_decode(q, k_cache, v_cache, pos, scale: float,
                 window: int = 0, softcap: float = 0.0):
    """Fused decode attention. q [B, Hq, D]; caches [B, S, Hkv, D] (bf16);
    pos int32 [B] (last visible index). window/softcap: gemma-style SWA and
    tanh score cap (window is STATIC here — per-layer selection happens in
    the unrolled forward). Returns [B, Hq, D] f32."""
    b, hq, d = q.shape
    s_len, hkv = k_cache.shape[1], k_cache.shape[2]
    group = hq // hkv
    if jax.default_backend() != "tpu" or s_len % 256 or d % 128 or hq > 256:
        # reference path (tests / odd shapes)
        qg = q.reshape(b, 1, hq, d)
        from ..models.llama import attention
        return attention(qg, k_cache, v_cache, pos, jnp.arange(1),
                         scale, window=window or None, softcap=softcap)[:, 0]
    bs = _decode_bs(s_len)
    n_s = s_len // bs
    # block-diagonal query operand: Q2[(h, d), (h', g)] = q[h', g, d] iff h==h'
    qr = q.reshape(b, hkv, group, d)
    eye = jnp.eye(hkv, dtype=qr.dtype)
    q2 = jnp.einsum("bhgd,hj->bjdhg", qr, eye).reshape(b, hkv * d, hq)
    q2 = q2.astype(k_cache.dtype)
    grid = (b, n_s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, hkv * d, hq), lambda bi, si, pr: (bi, 0, 0)),
            pl.BlockSpec((None, bs, hkv * d), lambda bi, si, pr: (bi, si, 0)),
            pl.BlockSpec((None, bs, hkv * d), lambda bi, si, pr: (bi, si, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, hq, hkv * d), lambda bi, si, pr: (bi, 0, 0)),
            pl.BlockSpec((None, 8, hq), lambda bi, si, pr: (bi, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, hq), jnp.float32),
                        pltpu.VMEM((hq, hkv * d), jnp.float32)],
    )
    acc, l_out = pl.pallas_call(
        functools.partial(_flash_decode_kernel, bs=bs, n_s=n_s, scale=scale,
                          softcap=softcap, win=window or None),
        out_shape=[jax.ShapeDtypeStruct((b, hq, hkv * d), jnp.float32),
                   jax.ShapeDtypeStruct((b, 8, hq), jnp.float32)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(pos.astype(jnp.int32), q2,
      k_cache.reshape(b, s_len, hkv * d),
      v_cache.reshape(b, s_len, hkv * d))
    # diagonal head blocks + softmax normalization (tiny, XLA)
    accd = acc.reshape(b, hkv, group, hkv, d)
    out = jnp.einsum("bhghd->bhgd", accd)
    l = jnp.maximum(l_out[:, 0, :], 1e-30).reshape(b, hkv, group)
    return (out / l[..., None]).reshape(b, hq, d)


def flash_decode_stacked(q, k3, v3, li, pos, scale: float, hkv: int,
                         s_limit: int | None = None, win_l=None,
                         softcap: float = 0.0):
    """Fused decode attention against LAYER-STACKED FLAT caches.

    q [B, Hq, D]; k3/v3 [L, B, S, Hkv*D] (the kvcache.py dense layout — flat
    so the kernel streams (positions, Hkv*D) tiles with no physical relayout);
    li traced int32 layer id; pos int32 [B]. The layer id rides scalar
    prefetch and indexes the stacked cache inside the BlockSpec — a lax.scan
    over layers reads each layer's KV straight from HBM with NO per-layer
    slice copy (the xs/ys formulation materialized ~2 copies of the layer
    cache per step). s_limit (static) bounds how many cache positions are
    streamed (attn_len bucketing analog). win_l: optional traced int32 scalar,
    the CURRENT layer's sliding window (callers pass a huge value for global
    layers — the mask j > pos - win then never bites); softcap: gemma2 tanh
    score cap. Returns [B, Hq, D] f32.
    """
    b, hq, d = q.shape
    n_l, _, s_len, _ = k3.shape
    s_eff = s_limit if s_limit is not None and s_limit < s_len else s_len
    group = hq // hkv
    if (jax.default_backend() != "tpu" or s_eff % 256 or d % 128
            or hq > 256):
        kci = jax.lax.dynamic_index_in_dim(k3, li, 0, keepdims=False)
        vci = jax.lax.dynamic_index_in_dim(v3, li, 0, keepdims=False)
        from ..models.llama import attention
        return attention(q[:, None],
                         kci[:, :s_eff].reshape(b, s_eff, hkv, d),
                         vci[:, :s_eff].reshape(b, s_eff, hkv, d),
                         pos, jnp.arange(1), scale,
                         window=win_l, softcap=softcap)[:, 0]
    bs = _decode_bs(s_eff)
    n_s = s_eff // bs
    qt = q.transpose(0, 2, 1).astype(k3.dtype)          # (B, D, Hq)
    grid = (b, n_s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, d, hq), lambda bi, si, pr, lr: (bi, 0, 0)),
            pl.BlockSpec((None, None, bs, hkv * d),
                         lambda bi, si, pr, lr: (lr[0], bi, si, 0)),
            pl.BlockSpec((None, None, bs, hkv * d),
                         lambda bi, si, pr, lr: (lr[0], bi, si, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, hq, d), lambda bi, si, pr, lr: (bi, 0, 0)),
            pl.BlockSpec((None, 8, hq), lambda bi, si, pr, lr: (bi, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, hq), jnp.float32),
                        pltpu.VMEM((hq, hkv * d), jnp.float32),
                        pltpu.VMEM((hkv * d, hq), k3.dtype)],
    )

    windowed = win_l is not None

    def kern(pos_ref, li_ref, qt_ref, k_ref, v_ref, acc_ref, l_ref,
             m_ref, accs_ref, q2s_ref):
        # li_ref = [layer_id, win]: the per-layer window rides the same
        # prefetch array (huge value on global layers)
        _flash_decode_qt_kernel(pos_ref, li_ref, qt_ref, k_ref, v_ref,
                                acc_ref, l_ref, m_ref, accs_ref, q2s_ref,
                                bs=bs, n_s=n_s, scale=scale, grp=group,
                                dh=d, softcap=softcap,
                                win=li_ref[1] if windowed else None)

    acc, l_out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, hq, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, 8, hq), jnp.float32)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(pos.astype(jnp.int32),
      jnp.stack([jnp.asarray(li, jnp.int32),
                 (jnp.asarray(win_l, jnp.int32) if windowed
                  else jnp.int32(0))]), qt, k3, v3)
    l = jnp.maximum(l_out[:, 0, :], 1e-30)              # (b, hq)
    return acc / l[..., None]
