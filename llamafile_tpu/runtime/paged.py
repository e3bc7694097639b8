"""Paged KV cache: block tables + paged attention decode + context shift.

The BASELINE north star names "paged F16/INT8 KV-cache attention"; the
reference keeps a dense F16 cache per slot but supports mid-context deletion
with tail relocation (llamafile/server/slot.cpp:291-424 — keep a common
prefix, delete a middle span, memmove the tail). The TPU-native design
separates the two concerns:

- **data pages** live on device: `k_pages`/`v_pages` shaped
  [L, Hkv, P, page_size, D] (the pallas paged-attention kernel layout,
  jax.experimental.pallas.ops.tpu.paged_attention); every row of the batch
  references pages through an int32 block table, so per-row sequence lengths
  pay only the pages they use;
- **page bookkeeping** lives on the host: a free-list allocator and per-row
  python tables (mirrored to a device [R, MAXP] table array). "memmove" is a
  table edit for whole pages; token-granular relocation gathers the moved
  span through the tables and re-rotates cached K by the position delta —
  exact for every supported RoPE mode because all angle schedules are linear
  in position (models/llama.rope_angles).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PagedKV:
    k_pages: jax.Array            # [L, Hkv, P, ps, D] bf16 or int8
    v_pages: jax.Array
    k_scale: Optional[jax.Array] = None   # [L, Hkv, P, ps, 1] f32 when int8
    v_scale: Optional[jax.Array] = None

    def tree_flatten(self):
        return (self.k_pages, self.v_pages, self.k_scale, self.v_scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[2]


jax.tree_util.register_pytree_node(
    PagedKV, PagedKV.tree_flatten, PagedKV.tree_unflatten)


def init_paged(n_layers: int, n_kv: int, n_pages: int, page_size: int,
               head_dim: int, dtype=jnp.bfloat16,
               v_head_dim: int = 0) -> PagedKV:
    """v_head_dim: V pages narrower than K pages (MLA: qk heads are
    nope+rope wide, V heads v_head_dim wide)."""
    kshape = (n_layers, n_kv, n_pages, page_size, head_dim)
    vshape = (n_layers, n_kv, n_pages, page_size, v_head_dim or head_dim)
    if dtype in (jnp.int8, "i8", "int8"):
        sshape = kshape[:-1] + (1,)
        return PagedKV(jnp.zeros(kshape, jnp.int8),
                       jnp.zeros(vshape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
    return PagedKV(jnp.zeros(kshape, dtype), jnp.zeros(vshape, dtype))


def _q8(x):
    """float [..., D] -> (int8, f32 absmax-keepdim scale) — the paged
    attention kernel's QuantizedTensor convention."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, (amax / 127.0).astype(jnp.float32)


class PageAllocator:
    """Host-side page bookkeeping. Page 0 is reserved as the trash page
    (parked rows write there; it is never referenced by a live table).

    Pages are REFCOUNTED so a common prompt prefix can be shared across
    rows copy-on-write style (the reference server computes the system
    prompt's KV once on seq 0 and lets every slot reference it,
    server_server.cpp.patch:883,1713-1731): share_prefix() aliases the
    donor's full prefix pages into another row's table; writes never land
    in shared pages (the batcher masks them to the trash page on
    write-back and rows only append past their length), and a page
    returns to the free list when its last reference drops."""

    def __init__(self, n_pages: int, page_size: int, n_rows: int,
                 max_len: int):
        self.page_size = page_size
        self.max_pages_per_row = -(-max_len // page_size)
        self.free: List[int] = list(range(n_pages - 1, 0, -1))
        self.tables: List[List[int]] = [[] for _ in range(n_rows)]
        self.lengths: List[int] = [0] * n_rows
        self.refs = {}                     # page -> refcount (absent = free)

    def _unref(self, p: int) -> None:
        self.refs[p] = self.refs.get(p, 1) - 1
        if self.refs[p] <= 0:
            del self.refs[p]
            self.free.append(p)

    def is_shared(self, p: int) -> bool:
        return self.refs.get(p, 1) > 1

    def ensure(self, row: int, n_tokens: int) -> None:
        """Grow row's table to cover n_tokens positions."""
        need = -(-n_tokens // self.page_size)
        t = self.tables[row]
        while len(t) < need:
            if not self.free:
                raise RuntimeError("out of KV pages")
            p = self.free.pop()
            self.refs[p] = 1
            t.append(p)

    def release(self, row: int) -> None:
        for p in self.tables[row]:
            self._unref(p)
        self.tables[row] = []
        self.lengths[row] = 0

    def truncate(self, row: int, n_tokens: int) -> None:
        """Drop pages beyond n_tokens (keep partial boundary page)."""
        keep = -(-n_tokens // self.page_size) if n_tokens else 0
        t = self.tables[row]
        for p in t[keep:]:
            self._unref(p)
        self.tables[row] = t[:keep]
        self.lengths[row] = n_tokens

    def share_prefix(self, src: int, dst: int, n_pages: int) -> None:
        """Alias src's first n_pages (a FULL-page prompt prefix) into dst's
        (empty) table. Both rows treat those pages as read-only."""
        assert not self.tables[dst], "share_prefix needs an empty dst table"
        head = self.tables[src][:n_pages]
        for p in head:
            self.refs[p] = self.refs.get(p, 1) + 1
        self.tables[dst] = list(head)
        self.lengths[dst] = n_pages * self.page_size

    def shared_page_count(self, row: int) -> int:
        """Leading run of shared pages in row's table (the aliased prefix)."""
        n = 0
        for p in self.tables[row]:
            if not self.is_shared(p):
                break
            n += 1
        return n

    def device_tables(self, n_rows: int, only_rows=None) -> jnp.ndarray:
        """[R, MAXP] int32, unused entries point at the trash page 0.

        only_rows: when given, rows NOT in it map entirely to the trash page
        (their host tables stay intact) — used by the batcher so parked rows'
        fused-step writes land in trash instead of a retained prefix page."""
        arr = np.zeros((n_rows, self.max_pages_per_row), np.int32)
        keep = None if only_rows is None else set(only_rows)
        for r, t in enumerate(self.tables):
            if keep is None or r in keep:
                arr[r, :len(t)] = t
        return jnp.asarray(arr)


# ---------------------------------------------------------------------------
# Device ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("ps",))
def copy_row_to_pages(paged: PagedKV, dense_k, dense_v, pages, ps: int):
    """Scatter a dense single-row cache ([L, 1, S, H*D] flat — the
    kvcache.py dense layout) into pages.

    pages: int32 [np] page ids covering positions [0, np*ps).
    """
    n = pages.shape[0]
    L = dense_k.shape[0]
    H, D = paged.k_pages.shape[1], paged.k_pages.shape[-1]
    Dv = paged.v_pages.shape[-1]
    lk = dense_k[:, 0, : n * ps].reshape(L, n * ps, H, D)
    lv = dense_v[:, 0, : n * ps].reshape(L, n * ps, H, Dv)
    kk = lk.reshape(L, n, ps, H, D).transpose(0, 3, 1, 2, 4)   # [L,H,np,ps,D]
    vv = lv.reshape(L, n, ps, H, Dv).transpose(0, 3, 1, 2, 4)
    if paged.quantized:
        qk, sk = _q8(kk.astype(jnp.float32))
        qv, sv = _q8(vv.astype(jnp.float32))
        return PagedKV(paged.k_pages.at[:, :, pages].set(qk),
                       paged.v_pages.at[:, :, pages].set(qv),
                       paged.k_scale.at[:, :, pages].set(sk),
                       paged.v_scale.at[:, :, pages].set(sv))
    return PagedKV(
        paged.k_pages.at[:, :, pages].set(kk.astype(paged.k_pages.dtype)),
        paged.v_pages.at[:, :, pages].set(vv.astype(paged.v_pages.dtype)))


@functools.partial(jax.jit, static_argnames=("ps", "max_len"))
def gather_pages_to_row(paged: PagedKV, pages, ps: int, max_len: int):
    """Inverse of copy_row_to_pages: rebuild a dense single-row cache
    [L, 1, S, H*D] (flat, rest zeros — the kvcache.py dense layout) — used to
    seed a prefix-reuse admission prefill from the row's live pages."""
    kk = paged.k_pages[:, :, pages]                    # [L, H, np, ps, D]
    vv = paged.v_pages[:, :, pages]
    if paged.quantized:
        kk = kk.astype(jnp.float32) * paged.k_scale[:, :, pages]
        vv = vv.astype(jnp.float32) * paged.v_scale[:, :, pages]
    L, H, n, _, D = kk.shape
    Dv = vv.shape[-1]
    k = kk.transpose(0, 2, 3, 1, 4).reshape(L, n * ps, H * D)
    v = vv.transpose(0, 2, 3, 1, 4).reshape(L, n * ps, H * Dv)
    pad = max_len - n * ps
    k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))[:, None]
    v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))[:, None]
    return k, v


def find_mid_delete(history: List[int], ids: List[int], prefix: int,
                    min_reuse: int = 8) -> Optional[Tuple[int, int]]:
    """Detect the reference's mid-delete pattern (slot.cpp:291-424): the new
    prompt keeps `prefix`, removes history[prefix:j], then continues with a
    span of the old history starting at j (trailing divergence — e.g. the
    previously generated tokens — is simply discarded, as the reference's
    tail truncation does). Returns (j, reuse_len) maximizing reuse, or None.
    """
    h = np.asarray(history[prefix:])
    i = np.asarray(ids[prefix:])
    if not len(h) or not len(i):
        return None
    best = None
    for d in range(1, len(h)):                         # deletion span length
        m = min(len(h) - d, len(i))
        if best is not None and best[1] >= m:
            break                                      # can't beat it anymore
        eq = h[d:d + m] == i[:m]
        reuse = int(np.argmin(eq)) if not eq.all() else m
        if reuse >= min_reuse and (best is None or reuse > best[1]):
            best = (prefix + d, reuse)
    return best


def paged_attend(q, k_pages_l, v_pages_l, lengths, tables, *,
                 pages_per_block: int = 4, k_scale_l=None, v_scale_l=None):
    """Decode attention for one layer. q [R, Hq, D] (PRE-SCALED by
    1/sqrt(D) — the pallas kernel applies no sm_scale); pages [Hkv, P, ps, D]
    bf16, or int8 with [Hkv, P, ps, 1] scales (kernel QuantizedTensor);
    lengths [R]; tables [R, MAXP]. Returns [R, Hq, D] f32.

    TPU uses the pallas paged-attention kernel; other backends use a
    gather+mask reference (tests)."""
    d_head = k_pages_l.shape[-1]
    if (jax.default_backend() == "tpu" and d_head % 128 == 0
            and v_pages_l.shape[-1] == d_head):
        # (asymmetric k/v widths — MLA — use the reference path: the upstream
        # pallas kernel assumes one head_dim)
        # the upstream kernel's residual outputs mis-tile for head_dim < 128
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention, quantization_utils)
        ppb = min(pages_per_block, tables.shape[1])
        while tables.shape[1] % ppb:
            ppb -= 1
        kp, vp = k_pages_l, v_pages_l
        if k_scale_l is not None:
            kp = quantization_utils.QuantizedTensor(kp, k_scale_l)
            vp = quantization_utils.QuantizedTensor(vp, v_scale_l)
        return paged_attention(
            q.astype(jnp.float32), kp, vp,
            lengths.astype(jnp.int32), tables,
            pages_per_compute_block=ppb).astype(jnp.float32)
    r, hq, d = q.shape
    hkv, _, ps, _ = k_pages_l.shape
    dv = v_pages_l.shape[-1]
    maxp = tables.shape[1]
    k = k_pages_l[:, tables]                  # [Hkv, R, MAXP, ps, D]
    v = v_pages_l[:, tables]
    if k_scale_l is not None:
        k = k.astype(jnp.float32) * k_scale_l[:, tables]
        v = v.astype(jnp.float32) * v_scale_l[:, tables]
    k = k.transpose(1, 0, 2, 3, 4).reshape(r, hkv, maxp * ps, d)
    v = v.transpose(1, 0, 2, 3, 4).reshape(r, hkv, maxp * ps, dv)
    group = hq // hkv
    qg = q.reshape(r, hkv, group, d).astype(jnp.float32)
    scores = jnp.einsum("rhgd,rhsd->rhgs", qg, k.astype(jnp.float32))
    j = jnp.arange(maxp * ps)[None, :]
    mask = j < lengths[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("rhgs,rhsd->rhgd", probs, v.astype(jnp.float32))
    return out.reshape(r, hq, dv)


def write_token_kv(k_pages_l, v_pages_l, k_new, v_new, pages, offs,
                   k_scale_l=None, v_scale_l=None):
    """Scatter one new token per row: k_new [R, Hkv, D], pages/offs [R].
    Quantizes per (row, head) when scale pages are present. Returns
    (k_pages, v_pages[, k_scale, v_scale])."""
    kT = k_new.transpose(1, 0, 2)                           # [Hkv, R, D]
    vT = v_new.transpose(1, 0, 2)
    if k_scale_l is not None:
        qk, sk = _q8(kT.astype(jnp.float32))
        qv, sv = _q8(vT.astype(jnp.float32))
        return (k_pages_l.at[:, pages, offs].set(qk, mode="drop"),
                v_pages_l.at[:, pages, offs].set(qv, mode="drop"),
                k_scale_l.at[:, pages, offs].set(sk, mode="drop"),
                v_scale_l.at[:, pages, offs].set(sv, mode="drop"))
    return (k_pages_l.at[:, pages, offs].set(kT.astype(k_pages_l.dtype),
                                             mode="drop"),
            v_pages_l.at[:, pages, offs].set(vT.astype(v_pages_l.dtype),
                                             mode="drop"))


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("cfg", "n_move"))
def relocate_span(paged: PagedKV, cfg, tables_row, src_start: jnp.ndarray,
                  dst_start: jnp.ndarray, n_move: int):
    """Move n_move cached tokens of ONE row from positions [src, src+n) to
    [dst, dst+n) (dst < src), re-rotating K by the position delta — the paged
    analog of slot.cpp:291-424's memmove + llama_kv_cache_seq_add rope shift.

    tables_row: int32 [MAXP] (the row's table; source and destination slots
    resolve through it, so this works regardless of page boundaries).
    """
    from ..models.llama import apply_rope, rope_angles
    ps = paged.page_size
    src = src_start + jnp.arange(n_move)
    dst = dst_start + jnp.arange(n_move)
    sp_, so = tables_row[src // ps], src % ps
    dp_, do = tables_row[dst // ps], dst % ps
    delta = (dst_start - src_start).astype(jnp.int32)        # negative
    # only the ROTARY slice of each K head re-rotates: full head for llama,
    # the first rope_dim dims for partial-rotary archs (gptneox rotary_pct),
    # the LAST rope_dim dims for MLA (k = [nope | rope])
    rd = cfg.rope_dim or cfg.head_dim
    r_off = cfg.qk_nope_dim if getattr(cfg, "kv_lora_rank", 0) else 0
    ang, _ = rope_angles(jnp.full((n_move,), delta), rd,
                         cfg.rope_theta, cfg.rope_scale, cfg)
    cos, sin = jnp.cos(ang), jnp.sin(ang)                    # [n, rd/2]
    k = paged.k_pages[:, :, sp_, so]                         # [L, H, n, D]
    v = paged.v_pages[:, :, sp_, so]
    if paged.quantized:
        k = k.astype(jnp.float32) * paged.k_scale[:, :, sp_, so]
    k32 = k.astype(jnp.float32).transpose(0, 2, 1, 3)        # [L, n, H, D]
    krot = apply_rope(k32[..., r_off:r_off + rd],
                      cos[None, :, None, :], sin[None, :, None, :],
                      cfg.rope_neox)
    kshift = jnp.concatenate(
        [k32[..., :r_off], krot, k32[..., r_off + rd:]],
        axis=-1).transpose(0, 2, 1, 3)
    if paged.quantized:
        qk, sk = _q8(kshift)
        return PagedKV(
            paged.k_pages.at[:, :, dp_, do].set(qk),
            paged.v_pages.at[:, :, dp_, do].set(
                paged.v_pages[:, :, sp_, so]),
            paged.k_scale.at[:, :, dp_, do].set(sk),
            paged.v_scale.at[:, :, dp_, do].set(
                paged.v_scale[:, :, sp_, so]))
    return PagedKV(
        paged.k_pages.at[:, :, dp_, do].set(
            kshift.astype(paged.k_pages.dtype)),
        paged.v_pages.at[:, :, dp_, do].set(v))
