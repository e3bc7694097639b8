"""Group-attention self-extend (LongLM): run a model beyond its trained
context by grouping distant KV rope positions.

Reference: the llamafile server's slot loop applies three position edits to
the KV cache whenever n_past_se crosses ga_i + ga_w
(llama.cpp.patches/patches/server_server.cpp.patch:3629-3651):

    ib = (ga_n * ga_i) / ga_w
    bd = (ga_w / ga_n) * (ga_n - 1)
    dd = (ga_w / ga_n) - ib*bd - ga_w
    seq_add(ga_i,           n_past,          +ib*bd)
    seq_div(ga_i + ib*bd,   ga_i+ib*bd+ga_w, ga_n)
    seq_add(ga_i+ib*bd+ga_w, n_past+ib*bd,   +dd)
    n_past -= bd;  ga_i += ga_w / ga_n

The reference cache is position-addressed, so these edits are lazy per-cell
deltas resolved by a rope-shift pass. Our dense cache is INDEX-addressed
(cell i = i-th token), which is a better fit: cells never move, the causal
mask stays index-based, and self-extend is purely (a) a per-cell ROPE
position array maintained host-side and (b) a jitted re-rope pass over the
cached K whenever positions change. New tokens rope at n_past_se (tracked as
`rope_off = cells - n_past_se` and threaded into the decode step).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def plan_shifts(n_cells: int, n_past_se: int, ga_i: int, ga_n: int,
                ga_w: int, cell_pos: np.ndarray
                ) -> Tuple[int, int, np.ndarray, bool]:
    """Run the reference while-loop on the host position array.

    cell_pos: int32 [S] current rope position of each cache cell (cells
    >= n_cells are ignored). Returns (n_past_se, ga_i, new_cell_pos, changed).
    """
    pos = cell_pos.copy()
    changed = False
    while n_past_se >= ga_i + ga_w:
        ib = (ga_n * ga_i) // ga_w
        bd = (ga_w // ga_n) * (ga_n - 1)
        dd = (ga_w // ga_n) - ib * bd - ga_w
        live = np.arange(len(pos)) < n_cells

        def _range(p0, p1):
            return live & (pos >= p0) & (pos < p1)

        m = _range(ga_i, n_past_se)
        pos[m] += ib * bd
        m = _range(ga_i + ib * bd, ga_i + ib * bd + ga_w)
        pos[m] //= ga_n
        m = _range(ga_i + ib * bd + ga_w, n_past_se + ib * bd)
        pos[m] += dd
        n_past_se -= bd
        ga_i += ga_w // ga_n
        changed = True
    return n_past_se, ga_i, pos, changed


@functools.partial(jax.jit, static_argnames=("head_dim", "theta", "rscale",
                                             "neox"))
def rerope_dense(k, delta, head_dim: int, theta: float, rscale: float,
                 neox: bool):
    """Rotate cached K by per-cell position deltas (exact: rope is additive).

    k: [L, B, S, H*D] dense cache array; delta: int32 [B, S].
    Plain-rope models only (YaRN's mscale breaks rotation additivity —
    callers must gate).
    """
    from ..models.llama import apply_rope, rope_cos_sin
    cos, sin = rope_cos_sin(delta, head_dim, theta, rscale, None)  # [B,S,D/2]
    L, B, S, HD = k.shape
    kr = k.reshape(L, B, S, HD // head_dim, head_dim).astype(jnp.float32)
    kr = apply_rope(kr, cos[None, :, :, None, :], sin[None, :, :, None, :],
                    neox)
    return kr.reshape(L, B, S, HD).astype(k.dtype)


class SelfExtend:
    """Host-side controller for one sequence (engine path, batch row 0).

    Usage: before roping new tokens at positions [cells, cells+t), call
    `advance(t)`; it re-ropes the cache when the reference loop fires and
    returns the rope offset to subtract from index positions.
    """

    def __init__(self, engine, ga_n: int, ga_w: int):
        cfg = engine.cfg
        if ga_n <= 1:
            raise ValueError("ga_n must be > 1")
        if ga_w % ga_n:
            raise ValueError("ga_w must be a multiple of ga_n")
        if getattr(cfg, "rope_yarn_ext", 0.0):
            raise ValueError("self-extend is incompatible with YaRN scaling")
        if getattr(cfg, "swa_window", 0):
            raise ValueError("self-extend needs uniform full attention "
                             "(model uses sliding-window layers)")
        if getattr(cfg, "rope_dim", 0) or getattr(cfg, "kv_lora_rank", 0):
            raise ValueError("self-extend's K re-rope assumes full-head "
                             "rope (partial-rotary / MLA archs unsupported)")
        if getattr(engine, "recurrent", False):
            raise ValueError("self-extend applies to attention caches only")
        if getattr(engine, "kv_dtype", None) == jnp.int8:
            raise ValueError("self-extend re-ropes the K cache: use a "
                             "bf16/f16/f32 KV cache (not int8)")
        self.engine = engine
        self.cfg = cfg
        self.ga_n, self.ga_w = ga_n, ga_w
        self.ga_i = 0
        self.n_past_se = 0            # reference rope position counter
        self.cells = 0                # cache cells used (index positions)
        self.cell_pos = np.zeros((engine.max_seq_len,), np.int32)

    @property
    def rope_off(self) -> int:
        return self.cells - self.n_past_se

    def advance(self, cache, t: int):
        """Account for t upcoming tokens; re-rope `cache` K if the loop
        fires. Returns (cache, rope_off) — rope positions for the new tokens
        are their index positions minus rope_off."""
        n_past, ga_i, pos, changed = plan_shifts(
            self.cells, self.n_past_se, self.ga_i, self.ga_n, self.ga_w,
            self.cell_pos)
        if changed:
            delta = (pos - self.cell_pos)[None, :]      # [1, S]
            cfg = self.cfg
            k2 = rerope_dense(cache.k, jnp.asarray(delta), cfg.head_dim,
                              cfg.rope_theta, cfg.rope_scale, cfg.rope_neox)
            cache = type(cache)(k2, cache.v, cache.k_scale, cache.v_scale)
            self.cell_pos = pos
            self.n_past_se, self.ga_i = n_past, ga_i
        off = self.rope_off
        self.cell_pos[self.cells:self.cells + t] = np.arange(
            self.n_past_se, self.n_past_se + t, dtype=np.int32)
        self.cells += t
        self.n_past_se += t
        return cache, off
