"""Tensor + data parallel execution: Megatron-style TP over a named mesh.

Replaces the reference's absent true tensor parallelism (SURVEY.md §2.10 —
ggml only splits ops across threads; multi-GPU row-split exists but no TP with
collectives). Layout per transformer layer, axes ("dp", "tp"):

  wq/wk/wv        column-parallel: shard output features (attention heads)
  wo              row-parallel:    shard input features; psum after
  ffn gate/up     column-parallel: shard d_ff
  ffn down        row-parallel:    psum after
  lm head         column-parallel over vocab; all-gather logits
  KV cache        sharded over kv heads (tp) and batch (dp)
  embeddings/norms replicated

QTensor leaves shard along their stored axes: column-parallel = axis 1 of
qs/scales/bias (N, the lane axis), row-parallel = axis 0 (K, sublanes). K-axis
sharding keeps whole 256-superblocks per shard (tp divides K/256 for all
supported models), so packed nibbles and scale groups never straddle shards.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.llama import LlamaConfig, LlamaLayer, LlamaParams, forward
from ..ops.repack import QTensor


def make_mesh(dp: int = 1, tp: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


COL = "col"   # shard N (axis 1 of K-major storage)
ROW = "row"   # shard K (axis 0)
REP = "rep"


def _qt_spec(role: str, qt: Optional[QTensor]) -> Optional[QTensor]:
    """PartitionSpec pytree for a QTensor, mirroring its None children."""
    if qt is None:
        return None
    if role == COL:
        s = P(None, "tp")
    elif role == ROW:
        s = P("tp", None)
    else:
        s = P(None, None)
    return QTensor(qt.kind, qt.shape, qt.g, s,
                   s if qt.scales is not None else None,
                   s if qt.bias is not None else None, qt.il)


def _qt_spec_stacked(qt: QTensor) -> QTensor:
    """Expert-stacked QTensor ([E, ...] leaves): shard experts over tp."""
    s = P("tp", None, None)
    return QTensor(qt.kind, qt.shape, qt.g, s,
                   s if qt.scales is not None else None,
                   s if qt.bias is not None else None, qt.il)


def _layer_spec(layer: LlamaLayer) -> LlamaLayer:
    if layer.wqkv is not None or layer.w_gate_up is not None:
        raise ValueError("TP sharding requires unfused projections: "
                         "load with fuse=False (shards must stay head-aligned)")
    rep = lambda x: P(None) if x is not None else None
    kw = dict(
        attn_norm=P(None),
        wq=_qt_spec(COL, layer.wq), wk=_qt_spec(COL, layer.wk),
        wv=_qt_spec(COL, layer.wv), wo=_qt_spec(ROW, layer.wo),
        bq=P("tp") if layer.bq is not None else None,
        bk=P("tp") if layer.bk is not None else None,
        bv=P("tp") if layer.bv is not None else None,
        ffn_norm=rep(layer.ffn_norm),
        # LN-family extras: norms + row-parallel-output biases replicate
        # (bo/b_down are added AFTER the psum), b_up shards with d_ff columns
        attn_norm_b=rep(layer.attn_norm_b),
        ffn_norm_b=rep(layer.ffn_norm_b),
        bo=rep(layer.bo),
        b_up=P("tp") if layer.b_up is not None else None,
        b_down=rep(layer.b_down),
        q_norm=rep(layer.q_norm), k_norm=rep(layer.k_norm),
        attn_post_norm=rep(layer.attn_post_norm),
        ffn_post_norm=rep(layer.ffn_post_norm),
        # MLA (deepseek2): LoRA down-projections + norms replicate (shared
        # low-rank latents), up-projections are column-parallel over heads
        # (q/kv head blocks are contiguous along N)
        wq_a=_qt_spec(REP, layer.wq_a), q_a_norm=rep(layer.q_a_norm),
        wq_b=_qt_spec(COL, layer.wq_b),
        wkv_a=_qt_spec(REP, layer.wkv_a), kv_a_norm=rep(layer.kv_a_norm),
        wkv_b=_qt_spec(COL, layer.wkv_b),
        w_gate=_qt_spec(COL, layer.w_gate),
        w_up=_qt_spec(COL, layer.w_up),
        w_down=_qt_spec(ROW, layer.w_down),
        gate_inp=_qt_spec(REP, layer.gate_inp),
        gate_inp_shexp=_qt_spec(REP, layer.gate_inp_shexp),
        experts=None if layer.experts is None else (
            # stacked EP layout: shard the expert dim over tp; shared-expert
            # (shexp.*) weights are 2-D and REPLICATED — moe_ffn_ep computes
            # them once on the device owning expert 0 and the psum combines
            {name: (_qt_spec_stacked(qt)
                    if name in ("gate", "up", "down", "gateup", "gateup_il")
                    else _qt_spec(REP, qt))
             for name, qt in layer.experts.items()}
            if any(r in layer.experts
                   for r in ("gate", "gateup", "gateup_il")) else
            {name: _qt_spec(ROW if "down" in name else COL, qt)
             for name, qt in layer.experts.items()}),
    )
    return LlamaLayer(**kw)


def params_spec(params: LlamaParams) -> LlamaParams:
    return LlamaParams(
        tok_embd=P(None, None),
        layers=[_layer_spec(l) for l in params.layers],
        out_norm=P(None),
        output=_qt_spec(COL, params.output),
        out_norm_b=P(None) if params.out_norm_b is not None else None,
        # lm-head bias shards with the vocab columns (added pre-all-gather)
        out_b=P("tp") if params.out_b is not None else None,
    )


def _strip_qt_padding(node):
    """Repack tile-pads the N axis; padding columns must not be distributed
    across column-parallel shards — strip to the logical N before sharding."""
    if not isinstance(node, QTensor) or node.kind == "dense":
        return node
    n = node.shape[0]
    if node.qs is None or node.qs.shape[-1] <= n:
        return node
    return QTensor(node.kind, node.shape, node.g, node.qs[..., :n],
                   None if node.scales is None else node.scales[..., :n],
                   None if node.bias is None else node.bias[..., :n], node.il)


def strip_padding(params):
    return jax.tree.map(
        _strip_qt_padding, params,
        is_leaf=lambda x: isinstance(x, QTensor) or x is None)


def _unstack_oddsize_experts(params: LlamaParams, tp: int) -> LlamaParams:
    """Expert-dim sharding needs n_experts % tp == 0; when it doesn't hold
    (e.g. qwen2moe's 60 experts on tp=8), fall back to the per-expert dict
    layout so each expert shards COL/ROW like any other projection."""
    import dataclasses as dc
    from ..ops.repack import expert_slice
    layers = []
    for layer in params.layers:
        ex = layer.experts
        if ex is not None and any(r in ex
                                  for r in ("gate", "gateup", "gateup_il")):
            roles = [r for r in ("gate", "up", "down", "gateup", "gateup_il")
                     if r in ex]
            n_e = ex[roles[0]].qs.shape[0]
            if n_e % tp:
                flat = {}
                for r in roles:
                    if r == "gateup_il":
                        # de-interleave the 1024-striped fused layout, then
                        # split like plain gateup
                        from ..ops.qmatmul import split_gu
                        dff = ex[r].shape[0] // 2
                        for e in range(n_e):
                            q = expert_slice(ex[r], e)
                            ga, ua = {}, {}
                            for fld in ("qs", "scales", "bias"):
                                a = getattr(q, fld)
                                if a is None:
                                    ga[fld] = ua[fld] = None
                                else:
                                    ga[fld], ua[fld] = split_gu(a, dff, True)
                            flat[f"gate.{e}"] = QTensor(
                                q.kind, (dff, q.shape[1]), q.g,
                                ga["qs"], ga["scales"], ga["bias"])
                            flat[f"up.{e}"] = QTensor(
                                q.kind, (dff, q.shape[1]), q.g,
                                ua["qs"], ua["scales"], ua["bias"])
                    elif r == "gateup":  # re-split: the COL/ROW TP path has
                        # no fused-expert handling (and shards must stay
                        # aligned to the logical d_ff split anyway)
                        dff = ex[r].shape[0] // 2
                        for e in range(n_e):
                            q = expert_slice(ex[r], e)
                            flat[f"gate.{e}"] = QTensor(
                                q.kind, (dff, q.shape[1]), q.g,
                                q.qs[..., :dff],
                                None if q.scales is None else q.scales[..., :dff],
                                None if q.bias is None else q.bias[..., :dff])
                            flat[f"up.{e}"] = QTensor(
                                q.kind, (dff, q.shape[1]), q.g,
                                q.qs[..., dff:],
                                None if q.scales is None else q.scales[..., dff:],
                                None if q.bias is None else q.bias[..., dff:])
                    else:
                        for e in range(n_e):
                            flat[f"{r}.{e}"] = expert_slice(ex[r], e)
                for k, v in ex.items():
                    if k.startswith("shexp."):
                        flat[k] = v
                layer = dc.replace(layer, experts=flat)
        layers.append(layer)
    return dc.replace(params, layers=layers)


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """device_put every leaf with its NamedSharding (host -> sharded HBM)."""
    params = strip_padding(params)
    tp = int(mesh.shape.get("tp", 1))
    if tp > 1:
        params = _unstack_oddsize_experts(params, tp)
    spec = params_spec(params)

    def put(leaf, s):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, s))

    return jax.tree.map(put, params, spec,
                        is_leaf=lambda x: x is None)


def local_config(cfg: LlamaConfig, tp: int) -> LlamaConfig:
    assert cfg.n_heads % tp == 0, (cfg.n_heads, tp)
    assert cfg.n_kv_heads % tp == 0, (cfg.n_kv_heads, tp)
    # ALiBi archs (mpt/bloom) shard fine: forward derives each shard's
    # slopes from the GLOBAL head table via axis_index (_alibi_local_slopes)
    return dataclasses.replace(cfg, n_heads=cfg.n_heads // tp,
                               n_kv_heads=cfg.n_kv_heads // tp)


def cache_spec(quantized: bool = False):
    from ..runtime.kvcache import KVCache
    if quantized:
        s = P(None, "dp", None, "tp", None)   # int8 [L, B, S, Hkv, D]
        sc = P(None, "dp", None, "tp")        # scales [L, B, S, Hkv]
        return KVCache(s, s, sc, sc)
    # dense caches are FLAT [L, B, S, Hkv*D] (kvcache.py layout): the flat
    # axis is head-major, so sharding it on tp = sharding heads on tp
    s = P(None, "dp", None, "tp")
    return KVCache(s, s, None, None)


def make_tp_forward(cfg: LlamaConfig, mesh: Mesh):
    """Build the shard_map'd forward: (params, tokens, pos, cache) -> (logits, cache).

    params must be sharded per params_spec; cache per cache_spec. tokens/pos are
    dp-sharded on batch; logits come back fully replicated across tp.
    """
    tp = mesh.shape["tp"]
    lcfg = local_config(cfg, tp)

    def fwd(params, tokens, pos, cache):
        return forward(params, lcfg, tokens, pos, cache, tp_axis="tp")

    def run(params, tokens, pos, cache):
        pspec = params_spec(params)
        f = shard_map(fwd, mesh=mesh,
                      in_specs=(pspec, P("dp", None), P("dp"), cache_spec()),
                      out_specs=(P("dp", None, None), cache_spec()),
                      check_vma=False)
        return f(params, tokens, pos, cache)

    return jax.jit(run)


def init_sharded_cache(cfg: LlamaConfig, mesh: Mesh, batch: int, max_len: int,
                       dtype=jnp.bfloat16, dp_shard: bool = True):
    from ..runtime.kvcache import init_kv
    quant = dtype in ("i8", "int8")
    spec = cache_spec(quant)
    if not dp_shard:   # single-row admission cache: replicate over dp
        spec = jax.tree.map(
            lambda s: P(*[None if ax == "dp" else ax for ax in s]), spec,
            is_leaf=lambda x: isinstance(x, P))
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                             is_leaf=lambda x: isinstance(x, P))
    z = jax.jit(lambda: init_kv(cfg.n_layers, batch, max_len, cfg.n_kv_heads,
                                cfg.head_dim, dtype,
                                v_head_dim=getattr(cfg, "v_head_dim", 0)),
                out_shardings=shardings)
    return z()


def _pw_spec():
    from ..runtime.sampling import PenaltyWindow
    return PenaltyWindow(P("dp", None), P("dp", None), P("dp"), P("dp"))


def _rp_spec(has_bias: bool):
    from ..runtime.sampling import RowParams
    return RowParams(*([P("dp")] * 11),
                     bias=P("dp", None) if has_bias else None)


def make_tp_row_prefill(cfg: LlamaConfig, mesh: Mesh, pspec,
                        fresh: bool, attn_len):
    """Single-row admission prefill over the mesh: the row is replicated
    across dp (every dp group computes it — admission is one row at a time)
    and tp shards heads as usual."""
    tp = mesh.shape["tp"]
    lcfg = local_config(cfg, tp)
    cspec = jax.tree.map(
        lambda s: P(*[None if ax == "dp" else ax for ax in s]), cache_spec(),
        is_leaf=lambda x: isinstance(x, P))

    def fwd(params, tokens, pos, cache, last_idx):
        return forward(params, lcfg, tokens, pos, cache, tp_axis="tp",
                       fresh_prefill=fresh, attn_len=attn_len,
                       last_idx=last_idx)

    f = shard_map(fwd, mesh=mesh,
                  in_specs=(pspec, P(None, None), P(None), cspec, P(None)),
                  out_specs=(P(None, None, None), cspec),
                  check_vma=False)
    return jax.jit(f)


def make_tp_fused_decode(cfg: LlamaConfig, mesh: Mesh, pspec, n_steps: int,
                         attn_len, has_bias: bool):
    """Row-batched fused decode scan over the mesh: rows shard over dp, heads
    over tp; the full sampling chain (sample_batched + penalty window) runs
    inside the shard_map on each dp group's rows. This is the TPU-native
    multi-chip continuous-batching step (SURVEY §2.10) — the reference's
    server has no analog (single-node threads; server_server.cpp.patch
    :1731-1762 batches slots on one context)."""
    from ..runtime.sampling import penalty_window_push, sample_batched
    tp = mesh.shape["tp"]
    lcfg = local_config(cfg, tp)
    cspec = cache_spec()

    def body(params, tok, pos, cache, pw, keys, rp):
        def step(carry, _):
            t, p, c, w, k = carry
            logits, c = forward(params, lcfg, t[:, None], p, c,
                                attn_len=attn_len, tp_axis="tp")
            k2 = jax.vmap(jax.random.split, in_axes=0, out_axes=0)(k)
            k, sub = k2[:, 0], k2[:, 1]
            nxt = sample_batched(logits[:, -1, :], sub, rp, w.counts)
            w = penalty_window_push(w, nxt)
            return (nxt, p + 1, c, w, k), nxt

        (tok, pos, cache, pw, keys), toks = jax.lax.scan(
            step, (tok, pos, cache, pw, keys), None, length=n_steps)
        return toks, tok, pos, cache, pw, keys

    f = shard_map(body, mesh=mesh,
                  in_specs=(pspec, P("dp"), P("dp"), cspec, _pw_spec(),
                            P("dp"), _rp_spec(has_bias)),
                  out_specs=(P(None, "dp"), P("dp"), P("dp"), cspec,
                             _pw_spec(), P("dp")),
                  check_vma=False)
    return jax.jit(f, donate_argnums=(3, 4))


class TPEngine:
    """Engine-compatible generation over a dp x tp mesh: weights Megatron-
    sharded (shard_params), every forward runs through shard_map'd programs.

    Serves the CLI/server --mesh-dp/--mesh-tp flags. Implements the same
    row-batched serving hooks as runtime.engine.Engine (init_row_cache /
    new_row_cache / row_prefill / fused_decode), so server.batcher.Batcher
    drives TP-sharded continuous batching unchanged: rows shard over dp,
    heads/ffn over tp, and the fused decode scan (full sampling chain,
    penalty windows, per-row PRNG) runs entirely on the mesh. generate()
    routes through a private Batcher — one code path for sampling fidelity
    on one chip or many.
    """

    supports_paged = False      # paged pool sharding not modeled yet (dense)
    recurrent = False

    def __init__(self, cfg: LlamaConfig, params: LlamaParams, tokenizer,
                 mesh: Mesh, max_seq_len: int = 2048):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.max_seq_len = min(max_seq_len, cfg.max_context)
        self.dp = mesh.shape.get("dp", 1)
        self.batch_size = self.dp
        self.params = shard_params(params, mesh)
        self._pspec = params_spec(self.params)
        self.run = make_tp_forward(cfg, mesh)
        self.kv_dtype = jnp.bfloat16
        self._prefills = {}      # (fresh, attn_len) -> jitted shard_map
        self._decodes = {}       # (n_steps, attn_len, has_bias) -> jitted
        self._batcher = None
        self._batcher_lock = __import__("threading").Lock()

    def new_cache(self):
        return init_sharded_cache(self.cfg, self.mesh, self.batch_size,
                                  self.max_seq_len)

    # -- batcher hooks (see runtime.engine.Engine) ---------------------------

    def init_row_cache(self, rows: int, dtype=None):
        assert rows % self.dp == 0, \
            f"--slots ({rows}) must be a multiple of mesh dp ({self.dp})"
        return init_sharded_cache(self.cfg, self.mesh, rows, self.max_seq_len)

    def new_row_cache(self, dtype=None):
        return init_sharded_cache(self.cfg, self.mesh, 1, self.max_seq_len,
                                  dp_shard=False)

    def row_prefill(self, tokens, pos0, row_cache, fresh=False,
                    attn_len=None, last_idx=None):
        k = (fresh, attn_len)
        if k not in self._prefills:
            self._prefills[k] = make_tp_row_prefill(
                self.cfg, self.mesh, self._pspec, fresh, attn_len)
        if last_idx is None:
            last_idx = jnp.zeros((tokens.shape[0],), jnp.int32)
        return self._prefills[k](self.params, tokens, pos0, row_cache,
                                 last_idx)

    def fused_decode(self, tok, pos, cache, pw, keys, rp, n_steps: int,
                     attn_len=None):
        has_bias = rp.bias is not None
        k = (n_steps, attn_len, has_bias)
        if k not in self._decodes:
            self._decodes[k] = make_tp_fused_decode(
                self.cfg, self.mesh, self._pspec, n_steps, attn_len, has_bias)
        return self._decodes[k](self.params, tok, pos, cache, pw, keys, rp)

    # -- generation (routed through the sharded batcher) ---------------------

    def _get_batcher(self):
        if self._batcher is None:
            with self._batcher_lock:
                if self._batcher is None:
                    from ..server.batcher import Batcher
                    self._batcher = Batcher(self, rows=self.dp)
        return self._batcher

    def generate(self, prompt: str, max_tokens: int = 128, sampling=None,
                 stop_on_eog: bool = True, prompt_ids=None):
        from ..runtime.sampling import SamplingParams
        sp = sampling or SamplingParams()
        ids = (prompt_ids if prompt_ids is not None
               else self.tokenizer.encode(prompt))
        req = self._get_batcher().submit(list(ids), sp, max_tokens)
        while True:
            kind, val = req.out.get()
            if kind == "done":
                return
            yield val, self.tokenizer.decode_token(val).decode(
                "utf-8", errors="replace")

    def complete(self, prompt: str, max_tokens: int = 128, sampling=None,
                 **kw) -> str:
        return "".join(p for _, p in self.generate(prompt, max_tokens,
                                                   sampling, **kw))

    def shutdown(self):
        if self._batcher is not None:
            self._batcher.shutdown()
            self._batcher = None
