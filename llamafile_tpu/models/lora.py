"""GGUF LoRA adapters, applied as runtime low-rank side-matmuls.

Reference: llamafile ships --lora / --lora-scaled / --lora-base
(llamafile-files/server/README.md:20-21, llama-bench/main.1:496-502); its
llama.cpp loads adapter GGUFs whose tensors are named "<base>.lora_a" /
"<base>.lora_b" with metadata adapter.lora.alpha
(llama.cpp.patch:17143-17157 llama_lora_adapter_init_internal) and merges
the scaled product into f16/f32 weights at load.

Here the base weights stay quantized and UNMERGED: each targeted weight
becomes a LoraQTensor whose qmatmul adds scale*(x@A.T)@B.T (rank-r side
matmul, 2*r*(K+N) flops — negligible next to the base GEMM). This keeps
the quantized base byte-exact, needs no --lora-base f16 copy, and stacks
multiple adapters by concatenating along the rank axis with per-adapter
scales folded into A.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.repack import LoraQTensor, QTensor

# GGUF tensor prefix -> LlamaLayer field (per-layer tensors)
_LAYER_MAP = {
    "attn_q": "wq", "attn_k": "wk", "attn_v": "wv", "attn_output": "wo",
    "ffn_gate": "w_gate", "ffn_up": "w_up", "ffn_down": "w_down",
}


def load_lora_gguf(path: str):
    """-> (alpha, {base_tensor_name: {"a": [r,K] f32, "b": [N,r] f32}})."""
    reader = GGUFReader(path)
    meta = reader.metadata
    alpha = float(meta.get("adapter.lora.alpha", 16.0))
    ltype = meta.get("adapter.type", meta.get("general.type", "lora"))
    if "lora" not in str(ltype).lower() and "adapter" not in str(ltype).lower():
        raise ValueError(f"{path}: not a LoRA adapter GGUF (type={ltype!r})")
    pairs: Dict[str, dict] = {}
    for name, t in reader.tensors.items():
        for suf, key in ((".lora_a", "a"), (".lora_b", "b"),
                         (".loraA", "a"), (".loraB", "b")):
            if name.endswith(suf):
                base = name[: -len(suf)]
                arr = reader.tensor_f32(name).reshape(
                    int(np.prod(t.shape[:-1])), t.shape[-1])
                pairs.setdefault(base, {})[key] = arr
                break
    reader.close()
    bad = [n for n, p in pairs.items() if "a" not in p or "b" not in p]
    if bad:
        raise ValueError(f"LoRA adapter missing a/b halves for: {bad[:4]}")
    return alpha, pairs


def _attach(qt: QTensor, a: np.ndarray, b: np.ndarray, s: float):
    """QTensor -> LoraQTensor (or extend an existing one along rank)."""
    a_eff = jnp.asarray(a * s, jnp.bfloat16)          # scale folded into A
    b_eff = jnp.asarray(b, jnp.bfloat16)
    if isinstance(qt, LoraQTensor):
        a_eff = jnp.concatenate([qt.lora_a, a_eff], axis=0)
        b_eff = jnp.concatenate([qt.lora_b, b_eff], axis=1)
        qt = QTensor(qt.kind, qt.shape, qt.g, qt.qs, qt.scales, qt.bias)
    if b.shape[0] != qt.shape[0] or a.shape[1] != qt.shape[1]:
        raise ValueError(
            f"LoRA shapes A{a.shape} B{b.shape} do not match base {qt.shape}")
    return LoraQTensor(qt.kind, qt.shape, qt.g, qt.qs, qt.scales, qt.bias,
                       qt.il, lora_a=a_eff, lora_b=b_eff, lora_scale=1.0)


def apply_lora(params, cfg, path: str, scale: float = 1.0):
    """Return params with one GGUF adapter attached (call repeatedly to
    stack). Requires UNFUSED projections (load_llama(fuse=False); the CLI's
    --lora does this), mirroring the reference's load-time application."""
    alpha, pairs = load_lora_gguf(path)
    applied, skipped = 0, []
    layers = list(params.layers)
    for base, ab in pairs.items():
        a, b = ab["a"], ab["b"]
        s = scale * (alpha / a.shape[0] if alpha else 1.0)
        if base.startswith("blk."):
            _, i, rest = base.split(".", 2)
            rest = rest.removesuffix(".weight")
            field = _LAYER_MAP.get(rest)
            i = int(i)
            if field is None or i >= len(layers):
                skipped.append(base)
                continue
            qt = getattr(layers[i], field)
            if qt is None:
                raise ValueError(
                    f"{base}: projection is fused — load the model with "
                    "fuse=False to apply LoRA (the CLI --lora does)")
            layers[i] = dataclasses.replace(
                layers[i], **{field: _attach(qt, a, b, s)})
            applied += 1
        elif base in ("output", "output.weight"):
            params = dataclasses.replace(
                params, output=_attach(params.output, a, b, s))
            applied += 1
        else:
            skipped.append(base)      # token_embd / MoE experts: unsupported
    params = dataclasses.replace(params, layers=layers)
    if not applied:
        raise ValueError(f"{path}: no applicable LoRA tensors")
    if skipped:
        import sys
        print(f"lora: skipped {len(skipped)} unsupported tensors "
              f"(e.g. {skipped[0]})", file=sys.stderr)
    return params


def parse_lora_args(lora: List[str], lora_scaled: List[Tuple[str, str]]):
    """(--lora paths, --lora-scaled (path, scale) pairs) -> [(path, s)]."""
    out = [(p, 1.0) for p in lora or []]
    out += [(p, float(s)) for p, s in (lora_scaled or [])]
    return out
