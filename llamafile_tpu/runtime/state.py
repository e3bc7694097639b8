"""KV/session state save & restore (llama_state_* analog).

The reference exposes llama_state save/load for prompt-state persistence
(SURVEY.md §5 checkpoint/resume: "the analog is KV/prompt state"). Here a
session = (KVCache pytree, token history, position); serialized as .npz so a
server restart (or slice restart after a failure) can resume without
re-prefilling long prompts.
"""
from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np

import jax

from .kvcache import KVCache


def _to_numpy(arr):
    """bf16 isn't a numpy-native dtype: store as uint16 + dtype tag."""
    a = np.asarray(jax.device_get(arr))
    if a.dtype.name == "bfloat16":
        return a.view(np.uint16), "bfloat16"
    return a, a.dtype.name


def save_state(path: str, cache: KVCache, history: List[int],
               trim: bool = True) -> None:
    """Serialize (cache, history). trim=True drops positions beyond
    len(history) (both dense [L,B,S,H*D] and int8 [L,B,S,H,D]+[L,B,S,H]
    layouts keep S at axis 2) — the file then scales with the prompt, not
    the context window, and load_state re-pads to any max_len."""
    if trim and history and len(history) < cache.max_len:
        n = len(history)
        cache = jax.tree.map(lambda a: a[:, :, :n], cache)
    leaves, _ = jax.tree.flatten(cache)
    arrays = {}
    dtypes = []
    for i, l in enumerate(leaves):
        a, name = _to_numpy(l)
        arrays[f"leaf{i}"] = a
        dtypes.append(name)
    arrays["history"] = np.asarray(history, np.int64)
    arrays["quantized"] = np.asarray([cache.quantized])
    arrays["dtypes"] = np.asarray(dtypes)
    np.savez_compressed(path, **arrays)


def load_state(path: str, max_len: int = 0) -> Tuple[KVCache, List[int]]:
    """Rebuild (cache, history). max_len > 0 re-pads a trimmed file's
    position axis back out to the engine's context window."""
    import jax.numpy as jnp
    z = np.load(path)
    history = z["history"].tolist()
    quantized = bool(z["quantized"][0])
    dtypes = [str(d) for d in z["dtypes"]]
    n_leaves = 4 if quantized else 2
    leaves = []
    for i in range(n_leaves):
        a = z[f"leaf{i}"]
        if dtypes[i] == "bfloat16":
            a = jnp.asarray(a).view(jnp.bfloat16)
        else:
            a = jnp.asarray(a)
        if max_len and a.shape[2] < max_len:
            pad = [(0, 0)] * a.ndim
            pad[2] = (0, max_len - a.shape[2])
            a = jnp.pad(a, pad)
        leaves.append(a)
    if quantized:
        cache = KVCache(leaves[0], leaves[1], leaves[2], leaves[3])
    else:
        cache = KVCache(leaves[0], leaves[1], None, None)
    return cache, history
