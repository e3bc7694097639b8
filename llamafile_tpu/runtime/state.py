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


def save_state(path: str, cache: KVCache, history: List[int]) -> None:
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


def load_state(path: str) -> Tuple[KVCache, List[int]]:
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
            leaves.append(jnp.asarray(a).view(jnp.bfloat16))
        else:
            leaves.append(jnp.asarray(a))
    if quantized:
        cache = KVCache(leaves[0], leaves[1], leaves[2], leaves[3])
    else:
        cache = KVCache(leaves[0], leaves[1], None, None)
    return cache, history
