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


def save_state(path: str, cache: KVCache, history: List[int]) -> None:
    leaves, treedef = jax.tree.flatten(cache)
    arrays = {f"leaf{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}
    arrays["history"] = np.asarray(history, np.int64)
    arrays["quantized"] = np.asarray([cache.quantized])
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> Tuple[KVCache, List[int]]:
    import jax.numpy as jnp
    z = np.load(path)
    history = z["history"].tolist()
    quantized = bool(z["quantized"][0])
    n_leaves = 4 if quantized else 2
    leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(n_leaves)]
    if quantized:
        cache = KVCache(leaves[0], leaves[1], leaves[2], leaves[3])
    else:
        cache = KVCache(leaves[0], leaves[1], None, None)
    return cache, history
