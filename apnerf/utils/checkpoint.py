"""Self-describing checkpoints (kwargs + weights), torch-free.

Mirrors the reference checkpoint contract (run.py:813-819 + lib/utils.py:
516-523): a checkpoint carries ``model_kwargs`` for reconstruction and the
parameter pytree; loading rebuilds the model from kwargs and restores
weights. Storage is a pickle of numpy-ified pytrees (portable across hosts
and device types).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def _to_device(tree):
    def conv(x):
        if isinstance(x, np.ndarray) and x.dtype != object:
            return jnp.asarray(x)
        return x
    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(path: str, model_kwargs: Dict[str, Any], params,
                    extra: Dict[str, Any] = None, global_step: int = 0):
    payload = {
        "global_step": global_step,
        "model_kwargs": model_kwargs,
        "params": _to_numpy(params),
    }
    if extra:
        payload.update(_to_numpy(extra))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str, to_device: bool = True):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if to_device:
        payload["params"] = _to_device(payload["params"])
    return payload
