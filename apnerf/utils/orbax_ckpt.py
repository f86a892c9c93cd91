"""Orbax-backed sharded checkpointing for multi-host training.

The pickle checkpoints (utils/checkpoint.py, mirroring the reference's
``torch.save`` contract at run.py:813-819) are single-host: every process
would write the full replicated pytree. This module adds the multi-host
path: each process writes only the shards it owns (OCDBT), and restore
accepts a DIFFERENT mesh/sharding than the one used at save time — the
standard elastic-resume story (e.g. train on 8 chips, resume on 4).

Usage:
    save_sharded(path, {"params": params, "opt_state": opt_state}, step=...)
    tree = load_sharded(path, like={"params": params_shardings, ...})

``like`` is a pytree of jax.sharding.NamedSharding (or arrays carrying
shardings) describing the target placement; orbax reshards on load.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_sharded(path: str, tree: Dict[str, Any], step: int = 0):
    """Write a (possibly sharded) pytree; each process writes its shards.

    ``step`` is stored under the ``"global_step"`` key next to the tree.
    Overwrites any existing checkpoint at ``path``.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    payload = dict(tree)
    payload["global_step"] = np.asarray(step, np.int64)
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_sharded(path: str, like: Optional[Dict[str, Any]] = None):
    """Restore a pytree saved by :func:`save_sharded`.

    ``like``: optional pytree matching the saved structure whose leaves are
    ``jax.sharding.Sharding``s, ``jax.ShapeDtypeStruct``s with shardings,
    or arrays (their shardings are reused). Leaves absent from ``like``
    (e.g. ``global_step``) restore as host numpy. With ``like=None``
    everything restores as host numpy arrays.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    meta = ckptr.metadata(path)

    def leaf_restore_arg(l):
        if isinstance(l, jax.sharding.Sharding):
            return ocp.ArrayRestoreArgs(sharding=l)
        if isinstance(l, jax.ShapeDtypeStruct) and l.sharding is not None:
            return ocp.ArrayRestoreArgs(sharding=l.sharding,
                                        global_shape=l.shape, dtype=l.dtype)
        if hasattr(l, "sharding"):
            return ocp.ArrayRestoreArgs(sharding=l.sharding,
                                        global_shape=l.shape, dtype=l.dtype)
        return ocp.RestoreArgs(restore_type=np.ndarray)

    # build restore args over the SAVED structure; leaves present in `like`
    # get target shardings, the rest restore as numpy
    like_flat = _flatten_with_paths(like)
    saved_tree = jax.tree_util.tree_map(lambda _: None, meta.item_metadata
                                        if hasattr(meta, "item_metadata")
                                        else meta.tree)

    def build(path_tuple, _):
        l = like_flat.get(path_tuple)
        if l is None:
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return leaf_restore_arg(l)

    restore_args = _tree_map_with_paths(build, saved_tree)
    return ckptr.restore(path, restore_args=restore_args)


def _flatten_with_paths(tree):
    out = {}
    if tree is None:
        return out
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        out[_norm_path(path)] = leaf
    return out


def _tree_map_with_paths(fn, tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None)
    leaves = [fn(_norm_path(p), l) for p, l in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _norm_path(path):
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
        else:
            keys.append(str(p))
    return tuple(keys)
