"""Linear-blend-skinning forward warp driven by a time-conditioned MLP.

Functional re-implementation of the reference ``PointWarper`` /
``TransformNet`` (lib/pointwarper.py:5-278):

* ``transform_net``: MLP time-embedding -> (J+1) x 4 parameters: per-joint
  overparameterised axis-angle (axis 3D + angle) plus a final global
  translation row,
* per-joint local transform = rotation about the *parent* joint position,
* absolute transforms via a log-depth matrix chain product over padded
  root-to-joint index paths,
* LBS blend of absolute transforms by per-point skinning weights, optional
  procrustes re-orthonormalisation,
* prune masks (rotation -> identity) and sibling masks (share rotations).

All 4x4 chain/blend matmuls run at HIGHEST precision (they are tiny but the
default TPU bf16 matmul precision visibly degrades long kinematic chains).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.rotations import rodrigues, special_procrustes

HIGH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class WarpConfig:
    n_joints: int                 # J (root included)
    t_dim: int
    num_layers: int = 5
    hidden_dim: int = 256
    over_parameterized_rot: bool = True
    params_per_component: int = 4


def build_tree(joints, bones) -> Dict[str, np.ndarray]:
    """Kinematic-tree index tables from a bone list.

    ``bones`` are (parent_joint, child_joint) pairs over J joints (root = 0).
    Returns ``parent_ex`` [J] (parent index, root -> itself/0) and
    ``parent_indices`` [J, D] root-to-joint paths padded with -1
    (cf. reference ``init_tree``, lib/pointwarper.py:70-116).
    """
    J = int(np.asarray(joints).shape[0] if hasattr(joints, "shape")
            else len(joints))
    parent = {int(b[1]): int(b[0]) for b in bones}
    paths: List[List[int]] = []
    for j in range(J):
        path = []
        k = j
        while True:
            path.append(k)
            if k == 0:
                break
            k = parent.get(k, 0)
            if k == 0:
                path.append(0)
                break
        paths.append(path[::-1])
    depth = max(len(p) for p in paths)
    parent_indices = -np.ones((J, depth), np.int32)
    for j, p in enumerate(paths):
        parent_indices[j, : len(p)] = p
    parent_ex = np.array([parent.get(j, 0) for j in range(J)], np.int32)
    return {"parent_indices": parent_indices, "parent_ex": parent_ex}


def init_params(key, cfg: WarpConfig):
    """transform_net parameters (reference TransformNet,
    lib/pointwarper.py:5-37): (num_layers-1) hidden layers + bias-free head."""
    dims = ([cfg.t_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1)
            + [(cfg.n_joints + 1) * cfg.params_per_component])
    p = nn.init_mlp(key, dims)
    # final layer has no bias
    del p["layers"][-1]["b"]
    return {"transform_net": p}


def transform_params(params, t_embed):
    """Raw per-component transform parameters for time embedding(s).

    t_embed [..., t_dim] -> [..., J+1, 4].
    """
    out = nn.mlp(params["transform_net"], t_embed)
    return out.reshape(*t_embed.shape[:-1], -1, 4)


def chain_product(mats):
    """Ordered product along axis 1 of [J, D, 4, 4] via log-depth halving."""
    D = mats.shape[1]
    pow2 = 1
    while pow2 < D:
        pow2 *= 2
    if pow2 != D:
        eye = jnp.broadcast_to(jnp.eye(4), (mats.shape[0], pow2 - D, 4, 4))
        mats = jnp.concatenate([mats, eye], axis=1)
    while mats.shape[1] > 1:
        a = mats[:, 0::2]
        b = mats[:, 1::2]
        mats = jnp.matmul(a, b, precision=HIGH)
    return mats[:, 0]


def absolute_transforms(R, joints, parent_indices, parent_ex):
    """Per-joint absolute transforms (reference ``calc_rec_abs_T_fast``,
    lib/pointwarper.py:156-193): each joint's rotation acts about its
    parent's position; compose along the root-to-joint path."""
    pivot = joints[parent_ex]                              # [J, 3]
    t = pivot - jnp.einsum("jab,jb->ja", R, pivot, precision=HIGH)
    M = jnp.zeros((R.shape[0], 4, 4)).at[:, :3, :3].set(R)
    M = M.at[:, :3, 3].set(t).at[:, 3, 3].set(1.0)
    M = jnp.concatenate([jnp.eye(4)[None], M], axis=0)     # -1 pad -> identity
    paths = M[parent_indices + 1]                          # [J, D, 4, 4]
    return chain_product(paths)


def forward(params, cfg: WarpConfig, tree, canonical_pcd, weights, joints,
            t_embed=None, rot_params=None, global_t=None,
            rot_mask=None, sibling_mask=None, avg_procrustes=False):
    """Warp the canonical cloud (reference PointWarper.forward,
    lib/pointwarper.py:213-278).

    Args:
      weights: [P, J] skinning weights; joints: [J, 3].
      t_embed: [t_dim] time embedding (or None with explicit rot_params
        [J, >=4] for reposing).
      rot_mask: [J] bool — True freezes that joint's rotation to identity.
      sibling_mask: [J] int — rotation source per joint (sibling sharing).

    Returns dict with warped ``xyz`` [P,3], ``joints_rel`` [J,3], blended
    ``frames`` [P,4,4], ``joints_warped`` [J,3], ``thetas`` [J],
    ``global_t`` [3].
    """
    J = cfg.n_joints
    if rot_params is None:
        p = transform_params(params, t_embed)              # [J+1, 4]
        global_t = p[-1, :3]
        rot_params = p[:J]
    R, thetas = rodrigues(rot_params)
    if sibling_mask is not None:
        R = R[sibling_mask]
    if rot_mask is not None:
        R = jnp.where(rot_mask[:, None, None], jnp.eye(3)[None], R)

    bone_T = absolute_transforms(R, joints, tree["parent_indices"],
                                 tree["parent_ex"])        # [J, 4, 4]

    frames = jnp.einsum("pj,jab->pab", weights, bone_T, precision=HIGH)
    if avg_procrustes:
        Rw = special_procrustes(frames[:, :3, :3])
        frames = frames.at[:, :3, :3].set(Rw)

    xyzh = jnp.concatenate(
        [canonical_pcd, jnp.ones((canonical_pcd.shape[0], 1))], axis=-1)
    xyz = jnp.einsum("pab,pb->pa", frames, xyzh, precision=HIGH)[:, :3]

    jh = jnp.concatenate([joints, jnp.ones((J, 1))], axis=-1)
    joints_rel = jnp.einsum("jab,jb->ja", bone_T, jh, precision=HIGH)[:, :3]

    if global_t is None:
        global_t = jnp.zeros(3)
    xyz = xyz + global_t
    return {
        "xyz": xyz,
        "joints_rel": joints_rel,
        "frames": frames,
        "joints_warped": joints_rel + global_t,
        "thetas": thetas,
        "global_t": global_t,
    }


def get_thetas(params, cfg: WarpConfig, ts_embed):
    """Per-time rotation angles (reference ``get_thetas``,
    lib/pointwarper.py:195-202)."""
    p = transform_params(params, ts_embed)                 # [T, J+1, 4]
    rot = p[..., :-1, :3].reshape(-1, 3)
    _, thetas = rodrigues(rot)
    return thetas.reshape(*ts_embed.shape[:-1], cfg.n_joints)
