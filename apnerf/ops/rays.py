"""Ray generation and dense TPU-friendly ray sampling.

Camera conventions (``inverse_y/flip_x/flip_y``, half-pixel 'center' mode)
match the reference ``get_rays`` (lib/tineuvox.py:675-703).

Sampling replaces the ragged CUDA layout of ``sample_pts_on_rays``
(lib/cuda/render_utils_kernel.cu:138-236) with a dense, statically shaped
``[n_rays, n_steps]`` layout plus a validity mask — the XLA-native moral
equivalent of the CUDA memory compaction.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def get_rays(H, W, K, c2w, inverse_y=False, flip_x=False, flip_y=False,
             mode="center"):
    """Per-pixel rays for one camera. Returns (rays_o, rays_d) of [H, W, 3]."""
    K = jnp.asarray(K, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    if mode == "lefttop":
        pass
    elif mode == "center":
        i, j = i + 0.5, j + 0.5
    else:
        raise NotImplementedError(mode)
    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]
    if inverse_y:
        dirs = jnp.stack([(i - K[0][2]) / K[0][0],
                          (j - K[1][2]) / K[1][1],
                          jnp.ones_like(i)], -1)
    else:
        dirs = jnp.stack([(i - K[0][2]) / K[0][0],
                          -(j - K[1][2]) / K[1][1],
                          -jnp.ones_like(i)], -1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """NDC reparameterisation (reference lib/tineuvox.py:714-731)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1. / (W / (2. * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1. / (H / (2. * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1. + 2. * near / rays_o[..., 2]
    d0 = -1. / (W / (2. * focal)) * (rays_d[..., 0] / rays_d[..., 2]
                                     - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1. / (H / (2. * focal)) * (rays_d[..., 1] / rays_d[..., 2]
                                     - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2. * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def get_rays_of_a_view(H, W, K, c2w, ndc=False, inverse_y=False,
                       flip_x=False, flip_y=False, mode="center"):
    rays_o, rays_d = get_rays(H, W, K, c2w, inverse_y=inverse_y,
                              flip_x=flip_x, flip_y=flip_y, mode=mode)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, float(K[0][0]), 1., rays_o, rays_d)
    return rays_o, rays_d, viewdirs


def ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far):
    """Slab test; semantics of ``infer_t_minmax`` (render_utils_kernel.cu:12-35).

    Returns (t_min, t_max), both clamped into [near, far].
    """
    v = jnp.where(rays_d == 0, 1e-6, rays_d)
    a = (xyz_max - rays_o) / v
    b = (xyz_min - rays_o) / v
    t_min = jnp.max(jnp.minimum(a, b), axis=-1)
    t_max = jnp.min(jnp.maximum(a, b), axis=-1)
    t_min = jnp.maximum(jnp.minimum(t_min, far), near)
    t_max = jnp.maximum(jnp.minimum(t_max, far), near)
    return t_min, t_max


class RaySamples(NamedTuple):
    """Dense per-ray samples. All arrays are [R, S] or [R, S, 3]."""
    pts: jnp.ndarray        # sample positions
    valid: jnp.ndarray      # bool: inside step count AND inside bbox
    step_id: jnp.ndarray    # integer step index along the ray
    t_min: jnp.ndarray      # [R]
    n_steps: jnp.ndarray    # [R] number of steps actually requested


def max_n_steps(xyz_min, xyz_max, stepdist) -> int:
    """Static upper bound on per-ray samples for the bbox diagonal."""
    diag = float(np.linalg.norm(np.asarray(xyz_max) - np.asarray(xyz_min)))
    return int(math.ceil(diag / float(stepdist))) + 1


def sample_pts_on_rays(rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist,
                       n_samples: int):
    """Dense equivalent of ``sample_pts_on_rays`` (render_utils_kernel.cu:190).

    Per-ray: clip to the AABB with the slab test, then march ``n_steps =
    max(ceil((t_max-t_min)/stepdist), 1)`` unit-direction steps of length
    ``stepdist`` starting at ``o + d * t_min``. Samples beyond ``n_steps`` or
    outside the bbox are masked out (the CUDA version drops them from the
    ragged buffer instead).
    """
    xyz_min = jnp.asarray(xyz_min, jnp.float32)
    xyz_max = jnp.asarray(xyz_max, jnp.float32)
    t_min, t_max = ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far)
    n_steps = jnp.maximum(jnp.ceil((t_max - t_min) / stepdist), 1.0).astype(jnp.int32)
    rays_start = rays_o + rays_d * t_min[..., None]
    unit_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    step = jnp.arange(n_samples, dtype=jnp.float32)
    # [R, S, 3]
    pts = rays_start[:, None, :] + unit_d[:, None, :] * (step[None, :, None] * stepdist)
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    valid = (step[None, :] < n_steps[:, None].astype(jnp.float32)) & in_bbox
    step_id = jnp.broadcast_to(jnp.arange(n_samples, dtype=jnp.int32)[None, :],
                               valid.shape)
    return RaySamples(pts=pts, valid=valid, step_id=step_id, t_min=t_min,
                      n_steps=n_steps)


def sample_ndc_pts_on_rays(rays_o, rays_d, xyz_min, xyz_max, n_samples: int):
    """Fixed-count equidistant NDC sampling (reference
    ``sample_ndc_pts_on_rays``, render_utils_kernel.cu:238-287; unused by
    every shipped config — ndc=False throughout — kept for parity)."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[None, :, None]
    xyz_min = jnp.asarray(xyz_min, jnp.float32)
    xyz_max = jnp.asarray(xyz_max, jnp.float32)
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    step_id = jnp.broadcast_to(
        jnp.arange(n_samples, dtype=jnp.int32)[None, :], in_bbox.shape)
    return RaySamples(pts=pts, valid=in_bbox, step_id=step_id,
                      t_min=jnp.zeros(rays_o.shape[0]),
                      n_steps=jnp.full(rays_o.shape[0], n_samples,
                                       jnp.int32))


def rays_hit_bbox(rays_o, rays_d, xyz_min, xyz_max, near, far):
    """Reference ``TiNeuVox.get_mask`` (lib/tineuvox.py:422-433): does any
    sample of the ray fall inside the scene bbox?"""
    t_min, t_max = ray_aabb(rays_o, rays_d, jnp.asarray(xyz_min, jnp.float32),
                            jnp.asarray(xyz_max, jnp.float32), near, far)
    return t_max > t_min
