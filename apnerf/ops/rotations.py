"""Rotation utilities in pure jnp.

Replaces the reference's ``roma`` dependency and the hand-rolled Rodrigues
formula (lib/pointwarper.py:118-143, lib/temporalpoints.py:356-368).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rodrigues(rvec):
    """Axis-angle -> rotation matrices.

    Accepts [..., 3] (axis*angle, Neural-Volumes style with the 1e-5
    regulariser) or [..., 4] (axis, angle) overparameterised form, exactly as
    reference ``PointWarper.Rodrigues`` (lib/pointwarper.py:118-143).

    Returns (R [..., 3, 3], theta [...]).
    """
    if rvec.shape[-1] == 3:
        theta = jnp.sqrt(1e-5 + jnp.sum(rvec ** 2, axis=-1))
        axis = rvec / theta[..., None]
    elif rvec.shape[-1] == 4:
        theta = rvec[..., -1]
        axis = rvec[..., :3]
        axis = axis / jnp.sqrt(1e-5 + jnp.sum(axis ** 2, axis=-1))[..., None]
    else:
        raise ValueError(f"rvec last dim must be 3 or 4, got {rvec.shape}")
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    R = jnp.stack([
        x * x + (1. - x * x) * c,
        x * y * (1. - c) - z * s,
        x * z * (1. - c) + y * s,
        x * y * (1. - c) + z * s,
        y * y + (1. - y * y) * c,
        y * z * (1. - c) - x * s,
        x * z * (1. - c) - y * s,
        y * z * (1. - c) + x * s,
        z * z + (1. - z * z) * c,
    ], axis=-1).reshape(*axis.shape[:-1], 3, 3)
    return R, theta


def special_procrustes(M):
    """Nearest rotation matrix (SVD orthonormalisation, det=+1).

    Replaces ``roma.special_procrustes`` (used at lib/pointwarper.py:247).
    """
    with jax.default_matmul_precision("highest"):
        u, _, vt = jnp.linalg.svd(M)
        det = jnp.linalg.det(u @ vt)
        d = jnp.concatenate(
            [jnp.ones((*M.shape[:-2], 2)), det[..., None]], axis=-1)
        return (u * d[..., None, :]) @ vt


def rotmat_to_rotvec(R):
    """Rotation matrix -> axis-angle vector (|v| = angle in [0, pi]).

    Replaces ``roma.rotmat_to_rotvec`` (used at lib/temporalpoints.py:359).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    sin_theta = jnp.sin(theta)
    # Near theta=0: v/(2 sin) -> v/2 * (1 + theta^2/6); near pi use axis from
    # the symmetric part. Keep it simple and numerically safe.
    small = sin_theta < 1e-6
    scale = jnp.where(small, 0.5, theta / jnp.where(small, 1.0, 2.0 * sin_theta))
    vec = v * scale[..., None]
    # theta ~ pi fallback: |v| -> 0 though angle is large; extract axis from
    # diagonal of (R + I)/2.
    near_pi = (theta > jnp.pi - 1e-3)
    axis_sq = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]],
                                  axis=-1) + 1.0) / 2.0, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    signs = jnp.sign(jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                                R[..., 0, 2] - R[..., 2, 0],
                                R[..., 1, 0] - R[..., 0, 1]], axis=-1) + 1e-20)
    vec_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], vec_pi, vec)


def geodesic_angle(R1, R2):
    """Relative rotation angle |log(R1 R2^T)| (lib/temporalpoints.py:356-360)."""
    return jnp.linalg.norm(rotmat_to_rotvec(R1 @ jnp.swapaxes(R2, -1, -2)),
                           axis=-1)
