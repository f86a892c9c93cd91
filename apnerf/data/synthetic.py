"""Synthetic articulated test scene (D-NeRF format).

Generates a tiny multi-time dataset of an articulated two-segment "arm"
(capsules joined at a hinge whose angle varies with time), rendered
analytically with NumPy volume marching. Written to disk in the D-NeRF
``transforms_*.json`` + RGBA png layout so it exercises the real data loader
end-to-end. This is apnerf's substitute for the reference's external
datasets, which are not shipped with the repo.
"""
from __future__ import annotations

import json
import os

import imageio.v2 as imageio
import numpy as np

from .dnerf import pose_spherical


def _seg_dist(p, a, b):
    """Distance from points p [N,3] to segment (a, b)."""
    s = b - a
    w = p - a
    t = np.clip((w @ s) / (s @ s), 0.0, 1.0)
    proj = a + t[:, None] * s
    return np.linalg.norm(p - proj, axis=-1), t


def arm_segments(t: float):
    """Canonical two-bone arm; hinge angle is a linear function of time."""
    j0 = np.array([-0.5, 0.0, 0.0])
    j1 = np.array([0.1, 0.0, 0.0])
    theta = (t - 0.0) * 1.2  # radians; canonical at t=0
    d = np.array([np.cos(theta), np.sin(theta), 0.0])
    j2 = j1 + 0.6 * d
    return [(j0, j1), (j1, j2)]


SEG_COLORS = np.array([[0.85, 0.3, 0.25], [0.25, 0.45, 0.85]])
SEG_RADIUS = 0.16
DENSITY = 60.0


def density_and_color(pts, t):
    """Analytic scene: soft-edged capsules."""
    segs = arm_segments(t)
    sigmas = np.zeros(len(pts))
    colors = np.zeros((len(pts), 3))
    total_w = np.zeros(len(pts)) + 1e-9
    for k, (a, b) in enumerate(segs):
        d, _ = _seg_dist(pts, a, b)
        inside = np.clip((SEG_RADIUS - d) / 0.03, 0.0, 1.0)
        sigmas = np.maximum(sigmas, DENSITY * inside)
        colors += inside[:, None] * SEG_COLORS[k]
        total_w += inside
    colors = colors / total_w[:, None]
    return sigmas, colors


def render_image(c2w, H, W, focal, t, n_steps=96, near=2.0, far=6.0):
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    rays_d = rays_d.reshape(-1, 3)
    rays_o = rays_o.reshape(-1, 3)

    ts = np.linspace(near, far, n_steps)
    dt = ts[1] - ts[0]
    T = np.ones(len(rays_o))
    rgb = np.zeros((len(rays_o), 3))
    acc = np.zeros(len(rays_o))
    for tv in ts:
        pts = rays_o + rays_d * tv
        sigma, col = density_and_color(pts, t)
        alpha = 1.0 - np.exp(-sigma * dt)
        w = T * alpha
        rgb += w[:, None] * col
        acc += w
        T = T * (1.0 - alpha)
    rgba = np.concatenate([rgb, acc[:, None]], -1).reshape(H, W, 4)
    return np.clip(rgba, 0, 1)


def generate_scene(out_dir, n_times=6, n_test=2, H=64, W=64,
                   camera_angle_x=0.8, radius=4.0, overwrite=False):
    """Write a D-NeRF-format dataset; returns the directory."""
    if os.path.exists(os.path.join(out_dir, "transforms_train.json")) and not overwrite:
        return out_dir
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "val"), exist_ok=True)
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    def write_split(split, n, angle0):
        frames = []
        for k in range(n):
            t = k / max(n - 1, 1)
            angle = angle0 + 360.0 * k / n
            c2w = pose_spherical(angle, -25.0, radius)
            img = render_image(np.asarray(c2w), H, W, focal, t)
            fp = f"{split}/r_{k:03d}"
            imageio.imwrite(os.path.join(out_dir, fp + ".png"),
                            (img * 255).astype(np.uint8))
            frames.append({"file_path": fp, "time": t,
                           "transform_matrix": np.asarray(c2w).tolist()})
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)

    write_split("train", n_times, 30.0)
    write_split("test", n_test, 110.0)
    write_split("val", 1, 200.0)
    return out_dir
