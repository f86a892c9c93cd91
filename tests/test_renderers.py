"""Renderer coverage: the single-dispatch scan image path must match the
per-chunk loop path, for both model families (reference run.py:80-356
chunked rendering)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import apnerf.ops.nn as onn
from apnerf.models import temporal_points as tp
from apnerf.models import tineuvox
from apnerf.render import render
from apnerf.render.renderers import (make_backbone_renderer,
                                     make_points_renderer)

from test_stage2 import _toy_model


def _camera(H, W, f=40.0, z=2.5):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = z
    return K, c2w


def _strip_image_fn(fn):
    def plain(ro, rd, vd):
        return fn(ro, rd, vd)
    return plain


def test_points_renderer_scan_matches_loop():
    params, mcfg, state, pcd, *_ = _toy_model()
    for_view = make_points_renderer(
        params, mcfg, state, near=0.1, far=10.0, bg=1.0,
        poses=np.eye(4, dtype=np.float32)[None],
        Ks=np.array([[40.0, 0, 12.0], [0, 40.0, 12.0], [0, 0, 1]],
                    np.float32)[None])
    H = W = 24
    K, c2w = _camera(H, W)
    c2w[:3, 3] = pcd.mean(0) + [0, 0, 2.0]
    fn = for_view(0, 0.3)
    out_scan = render.render_image(fn, K, c2w, H, W, chunk=128,
                                   extra_keys=("weights",))
    out_loop = render.render_image(_strip_image_fn(fn), K, c2w, H, W,
                                   chunk=128, extra_keys=("weights",))
    for k in ("rgb_marched", "depth", "weights"):
        assert k in out_scan and k in out_loop, (k, list(out_scan),
                                                 list(out_loop))
        np.testing.assert_allclose(out_scan[k], out_loop[k], rtol=1e-5,
                                   atol=1e-5, err_msg=k)
    # the scan path also surfaces the skeleton overlay inputs
    assert out_scan["joints_2d"].shape == (mcfg.n_joints, 2)
    assert len(out_scan["bones"]) >= 1


def test_backbone_renderer_scan_matches_loop():
    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    params["feature"] = params["feature"] + 0.1
    for_view = make_backbone_renderer(params, cfg, stepsize=0.5, near=0.3,
                                      far=6.0, bg=1.0)
    H = W = 16
    K, c2w = _camera(H, W, f=20.0, z=2.5)
    fn = for_view(0, 0.2)
    out_scan = render.render_image(fn, K, c2w, H, W, chunk=64)
    out_loop = render.render_image(_strip_image_fn(fn), K, c2w, H, W,
                                   chunk=64)
    for k in ("rgb_marched", "depth"):
        np.testing.assert_allclose(out_scan[k], out_loop[k], rtol=1e-5,
                                   atol=1e-5, err_msg=k)


def test_render_viewpoints_overlay_smoke(tmp_path):
    """render_viewpoints end-to-end: images + weight renders written, the
    skeleton overlay consumes the joints the scan path now surfaces."""
    params, mcfg, state, pcd, *_ = _toy_model()
    H = W = 24
    K, c2w = _camera(H, W)
    c2w[:3, 3] = pcd.mean(0) + [0, 0, 2.0]
    poses = np.stack([c2w, c2w])
    Ks = np.stack([K, K])
    for_view = make_points_renderer(params, mcfg, state, near=0.1, far=10.0,
                                    bg=1.0, poses=poses, Ks=Ks)
    out = render.render_viewpoints(
        for_view, poses, np.array([[H, W]] * 2), Ks,
        np.array([0.1, 0.6]), savedir=str(tmp_path), verbose=False,
        chunk=128)
    assert out["rgbs"].shape == (2, H, W, 3)
    assert np.isfinite(out["rgbs"]).all()
    assert len(out["weights"]) == 2
    import os
    assert os.path.exists(str(tmp_path / "img_000.png"))
    assert os.path.exists(str(tmp_path / "weights_001.png"))
