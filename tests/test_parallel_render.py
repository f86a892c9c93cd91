"""Multi-chip serving: the sharded scan render must match the
single-device render for both model families (SURVEY.md §2.3 additive
parallelism — the reference is single-GPU). Params/points replicated,
rays data-parallel over the 1-D mesh; GSPMD inserts the collectives."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from apnerf.models import tineuvox
from apnerf.parallel import mesh as pmesh
from apnerf.render import render
from apnerf.render.renderers import (make_backbone_renderer,
                                     make_points_renderer)

from test_stage2 import _toy_model
from test_renderers import _camera

# heavier CPU tier (VERDICT r3 #7): default `pytest -q` stays <3 min
pytestmark = pytest.mark.integration


def _mesh8():
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 cpu devices")
    return Mesh(np.array(devices[:8]), (pmesh.RAY_AXIS,))


def test_points_render_sharded_matches_single():
    mesh = _mesh8()
    params, mcfg, state, pcd, *_ = _toy_model()
    H = W = 24
    K, c2w = _camera(H, W)
    c2w[:3, 3] = pcd.mean(0) + [0, 0, 2.0]
    poses = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[40.0, 0, 12.0], [0, 40.0, 12.0], [0, 0, 1]],
                  np.float32)[None]

    kw = dict(near=0.1, far=10.0, bg=1.0, poses=poses, Ks=Ks)
    fn_plain = make_points_renderer(params, mcfg, state, **kw)(0, 0.3)
    fn_shard = make_points_renderer(params, mcfg, state, mesh=mesh,
                                    **kw)(0, 0.3)

    out_p = render.render_image(fn_plain, K, c2w, H, W, chunk=128,
                                extra_keys=("weights",))
    out_s = render.render_image(fn_shard, K, c2w, H, W, chunk=128,
                                extra_keys=("weights",))
    for k in ("rgb_marched", "depth", "weights"):
        np.testing.assert_allclose(out_s[k], out_p[k], rtol=1e-5,
                                   atol=1e-5, err_msg=k)
    assert out_s["joints_2d"].shape == (mcfg.n_joints, 2)


def test_backbone_render_sharded_matches_single():
    mesh = _mesh8()
    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    params["feature"] = params["feature"] + 0.1
    H = W = 16
    K, c2w = _camera(H, W, f=20.0, z=2.5)

    kw = dict(stepsize=0.5, near=0.3, far=6.0, bg=1.0)
    fn_plain = make_backbone_renderer(params, cfg, **kw)(0, 0.2)
    fn_shard = make_backbone_renderer(params, cfg, mesh=mesh, **kw)(0, 0.2)

    out_p = render.render_image(fn_plain, K, c2w, H, W, chunk=64)
    out_s = render.render_image(fn_shard, K, c2w, H, W, chunk=64)
    for k in ("rgb_marched", "depth"):
        np.testing.assert_allclose(out_s[k], out_p[k], rtol=1e-5,
                                   atol=1e-5, err_msg=k)


def test_sharded_chunk_divisibility_guard():
    mesh = _mesh8()
    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    fn = make_backbone_renderer(params, cfg, stepsize=0.5, near=0.3,
                                far=6.0, bg=1.0, mesh=mesh)(0, 0.2)
    K, c2w = _camera(16, 16, f=20.0, z=2.5)
    with pytest.raises(AssertionError):
        render.render_image(fn, K, c2w, 16, 16, chunk=60)
