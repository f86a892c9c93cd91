"""Fast stage1 -> export -> stage2 -> repose wiring smoke.

The full quality-gated pipeline lives in test_pipeline.py (marked slow and
deselected by default, pyproject addopts); without this file a plain
``pytest`` run would exercise no stage1->stage2 integration path at all and
wiring regressions would pass CI silently (ADVICE r2). Micro sizes, a
handful of iterations, structural asserts only — quality gates stay in the
slow test.
"""
import os
import numpy as np
import jax.numpy as jnp
import pytest

from apnerf.config.config import load_config
from apnerf.data.load_data import load_data
from apnerf.data.synthetic import generate_scene

# heavier CPU tier (VERDICT r3 #7): default `pytest -q` stays <3 min
pytestmark = pytest.mark.integration


@pytest.fixture(scope="module")
def micro_setup(tmp_path_factory):
    scene = generate_scene(str(tmp_path_factory.mktemp("scene") / "arm"),
                           n_times=3, n_test=1, H=32, W=32)
    cfg = load_config("apnerf/config/configs/nerf/jumpingjacks.py")
    cfg.data.datadir = scene
    cfg.data.half_res = False
    cfg.model_and_render.num_voxels = 20 ** 3
    cfg.model_and_render.num_voxels_base = 20 ** 3
    cfg.train_config.pg_scale = []
    cfg.train_config.N_rand = 128
    cfg.train_config.use_occupancy = False
    cfg.pcd_model_and_render.canonical_pcd_num = 200
    cfg.pcd_model_and_render.bone_length = 5.0
    cfg.pcd_train_config.N_rand = 64
    cfg.pcd_train_config.full_t_iter = 6
    data = load_data(cfg.data, cfg, bg_col=cfg.train_config.bg_col)
    return cfg, data


def test_pipeline_wiring(micro_setup, tmp_path):
    from apnerf.train import stage1, stage2
    from apnerf.train.export import export_point_cloud
    from apnerf.models import temporal_points as tp

    cfg, data = micro_setup
    params, mcfg, stats = stage1.scene_rep_reconstruction(
        cfg, data, n_iters=10, log_every=10)
    assert np.isfinite(stats["loss"][-1])

    art = export_point_cloud(
        params, mcfg, str(tmp_path), cfg.data.canonical_t,
        float(cfg.model_and_render.stepsize), pcd_density_threshold=0.0,
        skeleton_density_threshold=0.0, bone_length=5.0,
        canonical_pcd_num=200, overwrite=True)
    assert len(art["canonical"]["pcd"]) > 10
    assert len(art["skeleton"]["bones"]) >= 1

    scene_bbox = (np.asarray(mcfg.xyz_min), np.asarray(mcfg.xyz_max))
    tb_dir = str(tmp_path / "tb")
    p2, m2, st2, stats2 = stage2.train_pcd(
        cfg, data, art["canonical"], art["skeleton"], params, mcfg,
        scene_bbox, n_iters=4, log_every=4, sample_budget=32,
        tensorboard_path=tb_dir, i_save=4)
    assert np.isfinite(stats2["loss"][-1])
    import glob
    # comparison video written (mp4 via cv2; gif when no encoder)
    assert glob.glob(tb_dir + "/comparison_*.mp4") \
        or glob.glob(tb_dir + "/comparison_*.gif"), os.listdir(tb_dir)

    # repose path: explicit rotations through the full forward
    J = m2.n_joints
    rot = np.zeros((J, 4), np.float32)
    rot[:, 0] = 1.0
    ro = np.tile([[0, 0, 3.0]], (32, 1)).astype(np.float32)
    rd = np.tile([[0, 0, -1.0]], (32, 1)).astype(np.float32)
    rd[:, 0] = np.linspace(-0.3, 0.3, 32)
    out = tp.forward(p2, m2, st2, jnp.asarray(ro), jnp.asarray(rd),
                     jnp.asarray(rd), t=None, rot_params=jnp.asarray(rot),
                     near=0.5, far=6.0, bg=1.0)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()
