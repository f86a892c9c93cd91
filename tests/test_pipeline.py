"""End-to-end miniature pipeline: synthetic scene -> stage1 -> export ->
skeleton -> stage2 -> repose render. Tiny sizes; CPU-friendly."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from apnerf.config.config import load_config
from apnerf.data.load_data import load_data
from apnerf.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    scene = generate_scene(str(tmp_path_factory.mktemp("scene") / "arm"),
                           n_times=4, n_test=1, H=48, W=48)
    cfg = load_config("apnerf/config/configs/nerf/jumpingjacks.py")
    cfg.data.datadir = scene
    cfg.data.half_res = False
    cfg.model_and_render.num_voxels = 32 ** 3
    cfg.model_and_render.num_voxels_base = 32 ** 3
    cfg.train_config.pg_scale = [40]
    cfg.train_config.N_rand = 256
    cfg.pcd_model_and_render.canonical_pcd_num = 400
    cfg.pcd_model_and_render.bone_length = 5.0
    cfg.pcd_train_config.N_rand = 128
    cfg.pcd_train_config.full_t_iter = 40
    data = load_data(cfg.data, cfg, bg_col=cfg.train_config.bg_col)
    return cfg, data


@pytest.mark.slow
def test_full_pipeline(tiny_setup, tmp_path):
    from apnerf.train import stage1, stage2
    from apnerf.train.export import export_point_cloud
    from apnerf.models import temporal_points as tp

    cfg, data = tiny_setup
    params, mcfg, stats = stage1.scene_rep_reconstruction(
        cfg, data, n_iters=120, log_every=60)
    # regression gate at measured-minus-1dB (PSNR_TRAIL.jsonl: 24.58 across
    # rounds 2-3; deterministic seeded run) so drift fails, not just breakage
    assert stats["psnr"][-1] > 23.5, stats["psnr"]

    art = export_point_cloud(
        params, mcfg, str(tmp_path), cfg.data.canonical_t,
        float(cfg.model_and_render.stepsize), pcd_density_threshold=0.3,
        skeleton_density_threshold=0.3, bone_length=5.0,
        canonical_pcd_num=400, overwrite=True)
    assert len(art["canonical"]["pcd"]) > 100
    assert len(art["skeleton"]["bones"]) >= 1
    assert art["canonical"]["feat"].shape[1] == mcfg.net_width

    scene_bbox = (np.asarray(mcfg.xyz_min), np.asarray(mcfg.xyz_max))
    tb_dir = str(tmp_path / "tb")
    p2, m2, st2, stats2 = stage2.train_pcd(
        cfg, data, art["canonical"], art["skeleton"], params, mcfg,
        scene_bbox, n_iters=60, log_every=30, sample_budget=32,
        tensorboard_path=tb_dir, i_save=60)
    assert np.isfinite(stats2["loss"][-1])
    # stage-2 quality gate: train-batch PSNR at the end of the run must be
    # clearly above background-only rendering (~11 dB on this scene). This
    # is the guard against perf approximations (coarse occupancy testing,
    # bf16 aggregation, quantized KNN keys) silently bleeding quality while
    # losses stay finite. Gate at measured-minus-1dB (trail: 22.77).
    assert stats2["psnr"][-1] > 21.7, stats2["psnr"]
    import glob
    # comparison panel GIFs written at i_save (reference run.py:772-811)
    assert glob.glob(tb_dir + "/comparison_*.mp4") \
        or glob.glob(tb_dir + "/comparison_*.gif"), os.listdir(tb_dir)

    # ---- canonical-time re-render PSNR vs GT (repose-path quality gate):
    # rendering through the full warp+KNN+composite pipeline at a train
    # camera/time must reconstruct the image, not just produce finite pixels
    from apnerf.data import rays as raydata
    from apnerf.render import metrics
    H, W = int(data["HW"][0][0]), int(data["HW"][0][1])
    tcan = float(cfg.data.canonical_t)
    times = np.asarray(data["times"])
    i_tr = np.asarray(data["i_train"])
    row = i_tr[int(np.argmin(np.abs(times[i_tr] - tcan)))]
    cam = int(data["img_to_cam"][row])
    pix = jnp.arange(H * W, dtype=jnp.int32)
    ro, rd, vd = raydata.pixels_to_rays(
        jnp.asarray(data["Ks"]), jnp.asarray(data["poses"]),
        jnp.full((H * W,), cam, jnp.int32), pix, H, W,
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    out_c = tp.forward(p2, m2, st2, ro, rd, vd,
                       t=jnp.float32(float(times[row])),
                       near=data["near"], far=data["far"],
                       bg=float(cfg.pcd_train_config.bg_col))
    pred = np.asarray(out_c["rgb_marched"]).reshape(H, W, 3)
    gt = np.asarray(data["images"][row], np.float32)
    if gt.max() > 1.5:
        gt = gt / 255.0
    canon_psnr = metrics.psnr(pred, gt[..., :3])
    # measured-minus-1dB (trail: 21.78)
    assert canon_psnr > 20.7, f"canonical re-render PSNR {canon_psnr:.2f}"

    # mechanical PSNR-trail record (VERDICT r2 #3): append this run's
    # numbers so each round's quality sits next to its perf numbers
    import json
    import time
    trail = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PSNR_TRAIL.jsonl")
    with open(trail, "a") as f:
        f.write(json.dumps({
            "ts": round(time.time(), 1),
            "stage1_psnr": round(float(stats["psnr"][-1]), 2),
            "stage2_psnr": round(float(stats2["psnr"][-1]), 2),
            "canonical_rerender_psnr": round(float(canon_psnr), 2),
        }) + "\n")

    # repose with explicit rotations renders finite images
    J = m2.n_joints
    rot = np.zeros((J, 4), np.float32)
    rot[:, 0] = 1.0
    if J > 1:
        rot[1] = [0, 0, 1, 0.4]
    ro = np.tile([[0, 0, 3.0]], (64, 1)).astype(np.float32)
    rd = np.tile([[0, 0, -1.0]], (64, 1)).astype(np.float32)
    rd[:, 0] = np.linspace(-0.3, 0.3, 64)
    out = tp.forward(p2, m2, st2, jnp.asarray(ro), jnp.asarray(rd),
                     jnp.asarray(rd), t=None, rot_params=jnp.asarray(rot),
                     near=0.5, far=6.0, bg=1.0, render_depth=True)
    rgb = np.asarray(out["rgb_marched"])
    assert np.isfinite(rgb).all()
    assert rgb.shape == (64, 3)
    # an actually-rotated repose must change the image vs identity repose
    # (the rotation plumbing is live, not a no-op)
    rot_id = np.zeros((J, 4), np.float32)
    rot_id[:, 0] = 1.0
    out_id = tp.forward(p2, m2, st2, jnp.asarray(ro), jnp.asarray(rd),
                        jnp.asarray(rd), t=None,
                        rot_params=jnp.asarray(rot_id),
                        near=0.5, far=6.0, bg=1.0)
    if J > 1:
        assert not np.allclose(np.asarray(out_id["rgb_marched"]), rgb)
