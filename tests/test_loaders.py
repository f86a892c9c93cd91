"""Data-loader tests on generated WIM / ZJU-format fixtures (multi-camera
paths differ structurally from D-NeRF: shared cameras, img_to_cam mapping,
time-contiguous blocks)."""
import json
import os
import pickle

import imageio.v2 as imageio
import numpy as np
import pytest

from apnerf.data.wim import load_robot
from apnerf.data.zju import load_zju
from apnerf.data.rays import build_ray_index


def _make_wim(root, n_frames=2, size=32):
    os.makedirs(root, exist_ok=True)
    cams = list(range(1, 10)) + list(range(11, 20))
    rng = np.random.default_rng(0)
    for c in cams:
        with open(os.path.join(root, f"cam_{c:03d}.json"), "w") as f:
            view = np.eye(4)
            view[2, 3] = -3.0 - 0.01 * c
            json.dump({"camera_data": {
                "intrinsics": {"fx": 40.0, "fy": 40.0, "cx": size / 2,
                               "cy": size / 2},
                "camera_view_matrix": view.T.tolist()}}, f)
    for fid in range(n_frames):
        for c in cams:
            img = rng.integers(0, 255, (size, size, 4), dtype=np.uint8)
            imageio.imwrite(
                os.path.join(root, f"frame_{fid:05d}_cam_{c:03d}.png"), img)
    return root


def test_wim_loader(tmp_path):
    root = _make_wim(str(tmp_path / "spot"), n_frames=2, size=32)
    (imgs, poses, Ks, times, rposes, rtimes, rKs, hw, i_split, img_to_cam,
     masks) = load_robot(root, video_len=2, size=32)
    assert imgs.shape == (36, 32, 32, 3)
    assert imgs.dtype == np.uint8
    assert poses.shape == (18, 4, 4)
    assert Ks.shape == (18, 3, 3)
    assert len(times) == 36
    # frame-major ordering: first 18 entries are time 0
    assert (times[:18] == 0).all() and (times[18:] == 1).all()
    assert (img_to_cam[:18] == np.arange(18)).all()
    assert len(rposes) == 180
    np.testing.assert_allclose(poses[0][2, 3], 3.01, rtol=1e-5)


def test_wim_nao_coordinate_scale(tmp_path):
    root = _make_wim(str(tmp_path / "nao"), n_frames=1, size=32)
    out = load_robot(root, video_len=1, size=32)
    poses = out[1]
    # nao translations scaled by 1/0.333
    np.testing.assert_allclose(poses[0][2, 3], 3.01 / 0.333, rtol=1e-4)


def _make_zju(path, n_frames=3, n_cams=4, size=32):
    rng = np.random.default_rng(1)
    imgs_per_cam = n_frames
    data = {
        "frame_id": np.arange(n_frames),
        "camera_id": np.repeat(np.arange(n_cams), imgs_per_cam),
        "img": [], "mask": [],
        "camera_intrinsic": [], "camera_rotation": [],
        "camera_translation": [],
    }
    for c in range(n_cams):
        for f in range(imgs_per_cam):
            data["img"].append(
                rng.integers(0, 255, (3, size, size), dtype=np.uint8))
            data["mask"].append(
                (rng.random((size, size)) < 0.3).astype(np.uint8)[None])
            K = np.array([[40.0, 0, size / 2], [0, 40.0, size / 2],
                          [0, 0, 1.0]])
            data["camera_intrinsic"].append(K)
            data["camera_rotation"].append(np.eye(3))
            data["camera_translation"].append(
                np.array([[0.0], [0.0], [3.0 + c]]))
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def test_zju_loader(tmp_path):
    p = _make_zju(str(tmp_path / "cache_train.pickle"), n_frames=3, n_cams=4,
                  size=32)
    (imgs, poses, Ks, times, rposes, rtimes, rKs, hw, i_split, img_to_cam,
     masks, emb) = load_zju(p, video_len=3, size=32, bg_col=0)
    # video_len = min(imgs_per_cam - 1, video_len) = 2 frames x 4 cams
    assert imgs.shape == (8, 32, 32, 3)
    assert poses.shape == (4, 4, 4)
    assert (img_to_cam[:4] == np.arange(4)).all()
    # coordinate scale 1.5 applied to translations before inversion
    np.testing.assert_allclose(poses[0][2, 3], -(3.0 / 1.5), rtol=1e-5)
    assert len(rposes) == 80


def test_ray_index_multicam(tmp_path):
    """index_to_times blocks must be contiguous per timestep across shared
    cameras (the stage-2 sampler contract, reference
    lib/temporalpoints.py:851-868)."""
    rng = np.random.default_rng(2)
    H = W = 16
    n_cams, n_t = 3, 2
    poses = np.stack([np.eye(4, dtype=np.float32)] * n_cams)
    poses[:, 2, 3] = 3.0
    Ks = np.stack([np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]],
                            np.float32)] * n_cams)
    n_img = n_cams * n_t
    images = rng.random((n_img, H, W, 3)).astype(np.float32)
    masks = np.ones((n_img, H, W, 1), np.float32)
    times = np.repeat(np.linspace(0, 1, n_t), n_cams).astype(np.float32)
    img_to_cam = np.tile(np.arange(n_cams), n_t)
    idx = build_ray_index(images, masks, times, img_to_cam, poses, Ks, H, W,
                          np.array([-1., -1., -1.]), np.array([1., 1., 1.]),
                          0.5, 6.0)
    assert set(idx.index_to_times.keys()) == {0.0, 1.0}
    lo, hi = idx.index_to_times[0.0]
    assert hi - lo > 0
    lo2, hi2 = idx.index_to_times[1.0]
    assert lo2 == hi and hi2 == idx.n
    # gather returns consistent cam/time per record
    rgb, m, t, cam, pix = idx.gather(np.arange(lo, hi, 7))
    assert (t == 0.0).all()


def test_load_data_wim_dispatch(tmp_path):
    """Full load_data dispatch on the wim config family: near/far, hwf from
    the per-camera intrinsics table, alpha-derived masks, video_len knob."""
    from apnerf.config.config import load_config
    from apnerf.data.load_data import load_data

    root = _make_wim(str(tmp_path / "spot"), n_frames=2, size=32)
    cfg = load_config("apnerf/config/configs/wim/spot.py")
    cfg.data.datadir = root
    cfg.data.video_len = 2
    cfg.data.wim_size = 32
    data = load_data(cfg.data, cfg, bg_col=1.0)
    assert data["near"] == 1.0 and data["far"] == 6.0
    assert data["images"].shape[0] == 36
    assert data["Ks"].shape == (18, 3, 3)
    assert len(data["i_train"]) == 36 and len(data["i_test"]) == 0
    assert np.asarray(data["masks"]).shape[:1] == (36,)


def test_load_data_zju_dispatch(tmp_path):
    """load_data dispatch on the zju config family (near/far, masked-bg
    images, per-camera K table, zju_size knob)."""
    from apnerf.config.config import load_config
    from apnerf.data.load_data import load_data

    p = _make_zju(str(tmp_path / "cache_train.pickle"), n_frames=3,
                  n_cams=4, size=32)
    cfg = load_config("apnerf/config/configs/zju/377.py")
    cfg.data.datadir = p
    cfg.data.video_len = 3
    cfg.data.zju_size = 32
    data = load_data(cfg.data, cfg, bg_col=1.0)
    assert data["near"] == 1.0 and data["far"] == 4.0
    assert data["images"].shape[1:] == (32, 32, 3)
    assert data["Ks"].shape == (4, 3, 3)
    assert len(data["i_train"]) == data["images"].shape[0]


def test_ray_index_normalises_alpha_masks():
    """0-255 alpha masks (WIM) normalise to [0,1] before the mask BCE
    (reference run.py:919-921); 0/1 masks (ZJU) pass through unscaled."""
    from apnerf.data.rays import build_ray_index

    H = W = 8
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)]
    poses = np.eye(4, dtype=np.float32)[None]
    poses[0, 2, 3] = 3.0
    Ks = np.array([[[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]]], np.float32)
    kw = dict(times=np.zeros(1), img_to_cam=np.zeros(1, np.int32),
              poses=poses, Ks=Ks, H=H, W=W,
              xyz_min=np.array([-1., -1., -1.]),
              xyz_max=np.array([1., 1., 1.]), near=0.5, far=6.0)

    m255 = [np.full((H, W, 1), 255, np.uint8)]
    m255[0][:4] = 0
    idx = build_ray_index(imgs, m255, **kw)
    assert idx.mask.max() == 1.0 and set(np.unique(idx.mask)) <= {0.0, 1.0}

    m01 = [(rng.random((H, W, 1)) < 0.5).astype(np.uint8)]
    idx2 = build_ray_index(imgs, m01, **kw)
    assert set(np.unique(idx2.mask)) <= {0.0, 1.0}
    np.testing.assert_array_equal(
        idx2.mask, np.asarray(m01[0], np.float32).reshape(-1)[idx2.pix_id])
