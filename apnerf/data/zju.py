"""ZJU-MoCap loader (WIM-preprocessed pickle caches).

``cache_train.pickle`` / ``cache_test.pickle`` with (optionally
blosc-compressed) per-frame image/mask arrays; background compositing;
``coordinate_scale = 1.5``; static render pose repeated 80x.
Parity: reference lib/load_zju.py:72-176. Compressed caches decode through
the ``blosc`` package when present, else through the dependency-free
blosc1 frame decoder in apnerf.data.bloscdec (native blosclz + stdlib
zlib), so real WIM-exported caches load in this image too.
"""
from __future__ import annotations

import pickle

import numpy as np

from . import bloscdec

try:
    import blosc  # noqa: F401
    HAVE_BLOSC = True
except ImportError:
    HAVE_BLOSC = False

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

COORDINATE_SCALE = 1.5  # from WIM preprocessing


def _unpack(arr, compression):
    if not compression:
        return arr
    if HAVE_BLOSC:
        return blosc.unpack_array(arr)
    return bloscdec.unpack_array(arr)


def load_zju(pickle_path, video_len=300, size: int = 512, compression=None,
             bg_col=0, step: int = 1, load_test_val=False):
    if load_test_val:
        pickle_path = pickle_path.replace("cache_train", "cache_test")
    with open(pickle_path, "rb") as f:
        data = pickle.load(f)

    if compression is None:
        # auto-detect: compressed caches store bytes, raw caches store arrays
        compression = not isinstance(data["img"][0], np.ndarray)

    imgs, masks, intrinsics, poses, times, img_to_cam = [], [], [], [], [], []
    imgs_per_cam = len(np.unique(data["frame_id"]))
    id_max = video_len - 1
    video_len = min(imgs_per_cam - 1, video_len)
    unique_cams = np.unique(data["camera_id"])

    for fid in range(0, video_len, step):
        for c_id in unique_cams:
            f_id = int(c_id) * imgs_per_cam + fid
            times.append(data["frame_id"][fid] / (id_max - 1))
            img = _unpack(data["img"][f_id], compression)
            fg = _unpack(data["mask"][f_id], compression)
            if fg.ndim == 2:
                fg = fg[None]
            img = img * fg + (1 - fg) * bg_col * 255
            img = np.moveaxis(img, 0, -1)  # CHW -> HWC
            img_scale = 1.0
            if img.shape[0] != size:
                img_scale = size / img.shape[0]
                if cv2 is None:
                    raise RuntimeError("cv2 needed to resize ZJU frames")
                img = cv2.resize(img, (size, size),
                                 interpolation=cv2.INTER_AREA)
            imgs.append(img.astype(np.uint8))
            masks.append(np.moveaxis(fg, 0, -1).astype(np.uint8))
            img_to_cam.append(int(c_id))
            if len(poses) < len(unique_cams):
                K = np.array(data["camera_intrinsic"][f_id], np.float32) * img_scale
                K[2, 2] = 1.0
                intrinsics.append(K)
                rot = data["camera_rotation"][f_id]
                trans = data["camera_translation"][f_id] / COORDINATE_SCALE
                pose = np.concatenate(
                    [np.concatenate([rot, trans], axis=-1),
                     np.array([[0, 0, 0, 1]])], axis=0)
                poses.append(np.linalg.inv(pose))

    imgs = np.stack(imgs, 0)
    masks = np.stack(masks, 0)
    poses = np.asarray(poses, np.float32)
    intrinsics = np.asarray(intrinsics, np.float32)
    times = np.asarray(times, np.float32)
    H, W = imgs.shape[1], imgs.shape[2]

    render_poses = np.repeat(poses[None, 0], 80, axis=0).astype(np.float32)
    render_times = np.linspace(0.0, 1.0, len(render_poses)).astype(np.float32)
    render_intrinsics = np.repeat(intrinsics[0][None], len(render_poses), 0)

    if load_test_val:
        i_split = [np.array([]), np.array([]), np.arange(len(imgs))]
    else:
        i_split = [np.arange(len(imgs)), np.array([]), np.array([])]
    img_to_cam = np.asarray(img_to_cam, np.int32)
    embeddings = []
    return (imgs, poses, intrinsics, times, render_poses, render_times,
            render_intrinsics, [H, W], i_split, img_to_cam, masks, embeddings)
