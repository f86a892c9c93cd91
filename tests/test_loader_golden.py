"""Golden loader parity against the ACTUAL reference implementation.

The reference's D-NeRF / WIM loaders are pure python+numpy+torch-cpu, so
when the reference checkout is present we import them (no code copied) and
assert our loaders produce the same splits, poses, times and pixels on the
same on-disk fixtures. This pins loader parity deeper than shape tests:
any convention drift (pose flips, time ordering, split membership,
render-path cameras) fails loudly."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "lib")),
                                reason="reference checkout not present")


def _norm_img(x):
    x = np.asarray(x, np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    return x


def test_dnerf_loader_matches_reference(tmp_path):
    from apnerf.data.synthetic import generate_scene
    from apnerf.data.dnerf import load_dnerf_data

    scene = generate_scene(str(tmp_path / "arm"), n_times=3, n_test=1,
                           H=32, W=32)
    # load_test_val=False is the path the reference actually exercises:
    # its lib/load_data.py:19 never forwards load_test_val to load_dnerf_data,
    # and the dead load_test_val branch keeps stale GLOBAL i_split indices
    # after dropping the train images. Our loader re-bases them (usable
    # indices) — a deliberate deviation, so only the live path is golden.
    ours = load_dnerf_data(scene, half_res=False)

    sys.path.insert(0, REF)
    try:
        from lib.load_dnerf import load_dnerf_data as ref_load
        ref = ref_load(scene, half_res=False)
    finally:
        sys.path.remove(REF)

    (imgs, poses, times, rposes, rtimes, hwf, i_split, img_to_cam,
     masks) = ours
    (r_imgs, r_poses, r_times, r_rposes, r_rtimes, r_hwf, r_i_split,
     r_img_to_cam, r_masks) = ref

    np.testing.assert_allclose(_norm_img(imgs), _norm_img(r_imgs),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(r_poses),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(times).ravel(),
                               np.asarray(r_times).ravel(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rposes), np.asarray(r_rposes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rtimes).ravel(),
                               np.asarray(r_rtimes).ravel(), atol=1e-6)
    np.testing.assert_allclose(hwf, [float(v) for v in r_hwf], rtol=1e-6)
    for a, b in zip(i_split, r_i_split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(img_to_cam),
                                  np.asarray(r_img_to_cam))
    if masks is not None and r_masks is not None:
        np.testing.assert_allclose(_norm_img(masks), _norm_img(r_masks),
                                   atol=1e-5)


def test_wim_loader_matches_reference(tmp_path):
    from apnerf.data.wim import load_robot
    from test_loaders import _make_wim

    root = _make_wim(str(tmp_path / "spot"), n_frames=2, size=32)
    ours = load_robot(root, video_len=2, size=32)

    sys.path.insert(0, REF)
    try:
        from lib.load_robot import load_robot as ref_load
        ref = ref_load(root, video_len=2, size=32)
    finally:
        sys.path.remove(REF)

    (imgs, poses, Ks, times, rposes, rtimes, rKs, hw, i_split, img_to_cam,
     masks) = ours
    (r_imgs, r_poses, r_Ks, r_times, r_rposes, r_rtimes, r_rKs, r_hw,
     r_i_split, r_img_to_cam, r_masks) = ref

    np.testing.assert_allclose(_norm_img(imgs), _norm_img(r_imgs),
                               atol=1e-5)
    np.testing.assert_allclose(_norm_img(masks), _norm_img(r_masks),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(r_poses),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(r_Ks),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(times).ravel(),
                               np.asarray(r_times).ravel(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rposes), np.asarray(r_rposes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rKs), np.asarray(r_rKs),
                               rtol=1e-5, atol=1e-5)
    assert list(hw) == [int(v) for v in r_hw]
    for a, b in zip(i_split, r_i_split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(img_to_cam),
                                  np.asarray(r_img_to_cam))
