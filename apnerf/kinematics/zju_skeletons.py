"""SMPL-topology skeleton prior for ZJU-MoCap subjects.

The reference ships hardcoded per-subject joint tables + the SMPL bone
topology (reference zju_skeletons.py:3-147), consumed only by the
``smpl_skeleton`` branch of the export path which is disabled upstream
(reference run.py:1215-1216 hardcodes ``smpl_skeleton = False``).

We provide the standard SMPL 24-joint kinematic tree (public topology) and a
loader hook for per-subject rest-pose joints. Joint coordinates are
dataset-derived constants: supply them via a ``smpl_joints.npy`` file next
to the subject's pickle cache (shape [24, 3], already divided by the WIM
``coordinate_scale`` 1.5), or fall back to the automatic skeletonizer.
"""
from __future__ import annotations

import os

import numpy as np

# SMPL kinematic tree: (parent, child) over the standard 24 joints
# 0 pelvis, 1/2 L/R hip, 3 spine1, 4/5 L/R knee, 6 spine2, 7/8 L/R ankle,
# 9 spine3, 10/11 L/R foot, 12 neck, 13/14 L/R collar, 15 head,
# 16/17 L/R shoulder, 18/19 L/R elbow, 20/21 L/R wrist, 22/23 L/R hand
SMPL_BONES = [
    [0, 1], [0, 2], [0, 3], [1, 4], [2, 5], [3, 6], [4, 7], [5, 8],
    [6, 9], [7, 10], [8, 11], [9, 12], [9, 13], [9, 14], [12, 15],
    [13, 16], [14, 17], [16, 18], [17, 19], [18, 20], [19, 21],
    [20, 22], [21, 23],
]

COORDINATE_SCALE = 1.5  # WIM preprocessing scale for ZJU


def load_subject_joints(datadir: str):
    """Rest-pose SMPL joints for a ZJU subject, if provided on disk."""
    base = datadir.split(".pickle")[0]
    for cand in (os.path.join(os.path.dirname(base), "smpl_joints.npy"),
                 base + "_smpl_joints.npy"):
        if os.path.exists(cand):
            joints = np.load(cand).astype(np.float32)
            assert joints.shape == (24, 3)
            return joints
    return None


def smpl_skeleton_for(datadir: str):
    """Skeleton dict in ``create_skeleton``'s schema, or None if no joint
    table is available (callers then use the automatic skeletonizer)."""
    joints = load_subject_joints(datadir)
    if joints is None:
        return None
    return {
        "skeleton_pcd": joints,
        "joints": joints,
        "root": joints[0],
        "bones": [b for b in SMPL_BONES],
        "pcd": None,
        "weights": None,
    }
