"""Kinematics tests: thinning, skeletonizer, bone merging (golden vs the
reference's own numpy implementation when importable)."""
import sys

import numpy as np
import pytest
from scipy import ndimage

from apnerf.kinematics import morphology as M
from apnerf.kinematics.skeletonizer import create_skeleton, weight_from_bones
from apnerf.kinematics.treeprune import (merge_joints, cluster_children,
                                         flatten_merging_rules)


def test_thinning_preserves_topology_and_span():
    vol = np.zeros((40, 20, 20), bool)
    vol[4:36, 8:14, 8:14] = True
    sk = M.skeletonize_3d(vol)
    assert 0 < sk.sum() < vol.sum() * 0.1
    assert sk[vol].sum() == sk.sum()
    lab, n = ndimage.label(sk, structure=np.ones((3, 3, 3)))
    assert n == 1
    xs = np.argwhere(sk)[:, 0]
    assert xs.max() - xs.min() >= 25  # spans most of the tube


def test_thinning_keeps_thin_line():
    vol = np.zeros((20, 9, 9), bool)
    vol[2:18, 4, 4] = True
    sk = M.skeletonize_3d(vol)
    assert sk.sum() == 16


def test_remove_small_holes_and_largest_component():
    vol = np.zeros((12, 12, 12), bool)
    vol[2:10, 2:10, 2:10] = True
    vol[5, 5, 5] = False              # small internal hole
    vol[0, 0, 0] = True               # tiny separate blob
    filled = M.remove_small_holes(vol, area_threshold=8)
    assert filled[5, 5, 5]
    big = M.largest_component(filled)
    assert not big[0, 0, 0]
    assert big[5, 5, 5]


def test_create_skeleton_l_shape():
    vol = np.zeros((40, 24, 24), np.float32)
    vol[4:36, 8:14, 8:14] = 1.0
    vol[30:36, 8:20, 8:14] = 1.0
    axes = [np.linspace(-1, 1, s) for s in vol.shape]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
    res = create_skeleton(vol, grid, bone_length=6.0, threshold=0.5)
    assert res["weights"].shape == (res["pcd"].shape[0], len(res["bones"]))
    np.testing.assert_allclose(res["weights"].sum(1), 1.0, rtol=1e-5)
    assert len(res["bones"]) >= 3
    b = np.asarray(res["bones"])
    # bones form a tree over the joint list: each tail appears once
    tails = b[:, 1]
    assert len(np.unique(tails)) == len(tails)
    assert b.max() < len(res["joints"])


def _reference_fixture():
    """The reference repo's hardcoded 29-joint demo tree
    (lib/treeprune.py:301-478) regenerated structurally: a symmetric
    quadruped-ish tree with a made-up similarity matrix."""
    rng = np.random.default_rng(0)
    J = 17
    bones = []
    parent = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 5,
              10: 6, 11: 7, 12: 8, 13: 9, 14: 10, 15: 11, 16: 12}
    for c, p in parent.items():
        bones.append([p, c])
    joints = rng.normal(size=(J, 3)).astype(np.float32)
    prune = np.zeros(J, bool)
    prune[[3, 4, 8, 10, 13]] = True
    sim = np.eye(J, dtype=bool)
    for a, b in [(6, 7), (11, 12), (14, 15)]:
        sim[a, b] = sim[b, a] = True
    return joints, np.asarray(bones), prune, sim


def test_merge_joints_invariants():
    joints, bones, prune, sim = _reference_fixture()
    (new_joints, new_bones, merging_rules, joints_to_keep, rotations_to_keep,
     switch_mask, sibling_rules) = merge_joints(joints, bones, prune, sim,
                                                convert_merging_rules=False)
    J = len(joints)
    assert joints_to_keep[0]
    assert rotations_to_keep[0]
    assert len(new_joints) == joints_to_keep.sum()
    # new bones index the compacted joint list, tails unique (tree)
    assert new_bones.max() < len(new_joints)
    assert len(np.unique(new_bones[:, 1])) == len(new_bones)
    # merging rules point at unpruned-or-root joints
    flat = flatten_merging_rules(merging_rules)
    for src, dst in enumerate(flat):
        assert (not prune[dst]) or dst == 0
    # pruned joints never keep their own weight
    for j in range(1, J):
        if prune[j]:
            assert merging_rules[j] != j


def test_merge_joints_matches_reference_impl():
    sys.path.insert(0, "/root/reference")
    try:
        from lib.treeprune import merge_joints as ref_merge
    except Exception:
        pytest.skip("reference implementation not importable")
    finally:
        sys.path.pop(0)
    joints, bones, prune, sim = _reference_fixture()
    ours = merge_joints(joints, bones, prune, sim, convert_merging_rules=False)
    theirs = ref_merge(joints, bones, prune, sim, convert_merging_rules=False)
    np.testing.assert_allclose(ours[0], theirs[0])          # new_joints
    np.testing.assert_array_equal(ours[1], theirs[1])       # new_bones
    np.testing.assert_array_equal(ours[2], theirs[2])       # merging_rules
    np.testing.assert_array_equal(ours[3], theirs[3])       # joints_to_keep
    np.testing.assert_array_equal(ours[4], theirs[4])       # rotations_to_keep
    np.testing.assert_array_equal(ours[5], theirs[5])       # switch mask
    np.testing.assert_array_equal(ours[6], theirs[6])       # sibling rules


def test_cluster_children_transitive():
    sim = np.zeros((6, 6), bool)
    sim[1, 2] = sim[2, 1] = True
    sim[2, 3] = sim[3, 2] = True
    rules = cluster_children([1, 2, 3, 4], sim)
    assert 1 in rules
    assert set(rules[1]) == {2, 3}


def test_weight_from_bones_softmax():
    joints = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float64)
    bones = [[0, 1], [1, 2]]
    pcd = np.array([[0.5, 0.0, 0.0], [1.0, 0.5, 0.0]])
    w = weight_from_bones(joints, bones, pcd, theta=0.05)
    np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-6)
    assert w[0, 0] > w[0, 1]   # first point closer to bone 0
    assert w[1, 1] > w[1, 0]


def test_zju_subject_joint_tables():
    """Per-subject SMPL joint tables resolve by subject id and have the
    documented shape/topology (reference zju_skeletons.py:11-147)."""
    from apnerf.kinematics import zju_skeletons as z
    assert set(z.SUBJECT_JOINTS) == {"336", "377", "381", "384", "387"}
    for j in z.SUBJECT_JOINTS.values():
        assert j.shape == (24, 3) and j.dtype == np.float32
    sk = z.smpl_skeleton_for("/data/zju/377/cache_train.pickle")
    assert sk is not None
    np.testing.assert_array_equal(sk["joints"], z.SUBJECT_JOINTS["377"])
    assert len(sk["bones"]) == 23
    assert z.smpl_skeleton_for("/data/zju/999/cache_train.pickle") is None


def test_merge_joints_all_pruned_degenerates_gracefully():
    """Every non-root joint pruned -> single-root skeleton, not a crash
    (the reference indexes with an empty float array here)."""
    rng = np.random.default_rng(5)
    J = 6
    joints = rng.normal(size=(J, 3)).astype(np.float32)
    bones = [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5]]
    prune = np.ones(J, bool)
    prune[0] = False
    sim = np.eye(J, dtype=bool)
    (new_joints, new_bones, merging_rules, joints_to_keep,
     rotations_to_keep, switch_mask, sibling_rules) = merge_joints(
        joints, bones, prune, sim, convert_merging_rules=False)
    assert new_joints.shape == (1, 3)
    assert new_bones.shape == (0, 2)
    assert (merging_rules == 0).all()
    assert joints_to_keep.sum() == 1 and joints_to_keep[0]
    assert rotations_to_keep.sum() == 1 and rotations_to_keep[0]
    assert len(switch_mask) == 1


def test_heap_tie_order_matches_reference_distqueue():
    """The BFS heap keyed (dist, -counter) must pop in the exact order of
    the reference's insertion-sorted DistQueue (skeletonizer.py:51-81):
    ascending distance, and among equal distances NEWEST-inserted first
    (it inserts before existing equals). Fuzzed over tie-rich sequences."""
    import heapq
    import itertools

    rng = np.random.default_rng(11)
    dist_pool = [0.0, 1.0, 1.0, np.sqrt(2), np.sqrt(2), np.sqrt(3), 2.0]
    for trial in range(20):
        # reference-semantics comparison queue (insert before first >=)
        ref_d, ref_v = [], []
        heap = []
        counter = itertools.count()
        popped_ref, popped_heap = [], []
        for op in range(60):
            if heap and (rng.random() < 0.4 or op > 40):
                d_r, v_r = ref_d.pop(0), ref_v.pop(0)
                _, _, v_h = heapq.heappop(heap)
                popped_ref.append((d_r, v_r))
                popped_heap.append(v_h)
            else:
                d = float(rng.choice(dist_pool))
                v = op
                idx = next((i for i, x in enumerate(ref_d) if x >= d),
                           len(ref_d))
                ref_d.insert(idx, d)
                ref_v.insert(idx, v)
                heapq.heappush(heap, (d, -next(counter), v))
        assert [v for _, v in popped_ref] == popped_heap, trial
