"""Stage-2 model tests: warper kinematics, compaction, aggregation,
losses, skeleton simplification."""
import numpy as np
import jax
import jax.numpy as jnp

from apnerf.models import point_warper as pw
from apnerf.models import temporal_points as tp
from apnerf.models import tineuvox
import apnerf.ops.nn as onn


def _toy_model(P=64, J=4, F=8, seed=0):
    rng = np.random.default_rng(seed)
    joints = np.array([[0, 0, 0], [0.3, 0, 0], [0.6, 0, 0], [0.3, 0.3, 0]],
                      np.float32)[:J]
    bones = [[0, 1], [1, 2], [1, 3]][: J - 1]
    seg = rng.integers(0, J, P)
    pcd = (joints[seg] + rng.normal(size=(P, 3)) * 0.05).astype(np.float32)
    feat = rng.normal(size=(P, F)).astype(np.float32)
    mcfg = tp.TemporalPointsConfig(
        n_points=P, n_joints=J, feat_dim=F, neighbours=4, timebase_pe=2,
        posbase_pe=4, viewbase_pe=2, stepsize=0.5, voxel_size=0.05,
        voxel_size_ratio=1.0, act_shift=-3.0, sample_budget=16, max_steps=64)
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 3)
    tnv = {
        "rgbnet": tineuvox.init_rgbnet(ks[0], F, mcfg.views_ch),
        "densitynet": onn.init_mlp(ks[1], [F, 1]),
        "timenet": onn.init_mlp(ks[2], [mcfg.t_dim, 16, 8]),
    }
    params = tp.init_params(jax.random.PRNGKey(2), mcfg, pcd, joints, bones,
                            feat, np.full(P, 0.5, np.float32),
                            np.full((P, 3), 0.5, np.float32), tnv)
    state = tp.init_state(mcfg, pcd, joints, bones, pcd[:8],
                          pcd.min(0) - 0.2, pcd.max(0) + 0.2)
    return params, mcfg, state, pcd, joints, bones


def test_warp_identity_rotations():
    params, mcfg, state, pcd, joints, bones = _toy_model()
    rot = np.zeros((mcfg.n_joints, 4), np.float32)
    rot[:, 0] = 1.0   # axis x, angle 0 -> identity
    out = tp.warp(params, mcfg, state, rot_params=jnp.asarray(rot))
    np.testing.assert_allclose(np.asarray(out["xyz"]), pcd, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["joints_rel"]), joints,
                               atol=1e-4)
    # identity frames
    fr = np.asarray(out["frames"])
    np.testing.assert_allclose(fr[:, :3, :3],
                               np.eye(3)[None].repeat(len(pcd), 0), atol=1e-4)


def test_warp_root_rotation_rotates_cloud():
    params, mcfg, state, pcd, joints, bones = _toy_model()
    rot = np.zeros((mcfg.n_joints, 4), np.float32)
    rot[:, 0] = 1.0
    theta = 0.7
    rot[0] = [0, 0, 1, theta]   # rotate root about z
    out = tp.warp(params, mcfg, state, rot_params=jnp.asarray(rot))
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    # root rotation acts about joint 0 (origin here) on every point
    expected = pcd @ R.T
    np.testing.assert_allclose(np.asarray(out["xyz"]), expected, atol=1e-3)


def test_chain_product_matches_sequential():
    rng = np.random.default_rng(3)
    mats = rng.normal(size=(5, 7, 4, 4)).astype(np.float32)
    out = np.asarray(pw.chain_product(jnp.asarray(mats)))
    for r in range(5):
        ref = np.eye(4)
        for i in range(7):
            ref = ref @ mats[r, i]
        np.testing.assert_allclose(out[r], ref, rtol=1e-3, atol=1e-4)


def test_compact_per_ray():
    valid = jnp.asarray(np.array([
        [0, 1, 1, 0, 1, 0],
        [0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 1, 1],
    ], bool))
    src = np.asarray(tp._compact_per_ray(valid, 3))
    np.testing.assert_array_equal(src[0], [1, 2, 4])
    np.testing.assert_array_equal(src[1], [6, 6, 6])   # sentinel = S
    np.testing.assert_array_equal(src[2], [0, 1, 2])


def test_get_weights_merging():
    params, mcfg, state, *_ = _toy_model()
    w0 = np.asarray(tp.get_weights(params, mcfg, state))
    np.testing.assert_allclose(w0.sum(1), 1.0, rtol=1e-5)
    # merge joint 2's weight into joint 1
    mm = np.eye(mcfg.n_joints, dtype=np.float32)
    mm[2, 2] = 0.0
    mm[2, 1] = 1.0
    state2 = dict(state)
    state2["merge_mat"] = jnp.asarray(mm)
    w1 = np.asarray(tp.get_weights(params, mcfg, state2))
    np.testing.assert_allclose(w1[:, 1], w0[:, 1] + w0[:, 2], rtol=1e-5)
    np.testing.assert_allclose(w1[:, 2], 0.0, atol=1e-7)


def test_forward_misses_render_background():
    params, mcfg, state, *_ = _toy_model()
    # rays pointing away from the cloud
    ro = jnp.asarray(np.tile([[5.0, 5.0, 5.0]], (8, 1)).astype(np.float32))
    rd = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (8, 1)).astype(np.float32))
    out = tp.forward(params, mcfg, state, ro, rd, rd, t=jnp.float32(0.2),
                     near=0.1, far=10.0, bg=1.0)
    np.testing.assert_allclose(np.asarray(out["rgb_marched"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["alphainv_last"]), 1.0,
                               atol=1e-6)


def test_forward_hits_and_losses():
    params, mcfg, state, pcd, joints, bones = _toy_model()
    center = pcd.mean(0)
    ro = np.tile(center + [0, 0, 2.0], (16, 1)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (16, 1)).astype(np.float32)
    # spread rays slightly
    rd[:, 0] = np.linspace(-0.05, 0.05, 16)

    def loss_fn(params):
        out = tp.forward(params, mcfg, state, jnp.asarray(ro),
                         jnp.asarray(rd), jnp.asarray(rd),
                         t=jnp.float32(0.3), near=0.1, far=10.0, bg=1.0,
                         query_radius=0.05)
        loss = (out["rgb_marched"] ** 2).mean()
        loss = loss + tp.arap_loss(state, out["t_hat_pcd"])
        loss = loss + tp.neighbour_weight_tv_loss(state, out["lbs_weights"])
        loss = loss + tp.weight_sparsity_loss(out["lbs_weights"])
        loss = loss + tp.transformation_reg_loss(out["global_t"],
                                                 out["thetas"])
        loss = loss + tp.joint_chamfer_loss(state, params["joints"])
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_simplify_skeleton_prunes():
    params, mcfg, state, *_ = _toy_model()
    times = np.linspace(0, 1, 12)
    new_state, info = tp.simplify_skeleton(params, mcfg, state, times,
                                           deg_threshold=1e6)
    # with an absurd threshold everything but root is zero-motion
    assert info["prune_bones"][1:].all()
    assert not info["prune_bones"][0]
    assert np.asarray(new_state["rot_mask"])[1:].all()
    w = np.asarray(tp.get_weights(params, mcfg, new_state))
    np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-5)


def test_batch_chamfer_2d():
    a = jnp.asarray(np.zeros((2, 4, 2), np.float32))
    b = jnp.asarray(np.ones((2, 5, 2), np.float32))
    val = float(tp.batch_chamfer_2d(a, b))
    np.testing.assert_allclose(val, 4.0, rtol=1e-5)   # 2 + 2
