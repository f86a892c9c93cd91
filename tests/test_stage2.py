"""Stage-2 model tests: warper kinematics, compaction, aggregation,
losses, skeleton simplification."""
import numpy as np
import jax
import jax.numpy as jnp

from apnerf.models import point_warper as pw
from apnerf.models import temporal_points as tp
from apnerf.models import tineuvox
import apnerf.ops.nn as onn
import pytest

# heavier CPU tier (VERDICT r3 #7): default `pytest -q` stays <3 min
pytestmark = pytest.mark.integration


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


def test_avg_procrustes_changes_warp():
    """cfg.avg_procrustes must reach point_warper.forward (reference
    run.py:499 -> lib/pointwarper.py:246-250), not be a silent no-op."""
    import dataclasses
    params, mcfg, state, pcd, joints, bones = _toy_model()
    # flatten the skinning weights (high softmax temperature): near-one-hot
    # weights make the blend a pure rotation and procrustes a no-op
    params = dict(params)
    params["theta_weight"] = jnp.asarray([10.0], jnp.float32)
    rot = np.zeros((mcfg.n_joints, 4), np.float32)
    rot[:, 0] = 1.0
    rot[1] = [0, 0, 1, 0.8]   # bend one joint -> blended frames non-rotation
    out0 = tp.warp(params, mcfg, state, rot_params=jnp.asarray(rot))
    mcfg_p = dataclasses.replace(mcfg, avg_procrustes=True)
    out1 = tp.warp(params, mcfg_p, state, rot_params=jnp.asarray(rot))
    assert not np.allclose(np.asarray(out0["xyz"]), np.asarray(out1["xyz"]))
    # procrustes frames are orthonormal rotations
    fr = np.asarray(out1["frames"])[:, :3, :3]
    eye = np.einsum("pab,pcb->pac", fr, fr)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(len(fr), 0),
                               atol=1e-4)


def test_re_init_mlps_resets_heads():
    """cfg.re_init_mlps must re-initialise the shared backbone heads
    (reference lib/temporalpoints.py:137-146), not silently copy them."""
    import dataclasses
    params, mcfg, state, pcd, joints, bones = _toy_model()
    rng = np.random.default_rng(0)
    F = mcfg.feat_dim
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 3)
    tnv = {
        "rgbnet": tineuvox.init_rgbnet(ks[0], F, mcfg.views_ch),
        "densitynet": onn.init_mlp(ks[1], [F, 1]),
        "timenet": onn.init_mlp(ks[2], [mcfg.t_dim, 16, 8]),
    }
    feat = rng.normal(size=(mcfg.n_points, F)).astype(np.float32)
    common = dict(canonical_pcd=pcd, joints=joints, bones=bones,
                  canonical_feat=feat,
                  canonical_alpha=np.full(mcfg.n_points, 0.5, np.float32),
                  canonical_rgbs=np.full((mcfg.n_points, 3), 0.5, np.float32),
                  tineuvox_params=tnv)
    p_copy = tp.init_params(jax.random.PRNGKey(2), mcfg, **common)
    mcfg_r = dataclasses.replace(mcfg, re_init_mlps=True)
    p_re = tp.init_params(jax.random.PRNGKey(2), mcfg_r, **common)
    for name in ("rgbnet", "densitynet", "timenet"):
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: jnp.allclose(a, b), p_copy[name], p_re[name]))
        assert not same, f"{name} was not re-initialised"
        # shapes preserved
        jax.tree_util.tree_map(lambda a, b: None if a.shape == b.shape
                               else pytest_fail(name),
                               p_copy[name], p_re[name])
    # the copy path still matches the backbone params bit-for-bit
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.allclose(a, b), p_copy["rgbnet"], tnv["rgbnet"]))


def pytest_fail(name):
    raise AssertionError(f"shape mismatch after re-init of {name}")


def test_coarse_group_guard_stays_conservative():
    """When (coarse_stride-1)/2*stepdist > occ_cell the group-centre
    occupancy test is not conservative; sample_rays_compact must fall back
    to per-member testing so no sample the reference keeps is pruned
    (ADVICE r2, medium)."""
    import dataclasses
    rng = np.random.default_rng(5)
    pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    radius = 0.01
    # big voxel_size -> stepdist 0.15 per step; group half-width (c=8) is
    # 0.525 >> occ_cell (max extent/occ_res floored at sqrt(radius)=0.1)
    mcfg = tp.TemporalPointsConfig(
        n_points=500, n_joints=2, feat_dim=8, stepsize=0.5, voxel_size=0.3,
        voxel_size_ratio=1.0, act_shift=-3.0, sample_budget=16, max_steps=64,
        coarse_stride=8, occ_res=64)
    bb_min = jnp.asarray(pts.min(0) - radius)
    bb_max = jnp.asarray(pts.max(0) + radius)
    occ, cell = tp.build_occupancy(jnp.asarray(pts), bb_min, bb_max, radius,
                                   occ_res=mcfg.occ_res)
    assert (mcfg.coarse_stride - 1) / 2 * 0.15 > float(cell)  # guard active
    ro = np.tile(pts.mean(0) + [0, 0, 2.0], (32, 1)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (32, 1)).astype(np.float32)
    rd[:, 0] = np.linspace(-0.2, 0.2, 32)
    pts_c, valid_c, step_c = tp.sample_rays_compact(
        mcfg, jnp.asarray(ro), jnp.asarray(rd), 0.1, 10.0, bb_min, bb_max,
        occ=occ, occ_cell=cell)
    step_c = np.asarray(step_c)
    valid_c = np.asarray(valid_c)

    # ground truth: all S per-ray sample positions; the reference keeps any
    # sample within sqrt(radius) of a point — the occupancy prefilter (and
    # the group-centre shortcut) must not prune those
    from apnerf.ops.rays import ray_aabb
    stepdist = mcfg.stepsize * mcfg.voxel_size
    t_lo, t_hi = ray_aabb(jnp.asarray(ro), jnp.asarray(rd), bb_min, bb_max,
                          0.1, 10.0)
    t_lo, t_hi = np.asarray(t_lo), np.asarray(t_hi)
    n_steps = np.maximum(np.ceil((t_hi - t_lo) / stepdist), 1.0)
    unit = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    steps = np.arange(mcfg.max_steps, dtype=np.float32)
    start = ro + rd * t_lo[:, None]
    pall = (start[:, None, :] + unit[:, None, :]
            * steps[None, :, None] * stepdist)
    d2all = ((pall[:, :, None, :] - pts[None, None]) ** 2).sum(-1).min(2)
    # the reference's own keep-set: near the cloud AND inside the sampling
    # bbox AND within the ray's step range (its sampler clips to the bbox
    # crossing too); a small epsilon avoids fp boundary flicker
    in_bb = np.all((pall >= np.asarray(bb_min) + 1e-6)
                   & (pall <= np.asarray(bb_max) - 1e-6), -1)
    near = (d2all <= radius) & in_bb & (steps[None, :] < n_steps[:, None])
    for r in range(len(ro)):
        need = set(np.nonzero(near[r])[0].tolist())
        if not need:
            continue
        got = set(step_c[r][valid_c[r]].astype(int).tolist())
        missing = need - got
        # budget may legitimately truncate; only flag drops when the
        # emitted set is under budget (room was available)
        if valid_c[r].sum() < mcfg.sample_budget:
            assert not missing, (r, sorted(missing))


def test_pass_compaction_equivalence():
    """The post-KNN pass-compaction (aggregate only radius-passing samples)
    must not change the render when the pass budget is not exceeded."""
    import dataclasses
    params, mcfg, state, pcd, joints, bones = _toy_model(P=256)
    # big enough M_act that pass_fraction=0.5 takes the compacted branch
    mcfg_full = dataclasses.replace(mcfg, sample_budget=16, max_steps=64,
                                    active_fraction=1.0, pass_fraction=1.0)
    mcfg_cmp = dataclasses.replace(mcfg_full, pass_fraction=0.5)
    center = pcd.mean(0)
    R = 128
    ro = np.tile(center + [0, 0, 2.0], (R, 1)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (R, 1)).astype(np.float32)
    # wide fan: only the central rays cross the cloud, so the number of
    # radius-passing samples stays well under the 1024 pass budget
    rd[:, 0] = np.linspace(-1.5, 1.5, R)
    args = (jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(rd))
    kw = dict(t=jnp.float32(0.3), near=0.1, far=10.0, bg=1.0,
              query_radius=0.05, render_depth=True)
    out_f = tp.forward(params, mcfg_full, state, *args, **kw)
    out_c = tp.forward(params, mcfg_cmp, state, *args, **kw)
    # sanity: some rays hit, and the pass budget was not exceeded
    n_hit = int((np.asarray(out_f["weights_per_sample"]) > 0).sum())
    assert 0 < n_hit < 1024, n_hit
    np.testing.assert_allclose(np.asarray(out_c["rgb_marched"]),
                               np.asarray(out_f["rgb_marched"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c["depth"]),
                               np.asarray(out_f["depth"]), atol=1e-4)


def test_group_prefilter_equivalence():
    """The hierarchical group-level kth-neighbour prefilter prunes only
    groups whose members cannot pass the sample-level radius cutoff — the
    render must be unchanged vs the prefilter disabled."""
    import dataclasses
    params, mcfg, state, pcd, joints, bones = _toy_model(P=256)
    mcfg_off = dataclasses.replace(mcfg, group_pass_fraction=0.0)
    center = pcd.mean(0)
    R = 64
    ro = np.tile(center + [0, 0, 2.0], (R, 1)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (R, 1)).astype(np.float32)
    rd[:, 0] = np.linspace(-0.4, 0.4, R)
    args = (jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(rd))
    kw = dict(t=jnp.float32(0.3), near=0.1, far=10.0, bg=1.0,
              query_radius=0.05, render_depth=True)
    out_on = tp.forward(params, mcfg, state, *args, **kw)
    out_off = tp.forward(params, mcfg_off, state, *args, **kw)
    assert float(np.asarray(out_off["weights_per_sample"]).sum()) > 0
    np.testing.assert_allclose(np.asarray(out_on["rgb_marched"]),
                               np.asarray(out_off["rgb_marched"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_on["depth"]),
                               np.asarray(out_off["depth"]), atol=1e-4)


def test_occupancy_tightening_equivalence():
    """Finer occupancy cells + more dilation rounds prune only samples that
    cannot pass the radius cutoff — the render must be unchanged."""
    import dataclasses
    params, mcfg, state, pcd, joints, bones = _toy_model()
    mcfg_t = dataclasses.replace(mcfg, occ_res=128, occ_dilations=6)
    center = pcd.mean(0)
    R = 32
    ro = np.tile(center + [0, 0, 2.0], (R, 1)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (R, 1)).astype(np.float32)
    rd[:, 0] = np.linspace(-0.15, 0.15, R)
    args = (jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(rd))
    kw = dict(t=jnp.float32(0.3), near=0.1, far=10.0, bg=1.0,
              query_radius=0.05, render_depth=True)
    out0 = tp.forward(params, mcfg, state, *args, **kw)
    out1 = tp.forward(params, mcfg_t, state, *args, **kw)
    assert float(np.asarray(out0["weights_per_sample"]).sum()) > 0
    np.testing.assert_allclose(np.asarray(out1["rgb_marched"]),
                               np.asarray(out0["rgb_marched"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["depth"]),
                               np.asarray(out0["depth"]), atol=1e-4)


def test_batch_chamfer_2d():
    a = jnp.asarray(np.zeros((2, 4, 2), np.float32))
    b = jnp.asarray(np.ones((2, 5, 2), np.float32))
    val = float(tp.batch_chamfer_2d(a, b))
    np.testing.assert_allclose(val, 4.0, rtol=1e-5)   # 2 + 2


def test_budget_knobs_flow_from_config():
    """coarse_stride / group_pass_fraction / active_fraction /
    pass_fraction set in pcd_model_and_render must reach the built
    TemporalPointsConfig (no silent no-op keys)."""
    import jax
    import apnerf.ops.nn as onn
    from apnerf.config.config import load_config
    from apnerf.models import tineuvox as tnv
    from apnerf.train import stage2

    cfg = load_config("apnerf/config/configs/nerf/jumpingjacks.py")
    cfg.pcd_model_and_render.coarse_stride = 4
    cfg.pcd_model_and_render.group_pass_fraction = 0.25
    cfg.pcd_model_and_render.active_fraction = 0.5
    cfg.pcd_model_and_render.pass_fraction = 0.4
    cfg.pcd_model_and_render.sample_budget = 16
    cfg.pcd_model_and_render.knn_share = 2
    cfg.pcd_model_and_render.knn_cand = 10

    P, J, F = 64, 4, 8
    rng = np.random.default_rng(0)
    pcd = rng.normal(size=(P, 3)).astype(np.float32) * 0.3
    joints = rng.normal(size=(J, 3)).astype(np.float32) * 0.3
    canonical = {
        "pcd": pcd, "feat": rng.normal(size=(P, F)).astype(np.float32),
        "alphas": np.full(P, 0.5, np.float32),
        "rgbs": np.full((P, 3), 0.5, np.float32),
        "xyz_min": pcd.min(0) - 0.2, "xyz_max": pcd.max(0) + 0.2,
        "voxel_size": 0.125,
    }
    skeleton = {"joints": joints, "bones": [[0, 1], [1, 2], [2, 3]],
                "skeleton_pcd": pcd[:8]}
    tcfg = tnv.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=F, defor_depth=2, net_width=F,
        posbase_pe=4, viewbase_pe=2, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 3)
    tnv_params = {
        "rgbnet": tnv.init_rgbnet(ks[0], F, tcfg.views_ch),
        "densitynet": onn.init_mlp(ks[1], [F, 1]),
        "timenet": onn.init_mlp(ks[2], [1 + 2 * tcfg.timebase_pe, 16, F]),
    }
    mcfg, params, state = stage2.build_model(
        cfg, canonical, skeleton, tnv_params, tcfg)
    assert mcfg.coarse_stride == 4
    assert mcfg.group_pass_fraction == 0.25
    assert mcfg.active_fraction == 0.5
    assert mcfg.pass_fraction == 0.4
    assert mcfg.knn_share == 2
    assert mcfg.knn_cand == 10


def _fwd(params, mcfg, state, seed=3, **kw):
    rng = np.random.default_rng(seed)
    state = dict(state)
    ro = np.tile(np.asarray(state["canonical_pcd"]).mean(0) + [0, 0, 2.0],
                 (16, 1)).astype(np.float32)
    rd = np.tile([[0.0, 0.0, -1.0]], (16, 1)).astype(np.float32)
    rd[:, 0] = np.linspace(-0.08, 0.08, 16)
    return tp.forward(params, mcfg, state, jnp.asarray(ro), jnp.asarray(rd),
                      jnp.asarray(rd), t=jnp.float32(0.3), near=0.1,
                      far=10.0, bg=1.0, query_radius=0.05, **kw)


def test_knn_share_full_candidates_matches_exact():
    """With knn_cand = n_points every sample's true k-NN set is among the
    shared candidates, so the subgroup-shared path must reproduce the
    exact per-sample path (up to fp summation order)."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model()
    base = _fwd(params, mcfg, state, render_pcd_direct=True)
    mcfg_s = dataclasses.replace(mcfg, knn_share=4, knn_cand=mcfg.n_points)
    shared = _fwd(params, mcfg_s, state, render_pcd_direct=True)
    for key in ("rgb_marched", "alphainv_last", "rgb_marched_direct"):
        if key not in base:
            continue
        np.testing.assert_allclose(
            np.asarray(shared[key]), np.asarray(base[key]),
            rtol=2e-4, atol=2e-4, err_msg=key)


def test_knn_share_cand_equals_k_fast_path():
    """knn_cand == neighbours takes the rank-free fast path (every candidate
    is a selected neighbour). With K = n_points the candidate set is the
    whole cloud for rep and members alike, so the fast path must reproduce
    the exact per-sample path up to fp summation order; invalid-slot
    semantics (weight underflow + kd2 = inf) are covered by the same
    comparison wherever a rep has < K in-radius candidates."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model(P=8)
    mcfg_e = dataclasses.replace(mcfg, neighbours=8)
    base = _fwd(params, mcfg_e, state)
    mcfg_s = dataclasses.replace(mcfg, neighbours=8, knn_share=4, knn_cand=8)
    shared = _fwd(params, mcfg_s, state)
    for key in ("rgb_marched", "alphainv_last"):
        np.testing.assert_allclose(
            np.asarray(shared[key]), np.asarray(base[key]),
            rtol=2e-4, atol=2e-4, err_msg=key)


def test_knn_share_cand_equals_k_trainable():
    """kc = K = 4 on the full toy cloud: the approximation stays small and
    gradients flow through the fast path."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model()
    base = _fwd(params, mcfg, state)
    mcfg_s = dataclasses.replace(mcfg, knn_share=4, knn_cand=4)
    shared = _fwd(params, mcfg_s, state)
    diff = np.abs(np.asarray(shared["rgb_marched"])
                  - np.asarray(base["rgb_marched"]))
    assert np.isfinite(np.asarray(shared["rgb_marched"])).all()
    assert diff.mean() < 0.03, diff.mean()

    def loss_fn(p):
        out = _fwd(p, mcfg_s, state)
        return (out["rgb_marched"] ** 2).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
    assert np.isfinite(gsum) and gsum > 0


def test_fused_group_sampler_matches_legacy_pair(monkeypatch):
    """_sample_groups_fused (positions only for selected groups, midpoint
    reps, tighter prefilter bound) vs the sample_rays_compact +
    compact_active pair: on a non-truncating scene the composited outputs
    must agree — selection-order deltas only matter at budget-truncation
    boundaries, and the tighter prefilter can only prune groups whose
    samples fail the kd2 cutoff anyway."""
    params, mcfg, state, *_ = _toy_model()
    fused = _fwd(params, mcfg, state, render_pcd_direct=True)
    monkeypatch.setenv("APNERF_FUSED_SAMPLER", "0")
    legacy = _fwd(params, mcfg, state, render_pcd_direct=True)
    for key in ("rgb_marched", "alphainv_last", "depth",
                "rgb_marched_direct"):
        if key not in legacy:
            continue
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(legacy[key]),
            rtol=2e-5, atol=2e-5, err_msg=key)


def test_fused_group_sampler_matches_legacy_shared(monkeypatch):
    """Same equivalence through the subgroup-shared aggregation path."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model()
    mcfg_s = dataclasses.replace(mcfg, knn_share=2, knn_cand=10)
    fused = _fwd(params, mcfg_s, state)
    monkeypatch.setenv("APNERF_FUSED_SAMPLER", "0")
    legacy = _fwd(params, mcfg_s, state)
    for key in ("rgb_marched", "alphainv_last"):
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(legacy[key]),
            rtol=2e-5, atol=2e-5, err_msg=key)


def test_fused_agg_full_forward_matches_xla(monkeypatch):
    """End-to-end forward through the fused Pallas aggregation (forced into
    interpret mode off-TPU) vs the XLA shared path: same model, same rays,
    composited images must agree within bf16 tolerance."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model()
    mcfg_s = dataclasses.replace(mcfg, knn_share=4, knn_cand=10,
                                 fused_agg=False)
    base = _fwd(params, mcfg_s, state)
    monkeypatch.setenv("APNERF_FUSED_AGG", "force")
    mcfg_f = dataclasses.replace(mcfg_s, fused_agg=True)
    fused = _fwd(params, mcfg_f, state)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        if key not in base:
            continue
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(base[key]),
            rtol=2e-2, atol=2e-2, err_msg=key)


def test_knn_share_small_candidates_close_and_trainable():
    """kc = 12 shared candidates: the approximation must stay visually
    small on the toy scene and gradients must flow."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model()
    base = _fwd(params, mcfg, state)
    mcfg_s = dataclasses.replace(mcfg, knn_share=4, knn_cand=12)
    shared = _fwd(params, mcfg_s, state)
    diff = np.abs(np.asarray(shared["rgb_marched"])
                  - np.asarray(base["rgb_marched"]))
    assert np.isfinite(np.asarray(shared["rgb_marched"])).all()
    assert diff.mean() < 0.02, diff.mean()

    def loss_fn(p):
        out = _fwd(p, mcfg_s, state)
        return (out["rgb_marched"] ** 2).mean() + out["lbs_weights"].sum() * 0

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
    assert np.isfinite(gsum) and gsum > 0


def test_featmlp_kernel_full_forward_matches_xla_shared(monkeypatch):
    """End-to-end forward with the fused PE+feat_net+reduce kernel (forced
    into interpret mode off-TPU) vs the XLA shared-KNN path."""
    import dataclasses
    params, mcfg, state, *_ = _toy_model()
    mcfg_s = dataclasses.replace(mcfg, knn_share=4, knn_cand=10)
    monkeypatch.setenv("APNERF_FEATMLP", "0")
    base = _fwd(params, mcfg_s, state)
    monkeypatch.setenv("APNERF_FEATMLP", "force")
    fused = _fwd(params, mcfg_s, state)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        if key not in base:
            continue
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(base[key]),
            rtol=2e-2, atol=2e-2, err_msg=key)


def test_featmlp_kernel_full_forward_matches_xla_exact(monkeypatch):
    """Same through the exact per-sample KNN path (knn_share=1)."""
    params, mcfg, state, *_ = _toy_model()
    monkeypatch.setenv("APNERF_FEATMLP", "0")
    base = _fwd(params, mcfg, state)
    monkeypatch.setenv("APNERF_FEATMLP", "force")
    fused = _fwd(params, mcfg, state)
    for key in ("rgb_marched", "alphainv_last", "depth"):
        if key not in base:
            continue
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(base[key]),
            rtol=2e-2, atol=2e-2, err_msg=key)
