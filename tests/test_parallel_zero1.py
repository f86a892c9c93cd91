"""ZeRO-1 sharded-optimizer tests (SURVEY.md §2.3 additive parallelism).

The reference is single-GPU; this layer is TPU-native extra capability:
params replicated, Adam moments sharded over the 1-D ray mesh, collectives
inserted by GSPMD from sharding constraints alone. The contract under
test: (a) training with ZeRO-1 is numerically equivalent to the replicated
run, (b) the moments really are sharded (memory is actually saved).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from apnerf.models import tineuvox
from apnerf.parallel import mesh as pmesh
from apnerf.train import stage1
from apnerf.train.masked_adam import create_optimizer

# heavier CPU tier (VERDICT r3 #7): default `pytest -q` stays <3 min
pytestmark = pytest.mark.integration


def _tiny_setup():
    # num_voxels 4500 (~16.5^3) -> world_size (16, 16, 16): the leading grid
    # axis divides the 8-device mesh so the feature moments actually shard
    # (16^3 fp-truncates to 15^3 and 17^3 gives 17^3 — neither has a
    # divisible axis)
    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=4500,
        num_voxels_base=4500, voxel_dim=4, defor_depth=2, net_width=32,
        posbase_pe=4, viewbase_pe=2, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg_model)
    params["feature"] = params["feature"] + 0.05
    cfg_train = {
        "_stepsize": 0.5, "lrate_decay": 20, "N_rand": 32,
        "lrate_feature": 8e-2, "lrate_featurenet": 8e-4,
        "lrate_deformation_net": 6e-4, "lrate_densitynet": 8e-4,
        "lrate_timenet": 8e-4, "lrate_rgbnet": 8e-4,
        "weight_main": 1.0, "weight_entropy_last": 1e-3,
        "weight_rgbper": 1e-2, "weight_distortion": 5e-2,
        "weight_mask_loss": 0.0, "weight_tv_feature": 1e-4,
        "skip_zero_grad_fields": ["feature"],
    }
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 3.0
    K = np.array([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]], np.float32)
    Ks = np.stack([K, K])
    rng = np.random.default_rng(0)
    B = 32
    batch = {
        "rgb": rng.uniform(size=(B, 3)).astype(np.float32),
        "mask": np.ones(B, np.float32),
        "time": np.zeros(B, np.float32),
        "cam": (np.arange(B) % 2).astype(np.int32),
        "pix": rng.integers(0, 32 * 32, B).astype(np.int32),
    }
    return cfg_model, params, cfg_train, jnp.asarray(Ks), jnp.asarray(poses), batch


def test_zero1_spec_picks_divisible_axis():
    assert pmesh._zero1_spec((16, 16, 16, 4), 8, 1) == P("rays")
    # leading axis indivisible -> first divisible one
    assert pmesh._zero1_spec((3, 24, 5), 8, 1) == P(None, "rays")
    # nothing divisible -> replicated
    assert pmesh._zero1_spec((3, 5, 7), 8, 1) == P()
    # small leaves stay replicated
    assert pmesh._zero1_spec((16,), 8, 8192) == P()


def test_zero1_train_matches_replicated():
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 cpu devices")
    cfg_model, params, cfg_train, Ks, poses, batch = _tiny_setup()
    mesh = Mesh(np.array(devices[:8]), (pmesh.RAY_AXIS,))

    def run(zero1):
        optimizer = create_optimizer(params, cfg_train)
        p = pmesh.put_replicated(params, mesh)
        opt_state = optimizer.init(params)
        if zero1:
            opt_state = pmesh.put_zero1(opt_state, mesh, min_size=1024)
            step = stage1.make_train_step(
                cfg_model, cfg_train, optimizer, Ks, poses, 32, 32,
                0.5, 6.0, 1.0, zero1_mesh=mesh)
        else:
            opt_state = pmesh.put_replicated(opt_state, mesh)
            step = stage1.make_train_step(
                cfg_model, cfg_train, optimizer, Ks, poses, 32, 32,
                0.5, 6.0, 1.0)
        b = pmesh.put_ray_sharded(dict(batch), mesh)
        tv_on = jax.device_put(jnp.float32(1.0), pmesh.replicated(mesh))
        losses = []
        for _ in range(3):
            p, opt_state, loss, mse = step(p, opt_state, b, tv_on)
            losses.append(float(loss))
        return p, opt_state, losses

    p_rep, _, losses_rep = run(zero1=False)
    p_z, os_z, losses_z = run(zero1=True)

    np.testing.assert_allclose(losses_z, losses_rep, rtol=1e-5)
    for k in p_rep:
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(p_z[k])[0]),
            np.asarray(jax.tree_util.tree_leaves(p_rep[k])[0]),
            rtol=2e-5, atol=1e-6, err_msg=k)

    # the big moments must actually be sharded after the step
    mu_feat = os_z.mu["feature"]
    spec = mu_feat.sharding.spec
    assert pmesh.RAY_AXIS in tuple(spec), spec
    # a shard holds 1/8 of the rows
    shard_shape = mu_feat.sharding.shard_shape(mu_feat.shape)
    assert int(np.prod(shard_shape)) == mu_feat.size // 8


def test_put_zero1_placement():
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 cpu devices")
    mesh = Mesh(np.array(devices[:8]), (pmesh.RAY_AXIS,))
    tree = {"big": jnp.zeros((64, 256)), "small": jnp.zeros((4,)),
            "odd": jnp.zeros((17, 1031))}
    placed = pmesh.put_zero1(tree, mesh, min_size=1024)
    assert pmesh.RAY_AXIS in tuple(placed["big"].sharding.spec)
    assert tuple(placed["small"].sharding.spec) == ()
    # nothing divisible: replicated, but still placed on the mesh
    assert tuple(placed["odd"].sharding.spec) == ()


def test_zero1_stage2_matches_replicated():
    """The stage-2 step has its own ZeRO-1 branch; verify numerics match
    the replicated run and the step executes with sharded moments."""
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 cpu devices")
    from apnerf.models import temporal_points as tp
    from apnerf.models import tineuvox as tnv
    from apnerf.train import stage2
    import apnerf.ops.nn as onn

    mesh = Mesh(np.array(devices[:8]), (pmesh.RAY_AXIS,))
    P_pts, J, F = 96, 5, 8
    rng = np.random.default_rng(1)
    pcd = rng.normal(size=(P_pts, 3)).astype(np.float32) * 0.3
    joints = rng.normal(size=(J, 3)).astype(np.float32) * 0.3
    bones = [[0, 1], [1, 2], [0, 3], [3, 4]]
    feat = rng.normal(size=(P_pts, F)).astype(np.float32)
    mcfg = tp.TemporalPointsConfig(
        n_points=P_pts, n_joints=J, feat_dim=F, neighbours=4,
        timebase_pe=2, posbase_pe=4, viewbase_pe=2, stepsize=0.5,
        voxel_size=0.125, voxel_size_ratio=1.0, act_shift=-6.9,
        sample_budget=16, max_steps=64)
    k = jax.random.PRNGKey(2)
    ks = jax.random.split(k, 3)
    tnv_params = {
        "rgbnet": tnv.init_rgbnet(ks[0], F, mcfg.views_ch),
        "densitynet": onn.init_mlp(ks[1], [F, 1]),
        "timenet": onn.init_mlp(ks[2], [mcfg.t_dim, 16, F]),
    }
    params0 = tp.init_params(jax.random.PRNGKey(3), mcfg, pcd, joints, bones,
                             feat, np.ones(P_pts, np.float32) * 0.5,
                             np.ones((P_pts, 3), np.float32) * 0.5,
                             tnv_params)
    state = tp.init_state(mcfg, pcd, joints, bones, pcd[:16],
                          pcd.min(0) - 0.2, pcd.max(0) + 0.2)
    st2 = {k2: v for k2, v in state.items()
           if k2 != "bones" and v is not None}
    st2["bones"] = state["bones"]
    st2["frozen_view_dir"] = None
    cfg2 = {
        "lrate_decay": 160, "weight_render": 2e2, "weight_arap": 5e-3,
        "weight_tv": 1e1, "weight_sparsity": 2e-1,
        "weight_transformation_reg": 1e-1, "weight_joint_chamfer": 1.0,
        "weight_chamfer2D": 5e-3, "lrate_rgbnet": 1e-4,
        "lrate_densitynet": 1e-4, "lrate_canonical_feat": 1e-4,
        "lrate_gammas": 1e-3, "lrate_weights": 1e-4,
        "lrate_theta_weight": 1e-4, "lrate_forward_warp": 1e-4,
        "lrate_joints": 1e-5, "lrate_feat_net": 1e-3,
        "skip_zero_grad_fields": [],
    }
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 3.0
    Kc = np.array([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]], np.float32)
    Ks = jnp.asarray(np.stack([Kc, Kc]))
    poses_j = jnp.asarray(poses)
    B = 64
    batch_np = {
        "rgb": np.ones((B, 3), np.float32) * 0.5,
        "mask": np.ones(B, np.float32),
        "t": np.float32(0.25),
        "cam": (np.arange(B) % 2).astype(np.int32),
        "pix": rng.integers(0, 32 * 32, B).astype(np.int32),
        "sparsity_on": np.float32(1.0),
        "chamfer_poses": poses_j,
        "chamfer_Ks": Ks,
        "chamfer_mask_pts": jnp.asarray(
            rng.uniform(0, 32, (2, 64, 2)).astype(np.float32)),
        "chamfer_pcd_idx": jnp.asarray(
            rng.integers(0, P_pts, 64).astype(np.int32)),
    }

    from apnerf.train.masked_adam import create_optimizer

    def run(zero1):
        opt = create_optimizer(params0, cfg2)
        p = pmesh.put_replicated(params0, mesh)
        st = pmesh.put_replicated(
            {k2: v for k2, v in st2.items()
             if k2 not in ("bones", "frozen_view_dir")}, mesh)
        st["bones"] = st2["bones"]
        st["frozen_view_dir"] = None
        os_ = opt.init(params0)
        kw = {}
        if zero1:
            os_ = pmesh.put_zero1(os_, mesh, min_size=64)
            kw = dict(zero1_mesh=mesh, zero1_min_size=64)
        else:
            os_ = pmesh.put_replicated(os_, mesh)
        step = stage2.make_train_step(
            mcfg, st, cfg2, opt, pmesh.put_replicated(Ks, mesh),
            pmesh.put_replicated(poses_j, mesh), 32, 32, 0.5, 6.0, 1.0,
            n_chamfer_views=2, **kw)
        b = pmesh.put_ray_sharded(dict(batch_np), mesh)
        losses = []
        for _ in range(2):
            p, os_, metrics = step(p, os_, b)
            losses.append(float(metrics["loss"]))
        return p, os_, losses

    p_rep, _, losses_rep = run(zero1=False)
    p_z, os_z, losses_z = run(zero1=True)
    np.testing.assert_allclose(losses_z, losses_rep, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_z["canonical_feat"]), np.asarray(p_rep["canonical_feat"]),
        rtol=2e-5, atol=1e-6)
    # moments sharded: canonical_feat [96, 8] with min_size 64 -> P('rays')
    assert pmesh.RAY_AXIS in tuple(os_z.mu["canonical_feat"].sharding.spec)
