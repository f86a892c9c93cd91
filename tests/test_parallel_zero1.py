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
