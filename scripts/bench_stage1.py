import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Microbenchmark: stage-1 train step at jumpingjacks scale (160^3 x 12 grid,
4096 rays, occupancy-pruned active budget). Chained host readbacks for
timing (PERF.md)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from apnerf.models import tineuvox
    from apnerf.ops import compaction
    from apnerf.train import stage1
    from apnerf.train.masked_adam import create_optimizer

    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1.4, -1.4, -1.4), xyz_max=(1.4, 1.4, 1.4),
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, voxel_dim=12,
        defor_depth=3, net_width=256, alpha_init=1e-3, fast_color_thres=1e-4,
        mlp_bf16=os.environ.get("APNERF_S1_BF16", "1") == "1")
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg_model)
    stepsize = 0.5
    n_steps = cfg_model.max_steps(stepsize)
    N_rand = 4096
    cfg_train = {
        "_stepsize": stepsize, "lrate_decay": 20, "N_rand": N_rand,
        "lrate_feature": 8e-2, "lrate_featurenet": 8e-4,
        "lrate_deformation_net": 6e-4, "lrate_densitynet": 8e-4,
        "lrate_timenet": 8e-4, "lrate_rgbnet": 8e-4,
        "weight_main": 1.0, "weight_entropy_last": 1e-3,
        "weight_rgbper": 1e-2, "weight_distortion": 5e-2,
        "weight_mask_loss": 0.0, "weight_tv_feature": 1e-4,
        "skip_zero_grad_fields": ["feature"],
    }
    optimizer = create_optimizer(params, cfg_train)
    opt_state = optimizer.init(params)

    H = W = 400
    K = np.array([[555.0, 0, 200.0], [0, 555.0, 200.0], [0, 0, 1]],
                 np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 3.5

    # occupancy: a centred blob covering ~25% linear extent (bench-scene-ish)
    ws = cfg_model.world_size
    gx = np.linspace(-1, 1, ws[0])[:, None, None]
    gy = np.linspace(-1, 1, ws[1])[None, :, None]
    gz = np.linspace(-1, 1, ws[2])[None, None, :]
    blob = (gx ** 2 + gy ** 2 + gz ** 2) < 0.45 ** 2
    occ = compaction.build_occupancy_grid(jnp.asarray(blob))
    occ = compaction.build_occupancy_grid(occ)
    if int(getattr(cfg_model, "occ_group", 1)) > 1:
        occ = compaction.build_occupancy_grid(occ)  # see stage1.refresh_occupancy

    frac = 0.25
    budget = int(N_rand * n_steps * frac)
    # same compile-safe rounding as stage1.build_segment (2^17 multiples)
    budget = max(4096, budget // 131072 * 131072 or budget // 1024 * 1024)
    import os as _os
    if _os.environ.get("BUDGET_OVERRIDE"): budget = int(_os.environ["BUDGET_OVERRIDE"])
    print(f"n_steps={n_steps} budget={budget} "
          f"({budget / (N_rand * n_steps):.3f} of dense)")

    step = stage1.make_train_step(
        cfg_model, cfg_train, optimizer, jnp.asarray(np.stack([K, K])),
        jnp.asarray(poses), H, W, 2.0, 6.0, 1.0,
        use_occupancy=True, active_budget=budget)

    rng = np.random.default_rng(0)
    B = N_rand
    batch = {
        "rgb": jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32)),
        "mask": jnp.ones(B, jnp.float32),
        "time": jnp.asarray(rng.uniform(size=B).astype(np.float32)),
        "cam": jnp.asarray((np.arange(B) % 2).astype(np.int32)),
        "pix": jnp.asarray(
            rng.integers(0, H * W, B).astype(np.int32)),
    }
    tv_on = jnp.float32(1.0)

    params2, opt_state2, loss, mse = step(params, opt_state, batch, tv_on, occ)
    _ = float(loss)
    t0 = time.time()
    n = 10
    p, o = params2, opt_state2
    for _ in range(n):
        p, o, loss, mse = step(p, o, batch, tv_on, occ)
    _ = float(loss)
    dt = (time.time() - t0) / n
    print(f"stage-1 step: {dt * 1e3:.1f} ms  loss={float(loss):.5f}")


if __name__ == "__main__":
    main()
