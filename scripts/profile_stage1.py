import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Per-stage decomposition of the stage-1 train step (jumpingjacks scale).

Times (each with chained host readbacks, PERF.md measurement caveat):
  A. ray synthesis + sampling + occupancy + compaction (to compacted pts)
  B. multiscale interp fwd on the compacted points
  C. interp fwd+bwd (grad wrt grid + positions)
  D. full forward loss (no grad)
  E. full value_and_grad
  F. full step (grad + TV + Adam)
Stages overlap when fused, so A..C need not sum to F.
"""
import time

import numpy as np


def timeit(f, n=6):
    r = f()                      # warm (compile)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        r = f()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.time() - t0) / n


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from apnerf.models import tineuvox
    from apnerf.ops import compaction, grid as gridops, rays as rayops, nn, encoding
    from apnerf.train import stage1
    from apnerf.train.masked_adam import create_optimizer
    from apnerf.data import rays as raydata

    bf16 = os.environ.get("APNERF_S1_BF16", "1") == "1"
    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1.4, -1.4, -1.4), xyz_max=(1.4, 1.4, 1.4),
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, voxel_dim=12,
        defor_depth=3, net_width=256, alpha_init=1e-3, fast_color_thres=1e-4,
        mlp_bf16=bf16)
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
    Ks = jnp.asarray(np.stack([K, K]))
    poses_d = jnp.asarray(poses)

    ws = cfg_model.world_size
    gx = np.linspace(-1, 1, ws[0])[:, None, None]
    gy = np.linspace(-1, 1, ws[1])[None, :, None]
    gz = np.linspace(-1, 1, ws[2])[None, None, :]
    blob = (gx ** 2 + gy ** 2 + gz ** 2) < 0.45 ** 2
    occ = compaction.build_occupancy_grid(jnp.asarray(blob))
    occ = compaction.build_occupancy_grid(occ)
    budget = 524288
    print(f"n_steps={n_steps} budget={budget} bf16={bf16}")

    rng = np.random.default_rng(0)
    B = N_rand
    batch = {
        "rgb": jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32)),
        "mask": jnp.ones(B, jnp.float32),
        "time": jnp.asarray(rng.uniform(size=B).astype(np.float32)),
        "cam": jnp.asarray((np.arange(B) % 2).astype(np.int32)),
        "pix": jnp.asarray(rng.integers(0, H * W, B).astype(np.int32)),
    }
    near, far, bg = 2.0, 6.0, 1.0
    stepdist = stepsize * cfg_model.voxel_size

    # ---- A: sampling + compaction --------------------------------------
    @jax.jit
    def stage_a(params, batch, occ):
        ro, rd, vd = raydata.pixels_to_rays(Ks, poses_d, batch["cam"],
                                            batch["pix"], H, W)
        samples = rayops.sample_pts_on_rays(ro, rd, cfg_model.xyz_min,
                                            cfg_model.xyz_max, near, far,
                                            stepdist, n_steps)
        valid = samples.valid & compaction.occupancy_lookup_xyz(
            occ, jnp.asarray(cfg_model.xyz_min), jnp.asarray(cfg_model.xyz_max),
            samples.pts)
        M_full = N_rand * n_steps
        src, filled = compaction.compact_flat(valid.reshape(M_full), budget)
        pts_pad = jnp.concatenate(
            [samples.pts.reshape(M_full, 3), jnp.zeros((1, 3))], 0)
        return pts_pad[src], src, filled

    t_a = timeit(lambda: stage_a(params, batch, occ))
    pts_act, src, filled = stage_a(params, batch, occ)
    print(f"A sampling+compaction: {t_a * 1e3:7.1f} ms")

    # ---- B: multiscale interp fwd --------------------------------------
    xyz_min = jnp.asarray(cfg_model.xyz_min)
    xyz_max = jnp.asarray(cfg_model.xyz_max)

    @jax.jit
    def stage_b(params, pts):
        return gridops.mult_dist_interp(params["feature"], pts, xyz_min,
                                        xyz_max)

    t_b = timeit(lambda: stage_b(params, pts_act))
    print(f"B interp fwd:          {t_b * 1e3:7.1f} ms")

    # ---- C: interp fwd+bwd ---------------------------------------------
    @jax.jit
    def stage_c(params, pts):
        def f(feature, pts):
            v = gridops.mult_dist_interp(feature, pts, xyz_min, xyz_max)
            return (v * v).sum()
        ga, gb = jax.grad(f, argnums=(0, 1))(params["feature"], pts)
        return ga, gb

    t_c = timeit(lambda: stage_c(params, pts_act))
    print(f"C interp fwd+bwd:      {t_c * 1e3:7.1f} ms")

    # ---- C2: MLPs fwd+bwd on compacted points (no grid grad) ------------
    @jax.jit
    def stage_c2(params, pts, tfeat_act):
        def f(p):
            h, _ = tineuvox.query_density_features(p, cfg_model, pts,
                                                   tfeat_act)
            density = nn.mlp(p["densitynet"], h)[..., 0]
            rgb = jax.nn.sigmoid(tineuvox.apply_rgbnet(
                p["rgbnet"], h, None)) if cfg_model.no_view_dir else None
            return density.sum()
        return jax.grad(f)(params)

    tfeat = tineuvox.time_feature(params, cfg_model, batch["time"][:, None])
    ray_of = jnp.minimum(src // n_steps, N_rand - 1)
    tfeat_act = tfeat[ray_of]
    t_c2 = timeit(lambda: stage_c2(params, pts_act, tfeat_act))
    print(f"C2 pipeline fwd+bwd:   {t_c2 * 1e3:7.1f} ms (interp+MLP+grads)")

    # ---- D/E/F: full loss fwd / grad / step ----------------------------
    step = stage1.make_train_step(cfg_model, cfg_train, optimizer, Ks,
                                  poses_d, H, W, near, far, bg,
                                  use_occupancy=True, active_budget=budget)
    tv_on = jnp.float32(1.0)

    def run_step():
        p, o, loss, mse = step(params, opt_state, batch, tv_on, occ)
        return loss

    t_f = timeit(run_step)
    print(f"F full step:           {t_f * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
