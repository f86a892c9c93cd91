import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Microbenchmark: stage-2 train step at jumpingjacks scale (8192 rays,
10^4 points, all seven losses incl. 2D chamfer). Chained host readbacks."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.train import stage2
    from apnerf.train.masked_adam import create_optimizer

    params, mcfg, state = benchmod.build_model()
    H = W = 400
    N_rand = 8192
    K = np.array([[555.0, 0, 200.0], [0, 555.0, 200.0], [0, 0, 1]],
                 np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 3.0

    cfg_train = {
        "N_rand": N_rand, "lrate_decay": 20,
        "weight_render": 2e2, "weight_arap": 1e2, "weight_tv": 1e1,
        "weight_sparsity": 1e-3, "weight_transformation_reg": 1e-2,
        "weight_joint_chamfer": 1e1, "weight_chamfer2D": 1e0,
        "lrate_weights": 5e-3, "lrate_joints": 1e-4,
        "lrate_theta_weight": 1e-4, "lrate_canonical_feat": 1e-3,
        "lrate_forward_warp": 5e-4, "lrate_feat_net": 1e-3,
        "lrate_rgbnet": 1e-4, "lrate_densitynet": 1e-4,
    }
    optimizer = create_optimizer(params, cfg_train)
    opt_state = optimizer.init(params)

    step = stage2.make_train_step(
        mcfg, state, cfg_train, optimizer, jnp.asarray(np.stack([K, K])),
        jnp.asarray(poses), H, W, 0.5, 6.0, 1.0, n_chamfer_views=5)

    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.uniform(0, 1, (N_rand, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(0, 1, N_rand).astype(np.float32)),
        "t": jnp.float32(0.35),
        "cam": jnp.asarray((np.arange(N_rand) % 2).astype(np.int32)),
        "pix": jnp.asarray(rng.integers(0, H * W, N_rand).astype(np.int32)),
        "sparsity_on": jnp.float32(1.0),
        "chamfer_poses": jnp.asarray(poses[np.zeros(5, np.int32)]),
        "chamfer_Ks": jnp.asarray(np.stack([K] * 5)),
        "chamfer_mask_pts": jnp.asarray(
            rng.uniform(0, 400, (5, 3000, 2)).astype(np.float32)),
        "chamfer_pcd_idx": jnp.asarray(
            rng.integers(0, mcfg.n_points, 3000).astype(np.int32)),
    }
    p, o, metrics = step(params, opt_state, batch)
    _ = float(metrics["loss"])
    print("compiled", flush=True)
    t0 = time.time()
    n = 10
    for _ in range(n):
        p, o, metrics = step(p, o, batch)
    _ = float(metrics["loss"])
    print(f"stage-2 step: {(time.time() - t0) / n * 1e3:.1f} ms  "
          f"loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()
