import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Compile-envelope sweep for the stage-1 train step (VERDICT r2 #9).

The TPU compiler's regalloc RET_CHECK (live_range_finder.cc:29) fires on
SOME shape combinations at 160^3 scale; the in-tree mitigations
(optimization_barrier fences, 2^17 budget rounding) were tuned on the
jumpingjacks shape. This sweep compiles (and runs one step of) the
occupancy-active train step across the config-family shape matrix — cubic
nerf bboxes, elongated zju human bboxes, wide wim robot bboxes, both
active fractions — and records ok/fail per combo.

Run: nohup python scripts/compile_sweep.py > /tmp/compile_sweep.log 2>&1 &
Results: /tmp/compile_sweep.json (copy the matrix into PERF.md).
"""
import json
import time
import traceback

import numpy as np

CASES = [
    # name, bbox extent (pre world_bound_scale), N_rand, active_fraction
    ("nerf-cube-160", (2.8, 2.8, 2.8), 4096, 0.25),
    ("zju-flat-160", (4.0, 4.0, 1.6), 4096, 0.30),
    ("wim-wide-160", (3.6, 2.4, 2.4), 4096, 0.25),
    ("nerf-cube-af30", (2.8, 2.8, 2.8), 4096, 0.30),
    ("zju-flat-8192rays", (4.0, 4.0, 1.6), 8192, 0.30),
]


def run_case(name, extent, n_rand, occ_frac):
    import jax
    import jax.numpy as jnp
    from apnerf.models import tineuvox
    from apnerf.ops import compaction
    from apnerf.train import stage1
    from apnerf.train.masked_adam import create_optimizer

    half = np.asarray(extent, np.float64) / 2
    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=tuple(-half), xyz_max=tuple(half),
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, voxel_dim=12,
        defor_depth=3, net_width=256, alpha_init=1e-3, fast_color_thres=1e-4)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg_model)
    stepsize = 0.5
    n_steps = cfg_model.max_steps(stepsize)
    cfg_train = {
        "_stepsize": stepsize, "N_rand": n_rand, "weight_main": 1.0,
        "weight_entropy_last": 1e-3, "weight_rgbper": 1e-2,
        "weight_tv_feature": 1e-2, "weight_distortion": 0.0,
        "lrate_feature": 8e-2, "lrate_featurenet": 8e-4,
        "lrate_deformation_net": 6e-4, "lrate_densitynet": 8e-4,
        "lrate_timenet": 8e-4, "lrate_rgbnet": 8e-4, "lrate_decay": 20,
        "skip_zero_grad_fields": ["feature"],
    }
    optimizer = create_optimizer(params, cfg_train)
    opt_state = optimizer.init(params)
    # mirror stage1.build_segment: batches above 4096 rays run microbatched
    # (grad accumulation) so every shape stays in the swept 4096-ray family
    n_micro = max(1, int(n_rand) // 4096)
    budget = int(n_rand) // n_micro * n_steps * occ_frac
    budget = max(4096, int(budget) // 131072 * 131072 or
                 int(budget) // 1024 * 1024)
    H = W = 400
    Kmat = jnp.asarray(np.array([[555.0, 0, 200], [0, 555.0, 200],
                                 [0, 0, 1]], np.float32))[None]
    poses = jnp.asarray(np.eye(4, dtype=np.float32)[None].copy())
    step = stage1.make_train_step(
        cfg_model, cfg_train, optimizer, Kmat, poses, H, W, 0.5, 6.0, 1.0,
        use_occupancy=True, active_budget=budget, n_micro=n_micro)
    # occupancy: random ~40% active
    rng = np.random.default_rng(0)
    gd = cfg_model.world_size
    flags = jnp.asarray(rng.uniform(size=tuple(gd)) < 0.4)
    occ = compaction.build_occupancy_grid(flags)
    batch = {
        "rgb": jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(0, 1, n_rand).astype(np.float32)),
        "time": jnp.asarray(rng.uniform(0, 1, n_rand).astype(np.float32)),
        "cam": jnp.zeros(n_rand, jnp.int32),
        "pix": jnp.asarray(rng.integers(0, H * W, n_rand).astype(np.int32)),
    }
    t0 = time.time()
    p, o, loss, mse = step(params, opt_state, batch, jnp.float32(1.0), occ,
                           jnp.float32(1.0))
    loss = float(loss)
    dt = time.time() - t0
    assert np.isfinite(loss)
    return {"grid": [int(x) for x in gd], "n_steps": int(n_steps),
            "budget": int(budget), "n_micro": n_micro,
            "compile_s": round(dt, 1), "loss": loss}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    results = {}
    only = set(sys.argv[1:])
    cases = [c for c in CASES if not only or c[0] in only]
    for name, extent, n_rand, frac in cases:
        print(f"=== {name}: extent={extent} N_rand={n_rand} af={frac}",
              flush=True)
        try:
            info = run_case(name, extent, n_rand, frac)
            info["ok"] = True
            print(f"    ok: {info}", flush=True)
        except Exception as e:
            info = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        results[name] = info
        with open("/tmp/compile_sweep.json", "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
