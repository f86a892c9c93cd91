"""Isolated repro/bisect of the train-clock step-1600 TPU worker fault.

The 400x400 clock run (scripts/train_clock.py) crashes 100% of invocations
at the step-1600 pg_scale boundary: resume at 1500 is green, the 357-step
(~101^3) segment is green, but entering the 449-step (~127^3) segment kills
the TPU worker before the step-1600 checkpoint readback — with a pure
power-of-two budget (524288), so the round-4 non-pow2 diagnosis does not
cover it.

Phases (each needs a fresh process; a worker fault poisons the backend):
  PHASE=a  load ckpt @1500 -> scale_volume_grid -> readback
  PHASE=b  a + refresh_occupancy at the new grid -> readback
  PHASE=c  b + build step fn + N train steps (APNERF_REPRO_STEPS) -> readback
  PHASE=o  a + occupancy + ONE step with occupancy DISABLED path? (control)

Usage: PHASE=c python scripts/repro_pg1600.py
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PHASE = os.environ.get("PHASE", "c")
N_STEPS = int(os.environ.get("APNERF_REPRO_STEPS", "3"))
CKPT = os.environ.get(
    "APNERF_REPRO_CKPT", "/tmp/apnerf_clock/logs/clock400/fine_progress.pkl")
CFG = os.environ.get("APNERF_REPRO_CFG", "/tmp/apnerf_clock/clock.py")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from apnerf.config.config import load_config
    from apnerf.models import tineuvox
    from apnerf.utils.checkpoint import load_checkpoint

    cfg = load_config(CFG)
    payload = load_checkpoint(CKPT)
    step0 = int(payload["global_step"])
    model_cfg = tineuvox.TiNeuVoxConfig(**payload["model_kwargs"])
    params = payload["params"]
    print(f"[repro] ckpt step {step0} world_size {model_cfg.world_size}",
          flush=True)

    # ---- phase a: the pg_scale rebuild at 1600 ----------------------
    cur_voxels = int(int(cfg.model_and_render.num_voxels) / 2)  # n_rest=1
    t = time.time()
    params, model_cfg = tineuvox.scale_volume_grid(params, model_cfg,
                                                   cur_voxels)
    s = float(np.asarray(params["feature"].astype(jnp.float32).sum()))
    print(f"[repro] a: scale_volume_grid -> {model_cfg.world_size} "
          f"feat_sum={s:.4f} ({time.time() - t:.1f}s)", flush=True)
    if PHASE == "a":
        return

    # ---- phase b: refresh_occupancy at the new grid ------------------
    from apnerf.ops import compaction
    stepsize = float(cfg.model_and_render.stepsize)
    t = time.time()
    grid_xyz = tineuvox.grid_xyz_coords(model_cfg, 1.0)
    acc = None
    for tt in (0.0, 1.0 / 3, 2.0 / 3, 1.0):
        a = tineuvox.eval_alpha_volume(params, model_cfg, grid_xyz, tt,
                                       stepsize)
        acc = a if acc is None else np.maximum(acc, a)
    flags = jnp.asarray(acc > max(model_cfg.fast_color_thres, 1e-6))
    occ = compaction.build_occupancy_grid(flags)
    occ = compaction.build_occupancy_grid(occ)
    if int(getattr(model_cfg, "occ_group", 1)) > 1:
        occ = compaction.build_occupancy_grid(occ)
    print(f"[repro] b: occupancy {occ.shape} "
          f"mean={float(np.asarray(occ.astype(jnp.float32).mean())):.4f} "
          f"({time.time() - t:.1f}s)", flush=True)
    if PHASE == "b":
        return

    # ---- phase c: the 449-step train program ------------------------
    from apnerf.cli import config_parser, load_everything
    from apnerf.data import rays as raydata
    from apnerf.train import stage1
    from apnerf.train.masked_adam import create_optimizer

    args = config_parser().parse_args(["--config", CFG])
    data_dict = load_everything(args, cfg)

    cfg_train = dict(cfg.train_config)
    cfg_train["_stepsize"] = stepsize
    optimizer = create_optimizer(params, cfg_train)
    opt_state = optimizer.init(params)

    n_rand = int(cfg_train["N_rand"])
    occ_frac = float(cfg_train.get("active_fraction", 0.25))
    n_s = model_cfg.max_steps(stepsize)
    demanded = int(n_rand * n_s * occ_frac)
    chunk = 1 << 19
    if demanded > chunk:
        budget = -(-demanded // chunk) * chunk
    else:
        budget = max(4096, 1 << max(demanded - 1, 1).bit_length())
    budget = int(os.environ.get("APNERF_REPRO_BUDGET", budget))
    print(f"[repro] c: budget {budget} of {demanded} demanded "
          f"({n_rand} x {n_s})", flush=True)

    H, W = int(data_dict["HW"][0][0]), int(data_dict["HW"][0][1])
    i_train = data_dict["i_train"]
    xyz_min = np.asarray(model_cfg.xyz_min)
    xyz_max = np.asarray(model_cfg.xyz_max)
    ray_index = raydata.build_ray_index(
        [data_dict["images"][i] for i in i_train],
        [data_dict["masks"][i] for i in i_train],
        data_dict["times"][i_train], data_dict["img_to_cam"][i_train],
        data_dict["poses"], data_dict["Ks"], H, W,
        xyz_min, xyz_max, data_dict["near"], data_dict["far"],
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    gen = raydata.batch_index_generator(ray_index.n, n_rand, seed=0)

    Ks_dev = jnp.asarray(data_dict["Ks"])
    poses_dev = jnp.asarray(data_dict["poses"])

    def make_batch():
        sel = next(gen)
        rgb, mval, tval, cam, pix = ray_index.gather(sel)
        return {
            "rgb": jnp.asarray(rgb, jnp.float32),
            "mask": jnp.asarray(mval, jnp.float32),
            "time": jnp.asarray(tval, jnp.float32),
            "cam": jnp.asarray(cam, jnp.int32),
            "pix": jnp.asarray(pix, jnp.int32),
        }

    if PHASE in ("f", "g"):
        # forward-only / grad-only variants of the same loss at the same
        # shapes — pinpoints whether the fault is in the forward pipeline,
        # the backward, or only the full fused train step
        from apnerf.data import rays as raydata2
        from apnerf.models import tineuvox as tnv
        from apnerf.ops import marching

        stepsize_ = stepsize
        n_s_ = n_s

        def loss_fn(params, batch):
            ro, rd, vd = raydata.pixels_to_rays(
                Ks_dev, poses_dev, batch["cam"], batch["pix"], H, W,
                inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                flip_y=cfg.data.flip_y)
            res = tnv.forward(params, model_cfg, ro, rd, vd,
                              batch["time"][:, None], data_dict["near"],
                              data_dict["far"], stepsize_,
                              float(cfg_train["bg_col"]), n_s_,
                              occ_grid=occ, active_budget=budget)
            return jnp.mean((res["rgb_marched"] - batch["rgb"]) ** 2)

        if PHASE == "f":
            fn = jax.jit(loss_fn)
        else:
            fn = jax.jit(jax.grad(loss_fn))
        for i in range(N_STEPS):
            t = time.time()
            out = fn(params, make_batch())
            s = float(np.asarray(jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), out,
                jnp.float32(0.0))))
            print(f"[repro] {PHASE}: step {i} -> {s:.6f} "
                  f"({time.time() - t:.1f}s)", flush=True)
        print("[repro] PASS", flush=True)
        return

    step_fn = stage1.make_train_step(
        model_cfg, cfg_train, optimizer, Ks_dev, poses_dev, H, W,
        data_dict["near"], data_dict["far"], float(cfg_train["bg_col"]),
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y, use_occupancy=True, active_budget=budget)

    for i in range(N_STEPS):
        batch = make_batch()
        t = time.time()
        params, opt_state, loss, mse = step_fn(params, opt_state, batch,
                                               jnp.float32(1.0), occ,
                                               jnp.float32(1.0))
        lf = float(np.asarray(loss))
        print(f"[repro] c: step {i} loss={lf:.6f} "
              f"({time.time() - t:.1f}s)", flush=True)
    print("[repro] PASS", flush=True)


if __name__ == "__main__":
    main()
