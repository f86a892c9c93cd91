"""Stage-1 trainer: TiNeuVox backbone reconstruction.

Covers reference ``scene_rep_reconstruction`` (run.py:821-1010): frustum
bbox, progressive voxel upscaling with optimizer rebuild, mask-cache ray
batching, photometric + background-entropy + mask-BCE + per-point-rgb +
distortion losses, TV-on-feature, masked Adam with per-step lr decay, and the
fp16 (here bf16) feature switch.

TPU design: one jitted ``train_step`` per grid resolution (progressive
scaling changes parameter shapes, so each segment is its own XLA program);
rays are synthesised on device from the camera table; the whole
loss+backward+Adam update is a single fused XLA computation.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import rays as raydata
from ..models import tineuvox
from ..ops import marching, rays as rayops
from .masked_adam import create_optimizer


def compute_bbox_by_cam_frustrm(HW, Ks, poses, i_train, img_to_cam, near, far,
                                ndc=False, inverse_y=False, flip_x=False,
                                flip_y=False):
    """Scene bbox = union of train camera frustums (reference run.py:403-415)."""
    xyz_min = np.full(3, np.inf)
    xyz_max = np.full(3, -np.inf)
    for idx in i_train:
        H, W = HW[idx]
        cam = img_to_cam[idx]
        ro, rd, vd = rayops.get_rays_of_a_view(
            int(H), int(W), Ks[cam], poses[cam], ndc=ndc, inverse_y=inverse_y,
            flip_x=flip_x, flip_y=flip_y)
        if ndc:
            pts = np.stack([np.asarray(ro + rd * near), np.asarray(ro + rd * far)])
        else:
            pts = np.stack([np.asarray(ro + vd * near), np.asarray(ro + vd * far)])
        xyz_min = np.minimum(xyz_min, pts.reshape(-1, 3).min(0))
        xyz_max = np.maximum(xyz_max, pts.reshape(-1, 3).max(0))
    return xyz_min, xyz_max


def make_train_step(cfg_model_static: tineuvox.TiNeuVoxConfig, cfg_train,
                    optimizer, Ks, poses, H, W, near, far, bg,
                    inverse_y=False, flip_x=False, flip_y=False,
                    use_occupancy=False, active_budget=None,
                    zero1_mesh=None, zero1_min_size=None, n_micro=1):
    """Build the jitted stage-1 train step for one grid resolution.

    With ``use_occupancy`` the step takes an extra occupancy-volume arg and
    runs the sample pipeline under a static global ``active_budget`` (see
    tineuvox.forward) — the TPU replacement for the CUDA ragged filtering.

    With ``zero1_mesh`` (a 1-D device mesh) the Adam moments are sharded
    over the mesh (ZeRO-1): gradients are reduce-scattered, the update runs
    shard-locally, and only the updated params are all-gathered — place
    ``opt_state`` with ``parallel.mesh.put_zero1`` to match.

    With ``n_micro > 1`` the ray batch is split into ``n_micro`` equal
    microbatches run as a ``lax.scan`` with gradient accumulation before
    ONE optimizer update — numerically the full-batch step (all loss terms
    are per-ray means over equal-size microbatches; ``active_budget`` then
    applies per microbatch). This pins every budget/ray-dependent kernel
    shape to the 4096-ray family the TPU compiler is known to handle
    (PERF.md compile-envelope sweep: the 8192-ray zju-scale step trips the
    regalloc RET_CHECK as a single fused program).
    """
    stepsize = float(cfg_train["_stepsize"])
    n_steps = cfg_model_static.max_steps(stepsize)
    w_main = float(cfg_train["weight_main"])
    w_entropy = float(cfg_train.get("weight_entropy_last", 0.0))
    w_mask = float(cfg_train.get("weight_mask_loss", 0.0))
    w_rgbper = float(cfg_train.get("weight_rgbper", 0.0))
    w_dist = float(cfg_train.get("weight_distortion", 0.0))
    w_tv = float(cfg_train.get("weight_tv_feature", 0.0))

    def loss_fn(params, batch, occ):
        ro, rd, vd = raydata.pixels_to_rays(
            Ks, poses, batch["cam"], batch["pix"], H, W,
            inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
        res = tineuvox.forward(params, cfg_model_static, ro, rd, vd,
                               batch["time"][:, None], near, far, stepsize,
                               bg, n_steps, occ_grid=occ,
                               active_budget=active_budget)
        target = batch["rgb"]
        mse = jnp.mean((res["rgb_marched"] - target) ** 2)
        loss = w_main * mse
        if w_entropy > 0:
            pout = jnp.clip(res["alphainv_last"], 1e-6, 1 - 1e-6)
            ent = -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout)).mean()
            loss = loss + w_entropy * ent
        if w_mask > 0:
            pout = jnp.clip(res["alphainv_last"], 1e-6, 1 - 1e-6)
            tgt_inv = 1.0 - batch["mask"]
            bce = -(tgt_inv * jnp.log(pout)
                    + (1 - tgt_inv) * jnp.log(1 - pout)).mean()
            loss = loss + w_mask * bce
        if w_rgbper > 0:
            rgbper = ((res["raw_rgb"] - target[:, None, :]) ** 2).sum(-1)
            rgbper = (rgbper * jax.lax.stop_gradient(res["weights"])).sum()
            loss = loss + w_rgbper * rgbper / target.shape[0]
        if w_dist > 0:
            loss = loss + w_dist * marching.distortion_loss(
                res["weights"], res["s"], 1.0 / res["n_max"])
        return loss, mse

    def add_tv_grad(params, grads, batch, tv_on, tv_dense):
        """TV gradient injected after backward, like the reference's
        ``feature_total_variation_add_grad`` call (run.py:978-981).
        ``tv_dense`` = (global_step < tv_feature_before) as a 0/1 scalar."""
        if w_tv <= 0:
            return grads
        tvg = tineuvox.feature_tv_grad(
            params, cfg_model_static, w_tv / batch["rgb"].shape[0],
            grads["feature"], tv_dense)
        grads = dict(grads)
        grads["feature"] = grads["feature"] + tv_on * tvg
        return grads

    def apply_update(params, opt_state, grads):
        if zero1_mesh is not None:
            from ..parallel import mesh as pmesh
            ms = (pmesh.ZERO1_MIN_SIZE if zero1_min_size is None
                  else zero1_min_size)
            grads = pmesh.constrain_zero1(grads, zero1_mesh, ms)
            params, opt_state = optimizer.update(grads, opt_state, params)
            params = pmesh.constrain_replicated(params, zero1_mesh)
            opt_state = pmesh.constrain_zero1(opt_state, zero1_mesh, ms)
        else:
            params, opt_state = optimizer.update(grads, opt_state, params)
        return params, opt_state

    assert n_micro >= 1
    assert n_micro == 1 or zero1_mesh is None, (
        "ray microbatching and mesh data-parallelism are alternative "
        "ray-splitting schemes; combine by lowering N_rand instead")

    def grad_fn(params, batch, occ):
        """(loss, mse), grads — microbatched when n_micro > 1 (equal-size
        mean-of-means == full-batch mean for every per-ray loss term)."""
        if n_micro == 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, occ)

        def split(x):
            assert x.shape[0] % n_micro == 0, (
                "N_rand must divide by ray_microbatch", x.shape[0], n_micro)
            return x.reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:])

        mbs = {k: split(v) for k, v in batch.items()}

        def body(carry, mb):
            acc_l, acc_m, acc_g = carry
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, occ)
            return (acc_l + l, acc_m + m,
                    jax.tree_util.tree_map(jnp.add, acc_g, g)), None

        zero_g = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params)
        (loss, mse, grads), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0), zero_g), mbs)
        inv = 1.0 / n_micro
        grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
        return (loss * inv, mse * inv), grads

    if use_occupancy:
        @jax.jit
        def step(params, opt_state, batch, tv_on, occ, tv_dense=1.0):
            (loss, mse), grads = grad_fn(params, batch, occ)
            grads = add_tv_grad(params, grads, batch, tv_on, tv_dense)
            # fusion barrier: grads fused into the Adam update tips the
            # 160^3 program over the TPU compiler's regalloc bug
            grads = jax.lax.optimization_barrier(grads)
            params, opt_state = apply_update(params, opt_state, grads)
            return params, opt_state, loss, mse
    else:
        @jax.jit
        def step(params, opt_state, batch, tv_on, tv_dense=1.0):
            (loss, mse), grads = grad_fn(params, batch, None)
            grads = add_tv_grad(params, grads, batch, tv_on, tv_dense)
            grads = jax.lax.optimization_barrier(grads)
            params, opt_state = apply_update(params, opt_state, grads)
            return params, opt_state, loss, mse

    return step


def scene_rep_reconstruction(cfg, data_dict, seed=0, n_iters=None,
                             log_every=1000, step_to_half=100000,
                             callback=None, ckpt_path=None, ckpt_every=0,
                             mesh=None):
    """Run stage-1 training end to end; returns (params, model_cfg, stats).

    With ``ckpt_path`` + ``ckpt_every``: periodic mid-stage checkpoints
    (params, Adam state, step, occupancy) and automatic resume — the
    reference loses the whole stage on a crash (SURVEY.md §5.3).

    With ``mesh`` (a 1-D device mesh): data-parallel training — params
    replicated, the ray batch sharded over the mesh, Adam moments ZeRO-1
    sharded; requires ``N_rand %% mesh size == 0``. The reference is
    single-GPU (SURVEY.md §2.3)."""
    cfg_train = cfg.train_config
    cfg_model = cfg.model_and_render
    n_iters = n_iters or int(cfg_train.N_iters)

    if mesh is not None:
        from ..parallel import mesh as pmesh
        assert int(cfg_train.N_rand) % mesh.devices.size == 0, (
            "N_rand must divide over the mesh", int(cfg_train.N_rand),
            mesh.devices.size)

        def rep(tree):
            return pmesh.put_replicated_arrays(tree, mesh)
    else:
        def rep(tree):
            return tree

    xyz_min, xyz_max = compute_bbox_by_cam_frustrm(
        data_dict["HW"], data_dict["Ks"], data_dict["poses"],
        data_dict["i_train"], data_dict["img_to_cam"],
        data_dict["near"], data_dict["far"], ndc=cfg.data.ndc,
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)
    wbs = float(cfg_model.world_bound_scale)
    if abs(wbs - 1.0) > 1e-9:
        shift = (xyz_max - xyz_min) * (wbs - 1) / 2
        xyz_min, xyz_max = xyz_min - shift, xyz_max + shift

    pg_scale = list(cfg_train.get("pg_scale", []))
    num_voxels = int(cfg_model.num_voxels)
    if pg_scale:
        num_voxels = int(num_voxels / (2 ** len(pg_scale)))

    from ..ops.knn import _tpu_default
    model_cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=tuple(xyz_min), xyz_max=tuple(xyz_max),
        num_voxels=num_voxels,
        num_voxels_base=int(cfg_model.num_voxels_base),
        voxel_dim=int(cfg_model.voxel_dim),
        defor_depth=int(cfg_model.defor_depth),
        net_width=int(cfg_model.net_width),
        alpha_init=float(cfg_model.alpha_init),
        fast_color_thres=float(cfg_model.fast_color_thres),
        no_view_dir=bool(cfg_model.no_view_dir),
        add_cam=bool(cfg.data.get("add_cam", False)),
        # half-width deformation/featurenet activations on TPU (the
        # matmul products were bf16 already; this halves activation and
        # residual traffic). CPU keeps fp32 so tests pin fp32 numerics.
        mlp_bf16=bool(cfg_model.get("mlp_bf16", True)) and _tpu_default())

    key = jax.random.PRNGKey(seed)
    params = tineuvox.init_params(key, model_cfg)

    i_train = data_dict["i_train"]
    images = data_dict["images"]
    masks = data_dict["masks"]
    H, W = int(data_dict["HW"][0][0]), int(data_dict["HW"][0][1])
    ray_index = raydata.build_ray_index(
        [images[i] for i in i_train], [masks[i] for i in i_train],
        data_dict["times"][i_train], data_dict["img_to_cam"][i_train],
        data_dict["poses"], data_dict["Ks"], H, W,
        xyz_min, xyz_max, data_dict["near"], data_dict["far"],
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)

    Ks_dev = rep(jnp.asarray(data_dict["Ks"]))
    poses_dev = rep(jnp.asarray(data_dict["poses"]))
    bg = float(cfg_train.bg_col)
    stepsize = float(cfg_model.stepsize)
    cfg_train = dict(cfg_train)
    cfg_train["_stepsize"] = stepsize

    gen = raydata.batch_index_generator(ray_index.n, int(cfg_train["N_rand"]),
                                        seed=seed)

    # occupancy-pruned sampling (TPU-side replacement for the CUDA ragged
    # filtering): after a warmup, maintain a density-derived occupancy
    # volume and run the pipeline under a static active-sample budget.
    occ_start = int(cfg_train.get("occupancy_start", 1000))
    occ_every = int(cfg_train.get("occupancy_update_every", 500))
    occ_frac = float(cfg_train.get("active_fraction", 0.25))
    use_occ = bool(cfg_train.get("use_occupancy", True)) and occ_start <= n_iters
    occ = None

    def refresh_occupancy(params, model_cfg):
        from ..ops import compaction
        grid_xyz = tineuvox.grid_xyz_coords(model_cfg, 1.0)
        acc = None
        for t in (0.0, 1.0 / 3, 2.0 / 3, 1.0):
            a = tineuvox.eval_alpha_volume(params, model_cfg, grid_xyz, t,
                                           stepsize)
            acc = a if acc is None else np.maximum(acc, a)
        flags = jnp.asarray(acc > max(model_cfg.fast_color_thres, 1e-6))
        occ = compaction.build_occupancy_grid(flags)
        occ = compaction.build_occupancy_grid(occ)      # 2-cell dilation
        if int(getattr(model_cfg, "occ_group", 1)) > 1:
            # coarse-group centre testing (tineuvox.forward occ_group>1)
            # probes occupancy once per group CENTRE; the group half-width
            # is <= 1 cell (guarded in forward), so ONE extra dilation
            # keeps the centre test conservative for every member sample
            occ = compaction.build_occupancy_grid(occ)
        return occ

    def build_segment(params, model_cfg, occupancy_active):
        optimizer = create_optimizer(params, cfg_train)
        opt_state = optimizer.init(params)
        if mesh is not None:
            from ..parallel import mesh as pmesh
            opt_state = pmesh.put_zero1(opt_state, mesh)
        budget = None
        n_rand = int(cfg_train["N_rand"])
        # ray microbatching (grad accumulation, numerically the full-batch
        # step): auto-split batches above 4096 rays so every budget/ray-
        # dependent kernel shape stays in the compile-envelope-swept 4096-ray
        # family (PERF.md: the 8192-ray zju-scale single program trips the
        # TPU regalloc RET_CHECK). 0 = auto; set ray_microbatch=1 to force
        # the single fused program.
        n_micro = int(cfg_train.get("ray_microbatch", 0))
        if n_micro == 0:
            n_micro = (n_rand + 4095) // 4096 if mesh is None else 1
            while n_micro > 1 and n_rand % n_micro:
                n_micro += 1
        if n_micro > 1:
            print(f"stage1: ray microbatching x{n_micro} "
                  f"({n_rand // n_micro} rays/microbatch, grads accumulated)")
        if occupancy_active:
            n_s = model_cfg.max_steps(stepsize)
            demanded = int(n_rand // n_micro * n_s * occ_frac)
            # power-of-two budgets ONLY, rounded UP. libtpu faults on some
            # non-pow2 active-sample shapes at 160^3 scale: 569344 RET_CHECKs
            # at compile time, and 393216 (= 3*2^17, produced by the old
            # round-DOWN-to-2^17-multiples rule) crashed the TPU worker
            # mid-run in the round-4 train-clock (surfacing UNAVAILABLE at
            # the next pg_scale dispatch). Every pow2 member up to 2^19 is
            # compile-sweep green, and budgets above 2^19 are lax.scan-
            # chunked into 2^19-shaped programs (models/tineuvox.py), so
            # above 2^19 a chunk-multiple suffices. Rounding UP also ends
            # the silent sample truncation the audit used to warn about —
            # the padding rows are masked, costing at most <2x active-path
            # compute right above a pow2 boundary.
            chunk = 1 << 19
            if demanded > chunk:
                budget = -(-demanded // chunk) * chunk
            else:
                budget = max(4096, 1 << max(demanded - 1, 1).bit_length())
            print(f"stage1: budget audit — active budget {budget} of "
                  f"{demanded} demanded "
                  f"({n_rand // n_micro} rays x {n_s} steps x "
                  f"{occ_frac:g} active_fraction"
                  + (f", per microbatch x{n_micro})" if n_micro > 1 else ")")
                  + f" — padding {budget - demanded} "
                  f"({100 * (budget / max(demanded, 1) - 1):.1f}% over)")
        step = make_train_step(model_cfg, cfg_train, optimizer, Ks_dev,
                               poses_dev, H, W, data_dict["near"],
                               data_dict["far"], bg,
                               inverse_y=cfg.data.inverse_y,
                               flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
                               use_occupancy=occupancy_active,
                               active_budget=budget, zero1_mesh=mesh,
                               n_micro=n_micro)
        return step, opt_state

    # ---- mid-stage resume ------------------------------------------
    start_step = 0
    resume_payload = None
    if ckpt_path and os.path.isfile(ckpt_path):
        from ..utils.checkpoint import load_checkpoint
        resume_payload = load_checkpoint(ckpt_path)
        start_step = int(resume_payload["global_step"])
        model_cfg = tineuvox.TiNeuVoxConfig(**resume_payload["model_kwargs"])
        params = resume_payload["params"]
        print(f"stage1: resuming from {ckpt_path} at step {start_step}")

    occupancy_active = bool(use_occ and start_step >= occ_start)
    params = rep(params)
    step_fn, opt_state = build_segment(params, model_cfg, occupancy_active)
    if resume_payload is not None:
        from .masked_adam import MaskedAdamState
        saved = resume_payload.get("opt_state")
        if saved is not None:
            opt_state = MaskedAdamState(
                count=jnp.asarray(saved["count"]),
                mu=jax.device_put(saved["mu"]),
                nu=jax.device_put(saved["nu"]))
            if mesh is not None:
                from ..parallel import mesh as pmesh
                opt_state = pmesh.put_zero1(opt_state, mesh)
        if occupancy_active:
            occ = rep(refresh_occupancy(params, model_cfg))
    tv_before = float(cfg_train.get("tv_before", 1e9))
    tv_after = float(cfg_train.get("tv_after", 0))
    tv_every = int(cfg_train.get("tv_every", 1))
    tv_feature_before = float(cfg_train.get("tv_feature_before", 1e9))
    stats = {"psnr": [], "loss": []}
    t0 = time.time()

    def save_progress(step, params, model_cfg, opt_state):
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(ckpt_path, model_cfg.get_kwargs(), params,
                        extra={"opt_state": {
                            "count": opt_state.count,
                            "mu": opt_state.mu, "nu": opt_state.nu}},
                        global_step=step)

    for global_step in range(1 + start_step, n_iters + 1):
        if global_step == step_to_half:
            params["feature"] = params["feature"].astype(jnp.bfloat16)
        rebuild = False
        if global_step in pg_scale:
            n_rest = len(pg_scale) - pg_scale.index(global_step) - 1
            cur_voxels = int(int(cfg_model.num_voxels) / (2 ** n_rest))
            params, model_cfg = tineuvox.scale_volume_grid(
                params, model_cfg, cur_voxels)
            params = rep(params)
            rebuild = True
        if use_occ and global_step == occ_start:
            occupancy_active = True
            rebuild = True
        if rebuild:
            step_fn, opt_state = build_segment(params, model_cfg,
                                               occupancy_active)
            if occupancy_active:
                occ = rep(refresh_occupancy(params, model_cfg))
        elif occupancy_active and global_step % occ_every == 0:
            occ = rep(refresh_occupancy(params, model_cfg))

        sel = next(gen)
        rgb, mval, tval, cam, pix = ray_index.gather(sel)
        batch = {
            "rgb": jnp.asarray(rgb, jnp.float32),
            "mask": jnp.asarray(mval, jnp.float32),
            "time": jnp.asarray(tval, jnp.float32),
            "cam": jnp.asarray(cam, jnp.int32),
            "pix": jnp.asarray(pix, jnp.int32),
        }
        if mesh is not None:
            from ..parallel import mesh as pmesh
            batch = pmesh.put_ray_sharded(batch, mesh)
        tv_on = jnp.float32(
            1.0 if (global_step < tv_before and global_step > tv_after
                    and global_step % tv_every == 0) else 0.0)
        # dense TV until tv_feature_before, then only batch-touched voxels
        # (reference run.py:978-981 dense_mode switch)
        tv_dense = jnp.float32(
            1.0 if global_step < tv_feature_before else 0.0)
        if occupancy_active:
            params, opt_state, loss, mse = step_fn(params, opt_state, batch,
                                                   tv_on, occ, tv_dense)
        else:
            params, opt_state, loss, mse = step_fn(params, opt_state, batch,
                                                   tv_on, tv_dense)

        if global_step % log_every == 0 or global_step == n_iters:
            psnr = -10.0 * np.log10(max(float(mse), 1e-12))
            stats["psnr"].append(psnr)
            stats["loss"].append(float(loss))
            print(f"stage1: iter {global_step:6d} | loss {float(loss):.6f} "
                  f"| psnr {psnr:5.2f} | {time.time() - t0:.1f}s")
            if callback is not None:
                callback(global_step, params, model_cfg, stats)
        if ckpt_path and ckpt_every and global_step % ckpt_every == 0:
            save_progress(global_step, params, model_cfg, opt_state)

    return params, model_cfg, stats
