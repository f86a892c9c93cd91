"""Stage-2 trainer: TemporalPoints (LBS point cloud) optimisation.

Covers reference ``train_pcd`` (run.py:417-819): time-curriculum sampling
with the inverse-proportional time sampler, per-timestep contiguous ray
ranges, the seven-term loss (render MSE, ARAP, weight TV, weight sparsity
gated by ``weight_start_iter``, transformation regulariser, joint chamfer,
2D mask chamfer), masked Adam with per-step lr decay.

TPU design: a single jitted step takes (params, opt_state, batch); the batch
carries the sampled time, pixel records and the pre-sampled chamfer views /
mask pixels (host RNG); rays are synthesised on device.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import rays as raydata
from ..models import temporal_points as tp
from ..models import tineuvox
from ..utils.samplers import InverseProportionalSampler, curriculum_window
from .masked_adam import create_optimizer


def build_model(cfg, canonical, skeleton, tineuvox_params,
                tineuvox_cfg: tineuvox.TiNeuVoxConfig, seed=0,
                frozen_view_dir=None, sample_budget=None, max_steps=None):
    """Construct TemporalPoints config/params/state from export artifacts."""
    cfg_train = cfg.pcd_train_config
    cfg_model = cfg.pcd_model_and_render
    pcd = np.asarray(canonical["pcd"], np.float32)
    joints = np.asarray(skeleton["joints"], np.float32)
    bones = [list(map(int, b)) for b in skeleton["bones"]]
    wbs = float(cfg_model.world_bound_scale)
    xyz_min = np.asarray(canonical["xyz_min"]) * wbs
    xyz_max = np.asarray(canonical["xyz_max"]) * wbs
    voxel_size = float(canonical["voxel_size"])
    stepsize = float(cfg_model.stepsize)

    diag = float(np.linalg.norm(xyz_max - xyz_min))
    max_steps = max_steps or int(np.ceil(diag / (stepsize * voxel_size))) + 1
    # per-dataset TPU budgets (configurable since the bench-scene defaults
    # over- or under-shoot on other scene families; see configs/*/default.py)
    sample_budget = (sample_budget
                     or int(cfg_model.get("sample_budget", 0))
                     or min(192, max_steps))
    sample_budget = min(sample_budget, max_steps)
    active_fraction = float(cfg_model.get("active_fraction", 0.30))
    pass_fraction = float(cfg_model.get("pass_fraction", 0.30))
    occ_res = int(cfg_model.get("occ_res", 64))
    occ_dilations = int(cfg_model.get("occ_dilations", 2))
    dflt = tp.TemporalPointsConfig
    coarse_stride = int(cfg_model.get("coarse_stride",
                                      dflt.coarse_stride))
    group_pass_fraction = float(cfg_model.get("group_pass_fraction",
                                              dflt.group_pass_fraction))
    knn_share = int(cfg_model.get("knn_share", dflt.knn_share))
    knn_cand = int(cfg_model.get("knn_cand", dflt.knn_cand))

    mcfg = tp.TemporalPointsConfig(
        n_points=len(pcd), n_joints=len(joints),
        feat_dim=int(np.asarray(canonical["feat"]).shape[-1]),
        neighbours=8,
        timebase_pe=tineuvox_cfg.timebase_pe,
        posbase_pe=tineuvox_cfg.posbase_pe,
        viewbase_pe=tineuvox_cfg.viewbase_pe,
        stepsize=stepsize, voxel_size=voxel_size,
        voxel_size_ratio=tineuvox_cfg.voxel_size_ratio,
        act_shift=tineuvox_cfg.act_shift,
        fast_color_thres=float(cfg_model.fast_color_thres),
        no_view_dir=tineuvox_cfg.no_view_dir,
        frozen_view_dir=frozen_view_dir is not None,
        over_parameterized_rot=bool(cfg_train.over_parameterized_rot),
        avg_procrustes=bool(cfg_train.get("avg_procrustes", False)),
        re_init_mlps=bool(cfg_train.get("re_init_mlps", False)),
        pose_embedding_dim=int(cfg_train.pose_embedding_dim),
        sample_budget=int(sample_budget), max_steps=int(max_steps),
        active_fraction=active_fraction, pass_fraction=pass_fraction,
        coarse_stride=coarse_stride,
        group_pass_fraction=group_pass_fraction,
        knn_share=knn_share, knn_cand=knn_cand,
        occ_res=occ_res, occ_dilations=occ_dilations,
        # fused_agg (kernels/agg_pallas.py) is forward-only (no VJP), so it
        # stays off in training. featmlp (kernels/featmlp_pallas.py) HAS a
        # custom VJP (forward kernel + XLA-recompute backward, remat-style)
        # and can be opted in for training via the scene config; measured
        # on-chip 2026-08-20 (PERF.md round 5): the recompute makes the
        # full train step SLOWER (28.6 vs 24.8 ms at 8192 rays), so the
        # default stays OFF — the kernel's win is render-forward-only
        # (3.80 vs 4.04 ms) plus ~1.9 GB peak-HBM savings.
        # The CLI re-enables both at render time (render-perf knobs follow
        # the config, cli.py).
        fused_agg=False,
        featmlp_kernel=bool(cfg_model.get("featmlp_train", False)))

    key = jax.random.PRNGKey(seed)
    params = tp.init_params(key, mcfg, pcd, joints, bones,
                            canonical["feat"], canonical["alphas"],
                            canonical["rgbs"], tineuvox_params)
    state = tp.init_state(mcfg, pcd, joints, bones,
                          skeleton["skeleton_pcd"], xyz_min, xyz_max,
                          frozen_view_dir=frozen_view_dir)
    return mcfg, params, state


def make_train_step(mcfg: tp.TemporalPointsConfig, state, cfg_train,
                    optimizer, Ks, poses, H, W, near, far, bg,
                    n_chamfer_views: int, inverse_y=False, flip_x=False,
                    flip_y=False, zero1_mesh=None, zero1_min_size=None):
    w_render = float(cfg_train.get("weight_render", 0))
    w_arap = float(cfg_train.get("weight_arap", 0))
    w_tv = float(cfg_train.get("weight_tv", 0))
    w_sparse = float(cfg_train.get("weight_sparsity", 0))
    w_trans = float(cfg_train.get("weight_transformation_reg", 0))
    w_jcham = float(cfg_train.get("weight_joint_chamfer", 0))
    w_cham2d = float(cfg_train.get("weight_chamfer2D", 0))

    def loss_fn(params, batch):
        ro, rd, vd = raydata.pixels_to_rays(
            Ks, poses, batch["cam"], batch["pix"], H, W,
            inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=batch["t"],
                         near=near, far=far, bg=bg)
        metrics = {}
        loss = 0.0
        mse = jnp.mean((res["rgb_marched"] - batch["rgb"]) ** 2)
        metrics["mse"] = mse
        if w_render > 0:
            loss = loss + w_render * mse
        if w_arap > 0:
            metrics["arap"] = tp.arap_loss(state, res["t_hat_pcd"])
            loss = loss + w_arap * metrics["arap"]
        if w_tv > 0:
            metrics["weight_tv"] = tp.neighbour_weight_tv_loss(
                state, res["lbs_weights"])
            loss = loss + w_tv * metrics["weight_tv"]
        if w_sparse > 0:
            metrics["sparsity"] = tp.weight_sparsity_loss(res["lbs_weights"])
            loss = loss + batch["sparsity_on"] * w_sparse * metrics["sparsity"]
        if w_trans > 0:
            metrics["trans_reg"] = tp.transformation_reg_loss(
                res["global_t"], res["thetas"])
            loss = loss + w_trans * metrics["trans_reg"]
        if w_jcham > 0:
            metrics["joint_chamfer"] = tp.joint_chamfer_loss(
                state, params["joints"])
            loss = loss + w_jcham * metrics["joint_chamfer"]
        if w_cham2d > 0 and n_chamfer_views > 0:
            pcd_sub = res["t_hat_pcd"][batch["chamfer_pcd_idx"]]
            proj = jax.vmap(tp.project_points, in_axes=(None, 0, 0))(
                pcd_sub, batch["chamfer_poses"], batch["chamfer_Ks"])
            if not inverse_y:
                proj = proj.at[:, :, 0].set((H - 1) - proj[:, :, 0])
            proj = proj[..., ::-1]                     # (x, y) -> (row, col)
            metrics["chamfer2d"] = tp.batch_chamfer_2d(
                proj, batch["chamfer_mask_pts"])
            loss = loss + w_cham2d * metrics["chamfer2d"]
        return loss, metrics

    @jax.jit
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        if zero1_mesh is not None:
            # ZeRO-1: reduce-scatter grads, shard-local Adam, all-gather
            # params (see parallel.mesh.constrain_zero1)
            from ..parallel import mesh as pmesh
            ms = (pmesh.ZERO1_MIN_SIZE if zero1_min_size is None
                  else zero1_min_size)
            grads = pmesh.constrain_zero1(grads, zero1_mesh, ms)
            params, opt_state = optimizer.update(grads, opt_state, params)
            params = pmesh.constrain_replicated(params, zero1_mesh)
            opt_state = pmesh.constrain_zero1(opt_state, zero1_mesh, ms)
        else:
            params, opt_state = optimizer.update(grads, opt_state, params)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return step


def train_pcd(cfg, data_dict, canonical, skeleton, tineuvox_params,
              tineuvox_cfg, scene_bbox, seed=0, n_iters=None, log_every=1000,
              callback=None, sample_budget=None, tensorboard_path=None,
              i_save=5000, ckpt_path=None, ckpt_every=0, mesh=None):
    """Run stage-2 training; returns (params, mcfg, state, stats).

    With ``tensorboard_path``: per-interval loss-term scalars and periodic
    GT/prediction image grids (reference run.py:724-811 observability).
    With ``ckpt_path`` + ``ckpt_every``: mid-stage checkpoint/resume
    (params + Adam state + step; the reference loses the stage on a crash).
    With ``mesh`` (a 1-D device mesh): data-parallel training — params and
    points replicated, the ray batch sharded over the mesh, Adam moments
    ZeRO-1 sharded; requires ``N_rand %% mesh size == 0``. The reference
    is single-GPU (SURVEY.md §2.3).
    """
    cfg_train = cfg.pcd_train_config
    n_iters = n_iters or int(cfg_train.N_iters)
    rng = np.random.default_rng(seed)

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

    H, W = int(data_dict["HW"][0][0]), int(data_dict["HW"][0][1])
    i_train = data_dict["i_train"]
    images, masks = data_dict["images"], data_dict["masks"]

    ray_index = raydata.build_ray_index(
        [images[i] for i in i_train], [masks[i] for i in i_train],
        data_dict["times"][i_train], data_dict["img_to_cam"][i_train],
        data_dict["poses"], data_dict["Ks"], H, W,
        scene_bbox[0], scene_bbox[1], data_dict["near"], data_dict["far"],
        inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
        flip_y=cfg.data.flip_y)

    # frozen global viewdir option (reference run.py:480-483)
    frozen_view_dir = None
    if bool(cfg_train.get("use_global_view_dir", False)):
        mid = data_dict["poses"][0]
        frozen_view_dir = -np.asarray(mid[:3, 2], np.float32)

    mcfg, params, state = build_model(cfg, canonical, skeleton,
                                      tineuvox_params, tineuvox_cfg,
                                      seed=seed,
                                      frozen_view_dir=frozen_view_dir,
                                      sample_budget=sample_budget)

    # startup budget audit: measure how full the static sample budgets run
    # at the canonical pose so silent truncation is visible (the budgets are
    # config knobs, not guarantees — see pcd_model_and_render)
    try:
        probe_n = 2048
        sel0 = np.arange(min(probe_n, ray_index.n))
        rgb0, m0, t0_, cam0, pix0 = ray_index.gather(sel0)
        ro0, rd0, vd0 = raydata.pixels_to_rays(
            jnp.asarray(data_dict["Ks"]), jnp.asarray(data_dict["poses"]),
            jnp.asarray(cam0, jnp.int32), jnp.asarray(pix0, jnp.int32), H, W,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y)
        frame = tp.prepare_frame(params, mcfg, state,
                                 t=jnp.float32(float(t0_[0])))
        occ_info = frame["occ_info"]
        pts, valid, _ = tp.sample_rays_compact(
            mcfg, ro0, rd0, data_dict["near"], data_dict["far"],
            occ_info["bb_min"], occ_info["bb_max"], occ=occ_info["occ"],
            occ_cell=occ_info["occ_cell"],
            occ_margin=occ_info.get("occ_margin", 0.0))
        v = np.asarray(valid)
        per_ray = v.sum(1)
        m_act = max(1024, (int(v.size * mcfg.active_fraction) + 1023)
                    // 1024 * 1024)
        m_act = min(m_act, v.size)
        # pass budget: samples surviving the kth-neighbour radius cutoff
        q, src, act_ok, _ = tp.compact_active(mcfg, pts, valid,
                                              occ_info["bb_min"],
                                              occ_info["bb_max"])
        from ..ops.knn import knn as knn_fn
        tables = occ_info.get("knn_tables")
        d2p, _ = knn_fn(q, frame["xyz"], k=mcfg.neighbours,
                        radius2=0.01, assume_sorted=True,
                        point_tables=tables,
                        sorted_point_idx=tables is not None)
        n_pass = int(np.asarray((d2p[:, -1] <= 0.01) & act_ok).sum())
        m_pass = max(1024, (int(m_act * mcfg.pass_fraction) + 1023)
                     // 1024 * 1024)
        m_pass = min(m_pass, m_act)
        print(f"stage2: budget audit — sample_budget {mcfg.sample_budget} "
              f"(per-ray demand p99 {int(np.percentile(per_ray, 99))}, "
              f"max {int(per_ray.max())}), active budget {m_act} vs "
              f"valid {int(v.sum())} "
              f"({'TRUNCATING' if v.sum() > m_act else 'ok'}), "
              f"pass budget {m_pass} vs radius-passing {n_pass} "
              f"({'TRUNCATING' if n_pass > m_pass else 'ok'}), "
              f"occ_res {mcfg.occ_res}")
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"stage2: budget audit skipped ({e})")

    params = rep(params)
    state = rep(state)
    optimizer = create_optimizer(params, dict(cfg_train))
    opt_state = optimizer.init(params)
    if mesh is not None:
        opt_state = pmesh.put_zero1(opt_state, mesh)

    # ---- mid-stage resume ------------------------------------------
    import os as _os
    import dataclasses as _dc
    start_step = 0
    if ckpt_path and _os.path.isfile(ckpt_path):
        from ..utils.checkpoint import load_checkpoint
        from .masked_adam import MaskedAdamState
        payload = load_checkpoint(ckpt_path)
        start_step = int(payload["global_step"])
        params = payload["params"]
        saved = payload.get("opt_state")
        params = rep(params)
        if saved is not None:
            opt_state = MaskedAdamState(count=jnp.asarray(saved["count"]),
                                        mu=jax.device_put(saved["mu"]),
                                        nu=jax.device_put(saved["nu"]))
            if mesh is not None:
                opt_state = pmesh.put_zero1(opt_state, mesh)
        print(f"stage2: resuming from {ckpt_path} at step {start_step}")

    def save_progress(step):
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(ckpt_path, _dc.asdict(mcfg), params,
                        extra={"opt_state": {
                            "count": opt_state.count,
                            "mu": opt_state.mu, "nu": opt_state.nu}},
                        global_step=step)

    unique_times = np.unique(np.asarray(data_dict["times"])[i_train])
    canonical_idx = int(np.argmin(np.abs(unique_times
                                         - float(cfg.data.canonical_t))))
    sampler = InverseProportionalSampler(len(unique_times), seed=seed)
    full_t_iter = int(cfg_train.full_t_iter)
    weight_start_iter = int(cfg_train.get("weight_start_iter", 0))
    n_rand = int(cfg_train.N_rand)
    pose_one_each = bool(cfg_train.get("pose_one_each", False))
    w_cham2d = float(cfg_train.get("weight_chamfer2D", 0))

    # images grouped by time for chamfer-view sampling
    times_tr = np.asarray(data_dict["times"])[i_train]
    imgs_by_time = {t: np.nonzero(times_tr == t)[0] for t in unique_times}
    n_views_min = min(len(v) for v in imgs_by_time.values())
    n_chamfer_views = min(5, n_views_min) if w_cham2d > 0 else 0
    CH_M = 3000   # mask pixels per view
    CH_N = 3000   # pcd samples

    Ks_dev = rep(jnp.asarray(data_dict["Ks"]))
    poses_dev = rep(jnp.asarray(data_dict["poses"]))
    step_fn = make_train_step(mcfg, state, cfg_train, optimizer, Ks_dev,
                              poses_dev, H, W, data_dict["near"],
                              data_dict["far"],
                              float(cfg_train.bg_col), n_chamfer_views,
                              inverse_y=cfg.data.inverse_y,
                              flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
                              zero1_mesh=mesh)

    # precompute mask pixel coords per train image (for chamfer2D)
    mask_pix = []
    if n_chamfer_views > 0:
        for i in i_train:
            m = np.asarray(masks[i]).reshape(H, W)
            ys, xs = np.nonzero(m > 0)
            if len(ys) == 0:
                ys, xs = np.zeros(1, np.int64), np.zeros(1, np.int64)
            mask_pix.append(np.stack([ys, xs], -1).astype(np.float32))

    writer = None
    if tensorboard_path:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(tensorboard_path)
        except ImportError:
            print("stage2: tensorboardX unavailable, logging to console only")

    @jax.jit
    def preview_chunk(params, ro, rd, vd, t):
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=t,
                         near=data_dict["near"], far=data_dict["far"],
                         bg=float(cfg_train.bg_col))
        return res["rgb_marched"]

    from ..render.renderers import weight_palette
    _w_cols = jnp.asarray(
        weight_palette(mcfg.n_joints).astype(np.float32))

    @jax.jit
    def comparison_chunk(params, ro, rd, vd, t):
        """One forward returning the reference's three prediction panels:
        direct-pcd | full | LBS-weights (run.py:772-811)."""
        from ..ops.marching import composite
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=t,
                         near=data_dict["near"], far=data_dict["far"],
                         bg=float(cfg_train.bg_col), render_weights=True,
                         render_pcd_direct=True)
        col = jnp.einsum("rbj,jc->rbc", res["lbs_w_per_sample"], _w_cols)
        wimg = composite(res["weights_for_render"], col,
                         bg=float(cfg_train.bg_col),
                         alphainv_last=res["alphainv_for_render"])
        return (res["rgb_marched_direct"], res["rgb_marched"], wimg)

    def render_preview(params, img_row, factor=4):
        img_idx = i_train[img_row]
        h, w = H // factor, W // factor
        K = data_dict["Ks"][ray_index.img_cam[img_row]].copy()
        K[:2, :3] /= factor
        pix = jnp.arange(h * w, dtype=jnp.int32)
        cam = jnp.full((h * w,), int(ray_index.img_cam[img_row]), jnp.int32)
        Kd = jnp.asarray(K)[None]
        cd = jnp.asarray(
            data_dict["poses"][ray_index.img_cam[img_row]])[None]
        ro, rd, vd = raydata.pixels_to_rays(
            Kd, cd, jnp.zeros_like(pix), pix, h, w,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y)
        rgb = preview_chunk(params, ro, rd, vd,
                            jnp.float32(ray_index.img_time[img_row]))
        gt = np.asarray(data_dict["images"][img_idx], np.float32)
        if gt.max() > 1.5:
            gt = gt / 255.0
        gt = gt[::factor, ::factor, :3]
        return np.asarray(rgb).reshape(h, w, 3), gt

    def render_comparison_video(params, n_frames=6, factor=4):
        """Static-cam GT | direct-pcd | full | LBS-weights panel sequence
        over linspace times (reference run.py:772-811 tensorboard video)."""
        h, w = H // factor, W // factor
        cam0 = int(ray_index.img_cam[0])
        K = data_dict["Ks"][cam0].copy()
        K[:2, :3] /= factor
        pix = jnp.arange(h * w, dtype=jnp.int32)
        Kd = jnp.asarray(K)[None]
        cd = jnp.asarray(data_dict["poses"][cam0])[None]
        ro, rd, vd = raydata.pixels_to_rays(
            Kd, cd, jnp.zeros_like(pix), pix, h, w,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y)
        cam_rows = np.where(ray_index.img_cam == cam0)[0]
        frames = []
        for tq in np.linspace(0.0, 1.0, n_frames):
            # GT: this camera's train image nearest in time
            r = cam_rows[np.argmin(
                np.abs(ray_index.img_time[cam_rows] - tq))]
            gt = np.asarray(data_dict["images"][i_train[r]], np.float32)
            if gt.max() > 1.5:
                gt = gt / 255.0
            gt = gt[::factor, ::factor, :3]
            direct, full, wimg = comparison_chunk(params, ro, rd, vd,
                                                  jnp.float32(tq))
            panels = [gt] + [np.asarray(x).reshape(h, w, 3)
                             for x in (direct, full, wimg)]
            frames.append(np.clip(np.concatenate(panels, axis=1), 0, 1))
        return np.stack(frames)                       # [T, h, 4w, 3]

    stats = {"psnr": [], "loss": []}
    t0 = time.time()
    for global_step in range(1 + start_step, n_iters + 1):
        t_max, t_min = curriculum_window(global_step, len(unique_times),
                                         full_t_iter, canonical_idx)
        rnd_i = sampler.sample(t_min, t_max)
        t_key = float(unique_times[rnd_i])
        b_lo, b_hi = ray_index.index_to_times[t_key]
        sel = rng.integers(b_lo, b_hi, size=n_rand)
        rgb, mval, tval, cam, pix = ray_index.gather(sel)
        batch = {
            "rgb": jnp.asarray(rgb, jnp.float32),
            "mask": jnp.asarray(mval, jnp.float32),
            "t": jnp.float32(t_key),
            "cam": jnp.asarray(cam, jnp.int32),
            "pix": jnp.asarray(pix, jnp.int32),
            "sparsity_on": jnp.float32(
                1.0 if global_step >= weight_start_iter else 0.0),
        }
        if n_chamfer_views > 0:
            img_rows = imgs_by_time[t_key]
            pick = rng.permutation(len(img_rows))[:n_chamfer_views]
            rows = img_rows[pick]
            if pose_one_each:
                cams_sel = ray_index.img_cam[rows]
            else:
                cams_sel = pick % len(data_dict["poses"])
            mask_pts = np.stack([
                mask_pix[r][rng.integers(0, len(mask_pix[r]), CH_M)]
                for r in rows], 0)
            batch["chamfer_poses"] = poses_dev[jnp.asarray(cams_sel)]
            batch["chamfer_Ks"] = Ks_dev[jnp.asarray(cams_sel)]
            batch["chamfer_mask_pts"] = jnp.asarray(mask_pts)
            batch["chamfer_pcd_idx"] = jnp.asarray(
                rng.integers(0, mcfg.n_points, CH_N), jnp.int32)

        if mesh is not None:
            batch = pmesh.put_ray_sharded(batch, mesh)
        params, opt_state, metrics = step_fn(params, opt_state, batch)

        if global_step % log_every == 0 or global_step == n_iters:
            mse = float(metrics["mse"])
            psnr = -10.0 * np.log10(max(mse, 1e-12))
            stats["psnr"].append(psnr)
            stats["loss"].append(float(metrics["loss"]))
            print(f"stage2: iter {global_step:6d} | loss "
                  f"{float(metrics['loss']):.5f} | psnr {psnr:5.2f} | "
                  f"t {t_min}-{t_max} | {time.time() - t0:.1f}s")
            if writer is not None:
                writer.add_scalar("metrics/PSNR", psnr, global_step)
                for k in ("mse", "arap", "weight_tv", "sparsity",
                          "trans_reg", "joint_chamfer", "chamfer2d", "loss"):
                    if k in metrics:
                        writer.add_scalar(f"metrics/{k}", float(metrics[k]),
                                          global_step)
                writer.add_scalar("metrics/eps_time", time.time() - t0,
                                  global_step)
            if callback is not None:
                callback(global_step, params, mcfg, state, stats)

        if ckpt_path and ckpt_every and global_step % ckpt_every == 0:
            save_progress(global_step)

        if writer is not None and (global_step % i_save == 0
                                   or global_step == 1):
            rows = rng.integers(0, len(i_train), 3)
            panels = []
            for r in rows:
                pred, gt = render_preview(params, int(r))
                panels.append(np.concatenate([gt, pred], axis=1))
            grid = np.clip(np.concatenate(panels, axis=0), 0, 1)
            writer.add_image("payload", grid.transpose(2, 0, 1), global_step)
            # GT | direct | full | weights comparison sequence
            # (reference run.py:772-811) as mp4 (cv2 backend; GIF when no
            # encoder exists) plus a tensorboard filmstrip
            vid = render_comparison_video(params)
            writer.add_images("video_panels", vid.transpose(0, 3, 1, 2),
                              global_step)
            try:
                from ..render.render import write_video
                write_video(
                    os.path.join(tensorboard_path,
                                 f"comparison_{global_step:06d}.mp4"),
                    vid, fps=4)
            except Exception as e:  # pragma: no cover
                print(f"stage2: comparison video write skipped ({e})")

    if writer is not None:
        writer.close()
    return params, mcfg, state, stats
