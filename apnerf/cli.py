"""Command-line driver: train / render / repose.

Mirrors the reference ``run.py`` CLI surface (run.py:33-78, 1242-1415):
``python -m apnerf.cli --config <cfg> [--render_only --render_test
--render_video --render_pcd --render_pcd_direct --repose_pcd
--degree_threshold D --eval_psnr --eval_ssim ...]``.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
import random

import numpy as np

from .config.config import load_config, dump_config
from .data.load_data import load_data, KEPT_KEYS
from .render import metrics, render
from .render.renderers import make_backbone_renderer, make_points_renderer
from .utils import checkpoint as ckpt


def config_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render_only", action="store_true")
    p.add_argument("--render_test", action="store_true")
    p.add_argument("--overwrite_cache", action="store_true")
    p.add_argument("--use_cache", action="store_true")
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--load_test_val", action="store_true")
    p.add_argument("--joint_placement", action="store_true")
    p.add_argument("--visualise_weights", action="store_true")
    p.add_argument("--visualise_canonical", action="store_true")
    p.add_argument("--repose_pcd", action="store_true")
    p.add_argument("--first_stage_only", action="store_true")
    p.add_argument("--second_stage_only", action="store_true")
    p.add_argument("--debug_bone_merging", action="store_true")
    p.add_argument("--visualise_warp", action="store_true")
    p.add_argument("--render_pcd_direct", action="store_true")
    p.add_argument("--render_pcd", action="store_true")
    p.add_argument("--render_video_factor", type=int, default=0)
    p.add_argument("--eval_ssim", action="store_true")
    p.add_argument("--eval_lpips_alex", action="store_true")
    p.add_argument("--eval_lpips_vgg", action="store_true")
    p.add_argument("--eval_psnr", action="store_true")
    p.add_argument("--ablation_tag", type=str)
    p.add_argument("--degree_threshold", type=float, default=0.0)
    p.add_argument("--skip_load_images", action="store_true")
    p.add_argument("--i_print", type=int, default=1000)
    p.add_argument("--i_save", type=int, default=5000)
    # mid-stage checkpoint cadence; 0 = follow --i_save. Decoupled so a
    # crash-resumable run can checkpoint often without paying the
    # stage-2 tensorboard render that --i_save also drives.
    p.add_argument("--ckpt_every", type=int, default=0)
    p.add_argument("--fre_test", type=int, default=500000)
    p.add_argument("--basedir_append_suffix", type=str, default="")
    p.add_argument("--step_to_half", type=int, default=100000)
    p.add_argument("--export_bbox_and_cams_only", type=str, default="")
    # additive (no reference counterpart): shard render chunks / train ray
    # batches over the first N devices of the default backend (rays-DP,
    # params replicated; training also ZeRO-1 shards the Adam moments)
    p.add_argument("--render_devices", type=int, default=0)
    p.add_argument("--train_devices", type=int, default=0)
    return p


def seed_everything(seed):
    np.random.seed(seed)
    random.seed(seed)


def load_everything(args, cfg):
    """Data loading with the pickle cache (reference run.py:366-401)."""
    datadir = cfg.data.datadir
    cache_dir = datadir if os.path.isdir(datadir) else \
        datadir.split(".pickle")[0]
    os.makedirs(cache_dir, exist_ok=True)
    cache_file = os.path.join(cache_dir, "cache.pkl")
    if args.use_cache and not args.overwrite_cache \
            and os.path.isfile(cache_file):
        with open(cache_file, "rb") as f:
            return pickle.load(f)
    cfg.data.skip_images = bool(args.skip_load_images)
    bg_col = cfg.train_config.get("bg_col", None)
    data_dict = load_data(cfg.data, cfg, args.load_test_val, bg_col=bg_col)
    data_dict = {k: v for k, v in data_dict.items() if k in KEPT_KEYS}
    if args.use_cache:
        with open(cache_file, "wb") as f:
            pickle.dump(data_dict, f)
    return data_dict


def train(args, cfg, save_path, data_dict, stages=(1, 2)):
    from .train import stage1, stage2
    from .train.export import export_point_cloud
    from .models import tineuvox as tnv

    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    dump_config(cfg, os.path.join(save_path, "config.py"))

    mesh = None
    if getattr(args, "train_devices", 0) > 1:
        from .parallel import make_mesh
        mesh = make_mesh(args.train_devices)
        print(f"train: rays-DP + ZeRO-1 over {mesh.devices.size} devices")

    ck1 = os.path.join(save_path, "fine_last.pkl")
    if 1 in stages:
        if os.path.isfile(ck1):
            print("fine_last.pkl exists, skipping stage 1")
        else:
            params, mcfg, _ = stage1.scene_rep_reconstruction(
                cfg, data_dict, seed=args.seed, log_every=args.i_print,
                step_to_half=args.step_to_half,
                ckpt_path=os.path.join(save_path, "fine_progress.pkl"),
                ckpt_every=args.ckpt_every or args.i_save, mesh=mesh)
            ckpt.save_checkpoint(ck1, mcfg.get_kwargs(), params)

    if 2 in stages:
        payload = ckpt.load_checkpoint(ck1)
        mcfg = tnv.TiNeuVoxConfig(**payload["model_kwargs"])
        params = payload["params"]

        unique_times = np.unique(np.asarray(data_dict["times"]))
        cidx = int(np.argmin(np.abs(unique_times
                                    - float(cfg.data.canonical_t))))
        canonical_t = float(unique_times[cidx])
        art = export_point_cloud(
            params, mcfg, save_path, canonical_t,
            float(cfg.model_and_render.stepsize),
            pcd_density_threshold=float(
                cfg.pcd_model_and_render.pcd_density_threshold),
            skeleton_density_threshold=float(
                cfg.pcd_model_and_render.skeleton_density_threshold),
            bone_length=float(cfg.pcd_model_and_render.bone_length),
            canonical_pcd_num=float(
                cfg.pcd_model_and_render.canonical_pcd_num),
            # ZJU subjects can use the hardcoded SMPL joint prior
            # (reference run.py:1215-1231, opt-in via config)
            smpl_skeleton_datadir=(
                str(cfg.data.datadir)
                if bool(cfg.pcd_model_and_render.get("smpl_skeleton", False))
                else None))
        scene_bbox = (np.asarray(mcfg.xyz_min), np.asarray(mcfg.xyz_max))
        tb_path = os.path.join("./logs/tensorboard",
                               os.path.basename(os.path.normpath(save_path)))
        p2, m2, st2, _ = stage2.train_pcd(
            cfg, data_dict, art["canonical"], art["skeleton"], params, mcfg,
            scene_bbox, seed=args.seed, log_every=args.i_print,
            tensorboard_path=tb_path, i_save=args.i_save,
            ckpt_path=os.path.join(save_path, "temporalpoints_progress.pkl"),
            ckpt_every=args.ckpt_every or args.i_save, mesh=mesh)
        save_temporalpoints(os.path.join(save_path, "temporalpoints_last.pkl"),
                            p2, m2, st2, art, mcfg)


def save_temporalpoints(path, params, mcfg, state, art, tineuvox_cfg):
    import dataclasses
    extra = {
        "state_arrays": {
            "canonical_pcd": state["canonical_pcd"],
            "skeleton_pcd": state["skeleton_pcd"],
            "bones": state["bones"],
            "xyz_min": state["xyz_min"], "xyz_max": state["xyz_max"],
            "frozen_view_dir": state["frozen_view_dir"],
            "original_joints": state["original_joints"],
        },
        "tineuvox_kwargs": tineuvox_cfg.get_kwargs(),
    }
    ckpt.save_checkpoint(path, dataclasses.asdict(mcfg), params, extra=extra)


def load_temporalpoints(path):
    from .models import temporal_points as tp
    payload = ckpt.load_checkpoint(path)
    mcfg = tp.TemporalPointsConfig(**payload["model_kwargs"])
    sa = payload["state_arrays"]
    state = tp.init_state(
        mcfg, sa["canonical_pcd"], sa["original_joints"], sa["bones"],
        sa["skeleton_pcd"], sa["xyz_min"], sa["xyz_max"],
        frozen_view_dir=sa["frozen_view_dir"])
    return payload["params"], mcfg, state


def main(argv=None):
    # Persistent compile cache: stage programs take 300-500 s to compile at
    # 160^3 scale, and the axon tunnel can drop mid-run, so resumed runs must
    # not pay that again. NOTE the JAX_COMPILATION_CACHE_DIR env var is NOT
    # honoured by this JAX build (verified: config stays None) — only an
    # explicit config update works, hence doing it here for every CLI run.
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("APNERF_JAXCACHE", "/tmp/apnerf_jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    args = config_parser().parse_args(argv)
    cfg = load_config(args.config)
    seed_everything(args.seed)
    data_dict = load_everything(args, cfg)
    save_path = os.path.join(cfg.basedir, cfg.expname)

    if not args.render_only:
        stages = [1] if args.first_stage_only else (
            [2] if args.second_stage_only else [1, 2])
        train(args, cfg, save_path, data_dict, stages=stages)

    if not (args.render_test or args.render_video or args.repose_pcd
            or args.visualise_canonical):
        return

    cfg.basedir += args.basedir_append_suffix
    near, far = data_dict["near"], data_dict["far"]
    stepsize = float(cfg.model_and_render.stepsize)
    bg = float(cfg.train_config.bg_col)
    prune_info = None

    mesh = None
    if args.render_devices > 1:
        from .parallel import make_mesh
        mesh = make_mesh(args.render_devices)
        print(f"render: rays-DP over {mesh.devices.size} devices")

    # repose is a point-model feature (reference run.py:1355-1396): loading
    # the stage-2 checkpoint is implied, with or without --render_pcd
    if not (args.render_pcd or args.repose_pcd):
        from .models import tineuvox as tnv
        payload = ckpt.load_checkpoint(os.path.join(save_path, "fine_last.pkl"))
        mcfg = tnv.TiNeuVoxConfig(**payload["model_kwargs"])
        renderer = make_backbone_renderer(payload["params"], mcfg, stepsize,
                                          near, far, bg, mesh=mesh)
        ckpt_name = "fine_last"
        make_view_fn = renderer
    else:
        from .models import temporal_points as tp
        params, mcfg, state = load_temporalpoints(
            os.path.join(save_path, "temporalpoints_last.pkl"))
        # render-time perf knobs follow the CONFIG, not the checkpoint:
        # knn_share/knn_cand/coarse_stride are pure inference-time
        # approximation/speed trade-offs (docs/performance.md), so a model
        # trained exact can be re-rendered with the subgroup-shared KNN by
        # editing the scene config — no retraining
        ov = {k: int(cfg.pcd_model_and_render[k])
              for k in ("knn_share", "knn_cand", "coarse_stride")
              if k in cfg.pcd_model_and_render}
        # rendering is forward-only, so the experimental fused aggregation
        # kernel MAY be enabled here via the config (training checkpoints
        # always carry fused_agg=False — it has no VJP; see stage2.py).
        # Default follows the dataclass (off: measured slower than the XLA
        # path, see TemporalPointsConfig.fused_agg).
        if "fused_agg" in cfg.pcd_model_and_render:
            ov["fused_agg"] = bool(cfg.pcd_model_and_render["fused_agg"])
        # render_exact=True is the one-knob escape back to the exact
        # per-sample KNN (reference semantics, lib/temporalpoints.py:440),
        # overriding any shared-KNN speed knobs in the scene config.
        if bool(cfg.pcd_model_and_render.get("render_exact", False)):
            ov["knn_share"] = 1
        mcfg = dataclasses.replace(mcfg, **ov)
        share = int(getattr(mcfg, "knn_share", 1))
        if share > 1:
            # be loud when an approximate mode is active: eval numbers from
            # this render are NOT exact-KNN numbers (VERDICT r3 #8). PSNR
            # impact classes from the measured A/B (PERF.md round-3 sweep).
            impact = (">= 60 dB vs exact" if share <= 4 else
                      ">= 50 dB vs exact" if share <= 16 else
                      "~50 dB vs exact (measured at share 32)")
            print(f"render: APPROXIMATE subgroup-shared KNN active "
                  f"(knn_share={share}, impact class {impact}); set "
                  f"pcd_model_and_render.render_exact=True for exact KNN")
        if args.degree_threshold > 0:
            times = np.unique(np.asarray(data_dict["times"]))
            state, prune_info = tp.simplify_skeleton(
                params, mcfg, state, times,
                deg_threshold=args.degree_threshold,
                five_percent_heuristic=True)
            print(f"pruned {int(prune_info['prune_bones'].sum())} of "
                  f"{len(prune_info['prune_bones'])} joints")
        renderer = make_points_renderer(
            params, mcfg, state, near, far, bg,
            render_pcd_direct=args.render_pcd_direct,
            poses=data_dict["poses"], Ks=data_dict["Ks"], mesh=mesh)
        ckpt_name = "temporalpoints_last"
        make_view_fn = renderer

    flags = dict(inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                 flip_y=cfg.data.flip_y)

    if args.render_test:
        outdir = os.path.join(save_path, f"render_test_{ckpt_name}")
        os.makedirs(outdir, exist_ok=True)
        if prune_info is not None:
            with open(os.path.join(outdir, "threshold.txt"), "w") as f:
                f.write(f"{args.degree_threshold}\n")
                f.write(f"Static joints: "
                        f"{int(prune_info['prune_bones'].sum())} / "
                        f"{len(prune_info['prune_bones'])}")
        i_test = data_dict["i_test"]
        out = render.render_viewpoints(
            make_view_fn,
            data_dict["poses"][data_dict["img_to_cam"][i_test]],
            data_dict["HW"][i_test],
            data_dict["Ks"][data_dict["img_to_cam"][i_test]],
            data_dict["times"][i_test],
            gt_imgs=[np.asarray(data_dict["images"][i]) for i in i_test],
            savedir=outdir, eval_psnr=args.eval_psnr,
            eval_ssim=args.eval_ssim, eval_lpips_alex=args.eval_lpips_alex,
            eval_lpips_vgg=args.eval_lpips_vgg, **flags)
        render.write_video(os.path.join(outdir, "test_video.rgb.mp4"),
                           out["rgbs"])
        if args.eval_psnr:
            print("Testing psnr", np.mean(out["psnrs"]), "(avg)")

    if args.render_video:
        outdir = os.path.join(save_path, f"render_video_{ckpt_name}_time")
        os.makedirs(outdir, exist_ok=True)
        rp = data_dict["render_poses"]
        out = render.render_viewpoints(
            make_view_fn, rp,
            np.repeat(data_dict["HW"][0][None], len(rp), 0),
            np.repeat(data_dict["Ks"][0][None], len(rp), 0),
            data_dict["render_times"], savedir=outdir,
            render_factor=args.render_video_factor, **flags)
        render.write_video(os.path.join(outdir, "video.rgb.mp4"), out["rgbs"])
        d = out["depths"]
        render.write_video(os.path.join(outdir, "video.disp.mp4"),
                           d / max(d.max(), 1e-8))
        if len(out["weights"]):
            render.write_video(os.path.join(outdir, "video.weights.mp4"),
                               out["weights"])

    if args.repose_pcd:
        repose(args, cfg, save_path, data_dict, params, mcfg, state,
               near, far, bg, flags, mesh=mesh)

    if args.visualise_canonical and args.render_pcd:
        from .kinematics.visualize import visualise_skeletonizer
        from .models import temporal_points as tp_mod
        weights = np.asarray(tp_mod.get_weights(params, mcfg, state))
        if prune_info is not None:
            joints_v = prune_info["new_joints"]
            bones_v = prune_info["new_bones"]
        else:
            joints_v = np.asarray(params["joints"])
            bones_v = np.asarray(state["bones"])
        visualise_skeletonizer(
            np.asarray(state["skeleton_pcd"]), np.asarray(params["joints"])[0],
            joints_v, bones_v, np.asarray(state["canonical_pcd"]), weights,
            save_path=os.path.join(save_path, "canonical_skeleton.png"))


def repose(args, cfg, save_path, data_dict, params, mcfg, state, near, far,
           bg, flags, mesh=None):
    """Random repose animation (reference run.py:1355-1396).

    Manual animations: edit ``target_params`` — row j is (axis_xyz, angle)
    for joint j.
    """
    rng = np.random.default_rng(args.seed)
    J = mcfg.n_joints
    steps = 30
    target = rng.normal(size=(J, 4)).astype(np.float32) * 0.2
    target[0] = 0.0
    ramp = np.linspace(0, 1, steps, dtype=np.float32)[:, None, None]
    rot_seq = target[None] * ramp
    rot_seq = np.concatenate([rot_seq, rot_seq[::-1]], 0)
    steps = len(rot_seq)

    renderer = make_points_renderer(params, mcfg, state, near, far, bg,
                                    poses=np.repeat(
                                        data_dict["poses"][0][None], steps, 0),
                                    Ks=np.repeat(
                                        data_dict["Ks"][0][None], steps, 0),
                                    mesh=mesh)
    outdir = os.path.join(save_path, f"render_video_repose_{args.seed}")
    os.makedirs(outdir, exist_ok=True)

    def make_view(i, t):
        return renderer(i, None, rot_params=rot_seq[i])

    out = render.render_viewpoints(
        make_view, np.repeat(data_dict["poses"][0][None], steps, 0),
        np.repeat(data_dict["HW"][0][None], steps, 0),
        np.repeat(data_dict["Ks"][0][None], steps, 0),
        np.zeros(steps), savedir=outdir,
        render_factor=args.render_video_factor, **flags)
    render.write_video(os.path.join(outdir, "train_video.rgb.mp4"),
                       out["rgbs"])
    if len(out["weights"]):
        render.write_video(os.path.join(outdir, "video.weights.mp4"),
                           out["weights"])


if __name__ == "__main__":
    main()
