import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""CPU A/B: short stage-2 training with the subgroup-shared KNN vs the
exact per-sample path on the synthetic scene. Informs whether knn_share
can be enabled for TRAINING (not just rendering) without hurting
convergence. Run: python scripts/train_share_ab.py [iters]
"""
import numpy as np


def main(n_iters=120):
    import jax
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from apnerf.config.config import load_config
    from apnerf.data.load_data import load_data
    from apnerf.data.synthetic import generate_scene
    from apnerf.train import stage1, stage2
    from apnerf.train.export import export_point_cloud

    # mirror tests/test_pipeline.py scales (proven non-degenerate: its
    # stage-2 PSNR gate passes with the same radius/defaults)
    scene = generate_scene("/tmp/share_ab_scene/arm", n_times=4, n_test=1,
                           H=48, W=48)
    cfg = load_config("apnerf/config/configs/nerf/jumpingjacks.py")
    cfg.data.datadir = scene
    cfg.data.half_res = False
    cfg.model_and_render.num_voxels = 32 ** 3
    cfg.model_and_render.num_voxels_base = 32 ** 3
    cfg.train_config.pg_scale = [40]
    cfg.train_config.N_rand = 256
    cfg.pcd_model_and_render.canonical_pcd_num = 400
    cfg.pcd_model_and_render.bone_length = 5.0
    cfg.pcd_train_config.N_rand = 128
    # tiny scenes clamp sample_budget to max_steps (~21); pick a stride
    # that divides the budget or the group/shared machinery disengages
    cfg.pcd_model_and_render.coarse_stride = 4
    cfg.pcd_train_config.full_t_iter = n_iters // 2
    data = load_data(cfg.data, cfg, bg_col=cfg.train_config.bg_col)

    params, mcfg, _ = stage1.scene_rep_reconstruction(
        cfg, data, n_iters=120, log_every=60)
    art = export_point_cloud(
        params, mcfg, "/tmp/share_ab_scene/out", cfg.data.canonical_t,
        float(cfg.model_and_render.stepsize), pcd_density_threshold=0.3,
        skeleton_density_threshold=0.3, bone_length=5.0,
        canonical_pcd_num=400, overwrite=True)
    scene_bbox = (np.asarray(mcfg.xyz_min), np.asarray(mcfg.xyz_max))

    if os.environ.get("APNERF_AB_SHARE16", "0") == "1":
        # share16 needs 16-wide coarse groups and a budget that holds at
        # least one of them: halve the step to lift max_steps above 32
        cfg.pcd_model_and_render.stepsize = (
            float(cfg.pcd_model_and_render.stepsize) / 2.0)
        cfg.pcd_model_and_render.coarse_stride = 16
        cases = (("exact", 1, 12), ("share16_12", 16, 12))
        budget = 32
    else:
        cases = (("exact", 1, 12), ("share2_12", 2, 12),
                 ("share4_12", 4, 12))
        budget = 20
    for name, share, kc in cases:
        cfg.pcd_model_and_render.knn_share = share
        cfg.pcd_model_and_render.knn_cand = kc
        p2, m2, st2, stats = stage2.train_pcd(
            cfg, data, art["canonical"], art["skeleton"], params, mcfg,
            scene_bbox, n_iters=n_iters, log_every=max(1, n_iters // 2),
            sample_budget=budget)
        psnr = stats.get("psnr", [float("nan")])
        print(f"{name:10s}: final train PSNR "
              f"{np.mean(psnr[-3:]):6.2f} dB  loss "
              f"{stats['loss'][-1]:.4f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
