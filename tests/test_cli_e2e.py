"""CLI-level end to end: ``python -m apnerf.cli`` on a micro scene drives
train (both stages, multi-device) -> checkpoints -> render_test -> eval —
the arg/flag wiring the function-level tests bypass (reference command
surface, README.md:82-104). Slow-marked; plain CI covers the function path
via test_integration_fast."""
import glob
import os

import numpy as np
import pytest

from apnerf.data.synthetic import generate_scene


@pytest.mark.slow
def test_cli_train_render_multidevice(tmp_path):
    import jax
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 cpu devices")
    from apnerf import cli

    scene = generate_scene(str(tmp_path / "scene" / "arm"),
                           n_times=3, n_test=1, H=32, W=32)
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "apnerf", "config", "configs", "nerf",
        "jumpingjacks.py")
    cfg_file = tmp_path / "micro.py"
    cfg_file.write_text(f"""
_base_ = {base!r}
expname = "cli_e2e"
basedir = {str(tmp_path / "logs")!r}
data = dict(datadir={scene!r}, half_res=False)
model_and_render = dict(num_voxels=20 ** 3, num_voxels_base=20 ** 3)
train_config = dict(N_iters=10, N_rand=128, pg_scale=[],
                    use_occupancy=False)
pcd_model_and_render = dict(canonical_pcd_num=200, bone_length=5.0,
                            pcd_density_threshold=0.0,
                            skeleton_density_threshold=0.0)
pcd_train_config = dict(N_iters=8, N_rand=64, full_t_iter=6)
""")

    # train (both stages) — the reference trains on the train split ...
    cli.main(["--config", str(cfg_file), "--train_devices", "8",
              "--i_print", "5", "--i_save", "1000"])
    # ... then evaluates with --render_only --load_test_val
    # (reference README.md:82-104 command pairs)
    cli.main(["--config", str(cfg_file), "--render_devices", "8",
              "--render_only", "--load_test_val", "--render_test",
              "--render_pcd", "--eval_psnr",
              "--i_print", "5", "--i_save", "1000"])

    run_dir = str(tmp_path / "logs" / "cli_e2e")
    assert os.path.isfile(os.path.join(run_dir, "fine_last.pkl"))
    assert os.path.isfile(os.path.join(run_dir, "temporalpoints_last.pkl"))
    out_dir = os.path.join(run_dir, "render_test_temporalpoints_last")
    pngs = glob.glob(os.path.join(out_dir, "img_*.png"))
    assert pngs, os.listdir(out_dir)
    res_txt = os.path.join(out_dir, "results.txt")
    assert os.path.isfile(res_txt)
    txt = open(res_txt).read()
    assert "psnr:" in txt and np.isfinite(float(txt.split("psnr:")[1]
                                                .split()[0]))

    # repose + bone pruning through the CLI (reference run.py:1355-1396 +
    # --degree_threshold merging)
    cli.main(["--config", str(cfg_file), "--render_only", "--render_pcd",
              "--repose_pcd", "--degree_threshold", "30",
              "--visualise_canonical",
              "--i_print", "5", "--i_save", "1000"])
    rep_dir = os.path.join(run_dir, "render_video_repose_0")
    vids = (glob.glob(os.path.join(rep_dir, "*.mp4"))
            + glob.glob(os.path.join(rep_dir, "*.gif")))
    assert vids, os.listdir(rep_dir)
    assert os.path.isfile(os.path.join(run_dir, "canonical_skeleton.png"))

    # --repose_pcd WITHOUT --render_pcd must imply the point model
    # (regression: it used to take the backbone branch and crash on an
    # unbound params)
    for f in glob.glob(os.path.join(rep_dir, "img_*.png")):
        os.remove(f)
    cli.main(["--config", str(cfg_file), "--render_only", "--repose_pcd",
              "--i_print", "5", "--i_save", "1000"])
    assert glob.glob(os.path.join(rep_dir, "img_*.png")), \
        os.listdir(rep_dir)
