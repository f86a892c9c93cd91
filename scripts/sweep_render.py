import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""A/B sweep of render-path knobs (coarse_stride, pass/active fractions)
on the bench workload. Each case re-jits; compile cache keeps repeats
cheap."""
import dataclasses
import time

import numpy as np


def run_case(benchmod, jax, jnp, tp, overrides):
    params, mcfg, state = benchmod.build_model()
    mcfg = dataclasses.replace(mcfg, **overrides)
    H = W = 400
    CHUNK = 8192
    focal = 555.0
    rng = np.random.default_rng(1)

    @jax.jit
    def prep_frame(rot):
        return tp.prepare_frame(params, mcfg, state, rot_params=rot)

    @jax.jit
    def render_chunk(frame, ro, rd, vd):
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=None,
                         rot_params=None, near=0.5, far=6.0, bg=1.0,
                         render_depth=True, frame=frame)
        return res["rgb_marched"], res["depth"]

    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1).reshape(-1, 3).astype(np.float32)
    o = np.array([0, 0, 3.0], np.float32)
    rot = jnp.asarray(np.concatenate(
        [rng.normal(size=(mcfg.n_joints, 3)),
         0.2 * np.ones((mcfg.n_joints, 1))], -1).astype(np.float32))
    n_rays = H * W
    pad = (-n_rays) % CHUNK
    dirs = np.concatenate([dirs, dirs[:pad]], 0)
    chunks = dirs.reshape(-1, CHUNK, 3)

    def run_once():
        frame = prep_frame(rot)
        outs = []
        for c in chunks:
            rd = jnp.asarray(c)
            ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
            vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            outs.append(render_chunk(frame, ro, rd, vd))
        _ = np.asarray(outs[-1][0][0])
        return outs

    outs = run_once()
    img = np.concatenate([np.asarray(a) for a, _ in outs])[:n_rays]
    t0 = time.time()
    for _ in range(3):
        run_once()
    dt = (time.time() - t0) / 3
    return n_rays / dt, img


def main():
    import importlib.util
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.models import temporal_points as tp

    base = {}
    cases = [
        ("base", {}),
        ("combo1", {"coarse_stride": 16, "group_pass_fraction": 0.55}),
        ("combo2", {"coarse_stride": 16, "group_pass_fraction": 0.55,
                    "active_fraction": 0.30}),
        ("combo3", {"coarse_stride": 16, "group_pass_fraction": 0.55,
                    "active_fraction": 0.30, "pass_fraction": 0.30}),
        ("combo4", {"coarse_stride": 16, "group_pass_fraction": 0.5,
                    "active_fraction": 0.25, "pass_fraction": 0.25}),
    ]
    ref_img = None
    for name, ov in cases:
        rps, img = run_case(benchmod, jax, jnp, tp, ov)
        if ref_img is None:
            ref_img = img
        d = img - ref_img
        mse = float((d ** 2).mean())
        psnr = 99.0 if mse == 0 else -10.0 * np.log10(mse)
        frac = float((np.abs(d).max(-1) > 1 / 255).mean())
        print(f"{name:10s}: {rps:9.1f} rays/s  PSNR-vs-exact={psnr:6.2f} dB"
              f"  pix>1/255: {frac:.4%}", flush=True)


if __name__ == "__main__":
    main()
