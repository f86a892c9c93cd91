import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Probe: occupancy-valid demand and radius pass counts under tightened
occupancy settings (occ_res/occ_dilations), to pick active_fraction."""
import dataclasses
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.models import temporal_points as tp

    params, mcfg0, state = benchmod.build_model()
    H = W = 400
    CHUNK = 8192
    focal = 555.0
    rng = np.random.default_rng(1)
    rot = jnp.asarray(np.concatenate(
        [rng.normal(size=(mcfg0.n_joints, 3)),
         0.2 * np.ones((mcfg0.n_joints, 1))], -1).astype(np.float32))
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1).reshape(-1, 3).astype(np.float32)
    o = np.array([0, 0, 3.0], np.float32)
    n_rays = H * W
    pad = (-n_rays) % CHUNK
    dirs = np.concatenate([dirs, dirs[:pad]], 0)
    chunks = dirs.reshape(-1, CHUNK, 3)

    for label, res, dil in (("legacy", 64, 2), ("tight128", 128, 6),
                            ("tight192", 192, 8)):
        mcfg = dataclasses.replace(mcfg0, occ_res=res, occ_dilations=dil)

        @jax.jit
        def prep(r):
            return tp.prepare_frame(params, mcfg, state, rot_params=r)

        @jax.jit
        def sample(ro, rd, frame):
            oi = frame["occ_info"]
            return tp.sample_rays_compact(
                mcfg, ro, rd, 0.5, 6.0, oi["bb_min"], oi["bb_max"],
                occ=oi["occ"], occ_cell=oi["occ_cell"],
                occ_margin=oi.get("occ_margin", 0.0))

        frame = prep(rot)
        tot, mx = 0, 0
        for c in chunks:
            rd = jnp.asarray(c)
            ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
            _, valid, _ = sample(ro, rd, frame)
            n = int(np.asarray(valid).sum())
            tot += n
            mx = max(mx, n)
        cell = float(np.asarray(frame["occ_info"]["occ_cell"]))
        print(f"{label}: res={res} dil={dil} cell={cell:.4f} "
              f"valid total={tot} max/chunk={mx} "
              f"(frac of R*B: {mx / (CHUNK * mcfg.sample_budget):.3f})",
              flush=True)


if __name__ == "__main__" and not os.environ.get("PROBE_GROUP"):
    main()


def probe_group_prefilter():
    """Fraction of selected coarse groups whose rep passes a count>=8 test
    at the enlarged radius (the hierarchical-KNN prune candidate)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.models import temporal_points as tp
    from apnerf.ops.knn import knn

    params, mcfg, state = benchmod.build_model()
    H = W = 400
    CHUNK = 8192
    focal = 555.0
    rng = np.random.default_rng(1)
    rot = jnp.asarray(np.concatenate(
        [rng.normal(size=(mcfg.n_joints, 3)),
         0.2 * np.ones((mcfg.n_joints, 1))], -1).astype(np.float32))
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1).reshape(-1, 3).astype(np.float32)
    o = np.array([0, 0, 3.0], np.float32)
    c0 = dirs[len(dirs) // 2 - CHUNK // 2: len(dirs) // 2 + CHUNK // 2]
    rd = jnp.asarray(c0)
    ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
    qr = 0.01

    frame = jax.jit(lambda r: tp.prepare_frame(params, mcfg, state,
                                               rot_params=r))(rot)
    oi = frame["occ_info"]
    pts, valid, _ = jax.jit(lambda a, b: tp.sample_rays_compact(
        mcfg, a, b, 0.5, 6.0, oi["bb_min"], oi["bb_max"], occ=oi["occ"],
        occ_cell=oi["occ_cell"], occ_margin=oi.get("occ_margin", 0.0)))(
        ro, rd)
    q, src, act_ok, ge = jax.jit(lambda a, b: tp.compact_active(
        mcfg, a, b, oi["bb_min"], oi["bb_max"]))(pts, valid)
    # group reps: every c-th q row is the group's first member
    c = mcfg.coarse_stride
    grep = np.asarray(q)[::c]
    stepdist = mcfg.stepsize * mcfg.voxel_size
    thr = (np.sqrt(qr) + (c - 1) * stepdist) ** 2
    d2g, _ = knn(jnp.asarray(grep), frame["xyz"], k=8, radius2=float(thr),
                 point_tables=oi.get("knn_tables"),
                 sorted_point_idx=True)
    gpass = np.asarray(d2g[:, -1] <= thr)
    # sample-level pass for comparison
    d2s, _ = knn(q, frame["xyz"], k=8, radius2=qr, assume_sorted=True,
                 point_tables=oi.get("knn_tables"), sorted_point_idx=True)
    spass = np.asarray((d2s[:, -1] <= qr) & np.asarray(act_ok))
    print(f"group prefilter: thr={thr:.4f} groups pass "
          f"{gpass.mean():.3f}, samples pass {spass.mean():.3f}; "
          f"samples in passing groups "
          f"{(spass.reshape(-1, c)[gpass]).size / spass.size:.3f}",
          flush=True)
    # sanity: no passing sample in a failing group
    bad = spass.reshape(-1, c)[~gpass].sum()
    print(f"violations (must be 0): {bad}", flush=True)


if __name__ == "__main__" and os.environ.get("PROBE_GROUP"):
    probe_group_prefilter()
