import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Stage-level profile of the repose render chunk (bench.py workload).

Times each pipeline stage in its own jit with chained host readbacks
(PERF.md: block_until_ready does not synchronise under the axon tunnel).
Per-stage numbers over-count shared work (separate jits lose fusion), so
the total is also measured fused — the per-stage numbers rank dominators.
"""
import time

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    """Chained tiny host readback per iter (4 bytes, forces the dependency
    without shipping whole arrays over the axon tunnel)."""
    import jax

    def probe(out):
        leaves = jax.tree_util.tree_leaves(out)
        return np.asarray(leaves[0].ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
    _ = probe(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        _ = probe(out)                     # 1-element readback each iter
    return (time.time() - t0) / n * 1e3


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
    # centre chunk (hits the cloud)
    c0 = dirs[len(dirs) // 2 - CHUNK // 2: len(dirs) // 2 + CHUNK // 2]
    rd = jnp.asarray(c0)
    ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    qr = 0.01

    prep = jax.jit(lambda r: tp.prepare_frame(params, mcfg, state,
                                              rot_params=r))
    frame = prep(rot)
    occ_info = frame["occ_info"]

    @jax.jit
    def f_sample(ro, rd):
        return tp.sample_rays_compact(mcfg, ro, rd, 0.5, 6.0,
                                      occ_info["bb_min"], occ_info["bb_max"],
                                      occ=occ_info["occ"],
                                      occ_cell=occ_info["occ_cell"],
                                      occ_margin=occ_info.get("occ_margin",
                                                              0.0))

    pts, valid, step_id = f_sample(ro, rd)

    @jax.jit
    def f_compact(pts, valid):
        return tp.compact_active(mcfg, pts, valid, occ_info["bb_min"],
                                 occ_info["bb_max"])

    q, src, act_ok, ge = f_compact(pts, valid)

    @jax.jit
    def f_knn(q):
        return knn(q, frame["xyz"], k=mcfg.neighbours, radius2=qr,
                   assume_sorted=True, point_tables=occ_info["knn_tables"],
                   sorted_point_idx=True)

    @jax.jit
    def f_forward(ro, rd, vd):
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=None,
                         rot_params=None, near=0.5, far=6.0, bg=1.0,
                         render_depth=True, frame=frame)
        return res["rgb_marched"], res["depth"]

    @jax.jit
    def f_agg(ro, rd, vd):
        return tp.aggregate_pts(params, mcfg, state, frame["xyz"],
                                frame["inv_rot"], ro, rd, vd, 0.5, 6.0, qr,
                                occ_info=occ_info)

    print(f"M_act slots: {len(q)}, act_ok: {int(np.asarray(act_ok).sum())}")
    d2, _ = f_knn(q)
    print(f"nn_ok pass: {float(np.asarray(d2[:, -1] <= qr).mean()):.3f}")

    t_prep = timeit(prep, rot)
    t_sample = timeit(f_sample, ro, rd)
    t_compact = timeit(f_compact, pts, valid)
    t_knn = timeit(f_knn, q)
    t_agg = timeit(f_agg, ro, rd, vd)
    t_fwd = timeit(f_forward, ro, rd, vd)
    print(f"prepare_frame   {t_prep:7.2f} ms  (per frame, not per chunk)")
    print(f"sample_rays     {t_sample:7.2f} ms")
    print(f"compact_active  {t_compact:7.2f} ms  (incl. sample fused-in? no:"
          " takes pts,valid)")
    print(f"knn kernel      {t_knn:7.2f} ms")
    print(f"aggregate_pts   {t_agg:7.2f} ms  (sample+compact+knn+mlp)")
    print(f"forward total   {t_fwd:7.2f} ms  "
          f"({CHUNK / (t_fwd / 1e3):,.0f} rays/s)")


if __name__ == "__main__":
    main()
