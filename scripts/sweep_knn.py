import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Sweep the radius-KNN kernel tile parameters (pts_per_tile, rt) on the
real chip with production-shaped queries (Morton-sorted, sort_queries=False).
"""
import time

import numpy as np


def make_workload(M=294912, P=10_000, seed=0):
    rng = np.random.default_rng(seed)
    J = 24
    joints = np.zeros((J, 3), np.float32)
    joints[:, 1] = np.linspace(-0.8, 0.8, J)
    joints[:, 0] = 0.2 * np.sin(np.linspace(0, 3, J))
    seg = rng.integers(0, J, P)
    pcd = (joints[seg] + rng.normal(size=(P, 3)) * 0.08).astype(np.float32)
    B = 96
    nrays = M // B
    starts = pcd[rng.integers(0, P, nrays)] + rng.normal(
        size=(nrays, 3)).astype(np.float32) * 0.05
    dirs = rng.normal(size=(nrays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tt = (np.arange(B, dtype=np.float32) * 0.006)[None, :, None]
    q = (starts[:, None, :] + dirs[:, None, :] * tt).reshape(-1, 3)
    return q.astype(np.float32), pcd


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from apnerf.kernels.knn_cells_pallas import (build_point_tables,
                                                 knn_radius_pallas)
    from apnerf.ops.knn import morton_codes

    q_np, p_np = make_workload()
    p = jnp.asarray(p_np)
    r2 = 0.01
    k = 8

    # reference subset for correctness
    full = ((q_np[:4096][:, None, :] - p_np[None]) ** 2).sum(-1)
    ref_d = np.sort(full, 1)[:, :k]
    ok_ref = ref_d[:, -1] <= r2

    for pts_tile, rt in ((128, 24), (64, 40), (64, 48), (64, 32), (32, 64),
                         (128, 18)):
        tables = jax.jit(lambda pp: build_point_tables(
            pp, pts_per_tile=pts_tile))(p)
        codes = np.asarray(morton_codes(jnp.asarray(q_np),
                                        tables["p_lo"], tables["p_hi"]))
        qperm = np.argsort(codes)
        q = jnp.asarray(q_np[qperm])
        inv = np.argsort(qperm)

        f = jax.jit(lambda a: knn_radius_pallas(
            a, p, k=k, radius2=r2, sort_queries=False, tables=tables,
            remap_indices=True, rt=rt))
        d2, idx = f(q)
        d2h = np.asarray(d2)[inv][:4096]
        ok_got = d2h[:, -1] <= r2
        assert (ok_got == ok_ref).all(), (pts_tile, rt, ok_got.sum(),
                                          ok_ref.sum())
        np.testing.assert_allclose(d2h[ok_ref], ref_d[ok_ref], rtol=6e-4,
                                   atol=1e-6)
        # timing: chained iterations + tiny readback
        out = f(q)
        _ = np.asarray(out[0].ravel()[0])
        t0 = time.time()
        n = 10
        for _ in range(n):
            out = f(q)
            _ = np.asarray(out[0].ravel()[0])
        dt = (time.time() - t0) / n * 1e3
        print(f"pts={pts_tile:4d} rt={rt:3d} cw={pts_tile*rt:5d}: "
              f"{dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
