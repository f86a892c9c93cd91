import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Microbenchmark: stage-2 KNN formulations on the real chip.

Reproduces the bench.py query distribution (ray samples near an articulated
cloud) and times brute-force Pallas vs the radius-bounded candidate-tile
kernel. Timing uses chained host readbacks (PERF.md: block_until_ready does
not synchronise under the axon tunnel).
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
    # queries: points near the cloud (like occupancy-passed ray samples),
    # in ray order: groups of ~96 consecutive samples along short segments
    B = 96
    nrays = M // B
    starts = pcd[rng.integers(0, P, nrays)] + rng.normal(
        size=(nrays, 3)).astype(np.float32) * 0.05
    dirs = rng.normal(size=(nrays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tt = (np.arange(B, dtype=np.float32) * 0.006)[None, :, None]
    q = (starts[:, None, :] + dirs[:, None, :] * tt).reshape(-1, 3)
    return q.astype(np.float32), pcd


def timeit(fn, n=10):
    fn()  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    o = out[0]
    _ = np.asarray(o[(0,) * o.ndim])   # scalar readback: wait, don't transfer
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from apnerf.kernels.knn_pallas import knn_pallas_sorted
    from apnerf.kernels.knn_cells_pallas import knn_radius_pallas

    q_np, p_np = make_workload()
    q = jnp.asarray(q_np)
    p = jnp.asarray(p_np)
    r2 = 0.01
    k = 8

    # correctness vs brute force (on a subset, numpy reference)
    sub = slice(0, 8192)
    d_new, i_new = jax.jit(lambda a, b: knn_radius_pallas(a, b, k=k,
                                                          radius2=r2))(q, p)
    d_new = np.asarray(d_new)
    full = ((q_np[sub][:, None, :] - p_np[None]) ** 2).sum(-1)
    ref_d = np.sort(full, 1)[:, :k]
    ok_ref = ref_d[:, -1] <= r2
    ok_new = d_new[sub][:, -1] <= r2
    assert (ok_ref == ok_new).all(), (ok_ref.sum(), ok_new.sum())
    np.testing.assert_allclose(d_new[sub][ok_ref], ref_d[ok_ref],
                               rtol=6e-4, atol=1e-6)
    print(f"correctness ok; {ok_ref.mean():.3f} of samples pass radius")

    f_old = jax.jit(lambda a, b: knn_pallas_sorted(a, b, k=k, radius2=r2))
    f_new = jax.jit(lambda a, b: knn_radius_pallas(a, b, k=k, radius2=r2))
    t_old = timeit(lambda: f_old(q, p))
    t_new = timeit(lambda: f_new(q, p))
    print(f"brute (Morton+bbox-pruned): {t_old * 1e3:8.2f} ms")
    print(f"candidate-tile kernel:      {t_new * 1e3:8.2f} ms   "
          f"({t_old / t_new:.2f}x)")


if __name__ == "__main__":
    main()
