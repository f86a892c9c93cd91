import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Honest (scalar-readback) microbenchmarks of the stage-1 grid-gradient
components. Every jitted function returns a SCALAR — the axon tunnel runs
at ~6 MB/s, so any benchmark returning a large array measures transfer,
not compute (see PERF.md measurement caveats).
"""
import time

import numpy as np


def timeit(f, n=6):
    r = f()
    _ = float(np.asarray(r))
    t0 = time.time()
    for _ in range(n):
        r = f()
    _ = float(np.asarray(r))
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from apnerf.kernels.scatter_pallas import sorted_window_accumulate

    M = 524288
    rng = np.random.default_rng(0)
    # blob-like concentrated cells (matches occupancy-pruned samples)
    ex = ey = ez = 162
    ctr = rng.normal(0, 0.12, size=(M, 3)) + 0.5
    cell = np.clip((ctr * 161).astype(np.int32), 0, 160) + 1
    lin = (cell[:, 0] * ey + cell[:, 1]) * ez + cell[:, 2]
    lin_sorted = jnp.asarray(np.sort(lin).astype(np.int32))
    order_np = np.argsort(lin).astype(np.int32)
    order = jnp.asarray(order_np)
    upd = jnp.asarray(rng.uniform(size=(M, 96)).astype(np.float32))
    upd_sorted = jnp.asarray(
        np.asarray(upd)[order_np])
    g12 = jnp.asarray(rng.uniform(size=(M, 12)).astype(np.float32))
    w8 = jnp.asarray(rng.uniform(size=(M, 8)).astype(np.float32))

    # 1. the [M, 96] permute gather
    f1 = jax.jit(lambda upd, order: upd[order].sum())
    print(f"permute [M,96] gather : {timeit(lambda: f1(upd, order)) * 1e3:7.1f} ms")

    # 1b. permuting the two factors instead (12 + 8 ch), product after
    f1b = jax.jit(lambda g, w, order: (
        g[order][:, None, :] * w[order][:, :, None]).sum())
    print(f"permute g12+w8, prod  : {timeit(lambda: f1b(g12, w8, order)) * 1e3:7.1f} ms")

    # 2. the kernel on pre-sorted input
    f2 = jax.jit(lambda i, u: sorted_window_accumulate(i, u, ex * ey * ez).sum())
    print(f"kernel [M,96]->162^3  : {timeit(lambda: f2(lin_sorted, upd_sorted)) * 1e3:7.1f} ms")

    # 3. kernel + upstream permute fused (mirrors the real bwd data flow)
    f3 = jax.jit(lambda i, u, order: sorted_window_accumulate(
        i, u[order], ex * ey * ez).sum())
    print(f"permute+kernel        : {timeit(lambda: f3(lin_sorted, upd, order)) * 1e3:7.1f} ms")

    # 4. argsort + permute + kernel (the full bwd minus reduce)
    lin_dev = jnp.asarray(lin.astype(np.int32))
    def f4_(lin_dev, upd):
        o = jnp.argsort(lin_dev)
        return sorted_window_accumulate(lin_dev[o], upd[o], ex * ey * ez).sum()
    f4 = jax.jit(f4_)
    print(f"sort+permute+kernel   : {timeit(lambda: f4(lin_dev, upd)) * 1e3:7.1f} ms")

    # 5. outer-product materialization alone [M, 96]
    f5 = jax.jit(lambda g, w: (g[:, None, :] * w[:, :, None]).reshape(M, 96).sum())
    print(f"outer-product upd     : {timeit(lambda: f5(g12, w8)) * 1e3:7.1f} ms")

    # 6. the shifted corner reduce (read 1.6 GB buffer in 6 slices)
    acc = jnp.asarray(rng.uniform(size=(ex * ey * ez, 96)).astype(np.float32))
    def f6_(acc):
        sx = sy = sz = 161
        a = acc.reshape(ex, ey, ez, 4, 2, 12)
        a = (jax.lax.slice_in_dim(a, 1, 1 + sz, axis=2)[..., 0, :]
             + jax.lax.slice_in_dim(a, 0, sz, axis=2)[..., 1, :])
        a = a.reshape(ex, ey, sz, 2, 2, 12)
        a = (jax.lax.slice_in_dim(a, 1, 1 + sy, axis=1)[..., 0, :]
             + jax.lax.slice_in_dim(a, 0, sy, axis=1)[..., 1, :])
        a = a.reshape(ex, sy, sz, 1, 2, 12)
        a = (jax.lax.slice_in_dim(a, 1, 1 + sx, axis=0)[..., 0, :]
             + jax.lax.slice_in_dim(a, 0, sx, axis=0)[..., 1, :])
        return a.sum()
    f6 = jax.jit(f6_)
    print(f"shifted corner reduce : {timeit(lambda: f6(acc)) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
