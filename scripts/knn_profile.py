import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Decompose knn_radius_pallas wall time: prep (sorts) vs kernel vs post."""
import time

import numpy as np

from scripts.bench_knn import make_workload


def timeit(fn, n=10):
    fn()
    t0 = time.time()
    for _ in range(n):
        out = fn()
    o = out[0] if isinstance(out, (tuple, list)) else out
    _ = np.asarray(o[(0,) * o.ndim])   # scalar readback: wait, don't transfer
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    import apnerf.kernels.knn_cells_pallas as kc
    from apnerf.kernels.knn_cells_pallas import (_morton_with_bounds, QB,
                                                 PTS, knn_radius_pallas)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q_np, p_np = make_workload()
    q0 = jnp.asarray(q_np)
    p0 = jnp.asarray(p_np)
    r2 = 0.01
    k = 8

    @jax.jit
    def prep(qf, pf):
        p_lo, p_hi = pf.min(0), pf.max(0)
        perm = jnp.argsort(_morton_with_bounds(pf, p_lo, p_hi))
        pts = pf[perm]
        P = pf.shape[0]
        ppad = (-P) % PTS
        pts = jnp.concatenate([pts, jnp.full((ppad, 3), 1e9, jnp.float32)])
        T = (P + ppad) // PTS
        tiles = pts.reshape(T, PTS, 3)
        qperm = jnp.argsort(_morton_with_bounds(qf, p_lo, p_hi))
        q = qf[qperm]
        M = qf.shape[0]
        mpad = (-M) % QB
        q = jnp.pad(q, ((0, mpad), (0, 0)), constant_values=2e9)
        NB = (M + mpad) // QB
        qb = q.reshape(NB, QB, 3)
        gap = jnp.maximum(jnp.maximum(
            qb.min(1)[:, None, :] - tiles.max(1)[None],
            tiles.min(1)[None] - qb.max(1)[:, None, :]), 0.0)
        cand = (gap * gap).sum(-1) < r2
        order = jnp.argsort(~cand, axis=1, stable=True).astype(jnp.int32)
        cnt = cand.sum(1).astype(jnp.int32)
        meta = jnp.concatenate([cnt[:, None], order], axis=1)
        meta = jnp.pad(meta, ((0, 0), (0, 1024 - 1 - T))).reshape(NB, 8, 128)
        return meta, q, jnp.transpose(tiles, (0, 2, 1)), perm, qperm, pts

    meta, q, pts_t, perm, qperm, pts = jax.block_until_ready(prep(q0, p0))
    NB = meta.shape[0]
    T = pts_t.shape[0]
    M = q_np.shape[0]

    @jax.jit
    def kernel_only(meta, q, pts_t):
        return pl.pallas_call(
            partial(kc._kernel, k),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((QB, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 3, PTS), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((QB, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NB * QB, k), jnp.int32),
            scratch_shapes=[pltpu.VMEM((QB, kc.BW), jnp.int32)],
        )(meta, q, pts_t)

    @jax.jit
    def post(oi, q, pts, perm, qperm):
        oi = oi[:M]
        qs = q[:M]
        d2 = jnp.sum((qs[:, None, :] - pts[oi]) ** 2, axis=-1)
        o8 = jnp.argsort(d2, axis=1)
        d2 = jnp.take_along_axis(d2, o8, axis=1)
        oi = jnp.take_along_axis(oi, o8, axis=1)
        idx = perm[oi]
        inv = jnp.argsort(qperm)
        return d2[inv], idx[inv]

    oi = kernel_only(meta, q, pts_t)

    t_prep = timeit(lambda: prep(q0, p0))
    t_kern = timeit(lambda: kernel_only(meta, q, pts_t))
    t_post = timeit(lambda: post(oi, q, pts, perm, qperm))
    t_full = timeit(lambda: knn_radius_pallas(q0, p0, k=k, radius2=r2))
    print(f"prep   (sorts+cand): {t_prep * 1e3:8.2f} ms")
    print(f"kernel             : {t_kern * 1e3:8.2f} ms")
    print(f"post   (d2+unsort) : {t_post * 1e3:8.2f} ms")
    print(f"full wrapper       : {t_full * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
