import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Diagnostics: candidate-tile statistics for the stage-2 KNN workload."""
import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from scripts.bench_knn import make_workload  # noqa: E402


def stats(q, p, qb, pts, r, sort_queries, label):
    import jax.numpy as jnp
    from apnerf.kernels.knn_pallas import _morton_codes

    perm = np.asarray(jnp.argsort(_morton_codes(jnp.asarray(p))))
    ps = p[perm]
    P = len(ps)
    ppad = (-P) % pts
    ps = np.concatenate([ps, np.full((ppad, 3), 1e9, np.float32)])
    T = len(ps) // pts
    tiles = ps.reshape(T, pts, 3)
    t_lo, t_hi = tiles.min(1), tiles.max(1)

    if sort_queries:
        qs = q[np.asarray(jnp.argsort(_morton_codes(jnp.asarray(q))))]
    else:
        qs = q
    M = len(qs)
    mpad = (-M) % qb
    qs = np.concatenate([qs, np.full((mpad, 3), 2e9, np.float32)])
    NB = len(qs) // qb
    qblk = qs.reshape(NB, qb, 3)
    q_lo, q_hi = qblk.min(1), qblk.max(1)

    gap = np.maximum(np.maximum(q_lo[:, None] - t_hi[None],
                                t_lo[None] - q_hi[:, None]), 0.0)
    lb = np.sqrt((gap ** 2).sum(-1))
    cand = lb < r
    cnt = cand.sum(1)
    # contiguous covering range of candidate tiles (Morton locality)
    first = np.where(cand.any(1), cand.argmax(1), 0)
    last = np.where(cand.any(1), T - cand[:, ::-1].argmax(1), 0)
    rng_w = last - first
    print(f"{label}: NB={NB} T={T} cand/blk mean={cnt.mean():.1f} "
          f"p50={np.percentile(cnt, 50):.0f} p90={np.percentile(cnt, 90):.0f} "
          f"max={cnt.max()} -> cand pts mean={cnt.mean() * pts:.0f} "
          f"({cnt.mean() * pts / P:.2%} of P) | range mean={rng_w.mean():.1f} "
          f"p90={np.percentile(rng_w, 90):.0f}")


def main():
    q, p = make_workload()
    r = 0.1
    stats(q, p, 256, 128, r, True, "cells        PT=128  morton-q ")
    stats(q, p, 256, 2048, r, True, "brute-style  PT=2048 morton-q ")
    stats(q, p, 256, 256, r, False, "cells        PT=256  natural-q")
    stats(q, p, 256, 256, r, True, "cells        PT=256  morton-q ")
    stats(q, p, 256, 64, r, True, "cells        PT=64   morton-q ")
    stats(q, p, 128, 128, r, True, "cells qb=128 PT=128  morton-q ")


if __name__ == "__main__":
    main()
