import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Debug harness for knn_radius_pallas: find and dissect mismatching rows."""
import numpy as np


def main():
    import jax.numpy as jnp
    from apnerf.kernels.knn_cells_pallas import (knn_radius_pallas,
                                                 _morton_with_bounds, QB, PTS,
                                                 RT)

    from scripts.bench_knn import make_workload
    q, p = make_workload(M=16384)
    print('workload ready', flush=True)
    r2 = 0.01
    k = 8
    d2, idx = knn_radius_pallas(jnp.asarray(q), jnp.asarray(p), k=k,
                                radius2=r2)
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    print('kernel done', flush=True)
    chunks = []
    for c0 in range(0, len(q), 4096):
        chunks.append(((q[c0:c0 + 4096, None, :] - p[None]) ** 2).sum(-1))
    full = np.concatenate(chunks, 0)
    ref_d = np.sort(full, 1)[:, :k]
    ref_i = np.argsort(full, 1)[:, :k]
    ok = ref_d[:, -1] <= r2

    bad = np.where(ok & (np.abs(d2 - ref_d) > ref_d * 2e-3 + 1e-6).any(1))[0]
    print(f"{len(bad)} bad rows of {ok.sum()} passing")
    if not len(bad):
        return
    r = int(bad[0])
    print("row", r)
    print("ref_d", ref_d[r])
    print("got_d", d2[r])
    print("ref_i", ref_i[r])
    print("got_i", idx[r])

    # reconstruct prep state
    p_lo, p_hi = p.min(0), p.max(0)
    perm = np.asarray(jnp.argsort(_morton_with_bounds(jnp.asarray(p),
                                                      jnp.asarray(p_lo),
                                                      jnp.asarray(p_hi))))
    pts = p[perm]
    P = len(p)
    ppad = (-P) % PTS
    pts_pad = np.concatenate([pts, np.full((ppad, 3), 1e9, np.float32)])
    T = len(pts_pad) // PTS
    tiles = pts_pad.reshape(T, PTS, 3)
    qperm = np.asarray(jnp.argsort(_morton_with_bounds(jnp.asarray(q),
                                                       jnp.asarray(p_lo),
                                                       jnp.asarray(p_hi))))
    spos = int(np.where(qperm == r)[0][0])   # row in sorted order
    b = spos // QB
    qb = q[qperm].reshape(-1, QB, 3)
    q_lo, q_hi = qb[b].min(0), qb[b].max(0)
    gap = np.maximum(np.maximum(q_lo - tiles.max(1), tiles.min(1) - q_hi), 0)
    cand = (gap ** 2).sum(-1) < r2
    order = np.argsort(~cand, kind="stable")
    cnt = int(cand.sum())
    print(f"block {b}: cnt={cnt} tiles, rounds={-(-cnt // RT)}")
    # which tile holds the missing nearest point?
    missing = [i for i in ref_i[r] if i not in idx[r]]
    for mi in missing:
        sp = int(np.where(perm == mi)[0][0])
        t = sp // PTS
        in_list = bool(cand[t])
        pos = int(np.where(order == t)[0][0]) if in_list else -1
        print(f"missing point {mi}: sorted pos {sp}, tile {t}, "
              f"candidate={in_list}, list pos={pos}, d2={full[r, mi]:.6f}")


if __name__ == "__main__":
    main()
