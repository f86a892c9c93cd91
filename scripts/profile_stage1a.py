import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Sub-decomposition of stage-1 'A' (sampling + occupancy + compaction).

PERF.md round-5 lists A at 76.3 ms and calls it cumsum-bound; this script
splits it into ray synthesis, slab sampling, occupancy lookup, the
compaction cumsum, the compaction scatter, and the final row gather so the
next optimization targets the real term.
"""
import time

import numpy as np


def timeit(f, n=10):
    r = f()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        r = f()
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.time() - t0) / n


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from apnerf.models import tineuvox
    from apnerf.ops import compaction, rays as rayops
    from apnerf.data import rays as raydata

    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1.4, -1.4, -1.4), xyz_max=(1.4, 1.4, 1.4),
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, voxel_dim=12)
    stepsize = 0.5
    n_steps = cfg_model.max_steps(stepsize)
    N_rand = 4096
    H = W = 400
    K = np.array([[555.0, 0, 200.0], [0, 555.0, 200.0], [0, 0, 1]],
                 np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 3.5
    Ks = jnp.asarray(np.stack([K, K]))
    poses_d = jnp.asarray(poses)

    ws = cfg_model.world_size
    gx = np.linspace(-1, 1, ws[0])[:, None, None]
    gy = np.linspace(-1, 1, ws[1])[None, :, None]
    gz = np.linspace(-1, 1, ws[2])[None, None, :]
    blob = (gx ** 2 + gy ** 2 + gz ** 2) < 0.45 ** 2
    occ = compaction.build_occupancy_grid(jnp.asarray(blob))
    occ = compaction.build_occupancy_grid(occ)
    budget = 524288
    M_full = N_rand * n_steps
    print(f"n_steps={n_steps} M_full={M_full} budget={budget}")

    rng = np.random.default_rng(0)
    B = N_rand
    cam = jnp.asarray((np.arange(B) % 2).astype(np.int32))
    pix = jnp.asarray(rng.integers(0, H * W, B).astype(np.int32))
    near, far, bg = 2.0, 6.0, 1.0
    stepdist = stepsize * cfg_model.voxel_size
    xyz_min = jnp.asarray(cfg_model.xyz_min)
    xyz_max = jnp.asarray(cfg_model.xyz_max)

    # A1: ray synthesis
    @jax.jit
    def a1(cam, pix):
        return raydata.pixels_to_rays(Ks, poses_d, cam, pix, H, W)

    t = timeit(lambda: a1(cam, pix))
    ro, rd, vd = a1(cam, pix)
    print(f"A1 ray synthesis:     {t * 1e3:7.2f} ms")

    # A2: slab sampling
    @jax.jit
    def a2(ro, rd):
        s = rayops.sample_pts_on_rays(ro, rd, cfg_model.xyz_min,
                                      cfg_model.xyz_max, near, far,
                                      stepdist, n_steps)
        return s.pts, s.valid

    t = timeit(lambda: a2(ro, rd))
    pts, valid0 = a2(ro, rd)
    print(f"A2 slab sampling:     {t * 1e3:7.2f} ms")

    # A3: occupancy lookup
    @jax.jit
    def a3(pts, valid0, occ):
        return valid0 & compaction.occupancy_lookup_xyz(
            occ, xyz_min, xyz_max, pts)

    t = timeit(lambda: a3(pts, valid0, occ))
    valid = a3(pts, valid0, occ)
    print(f"A3 occupancy lookup:  {t * 1e3:7.2f} ms")

    # A4: compaction cumsum only
    vflat = valid.reshape(M_full)

    @jax.jit
    def a4(vflat):
        return jnp.cumsum(vflat) - 1

    t = timeit(lambda: a4(vflat))
    pos = a4(vflat)
    print(f"A4 compaction cumsum: {t * 1e3:7.2f} ms")

    # A5: compaction scatter
    @jax.jit
    def a5(vflat, pos):
        keep = vflat & (pos < budget)
        dest = jnp.where(keep, pos, budget)
        src = jnp.full((budget + 1,), M_full, jnp.int32)
        return src.at[dest].set(jnp.arange(M_full, dtype=jnp.int32),
                                mode="drop")[:budget]

    t = timeit(lambda: a5(vflat, pos))
    src = a5(vflat, pos)
    print(f"A5 compaction scatter:{t * 1e3:7.2f} ms")

    # A6: final row gather
    @jax.jit
    def a6(pts, src):
        pts_pad = jnp.concatenate(
            [pts.reshape(M_full, 3), jnp.zeros((1, 3))], 0)
        return pts_pad[src]

    t = timeit(lambda: a6(pts, src))
    print(f"A6 pts row gather:    {t * 1e3:7.2f} ms")

    # A (fused, as in profile_stage1.py)
    @jax.jit
    def a_full(cam, pix, occ):
        ro, rd, vd = raydata.pixels_to_rays(Ks, poses_d, cam, pix, H, W)
        s = rayops.sample_pts_on_rays(ro, rd, cfg_model.xyz_min,
                                      cfg_model.xyz_max, near, far,
                                      stepdist, n_steps)
        valid = s.valid & compaction.occupancy_lookup_xyz(
            occ, xyz_min, xyz_max, s.pts)
        src, filled = compaction.compact_flat(valid.reshape(M_full), budget)
        pts_pad = jnp.concatenate(
            [s.pts.reshape(M_full, 3), jnp.zeros((1, 3))], 0)
        return pts_pad[src], src, filled

    t = timeit(lambda: a_full(cam, pix, occ))
    print(f"A fused total:        {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
