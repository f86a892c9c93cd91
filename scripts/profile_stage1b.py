import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Ablations inside the stage-1 fwd+bwd pipeline (C2 of profile_stage1.py).

V1 full C2              : interp + deformation + MLPs, grad wrt all params
V2 no grid grad         : stop_gradient(feature) into interp
V3 canonical            : no deformation MLP (also kills d interp/d u path)
V4 no interp            : vox_feat = zeros (MLPs + deformation only)
V5 scatter kernel alone : argsort + sorted_window_accumulate at [M, 96]
"""
import time

import numpy as np


def timeit(f, n=6):
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
    from apnerf.ops import grid as gridops, nn, encoding
    from apnerf.kernels.scatter_pallas import sorted_window_accumulate

    bf16 = os.environ.get("APNERF_S1_BF16", "1") == "1"
    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1.4, -1.4, -1.4), xyz_max=(1.4, 1.4, 1.4),
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, voxel_dim=12,
        defor_depth=3, net_width=256, alpha_init=1e-3, fast_color_thres=1e-4,
        mlp_bf16=bf16)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    M = 524288
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.3, 1.3, size=(M, 3)).astype(np.float32))
    tfeat_1 = tineuvox.time_feature(params, cfg, jnp.full((1, 1), 0.3))
    tfeat = jnp.broadcast_to(tfeat_1, (M, tfeat_1.shape[-1]))
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    freqs_pos = encoding.poc_freqs(cfg.posbase_pe)
    freqs_grid = encoding.poc_freqs(cfg.gridbase_pe)

    def pipeline(p, pts, tfeat, grid_grad=True, canonical=False,
                 interp_on=True):
        feat = p["feature"]
        if not grid_grad:
            feat = jax.lax.stop_gradient(feat)
        pts_emb = encoding.poc_fre(pts, freqs_pos)
        if canonical:
            pts_delta = pts
        else:
            h_d = jnp.concatenate([pts_emb, tfeat], axis=-1)
            dx = nn.mlp(p["deformation_net"], h_d)
            pts_delta = pts_emb[..., :3] + dx
        if interp_on:
            vox_feat = gridops.mult_dist_interp(feat, pts_delta, xyz_min,
                                                xyz_max)
        else:
            vox_feat = jnp.zeros((pts.shape[0], 3 * cfg.voxel_dim),
                                 jnp.float32) + pts_delta.sum() * 0.0
        vox_emb = encoding.poc_fre(vox_feat, freqs_grid)
        h_in = jnp.concatenate([vox_emb, pts_emb, tfeat], axis=-1)
        h = nn.mlp(p["featurenet"], h_in, final_activation=jax.nn.relu)
        density = nn.mlp(p["densitynet"], h)[..., 0]
        return density.sum()

    variants = [
        ("V1 full", dict()),
        ("V2 no grid grad", dict(grid_grad=False)),
        ("V3 canonical", dict(canonical=True)),
        ("V4 no interp", dict(interp_on=False)),
    ]
    for name, kw in variants:
        fn = jax.jit(lambda p, pts, tf, kw=kw: jax.grad(
            lambda p: pipeline(p, pts, tf, **kw))(p))
        t = timeit(lambda: fn(params, pts, tfeat))
        print(f"{name:18s}: {t * 1e3:7.1f} ms")

    # V5: scatter kernel alone (per-scale cost x3 in the real bwd)
    ex = ey = ez = 162
    lin_ext = jnp.asarray(
        rng.integers(0, ex * ey * ez, M).astype(np.int32))
    upd = jnp.asarray(rng.uniform(size=(M, 96)).astype(np.float32))

    @jax.jit
    def v5(lin_ext, upd):
        order = jnp.argsort(lin_ext)
        return sorted_window_accumulate(lin_ext[order], upd[order],
                                        ex * ey * ez)

    t = timeit(lambda: v5(lin_ext, upd))
    print(f"V5 sort+scatter 96ch: {t * 1e3:7.1f} ms (x3 scales in bwd)")

    @jax.jit
    def v6(lin_ext):
        return jnp.argsort(lin_ext)

    t = timeit(lambda: v6(lin_ext))
    print(f"V6 argsort 524k     : {t * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
