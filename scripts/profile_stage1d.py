import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Backward-path decomposition of the stage-1 active pipeline (the 247 ms
C2 term of profile_stage1.py).

Variants of the same pipeline (deformation + 3-scale interp + featurenet +
heads on 524288 active samples):
  P1 forward only
  P2 value_and_grad wrt ALL params         (= C2; grid grad machinery on)
  P3 value_and_grad with the grid stop-gradiented (MLP grads only)
  P4 P2 with APNERF_SCATTER=0 would need a re-import; instead we time the
     grid-gradient trio standalone per scale (sort+permute+kernel+reduce)
Chained-scan device timing, one readback (PERF.md measurement caveat).
"""
import time

import numpy as np

N_REP = 8


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from apnerf.models import tineuvox
    from apnerf.ops import nn

    cfg_model = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1.4, -1.4, -1.4), xyz_max=(1.4, 1.4, 1.4),
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, voxel_dim=12,
        defor_depth=3, net_width=256, alpha_init=1e-3, fast_color_thres=1e-4,
        mlp_bf16=True)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg_model)
    A = 524288
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, size=(A, 3)).astype(np.float32))
    tfeat = jnp.asarray(rng.uniform(size=(
        A, cfg_model.timenet_output)).astype(np.float32))

    def token_of(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        return sum(x.ravel()[0].astype(jnp.float32) * 0.0 for x in leaves)

    def rep_time(stage, perturb, label, n=N_REP):
        @jax.jit
        def run():
            def body(tok, _):
                out = stage(*perturb(tok))
                return token_of(out), None
            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return tok
        _ = np.asarray(run())
        t0 = time.time()
        _ = np.asarray(run())
        dt = (time.time() - t0) / n * 1e3
        print(f"{label:42s} {dt:7.2f} ms")
        return dt

    def pipeline(p, pts_, tfeat_):
        h, _ = tineuvox.query_density_features(p, cfg_model, pts_, tfeat_)
        density = nn.mlp(p["densitynet"], h)[..., 0]
        return density.sum()

    rep_time(lambda pts_, t_: pipeline(params, pts_, t_),
             lambda tok: (pts + tok, tfeat), "P1 pipeline fwd only")

    def grad_all(pts_, tfeat_):
        return jax.grad(lambda p: pipeline(p, pts_, tfeat_))(params)
    rep_time(grad_all, lambda tok: (pts + tok, tfeat),
             "P2 fwd+bwd all params (C2)")

    def grad_nogrid(pts_, tfeat_):
        def f(p):
            p2 = dict(p)
            p2["feature"] = jax.lax.stop_gradient(params["feature"])
            return pipeline(p2, pts_, tfeat_)
        return jax.grad(f)(params)
    rep_time(grad_nogrid, lambda tok: (pts + tok, tfeat),
             "P3 fwd+bwd, grid stop-grad")

    # grid-gradient trio standalone, per scale
    from apnerf.kernels.scatter_pallas import sorted_window_accumulate
    for (dims, label) in (((162, 162, 162), "fine 162^3"),
                          ((82, 82, 82), "mid 82^3"),
                          ((42, 42, 42), "coarse 42^3")):
        ex, ey, ez = dims
        n_cells = ex * ey * ez
        lin = jnp.asarray(
            rng.integers(0, n_cells, size=A).astype(np.int32))
        upd = jnp.asarray(rng.uniform(size=(A, 96)).astype(np.float32))

        def trio(lin_, upd_):
            o = jnp.argsort(lin_)
            acc = sorted_window_accumulate(lin_[o], upd_[o], n_cells)
            maxoff = (ey + 1) * ez + 1
            accp = jnp.concatenate(
                [acc, jnp.zeros((maxoff, 96), jnp.float32)], 0)
            red = 0.0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        k = (dx * 2 + dy) * 2 + dz
                        off = ((1 - dx) * ey + (1 - dy)) * ez + (1 - dz)
                        red = red + jax.lax.dynamic_slice(
                            accp, (off, k * 12), (n_cells, 12))
            return red.sum()
        rep_time(trio, lambda tok, lin_=lin, upd_=upd: (lin_, upd_ + tok),
                 f"grid-grad trio {label}")


if __name__ == "__main__":
    main()
