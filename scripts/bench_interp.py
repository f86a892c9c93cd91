import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""A/B: baked vs per-scale multiscale interp, forward and forward+grad,
at stage-1 scale (161^3 x 12 grid, 524288 points)."""
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from apnerf.ops.grid import bake_multiscale, mult_dist_interp

    rng = np.random.default_rng(0)
    S, C, M = 160, 12, 524288
    grid = jnp.asarray(rng.standard_normal((S, S, S, C)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, 1, (M, 3)).astype(np.float32))
    lo = jnp.zeros(3)
    hi = jnp.ones(3)

    def timeit(f, *a, n=10):
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.time()
        for _ in range(n):
            out = f(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.time() - t0) / n * 1e3

    fwd_baked = jax.jit(lambda g, p: mult_dist_interp(
        g, p, lo, hi, baked=bake_multiscale(g)).sum())
    import functools

    def perscale(g, p):
        from apnerf.ops.grid import pad_to_mult4, _interp_at_indices
        gp = pad_to_mult4(g)
        unit = (p - lo) / (hi - lo)
        outs = []
        for stride in (1, 2, 4):
            gs = gp[::stride, ::stride, ::stride]
            sh = jnp.asarray(gs.shape[:3], jnp.float32)
            outs.append(_interp_at_indices(gs, unit * (sh - 1.0)))
        return jnp.concatenate(outs, -1)

    fwd_scale = jax.jit(lambda g, p: perscale(g, p).sum())
    g_baked = jax.jit(jax.grad(lambda g, p: (mult_dist_interp(
        g, p, lo, hi, baked=bake_multiscale(g)) ** 2).sum()))
    g_scale = jax.jit(jax.grad(lambda g, p: (perscale(g, p) ** 2).sum()))

    bake_only = jax.jit(lambda g: bake_multiscale(g).sum())
    print(f"bake only:        {timeit(bake_only, grid):8.2f} ms", flush=True)
    print(f"fwd baked:        {timeit(fwd_baked, grid, pts):8.2f} ms",
          flush=True)
    print(f"fwd per-scale:    {timeit(fwd_scale, grid, pts):8.2f} ms",
          flush=True)
    print(f"fwd+grad baked:   {timeit(g_baked, grid, pts):8.2f} ms",
          flush=True)
    print(f"fwd+grad scale:   {timeit(g_scale, grid, pts):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
