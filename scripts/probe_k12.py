import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Probe VMEM-viable (qb, rt) configs for the k=12 selection kernel."""
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from apnerf.kernels.knn_cells_pallas import (build_point_tables,
                                                 knn_radius_pallas)
    rng = np.random.default_rng(11)
    q = rng.normal(size=(4096 * 4, 3)).astype(np.float32)
    p = rng.normal(size=(10000, 3)).astype(np.float32)
    r2 = 0.08
    tables = build_point_tables(jnp.asarray(p))
    full = None
    for k, qb, rt in [(12, 256, 16), (12, 128, 24), (12, 128, 16),
                      (12, 256, 8), (16, 128, 16), (12, 64, 24)]:
        try:
            import time
            d2, idx = knn_radius_pallas(jnp.asarray(q), jnp.asarray(p), k=k,
                                        radius2=r2, tables=tables, qb=qb,
                                        rt=rt)
            d2n = np.asarray(d2)
            t0 = time.time()
            for _ in range(5):
                d2, idx = knn_radius_pallas(jnp.asarray(q), jnp.asarray(p),
                                            k=k, radius2=r2, tables=tables,
                                            qb=qb, rt=rt)
            _ = np.asarray(d2)[0, 0]
            dt = (time.time() - t0) / 5
            if full is None:
                fd = ((q[:, None, :] - p[None]) ** 2).sum(-1)
                full = np.sort(fd, 1)
            ref = full[:, :k]
            mask = ref <= r2
            err = np.abs(np.sort(d2n, 1)[mask] - ref[mask])
            rel = (err / np.maximum(ref[mask], 1e-9)).max() if mask.any() else 0
            print(f"k={k} qb={qb} rt={rt}: OK {dt*1e3:.1f} ms "
                  f"maxrel={rel:.2e}", flush=True)
        except Exception as e:
            msg = str(e)
            i = msg.find("Scoped allocation")
            print(f"k={k} qb={qb} rt={rt}: FAIL "
                  f"{msg[i:i+60] if i >= 0 else msg[:90]}", flush=True)


if __name__ == "__main__":
    main()
