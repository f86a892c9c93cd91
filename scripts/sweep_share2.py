import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
"""Round-4 operating-point sweep: shared-KNN knobs measured against the
EXACT render (share=1) at the same budgets; >=50 dB gate."""
import numpy as np


def main():
    import importlib.util
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.models import temporal_points as tp
    from sweep_render import run_case

    cases = [
        ("exact_cs32", {"knn_share": 1, "coarse_stride": 32}),
        ("s16c12_cs32", {"knn_share": 16, "knn_cand": 12,
                         "coarse_stride": 32}),       # current default
        ("s16c10_cs32", {"knn_share": 16, "knn_cand": 10,
                         "coarse_stride": 32}),
        ("s16c12_cs64", {"knn_share": 16, "knn_cand": 12,
                         "coarse_stride": 64}),
        ("s32c12_cs64", {"knn_share": 32, "knn_cand": 12,
                         "coarse_stride": 64}),
    ]
    ref_img = None
    for name, ov in cases:
        rps, img = run_case(benchmod, jax, jnp, tp, ov)
        if ref_img is None:
            ref_img = img
        d = img - ref_img
        mse = float((d ** 2).mean())
        psnr = 99.0 if mse == 0 else -10.0 * np.log10(mse)
        frac = float((np.abs(d).max(-1) > 1 / 255).mean())
        print(f"{name:12s}: {rps:9.1f} rays/s  PSNR-vs-exact={psnr:6.2f} dB"
              f"  pix>1/255: {frac:.4%}", flush=True)


if __name__ == "__main__":
    main()
