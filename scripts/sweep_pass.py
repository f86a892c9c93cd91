import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
"""Round-3 continuation sweep at the 598k operating point: trim the
pass-budget (the aggregation MLP runs on S_pass*share slots; the measured
mean demand is ~50k of the 71.7k granted) and revisit share32 now that the
row-granular scatter made wide subgroups cheaper. Quality reference = the
EXACT per-sample KNN render at generous budgets (ship gate: >= 50 dB
PSNR-vs-exact, the budget-knob policy of docs/performance.md)."""
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
        # exact reference: per-sample KNN, generous budgets
        ("exact-ref", {"knn_share": 1, "coarse_stride": 16,
                       "active_fraction": 0.42, "pass_fraction": 0.50,
                       "group_pass_fraction": 0.0}),
        ("default", {}),                       # share16 cand12 cs32 pf.30
        ("pf0.25", {"pass_fraction": 0.25}),
        ("pf0.20", {"pass_fraction": 0.20}),
        ("share32", {"knn_share": 32}),
        ("share32-pf0.25", {"knn_share": 32, "pass_fraction": 0.25}),
        ("af0.25", {"active_fraction": 0.25}),
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
        print(f"{name:15s}: {rps:9.1f} rays/s  PSNR-vs-exact={psnr:6.2f} dB"
              f"  pix>1/255: {frac:.4%}", flush=True)


if __name__ == "__main__":
    main()
