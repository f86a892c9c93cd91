import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-5 operating-point sweep toward the 5x north star (VERDICT r4 #2).

Reuses bench.py's measure_mode (single-dispatch scan, chained readback) so
numbers are directly comparable to BENCH_r0x.json. Sweeps knn_cand down to
K=8 (the rank-free fast path: no rank mask, no one-hot compaction einsums,
2 fewer gather rows per subgroup) and the 16384-ray chunk, against the
exact render at the same budgets; >=50 dB gate like the bench.

Run on a free TPU: python scripts/sweep_r5.py
"""
import importlib.util

import numpy as np

CASES = [
    ("exact_cs32", {"APNERF_KNN_SHARE": "1"}),
    ("s16c10_cs32", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "10"}),
    ("s16c9_cs32", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "9"}),
    ("s16c8_cs32", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "8"}),
    ("s16c8_chunk16k", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "8",
                        "APNERF_BENCH_CHUNK": "16384"}),
    ("s16c10_chunk16k", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "10",
                         "APNERF_BENCH_CHUNK": "16384"}),
    ("exact_chunk16k", {"APNERF_KNN_SHARE": "1",
                        "APNERF_BENCH_CHUNK": "16384"}),
    ("s16c8_chunk32k", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "8",
                        "APNERF_BENCH_CHUNK": "32768"}),
    ("exact_chunk32k", {"APNERF_KNN_SHARE": "1",
                        "APNERF_BENCH_CHUNK": "32768"}),
]

# pass-fraction sweep (round-5 part 2): the radius-cutoff pass budget is
# 0.30 of active but only ~23% pass (round-3 audit) — the padding inflates
# selection queries, candidate gathers and the aggregation MLP in BOTH
# modes. Gate vs the exact pf=0.30 reference like every other knob.
PF_CASES = [
    ("exact_pf30_ref", {"APNERF_KNN_SHARE": "1"}),
    ("exact_pf25", {"APNERF_KNN_SHARE": "1", "APNERF_PASS_FRACTION": "0.25"}),
    ("s16c8_pf25", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "8",
                    "APNERF_PASS_FRACTION": "0.25"}),
    ("exact_af25", {"APNERF_KNN_SHARE": "1",
                    "APNERF_ACTIVE_FRACTION": "0.25"}),
    ("s16c8_af25", {"APNERF_KNN_SHARE": "16", "APNERF_KNN_CAND": "8",
                    "APNERF_ACTIVE_FRACTION": "0.25"}),
]

KNOBS = ("APNERF_KNN_SHARE", "APNERF_KNN_CAND", "APNERF_COARSE_STRIDE",
         "APNERF_BENCH_CHUNK", "APNERF_PASS_FRACTION",
         "APNERF_ACTIVE_FRACTION")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    benchmod._probe_backend()

    ref_img = None
    cases = (PF_CASES if os.environ.get("APNERF_SWEEP_SET") == "pf"
             else CASES)
    for name, env in cases:
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        params, mcfg, state = benchmod.build_model()
        rps, _, img = benchmod.measure_mode(params, mcfg, state)
        if ref_img is None:
            ref_img = img
        d = img - ref_img
        mse = float((d ** 2).mean())
        psnr = 99.0 if mse == 0 else -10.0 * np.log10(mse)
        frac = float((np.abs(d).max(-1) > 1 / 255).mean())
        print(f"{name:16s}: {rps:9.1f} rays/s  PSNR-vs-exact={psnr:6.2f} dB"
              f"  pix>1/255: {frac:.4%}", flush=True)


if __name__ == "__main__":
    main()
