"""Benchmark: TemporalPoints repose-rendering throughput (rays/sec/chip).

This is the BASELINE.md north-star metric ("repose rendering >= 5x reference
rays/sec"): render a jumpingjacks-scale reposable point model (10^4 points,
24 joints, K=8 neighbours, 400x400 image) through the full forward path
(LBS warp -> occupancy-pruned ray sampling -> KNN feature aggregation ->
compositing) and measure steady-state rays/sec on one chip.

``vs_baseline`` compares against BASELINE_RAYS_PER_SEC, a derived
estimate of the CUDA/pykeops reference implementation's repose rendering
throughput on an A100-class GPU. The repo publishes no numbers; the full
derivation (per-stage FLOP/bandwidth budget of the reference chunk
pipeline, lib/temporalpoints.py:416-521) lives in BASELINE.md. Replace
with a measured number when the reference can be run.
"""
import json
import os
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 150_000.0


def build_model(P=10_000, J=24, F=128):
    import jax
    import jax.numpy as jnp
    from apnerf.models import temporal_points as tp
    from apnerf.models import tineuvox
    import apnerf.ops.nn as onn

    rng = np.random.default_rng(0)
    # a plausible articulated cloud: points scattered around a joint chain
    joints = np.zeros((J, 3), np.float32)
    joints[:, 1] = np.linspace(-0.8, 0.8, J)
    joints[:, 0] = 0.2 * np.sin(np.linspace(0, 3, J))
    bones = [[j, j + 1] for j in range(J - 1)]
    seg = rng.integers(0, J, P)
    pcd = (joints[seg] + rng.normal(size=(P, 3)) * 0.08).astype(np.float32)
    feat = rng.normal(size=(P, F)).astype(np.float32) * 0.1

    mcfg = tp.TemporalPointsConfig(
        n_points=P, n_joints=J, feat_dim=F, neighbours=8,
        timebase_pe=8, posbase_pe=10, viewbase_pe=4,
        stepsize=0.5, voxel_size=0.012, voxel_size_ratio=1.0,
        act_shift=float(np.log(1 / (1 - 1e-3) - 1)),
        fast_color_thres=1e-4, sample_budget=96, max_steps=512,
        # subgroup-shared KNN render defaults (docs/performance.md): the
        # round-5 TPU sweep (scripts/sweep_r5.py, PERF.md) measured
        # share16/cand8 at coarse_stride 32 = 752.7k rays/s at 59.9 dB
        # PSNR vs the exact-KNN render (gate: >= 50 dB, asserted below).
        # cand8 == K engages the rank-free fast path (no rank mask, no
        # compaction einsums); env knobs for A/B
        knn_share=int(os.environ.get("APNERF_KNN_SHARE", "16")),
        knn_cand=int(os.environ.get("APNERF_KNN_CAND", "8")),
        coarse_stride=int(os.environ.get("APNERF_COARSE_STRIDE", "32")),
        # budget-fraction A/B knobs (scripts/sweep_r5.py): the defaults
        # carry the dataclass values; the round-3 audit measured only ~23%
        # of active samples passing the radius cutoff vs the 0.30 budget
        active_fraction=float(os.environ.get("APNERF_ACTIVE_FRACTION",
                                             "0.30")),
        pass_fraction=float(os.environ.get("APNERF_PASS_FRACTION", "0.30")))

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 3)
    tnv = {
        "rgbnet": tineuvox.init_rgbnet(ks[0], F, mcfg.views_ch),
        "densitynet": onn.init_mlp(ks[1], [F, 1]),
        "timenet": onn.init_mlp(ks[2], [mcfg.t_dim, 128, 60]),
    }
    params = tp.init_params(jax.random.PRNGKey(1), mcfg, pcd, joints, bones,
                            feat, np.full(P, 0.5, np.float32),
                            np.full((P, 3), 0.5, np.float32), tnv)
    state = tp.init_state(mcfg, pcd, joints, bones, pcd[::40],
                          pcd.min(0) - 0.1, pcd.max(0) + 0.1)
    return params, mcfg, state


def _probe_backend(timeout_s: float = 180.0):
    """Fail fast (with a diagnosable message) when the remote TPU tunnel is
    down: backend init then HANGS indefinitely rather than erroring, which
    would otherwise burn the whole driver timeout with no output."""
    import threading

    ok = threading.Event()

    def probe():
        import jax
        np.asarray(jax.numpy.ones((8, 8)).sum())
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        import sys
        print(f"bench: backend unreachable after {timeout_s:.0f}s "
              "(axon TPU tunnel down?) — aborting", file=sys.stderr)
        os._exit(3)


def measure_mode(params, mcfg, state):
    """Render frames in the given config.

    Returns (rays_per_sec, dt_frame_seconds, rgb_frame[n_rays, 3]).
    """
    import jax
    import jax.numpy as jnp
    from apnerf.models import temporal_points as tp
    H = W = 400
    CHUNK = int(os.environ.get("APNERF_BENCH_CHUNK", "8192"))
    focal = 555.0
    rng = np.random.default_rng(1)

    @jax.jit
    def prep_frame(rot):
        return tp.prepare_frame(params, mcfg, state, rot_params=rot)

    @jax.jit
    def render_chunk(frame, ro, rd, vd):
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=None,
                         rot_params=None, near=0.5, far=6.0, bg=1.0,
                         render_depth=True, frame=frame)
        return res["rgb_marched"], res["depth"]

    # camera at +z looking at origin
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1).reshape(-1, 3).astype(np.float32)
    o = np.array([0, 0, 3.0], np.float32)
    rot = jnp.asarray(np.concatenate(
        [rng.normal(size=(mcfg.n_joints, 3)), 0.2 * np.ones((mcfg.n_joints, 1))],
        -1).astype(np.float32))

    n_rays = H * W
    pad = (-n_rays) % CHUNK
    dirs = np.concatenate([dirs, dirs[:pad]], 0)
    chunks = dirs.reshape(-1, CHUNK, 3)
    n_chunks = len(chunks)

    # single-dispatch frame render: rays generated ON DEVICE and the chunk
    # loop rolled into one lax.scan — no per-chunk host->device direction
    # transfers or dispatch RPCs over the (remote) tunnel. Ray values match
    # the host meshgrid up to fp32 associativity. APNERF_BENCH_SCAN=0
    # restores the per-chunk dispatch loop for A/B.
    one_dispatch = os.environ.get("APNERF_BENCH_SCAN", "1") == "1"
    o_dev = jnp.asarray(o)

    @jax.jit
    def render_frame(frame):
        def body(_, ci):
            pix = (ci * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)) % n_rays
            px = (pix % W).astype(jnp.float32) + 0.5
            py = (pix // W).astype(jnp.float32) + 0.5
            rd = jnp.stack([(px - W / 2) / focal, -(py - H / 2) / focal,
                            -jnp.ones_like(px)], -1)
            ro = jnp.broadcast_to(o_dev, rd.shape)
            vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            res = tp.forward(params, mcfg, state, ro, rd, vd, t=None,
                             rot_params=None, near=0.5, far=6.0, bg=1.0,
                             render_depth=True, frame=frame)
            return 0, (res["rgb_marched"], res["depth"])
        _, (rgbs, deps) = jax.lax.scan(
            body, 0, jnp.arange(n_chunks, dtype=jnp.int32))
        return rgbs, deps

    def run_once():
        frame = prep_frame(rot)
        if one_dispatch:
            rgbs, deps = render_frame(frame)
            _ = np.asarray(rgbs[-1][0])
            return rgbs
        outs = []
        for c in chunks:
            rd = jnp.asarray(c)
            ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
            vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            outs.append(render_chunk(frame, ro, rd, vd))
        # block_until_ready does not synchronise on this backend (PERF.md);
        # force a host readback of the last chunk
        _ = np.asarray(outs[-1][0][0])
        return outs

    run_once()  # compile + warm caches
    # APNERF_PROFILE=<dir>: capture a jax.profiler trace of one steady-state
    # frame (SURVEY.md §5.1 observability; view with tensorboard/xprof)
    prof_dir = os.environ.get("APNERF_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            run_once()
        print(f"# trace written to {prof_dir}", flush=True)
    t0 = time.time()
    n_iters = 3
    for _ in range(n_iters):
        run_once()
    dt = (time.time() - t0) / n_iters
    rays_per_sec = n_rays / dt

    rgbs = run_once()
    if one_dispatch:
        img = np.asarray(rgbs).reshape(-1, 3)[:n_rays]
    else:
        img = np.concatenate([np.asarray(r) for r, _ in rgbs], 0)[:n_rays]
    return rays_per_sec, dt, img


def main():
    import jax
    # persistent compile cache: TPU compiles through the remote AOT helper
    # run minutes; cache hits make repeat benchmarks (and driver re-runs
    # within an image) near-instant
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    _probe_backend()
    H = W = 400
    CHUNK = int(os.environ.get("APNERF_BENCH_CHUNK", "8192"))
    n_rays = H * W
    n_chunks = (n_rays + CHUNK - 1) // CHUNK

    # Dual-mode reporting (VERDICT r3 #2): the shared-KNN mode (knn_share>1)
    # is a lossy approximation the reference does not have, so its headline
    # number is only honest next to the exact-KNN number and the PSNR
    # between the two renders. The >=50 dB gate from the round-3 A/B
    # (PERF.md share sweep) is asserted HERE, every bench run: if the shared
    # render drifts below the gate, the headline falls back to exact.
    PSNR_GATE_DB = 50.0
    params, mcfg, state = build_model()
    shared_mode = int(getattr(mcfg, "knn_share", 1)) > 1

    shared_rps, dt, img_shared = measure_mode(params, mcfg, state)
    if shared_mode:
        os.environ["APNERF_KNN_SHARE"] = "1"
        params_e, mcfg_e, state_e = build_model()
        exact_rps, _, img_exact = measure_mode(params_e, mcfg_e, state_e)
        mse = float(np.mean((img_shared - img_exact) ** 2))
        psnr = float(-10.0 * np.log10(max(mse, 1e-12)))
        gate_ok = psnr >= PSNR_GATE_DB
    else:
        exact_rps, psnr, gate_ok = shared_rps, float("inf"), True

    headline = shared_rps if gate_ok else exact_rps
    print(json.dumps({
        "metric": "repose_render_rays_per_sec",
        "value": round(headline, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(headline / BASELINE_RAYS_PER_SEC, 3),
        "exact_rays_per_sec": round(exact_rps, 1),
        "shared_rays_per_sec": round(shared_rps, 1),
        "shared_psnr_vs_exact": (round(psnr, 2) if np.isfinite(psnr)
                                 else None),
        "psnr_gate_db": PSNR_GATE_DB,
        "psnr_gate_ok": gate_ok,
        "roofline": roofline(mcfg, n_chunks=n_chunks, chunk=CHUNK,
                             dt_frame=dt),
    }))


def roofline(mcfg, n_chunks, chunk, dt_frame):
    """Analytic per-frame cost model vs chip limits (VERDICT r2 #7).

    Counts the pipeline's gather rows, MXU FLOPs and HBM bytes from the
    config (the gather-floor model of PERF.md), and reports the implied
    fraction of each hardware limit the measured time achieves. The
    dominant term tells whether the pipeline is near its floor or has
    headroom. Limits (v5e): measured gather floor ~80M rows/s (PERF.md),
    bf16 MXU peak ~197 TFLOP/s, HBM ~819 GB/s.
    """
    GATHER_ROWS_PER_S = 80e6
    MXU_BF16 = 197e12
    HBM_BPS = 819e9
    R, B, K, F = chunk, mcfg.sample_budget, mcfg.neighbours, mcfg.feat_dim
    c = mcfg.coarse_stride
    S = mcfg.max_steps
    M_act = int(R * B * mcfg.active_fraction)
    M_act = max(1024, (M_act + 1023) // 1024 * 1024)
    G_act = M_act // c
    M_pass = int(M_act * mcfg.pass_fraction)
    M_pass = max(1024, (M_pass + 1023) // 1024 * 1024)
    M_pass = min(M_pass, M_act)
    share = int(getattr(mcfg, "knn_share", 1))
    if share > 1:
        # subgroup-shared KNN: candidate rows gathered once per subgroup,
        # MLP runs on knn_cand candidates per member sample
        kc = int(mcfg.knn_cand)
        S_pass = max(128, (int(M_act * mcfg.pass_fraction) // share
                           + 127) // 128 * 128)
        n_samp = S_pass * share
        rows = R * (S // c) + G_act + 3 * S_pass + S_pass * kc
        kk = kc
        M_mlp = n_samp
        bytes_ = (S_pass * kc * (24 + F) * 2 + R * (S // c) * 4
                  + R * B * 8)
    else:
        rows = R * (S // c) + G_act + 3 * M_pass + M_pass * K
        kk = K
        M_mlp = M_pass
        bytes_ = M_pass * K * (24 + F) * 2 + R * (S // c) * 4 + R * B * 8
    # MXU flops per chunk: feat_net on every (sample, candidate)
    fin = F + mcfg.pts_ch + mcfg.pose_embedding_dim
    feat_macs = fin * F + F * F * 3
    head_macs = F * 1 + F * F + (F + mcfg.views_ch) * (F // 2) + (F // 2) * 3
    flops = 2 * (M_mlp * kk * feat_macs + M_mlp * head_macs)
    dt_chunk = dt_frame / n_chunks
    return {
        "per_chunk": {"gather_rows": rows, "mxu_flops": flops,
                      "hbm_bytes": bytes_},
        "floor_ms": {
            "gather": round(rows / GATHER_ROWS_PER_S * 1e3, 2),
            "mxu": round(flops / MXU_BF16 * 1e3, 2),
            "hbm": round(bytes_ / HBM_BPS * 1e3, 2),
        },
        "measured_chunk_ms": round(dt_chunk * 1e3, 2),
        "frac_of_floor": round(
            max(rows / GATHER_ROWS_PER_S, flops / MXU_BF16,
                bytes_ / HBM_BPS) / dt_chunk, 3),
    }


if __name__ == "__main__":
    main()
