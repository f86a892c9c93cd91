import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Device-time profile of the repose render chunk (bench.py workload).

profile_chunk.py times each stage with a per-iteration host readback,
which adds the axon tunnel RTT (~20-30 ms) to every number. Here each
stage is repeated N times INSIDE one jit via a lax.scan whose carry
token perturbs the inputs (so XLA cannot hoist the loop-invariant
computation), and the wall time of the single dispatch is divided by N
— pure device time per stage, one readback total.
"""
import time

import numpy as np

N_REP = 20


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.models import temporal_points as tp

    params, mcfg, state = benchmod.build_model()
    H = W = 400
    CHUNK = 8192
    focal = 555.0
    rng = np.random.default_rng(1)
    rot = jnp.asarray(np.concatenate(
        [rng.normal(size=(mcfg.n_joints, 3)),
         0.2 * np.ones((mcfg.n_joints, 1))], -1).astype(np.float32))

    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1).reshape(-1, 3).astype(np.float32)
    o = np.array([0, 0, 3.0], np.float32)
    c0 = dirs[len(dirs) // 2 - CHUNK // 2: len(dirs) // 2 + CHUNK // 2]
    rd = jnp.asarray(c0)
    ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    qr = 0.01

    prep = jax.jit(lambda r: tp.prepare_frame(params, mcfg, state,
                                              rot_params=r))
    frame = prep(rot)
    occ_info = frame["occ_info"]

    def token_of(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        return sum(x.ravel()[0].astype(jnp.float32) * 0.0 for x in leaves)

    def rep_time(stage, perturb, label, n=N_REP):
        """stage() -> out; perturb(tok) -> args for stage. One dispatch."""
        @jax.jit
        def run():
            def body(tok, _):
                out = stage(*perturb(tok))
                return token_of(out), None
            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return tok
        _ = np.asarray(run())          # compile + warm
        t0 = time.time()
        _ = np.asarray(run())
        dt = (time.time() - t0) / n * 1e3
        print(f"{label:34s} {dt:7.2f} ms")
        return dt

    # ---- stage 1: sampling --------------------------------------------
    def st_sample(ro_, rd_):
        return tp.sample_rays_compact(mcfg, ro_, rd_, 0.5, 6.0,
                                      occ_info["bb_min"], occ_info["bb_max"],
                                      occ=occ_info["occ"],
                                      occ_cell=occ_info["occ_cell"],
                                      occ_margin=occ_info.get("occ_margin",
                                                              0.0))
    t_sample = rep_time(st_sample, lambda tok: (ro + tok, rd), "sample_rays_compact")

    pts, valid, step_id = jax.jit(st_sample)(ro, rd)

    # ---- stage 2: group compaction + prefilter ------------------------
    def st_compact(pts_, valid_):
        return tp.compact_active(mcfg, pts_, valid_, occ_info["bb_min"],
                                 occ_info["bb_max"],
                                 pcd=frame["xyz"],
                                 tables=occ_info.get("knn_tables"),
                                 query_radius=qr)
    rep_time(st_compact, lambda tok: (pts + tok, valid), "compact_active(+group prefilter)")

    # without the hierarchical group knn_count prefilter, for the split
    def st_compact_nopre(pts_, valid_):
        return tp.compact_active(mcfg, pts_, valid_, occ_info["bb_min"],
                                 occ_info["bb_max"])
    rep_time(st_compact_nopre, lambda tok: (pts + tok, valid),
             "compact_active (no prefilter)")

    q, src, act_ok, ge = jax.jit(st_compact)(pts, valid)
    M_full = pts.shape[0] * pts.shape[1]
    M_act = int(M_full * mcfg.active_fraction)
    M_act = max(1024, ((M_act + 1023) // 1024) * 1024)
    print(f"    M_slots={q.shape[0]}  M_act={M_act}")

    # ---- stage 3: subgroup-shared aggregation (selection+gather+MLP) --
    def st_agg(q_, src_, ok_):
        return tp._aggregate_subgroup_shared(
            params, mcfg, state, frame["xyz"], frame["inv_rot"], vd,
            q_, src_, ok_, CHUNK, mcfg.sample_budget, M_full, M_act, qr,
            occ_info.get("knn_tables"), jnp.int32(M_act))
    rep_time(st_agg, lambda tok: (q + tok, src, act_ok),
             "subgroup_shared agg (sel+gather+mlp)")

    # selection kernel alone, at subgroup-rep shape
    from apnerf.ops.knn import knn
    share = int(mcfg.knn_share)
    G_sub = q.shape[0] // share
    reps = q.reshape(G_sub, share, 3).mean(1)

    def st_sel(reps_):
        return knn(reps_, frame["xyz"], k=int(mcfg.knn_cand),
                   radius2=qr, assume_sorted=True,
                   point_tables=occ_info.get("knn_tables"),
                   sorted_point_idx=True, rt=mcfg.knn_rt)
    rep_time(st_sel, lambda tok: (reps + tok,), f"selection knn ({G_sub} reps)")

    # ---- full forward --------------------------------------------------
    def st_fwd(ro_, rd_, vd_):
        res = tp.forward(params, mcfg, state, ro_, rd_, vd_, t=None,
                         rot_params=None, near=0.5, far=6.0, bg=1.0,
                         render_depth=True, frame=frame)
        return res["rgb_marched"], res["depth"]
    t_fwd = rep_time(st_fwd, lambda tok: (ro + tok, rd, vd), "forward total")
    print(f"    => {CHUNK / (t_fwd / 1e3):,.0f} rays/s steady-state")

    # ---- prepare_frame --------------------------------------------------
    def st_prep(rot_):
        return tp.prepare_frame(params, mcfg, state, rot_params=rot_)
    rep_time(st_prep, lambda tok: (rot + tok,), "prepare_frame (per frame)")


if __name__ == "__main__":
    main()
