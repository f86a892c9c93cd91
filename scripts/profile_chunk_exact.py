import os
os.environ.setdefault("APNERF_KNN_SHARE", "1")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Device-time profile of the EXACT-mode render chunk (knn_share=1).

Same chained-scan measurement as profile_chunk2.py (one dispatch per
stage, token-perturbed inputs, one readback). Decomposes the ~23 ms
exact chunk (PERF.md: ~350k rays/s) into sampling, compaction, the
two-phase KNN (count + selection), the per-sample gather+MLP block, and
the full forward — the target list for the >=500k exact push.
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
    from apnerf.ops.knn import knn, knn_count

    params, mcfg, state = benchmod.build_model()
    assert int(mcfg.knn_share) == 1, "run with APNERF_KNN_SHARE=1"
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
    K = 8

    prep = jax.jit(lambda r: tp.prepare_frame(params, mcfg, state,
                                              rot_params=r))
    frame = prep(rot)
    occ_info = frame["occ_info"]
    tables = occ_info.get("knn_tables")

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
        print(f"{label:38s} {dt:7.2f} ms")
        return dt

    # ---- 1: sampling ----------------------------------------------------
    def st_sample(ro_, rd_):
        return tp.sample_rays_compact(mcfg, ro_, rd_, 0.5, 6.0,
                                      occ_info["bb_min"], occ_info["bb_max"],
                                      occ=occ_info["occ"],
                                      occ_cell=occ_info["occ_cell"],
                                      occ_margin=occ_info.get("occ_margin",
                                                              0.0))
    rep_time(st_sample, lambda tok: (ro + tok, rd), "sample_rays_compact")
    pts, valid, step_id = jax.jit(st_sample)(ro, rd)

    # ---- 2: compaction + group prefilter --------------------------------
    def st_compact(pts_, valid_):
        return tp.compact_active(mcfg, pts_, valid_, occ_info["bb_min"],
                                 occ_info["bb_max"], pcd=frame["xyz"],
                                 tables=tables, query_radius=qr)
    rep_time(st_compact, lambda tok: (pts + tok, valid),
             "compact_active(+group prefilter)")
    q, src, act_ok, ge = jax.jit(st_compact)(pts, valid)
    M_full = pts.shape[0] * pts.shape[1]
    M_act = int(M_full * mcfg.active_fraction)
    M_act = max(1024, ((M_act + 1023) // 1024) * 1024)
    M_slots = q.shape[0]
    M_pass = int(M_act * mcfg.pass_fraction)
    M_pass = max(1024, ((M_pass + 1023) // 1024) * 1024)
    M_pass = min(M_pass, M_slots)
    print(f"    M_slots={M_slots}  M_act={M_act}  M_pass={M_pass}")

    # ---- 3: phase-1 count -----------------------------------------------
    def st_count(q_):
        return knn_count(q_, frame["xyz"], radius2=qr, assume_sorted=True,
                         point_tables=tables, rt=mcfg.knn_rt)
    rep_time(st_count, lambda tok: (q + tok,), f"knn_count ({M_slots} queries)")
    cnt = jax.jit(st_count)(q)
    nn_ok = (cnt >= K) & act_ok
    print(f"    count>=K survivors: {int(nn_ok.sum())}")

    # ---- 4: pass-compaction ----------------------------------------------
    def st_pass(nn_ok_, q_, src_):
        ppos = jnp.cumsum(nn_ok_) - 1
        keep = nn_ok_ & (ppos < M_pass)
        pdest = jnp.where(keep, ppos, M_pass)
        psrc = jnp.full((M_pass + 1,), M_slots, jnp.int32)
        psrc = psrc.at[pdest].set(jnp.arange(M_slots, dtype=jnp.int32),
                                  mode="drop")[:M_pass]
        pass_ok = psrc < M_slots
        psl = jnp.minimum(psrc, M_slots - 1)
        return q_[psl], jnp.where(pass_ok, src_[psl], M_full), pass_ok
    rep_time(st_pass, lambda tok: (nn_ok, q + tok, src), "pass-compaction")
    qp, srcp, pass_ok = jax.jit(st_pass)(nn_ok, q, src)

    # ---- 5: phase-2 selection on survivors -------------------------------
    def st_sel(q_):
        return knn(q_, frame["xyz"], k=K, radius2=qr, assume_sorted=True,
                   point_tables=tables, sorted_point_idx=True,
                   rt=mcfg.knn_rt)
    rep_time(st_sel, lambda tok: (qp + tok,), f"knn selection ({M_pass} queries)")
    d2, idx = jax.jit(st_sel)(qp)

    # ---- 6: per-sample gather + featnet + heads (block_fn equivalent) ---
    from apnerf.ops import encoding, nn as nnops
    from apnerf.models.tineuvox import apply_rgbnet
    from apnerf.ops.activation import raw2alpha
    HIGH = jax.lax.Precision.HIGHEST

    def permute(arr):
        perm = tables["perm"]
        Pp = tables["pts_sorted"].shape[0]
        out = arr[perm]
        pad = Pp - out.shape[0]
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((pad, *out.shape[1:]), out.dtype)], 0)
        return out

    geo_src = jnp.concatenate(
        [permute(frame["xyz"]),
         permute(frame["inv_rot"].reshape(frame["inv_rot"].shape[0], 9))],
        axis=-1)
    feat_src = permute(params["canonical_feat"].astype(jnp.bfloat16))
    featnet_p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                       params["feat_net"])
    geo_bf = jax.lax.bitcast_convert_type(
        geo_src, jnp.bfloat16).reshape(geo_src.shape[0], 24)
    packed_src = jnp.concatenate([geo_bf, feat_src], axis=-1)
    interval = mcfg.stepsize * mcfg.voxel_size_ratio

    ve = encoding.poc_fre(vd, encoding.poc_freqs(mcfg.viewbase_pe))
    ray_of = jnp.minimum(srcp // mcfg.sample_budget, CHUNK - 1)
    views_emb = ve[ray_of]

    def st_gather_only(idxb):
        return packed_src[idxb]
    rep_time(st_gather_only, lambda tok: (jnp.clip(
        idx + jnp.int32(tok), 0, packed_src.shape[0] - 1),),
        f"packed row gather alone [{M_pass},K]")

    def st_agg(qb, idxb, veb):
        pk = packed_src[idxb]
        geo = jax.lax.bitcast_convert_type(
            pk[..., :24].reshape(*pk.shape[:2], 12, 2), jnp.float32)
        feat_k = pk[..., 24:]
        nbr = geo[..., :3]
        rel_p = qb[:, None, :] - nbr
        to_nn = (rel_p ** 2).sum(-1)
        w = 1.0 / (to_nn + mcfg.eps)
        w = w / w.sum(-1, keepdims=True)
        rot_k = geo[..., 3:].reshape(*geo.shape[:2], 3, 3)
        rel_canon = jnp.einsum("mkab,mkb->mka", rot_k, rel_p, precision=HIGH)
        h = tp._featnet_h(mcfg, featnet_p, rel_canon, feat_k, w, None)
        density = nnops.mlp(params["densitynet"], h)[..., 0]
        alpha = raw2alpha(density, mcfg.act_shift, interval)
        rgb = jax.nn.sigmoid(apply_rgbnet(params["rgbnet"], h, veb))
        return alpha, rgb, to_nn.max(-1)
    rep_time(st_agg, lambda tok: (qp + tok, idx, views_emb),
             "gather+featnet+heads (block_fn)")

    # ---- full forward -----------------------------------------------------
    def st_fwd(ro_, rd_, vd_):
        res = tp.forward(params, mcfg, state, ro_, rd_, vd_, t=None,
                         rot_params=None, near=0.5, far=6.0, bg=1.0,
                         render_depth=True, frame=frame)
        return res["rgb_marched"], res["depth"]
    t_fwd = rep_time(st_fwd, lambda tok: (ro + tok, rd, vd), "forward total")
    print(f"    => {CHUNK / (t_fwd / 1e3):,.0f} rays/s steady-state")


if __name__ == "__main__":
    main()
