import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Piecewise device-time decomposition of the subgroup-shared aggregation
block (the 10.5 ms dominator of the 15.4 ms render chunk): packed gather,
positional encoding, feat_net GEMM stack, rank mask, scatter-back —
each timed with the chained-token lax.scan trick of profile_chunk2.py."""
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
    from apnerf.ops import encoding, nn

    params, mcfg, state = benchmod.build_model()
    rng = np.random.default_rng(1)

    # shapes at the bench operating point
    R, B = 8192, mcfg.sample_budget
    M_full = R * B
    M_act = max(1024, (int(M_full * mcfg.active_fraction) + 1023)
                // 1024 * 1024)
    share, kc, K, F = (int(mcfg.knn_share), int(mcfg.knn_cand),
                       mcfg.neighbours, mcfg.feat_dim)
    S_pass = max(128, int(M_act * mcfg.pass_fraction) // share)
    S_pass = (S_pass + 127) // 128 * 128
    n_samp = S_pass * share
    P = 10240  # padded point table
    print(f"S_pass={S_pass} n_samp={n_samp} kc={kc} share={share}")

    def token_of(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        return sum(x.ravel()[0].astype(jnp.float32) * 0.0 for x in leaves)

    def rep_time(stage, args, perturb, label, n=N_REP):
        """args passed as jit ARGUMENTS (a closure would inline them as
        constants into the compile payload — HTTP 413 on the remote
        compile helper for the 300 MB activation tensors here)."""
        @jax.jit
        def run(*args):
            def body(tok, _):
                out = stage(*perturb(args, tok))
                return token_of(out), None
            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return tok
        _ = np.asarray(run(*args))
        t0 = time.time()
        _ = np.asarray(run(*args))
        dt = (time.time() - t0) / n * 1e3
        print(f"{label:38s} {dt:7.2f} ms")
        return dt

    # ---- packed row gather: [S_pass, kc] indices into [P, 24+F] bf16 ----
    packed = jnp.asarray(rng.normal(size=(P, 24 + F)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, P, (S_pass, kc)), jnp.int32)
    rep_time(lambda p_, i_: p_[i_], (packed, idx),
             lambda a, tok: (a[0],
                             jnp.minimum(a[1] + tok.astype(jnp.int32),
                                         P - 1)),
             f"packed gather [{S_pass}x{kc}] rows")

    # ---- positional encoding on member-candidate rel positions ---------
    rel = jnp.asarray(rng.normal(size=(S_pass, share, kc, 3)), jnp.float32)
    freqs = encoding.poc_freqs(mcfg.posbase_pe)
    rep_time(lambda r_: encoding.poc_fre(r_, freqs), (rel,),
             lambda a, tok: (a[0] + tok,),
             f"poc_fre [{S_pass}x{share}x{kc},3->63]")

    # ---- feat_net GEMM stack (bf16) -------------------------------------
    fin = F + mcfg.pts_ch + mcfg.pose_embedding_dim
    featnet_p = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params["feat_net"])
    x_in = jnp.asarray(rng.normal(size=(S_pass, share, kc, fin)),
                       jnp.bfloat16)
    rep_time(lambda fp_, x_: nn.mlp(fp_, x_, activation=nn.leaky_relu,
                                    final_activation=nn.leaky_relu),
             (featnet_p, x_in),
             lambda a, tok: (a[0], a[1] + tok.astype(jnp.bfloat16)),
             f"feat_net MLP [{n_samp}x{kc},{fin}]")

    # ---- rank mask (top-K-of-kc) ----------------------------------------
    d2 = jnp.asarray(rng.uniform(size=(S_pass, share, kc)), jnp.float32)
    cand_ar = jnp.arange(kc, dtype=jnp.int32)

    def rank_mask(d_):
        less = (d_[..., :, None] > d_[..., None, :]) | (
            (d_[..., :, None] == d_[..., None, :])
            & (cand_ar[:, None] > cand_ar[None, :]))
        rank = less.sum(-1)
        return rank < K
    rep_time(rank_mask, (d2,), lambda a, tok: (a[0] + tok,),
             "rank mask top-8-of-12")

    # ---- inverse-rot einsum ---------------------------------------------
    rot = jnp.asarray(rng.normal(size=(S_pass, kc, 3, 3)), jnp.float32)
    rep_time(lambda r_, rel_: jnp.einsum(
                 "mkab,mskb->mska", r_, rel_,
                 precision=jax.lax.Precision.HIGHEST),
             (rot, rel), lambda a, tok: (a[0] + tok, a[1]),
             "inv-rot einsum")

    # ---- scatter-back ----------------------------------------------------
    vals = jnp.asarray(rng.normal(size=(n_samp, 3)), jnp.float32)
    dst = jnp.asarray(rng.integers(0, M_full, n_samp), jnp.int32)

    def scat(v_, d_):
        out = jnp.zeros((M_full + 1, 3), jnp.float32)
        return out.at[d_].set(v_, mode="drop")[:M_full]
    rep_time(scat, (vals, dst), lambda a, tok: (a[0] + tok, a[1]),
             f"scatter [{n_samp}]->[{M_full},3]")

    # alpha scatter [n_samp] -> [M_full]
    a = jnp.asarray(rng.normal(size=(n_samp,)), jnp.float32)

    def scat1(v_, d_):
        out = jnp.zeros((M_full + 1,), jnp.float32)
        return out.at[d_].set(v_, mode="drop")[:M_full]
    rep_time(scat1, (a, dst), lambda ar, tok: (ar[0] + tok, ar[1]),
             f"scatter [{n_samp}]->[{M_full}]")


if __name__ == "__main__":
    main()
