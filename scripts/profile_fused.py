import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Isolate the fused-aggregation kernel cost vs its XLA glue (transposes,
pre-gather) and vs the XLA block formulation at bench shapes."""
import time

import numpy as np

N_REP = 20


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from apnerf.kernels.agg_pallas import fused_subgroup_agg
    from apnerf.ops import nn

    rng = np.random.default_rng(0)
    S, share, kc, K, F, pe = 4480, 16, 12, 8, 128, 10
    fin = 3 * (1 + 2 * pe) + F
    q = jnp.asarray(rng.normal(size=(S, share, 3)), jnp.float32) * 0.2
    nbr = jnp.asarray(rng.normal(size=(S, kc, 3)), jnp.float32) * 0.2
    rot = jnp.asarray(rng.normal(size=(S, kc, 3, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(S, kc, F)), jnp.bfloat16)
    fp = nn.init_mlp(jax.random.PRNGKey(0), [fin] + [F] * 4)

    def token_of(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        return sum(x.ravel()[0].astype(jnp.float32) * 0.0 for x in leaves)

    def rep_time(stage, args, perturb, label, n=N_REP):
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
        print(f"{label:42s} {dt:7.2f} ms")
        return dt

    rep_time(lambda q_, n_, r_, f_: fused_subgroup_agg(
                 q_, n_, r_, f_, fp, share=share, K=K, eps=1e-6),
             (q, nbr, rot, feat),
             lambda a, tok: (a[0] + tok, a[1], a[2], a[3]),
             "fused_subgroup_agg (kernel + glue)")

    # the transposes alone (wrapper glue)
    def glue(q_, n_, r_, f_):
        qi = jnp.transpose(q_, (1, 0, 2))
        ni = jnp.transpose(n_, (1, 0, 2))
        ri = jnp.transpose(r_.reshape(S, kc, 9), (1, 0, 2))
        fi = jnp.transpose(f_, (1, 0, 2))
        return qi.sum() + ni.sum() + ri.sum() + fi.astype(jnp.float32).sum()
    rep_time(glue, (q, nbr, rot, feat),
             lambda a, tok: (a[0] + tok, a[1], a[2], a[3]),
             "wrapper input transposes")

    ho = jnp.asarray(rng.normal(size=(share, S, F)), jnp.float32)
    rep_time(lambda h_: jnp.transpose(h_, (1, 0, 2)) * 1.0, (ho,),
             lambda a, tok: (a[0] + tok,), "output h transpose")

    # XLA block formulation at the same shapes (the path the kernel
    # replaces: rel/rank/PE/MLP/reduce on member-candidate tensors)
    from apnerf.ops import encoding
    fpb = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), fp)
    ar = jnp.arange(kc)

    def xla_block(q_, n_, r_, f_):
        rel = q_[:, :, None, :] - n_[:, None, :, :]
        to_nn = (rel ** 2).sum(-1)
        less = (to_nn[..., :, None] > to_nn[..., None, :]) | (
            (to_nn[..., :, None] == to_nn[..., None, :])
            & (ar[:, None] > ar[None, :]))
        rank = less.sum(-1)
        top = rank < K
        kd2 = jnp.max(jnp.where(top, to_nn, -jnp.inf), axis=-1)
        w = jnp.where(top, 1.0 / (to_nn + 1e-6), 0.0)
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-30)
        rc = jnp.einsum("mkab,mskb->mska", r_, rel,
                        precision=jax.lax.Precision.HIGHEST)
        emb = encoding.poc_fre(rc, encoding.poc_freqs(pe))
        x = jnp.concatenate(
            [emb.astype(jnp.bfloat16),
             jnp.broadcast_to(f_[:, None], (S, share, kc, F))], -1)
        h_k = nn.mlp(fpb, x, activation=nn.leaky_relu,
                     final_activation=nn.leaky_relu)
        h = (h_k.astype(jnp.float32) * w[..., None]).sum(2)
        return h, kd2
    rep_time(xla_block, (q, nbr, rot, feat),
             lambda a, tok: (a[0] + tok, a[1], a[2], a[3]),
             "XLA block formulation (same shapes)")


if __name__ == "__main__":
    main()
