"""Microbench: fused featmlp_agg Pallas kernel vs the XLA formulation.

Measures the aggregation MLP in isolation at bench shapes across row-block
sizes. Args are passed (not closed over) so the compile request stays small
under the axon remote-compile tunnel (HTTP 413 on >~100 MB programs).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")

from apnerf.ops import nn, encoding
from apnerf.kernels.featmlp_pallas import featmlp_agg


def chain(f, n, *args):
    """Chained-dependency timing + host readback (PERF.md caveat)."""
    def body(c, _):
        out = f(args[0] + c, *args[1:])
        return out.mean().astype(jnp.float32) * 1e-9, None

    @jax.jit
    def g(*a):
        def body(c, _):
            out = f(a[0] + c, *a[1:])
            return out.mean().astype(jnp.float32) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    np.asarray(g(*args))  # compile + warm
    t0 = time.time()
    np.asarray(g(*args))
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    M, K, F, pb = 131072, 8, 128, 10
    P = 3 * (1 + 2 * pb)
    rel = jnp.asarray(rng.normal(size=(M, K, 3)).astype(np.float32) * 0.1)
    feat = jnp.asarray(
        rng.normal(size=(M, K, F)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.random((M, K)).astype(np.float32))
    fp = nn.init_mlp(jax.random.PRNGKey(0), [P + F, F, F, F, F])
    fp_bf = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), fp)

    def xla_path(rel, feat, w):
        emb = encoding.poc_fre(rel, encoding.poc_freqs(pb))
        fi = jnp.concatenate([emb.astype(jnp.bfloat16), feat], -1)
        hk = nn.mlp(fp_bf, fi, activation=nn.leaky_relu,
                    final_activation=nn.leaky_relu)
        return (hk.astype(jnp.float32) * w[..., None]).sum(1)

    dt = chain(xla_path, 20, rel, feat, w)
    print(f"xla formulation: {dt * 1e3:.2f} ms")
    for rows_blk in (1024, 2048, 4096, 8192):
        def f(r, ft, ww, rb=rows_blk):
            return featmlp_agg(r, ft, ww, fp_bf, K=K, pe_freqs=pb,
                               block_rows=rb)
        dt = chain(f, 20, rel, feat, w)
        print(f"kernel rows_blk={rows_blk}: {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
