import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Print the budget audit (demand vs granted) for every chunk of the bench
frame — the input for tuning active/pass fractions at a new operating
point (docs/performance.md audits)."""
import numpy as np


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

    frame = jax.jit(lambda r: tp.prepare_frame(params, mcfg, state,
                                               rot_params=r))(rot)

    @jax.jit
    def chunk_audit(ro, rd, vd):
        res = tp.forward(params, mcfg, state, ro, rd, vd, t=None,
                         rot_params=None, near=0.5, far=6.0, bg=1.0,
                         frame=frame)
        return res["budget_audit"]

    pad = (-len(dirs)) % CHUNK
    dirs = np.concatenate([dirs, dirs[:pad]], 0)
    audits = []
    for c in dirs.reshape(-1, CHUNK, 3):
        rd = jnp.asarray(c)
        ro = jnp.broadcast_to(jnp.asarray(o), rd.shape)
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        audits.append(np.asarray(chunk_audit(ro, rd, vd)))
    audits = np.stack(audits)  # [n_chunks, 4]
    print("cfg: active_fraction", mcfg.active_fraction, "pass_fraction",
          mcfg.pass_fraction, "group_pass", mcfg.group_pass_fraction,
          "share", mcfg.knn_share, "cs", mcfg.coarse_stride)
    names = ["act_demand", "act_granted", "pass_demand", "pass_granted"]
    for k, nm in enumerate(names):
        col = audits[:, k]
        print(f"{nm:13s} max {col.max():8d}  p90 "
              f"{int(np.percentile(col, 90)):8d}  mean {col.mean():10.1f}")


if __name__ == "__main__":
    main()
