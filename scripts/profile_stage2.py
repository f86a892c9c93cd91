"""Stage-2 train-step decomposition (VERDICT r3 #6 evidence).

Times, with chained dependencies + one host readback per series:
prepare_frame, the render forward, each auxiliary loss in isolation,
loss_fn fwd, fwd+bwd, and the full step (fwd+bwd+Adam) — at the
jumpingjacks scale bench_stage2.py uses (8192 rays, 10^4 points).
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def timed(name, fn, args, n=10):
    """Chained-dependency timing: each iteration perturbs the first array
    leaf of args by the previous output's (tiny) scalar digest, so the n
    executions are data-dependent and a single host readback bounds them
    (PERF.md: block_until_ready does not synchronize under the tunnel)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(args)
    fi = next(i for i, leaf in enumerate(leaves)
              if hasattr(leaf, "dtype") and jnp.issubdtype(
                  jnp.asarray(leaf).dtype, jnp.inexact))

    def digest(out):
        ls = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
        s = sum(jnp.sum(x).astype(jnp.float32) for x in ls)
        return s * 1e-30

    @jax.jit
    def g(*a):
        lv, td = jax.tree_util.tree_flatten(a)

        def body(c, _):
            lv2 = list(lv)
            lv2[fi] = lv2[fi] + c.astype(lv2[fi].dtype)
            out = fn(*jax.tree_util.tree_unflatten(td, lv2))
            return digest(out), None

        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    np.asarray(g(*args))  # compile + warm
    t0 = time.time()
    np.asarray(g(*args))
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/apnerf_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(ROOT, "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    from apnerf.models import temporal_points as tp
    from apnerf.train import stage2
    from apnerf.train.masked_adam import create_optimizer
    from apnerf.data import rays as raydata

    P = int(os.environ.get("APNERF_PROF_PTS", "10000"))
    params, mcfg, state = benchmod.build_model(P=P)
    H = W = 400
    N_rand = int(os.environ.get("APNERF_PROF_NRAND", "8192"))
    K = np.array([[555.0, 0, 200.0], [0, 555.0, 200.0], [0, 0, 1]],
                 np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 3.0
    Ks = jnp.asarray(np.stack([K, K]))
    posesj = jnp.asarray(poses)

    cfg_train = {
        "N_rand": N_rand, "lrate_decay": 20,
        "weight_render": 2e2, "weight_arap": 1e2, "weight_tv": 1e1,
        "weight_sparsity": 1e-3, "weight_transformation_reg": 1e-2,
        "weight_joint_chamfer": 1e1, "weight_chamfer2D": 1e0,
        "lrate_weights": 5e-3, "lrate_joints": 1e-4,
        "lrate_theta_weight": 1e-4, "lrate_canonical_feat": 1e-3,
        "lrate_forward_warp": 5e-4, "lrate_feat_net": 1e-3,
        "lrate_rgbnet": 1e-4, "lrate_densitynet": 1e-4,
    }
    optimizer = create_optimizer(params, cfg_train)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.uniform(0, 1, (N_rand, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(0, 1, N_rand).astype(np.float32)),
        "t": jnp.float32(0.35),
        "cam": jnp.asarray((np.arange(N_rand) % 2).astype(np.int32)),
        "pix": jnp.asarray(rng.integers(0, H * W, N_rand).astype(np.int32)),
        "sparsity_on": jnp.float32(1.0),
        "chamfer_poses": jnp.asarray(poses[np.zeros(5, np.int32)]),
        "chamfer_Ks": jnp.asarray(np.stack([K] * 5)),
        "chamfer_mask_pts": jnp.asarray(
            rng.uniform(0, 400, (5, 3000, 2)).astype(np.float32)),
        "chamfer_pcd_idx": jnp.asarray(
            rng.integers(0, mcfg.n_points, 3000).astype(np.int32)),
    }

    # ---- components
    timed("prepare_frame", lambda t: tp.prepare_frame(
        params, mcfg, state, t=t), (batch["t"],))

    frame = jax.jit(lambda t: tp.prepare_frame(params, mcfg, state, t=t))(
        batch["t"])

    def fwd_render(p, b):
        ro, rd, vd = raydata.pixels_to_rays(Ks, posesj, b["cam"], b["pix"],
                                            H, W)
        return tp.forward(p, mcfg, state, ro, rd, vd, t=b["t"],
                          near=0.5, far=6.0, bg=1.0)["rgb_marched"]

    timed("forward render (incl prepare)", fwd_render, (params, batch))

    def fwd_render_framed(p, b):
        ro, rd, vd = raydata.pixels_to_rays(Ks, posesj, b["cam"], b["pix"],
                                            H, W)
        return tp.forward(p, mcfg, state, ro, rd, vd, t=b["t"],
                          near=0.5, far=6.0, bg=1.0,
                          frame=frame)["rgb_marched"]

    timed("forward render (frame hoisted)", fwd_render_framed,
          (params, batch))

    # aux losses in isolation (each includes its own warp when it needs one)
    warped = jax.jit(lambda p, t: tp.warp(p, mcfg, state, t=t)["xyz"])(
        params, batch["t"])
    timed("warp alone", lambda p, t: tp.warp(p, mcfg, state, t=t)["xyz"],
          (params, batch["t"]))
    timed("arap_loss", lambda w: tp.arap_loss(state, w), (warped,))
    timed("joint_chamfer", lambda p: tp.joint_chamfer_loss(
        state, p["joints"]), (params,))

    def cham2d(p, b):
        w = tp.warp(p, mcfg, state, t=b["t"])["xyz"]
        pcd_sub = w[b["chamfer_pcd_idx"]]
        proj = jax.vmap(tp.project_points, in_axes=(None, 0, 0))(
            pcd_sub, b["chamfer_poses"], b["chamfer_Ks"])
        proj = proj.at[:, :, 0].set((H - 1) - proj[:, :, 0])
        proj = proj[..., ::-1]
        return tp.batch_chamfer_2d(proj, b["chamfer_mask_pts"])

    timed("chamfer2d (incl warp)", cham2d, (params, batch))

    # full step pieces
    step = stage2.make_train_step(mcfg, state, cfg_train, optimizer, Ks,
                                  posesj, H, W, 0.5, 6.0, 1.0,
                                  n_chamfer_views=5)
    # grad of render-only loss (isolates the aggregation backward)
    def render_loss(p, b):
        return ((fwd_render(p, b) - b["rgb"]) ** 2).mean()

    timed("render loss fwd", render_loss, (params, batch))
    timed("render loss fwd+bwd",
          lambda p, b: jax.grad(render_loss)(p, b)["canonical_feat"],
          (params, batch))

    t0 = time.time()
    p, o, m = step(params, opt_state, batch)
    _ = float(m["loss"])
    print(f"full step compile+1st: {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    n = 10
    for _ in range(n):
        p, o, m = step(p, o, batch)
    _ = float(m["loss"])
    print(f"{'FULL STEP (fwd+bwd+adam)':34s} {(time.time() - t0) / n * 1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
