"""Per-model chunk renderers for render_viewpoints / render_repose."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.rays import pixels_to_rays
from ..models import temporal_points as tp
from ..models import tineuvox
from ..ops.marching import composite


def make_image_scan(chunk_fn, keys, mesh=None):
    """Whole-image single-dispatch renderer: rays generated on device, the
    chunk loop rolled into one ``lax.scan``. One dispatch per image instead
    of one per chunk (dispatch + pix transfers ride a remote tunnel here).

    ``chunk_fn(extra, ro, rd, vd) -> dict`` must be jit-pure; ``extra`` is
    an arbitrary pytree threaded through (frame state / scalar time).
    Returns ``image_fn(extra, K[1], c2w[1], H, W, chunk, flags) -> dict``
    of stacked ``[n_chunks, chunk, ...]`` device arrays; jits are cached
    per (H, W, chunk, flags).

    ``mesh``: optional ``jax.sharding.Mesh`` — each chunk's rays are
    sharded over the mesh's ray axis (multi-chip serving: params/state
    replicated, rays data-parallel; GSPMD inserts the collectives). The
    reference is single-GPU (SURVEY.md §2.3); this layer is additive.
    """
    cache = {}
    shardings = None
    if mesh is not None:
        from ..parallel import mesh as pmesh
        shardings = (pmesh.ray_sharded(mesh), pmesh.replicated(mesh))

    def image_fn(extra, Kd, cd, H, W, chunk, inverse_y, flip_x, flip_y):
        key = (H, W, chunk, inverse_y, flip_x, flip_y)
        if key not in cache:
            n = H * W
            n_chunks = (n + chunk - 1) // chunk
            if mesh is not None:
                assert chunk % mesh.devices.size == 0, (
                    f"chunk {chunk} must divide over the {mesh.devices.size}"
                    "-device mesh")

            @jax.jit
            def run(extra, Kd, cd):
                def body(_, ci):
                    pix = jnp.minimum(
                        ci * chunk + jnp.arange(chunk, dtype=jnp.int32),
                        n - 1)
                    ro, rd, vd = pixels_to_rays(
                        Kd, cd, jnp.zeros(chunk, jnp.int32), pix, H, W,
                        inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
                    if shardings is not None:
                        ro, rd, vd = jax.lax.with_sharding_constraint(
                            (ro, rd, vd), shardings[0])
                    res = chunk_fn(extra, ro, rd, vd)
                    return 0, {k: res[k] for k in keys if res.get(k)
                               is not None}
                _, out = jax.lax.scan(
                    body, 0, jnp.arange(n_chunks, dtype=jnp.int32))
                return out

            cache[key] = run
        return cache[key](extra, Kd, cd)

    return image_fn


def _put_replicated_arrays(tree, mesh):
    from ..parallel.mesh import put_replicated_arrays
    return put_replicated_arrays(tree, mesh)


def make_backbone_renderer(params, mcfg: tineuvox.TiNeuVoxConfig, stepsize,
                           near, far, bg, mesh=None):
    """Chunk renderer for the TiNeuVox backbone (reference run.py:125-130).

    ``mesh``: optional device mesh — the scan path renders each chunk
    rays-data-parallel over it (params replicated)."""
    n_steps = mcfg.max_steps(stepsize)
    if mesh is not None:
        params = _put_replicated_arrays(params, mesh)

    @jax.jit
    def chunk(ro, rd, vd, t):
        times = jnp.full((ro.shape[0], 1), t)
        res = tineuvox.forward(params, mcfg, ro, rd, vd, times, near, far,
                               stepsize, bg, n_steps)
        return {"rgb_marched": res["rgb_marched"], "depth": res["depth"]}

    scan = make_image_scan(
        lambda t, ro, rd, vd: chunk(ro, rd, vd, t),
        keys=("rgb_marched", "depth"), mesh=mesh)

    def for_view(i, t):
        fn = lambda ro, rd, vd: chunk(ro, rd, vd, jnp.float32(t))  # noqa: E731
        fn.image_fn = partial(scan, jnp.float32(t))
        return fn

    return for_view


def _warn_audit(audit):
    """Budget-audit warning from one [act_demand, act_granted, pass_demand,
    pass_granted] row (renderers print it once per renderer lifetime)."""
    if audit[0] > audit[1] or audit[2] > audit[3]:
        print("render: budget audit — static sampling budgets "
              f"truncated (active {audit[0]}/{audit[1]}, "
              f"radius-pass {audit[2]}/{audit[3]}); raise "
              "active_fraction/pass_fraction if quality "
              "matters more than speed")


def weight_palette(n, seed=0):
    """LBS weight false-colour palette (reference lib/temporalpoints.py:692-695
    uses seaborn hls + a seeded permutation)."""
    try:
        from seaborn import color_palette
        cols = np.array(color_palette("hls", n))
    except ImportError:  # pragma: no cover
        hues = np.linspace(0, 1, n, endpoint=False)
        cols = np.stack([np.abs(hues * 6 - 3) - 1, 2 - np.abs(hues * 6 - 2),
                         2 - np.abs(hues * 6 - 4)], -1).clip(0, 1)
    rng = np.random.default_rng(seed)
    return cols[rng.permutation(n)]


def make_points_renderer(params, mcfg: tp.TemporalPointsConfig, state, near,
                         far, bg, render_weights=True,
                         render_pcd_direct=False, poses=None, Ks=None,
                         mesh=None):
    """Chunk renderer for TemporalPoints; optionally returns LBS-weight
    colours and 2D joints for the skeleton overlay.

    ``mesh``: optional device mesh — the scan path renders each chunk
    rays-data-parallel over it (params/points replicated)."""
    weight_mask = np.asarray(
        tp.get_weights(params, mcfg, state).sum(0) > 0)
    if mesh is not None:
        params = _put_replicated_arrays(params, mesh)
        state = _put_replicated_arrays(state, mesh)
    n_active = int(weight_mask.sum())
    cols = np.zeros((mcfg.n_joints, 3), np.float32)
    if n_active:
        cols[weight_mask] = weight_palette(n_active)
    cols_dev = jnp.asarray(cols)
    if mesh is not None:
        cols_dev = _put_replicated_arrays(cols_dev, mesh)

    @partial(jax.jit, static_argnames=("use_rot",))
    def prep(t, rot_params, use_rot):
        return tp.prepare_frame(params, mcfg, state,
                                t=None if use_rot else t,
                                rot_params=rot_params if use_rot else None)

    @jax.jit
    def chunk(frame, ro, rd, vd):
        res = tp.forward(params, mcfg, state, ro, rd, vd,
                         near=near, far=far, bg=bg, render_depth=True,
                         render_weights=render_weights,
                         render_pcd_direct=render_pcd_direct, frame=frame)
        out = {"rgb_marched": res["rgb_marched"], "depth": res["depth"],
               "budget_audit": res["budget_audit"]}
        if render_pcd_direct and "rgb_marched_direct" in res:
            out["rgb_marched"] = res["rgb_marched_direct"]
        if render_weights:
            col = jnp.einsum("rbj,jc->rbc", res["lbs_w_per_sample"], cols_dev)
            out["weights"] = composite(res["weights_for_render"], col, bg=bg,
                                       alphainv_last=res["alphainv_for_render"])
        out["joints_warped"] = res["joints_warped"]
        return out

    zeros_rot = jnp.zeros((mcfg.n_joints, 4))
    scan = make_image_scan(
        chunk, keys=("rgb_marched", "depth", "weights", "budget_audit"),
        mesh=mesh)

    def for_view(i, t, rot_params=None):
        use_rot = rot_params is not None
        rp = jnp.asarray(rot_params) if use_rot else zeros_rot
        frame = prep(jnp.float32(t or 0.0), rp, use_rot)

        def image_fn(*args):
            out = dict(scan(frame, *args))
            audit = out.pop("budget_audit")
            if not for_view._audited:
                for_view._audited = True
                # worst chunk of the whole image (the first chunk is often
                # background with near-zero demand — auditing only it let
                # central-chunk truncation pass silently)
                _warn_audit(np.asarray(audit).max(0))
            if poses is not None and Ks is not None and i < len(poses):
                j2 = tp.project_points(frame["joints_warped"],
                                       jnp.asarray(poses[i]),
                                       jnp.asarray(Ks[i], jnp.float32))
                out["joints_2d"] = np.asarray(j2)
                out["bones"] = np.asarray(state["bones"])
            return out

        def fn(ro, rd, vd):
            out = dict(chunk(frame, ro, rd, vd))
            audit = out.pop("budget_audit")
            if not for_view._audited:
                # one chunk per render is audited (the readback syncs the
                # pipeline, so don't pay it per chunk)
                for_view._audited = True
                _warn_audit(np.asarray(audit))
            if poses is not None and Ks is not None and i < len(poses):
                j2 = tp.project_points(out["joints_warped"],
                                       jnp.asarray(poses[i]),
                                       jnp.asarray(Ks[i], jnp.float32))
                out["joints_2d"] = np.asarray(j2)
                out["bones"] = np.asarray(state["bones"])
            out.pop("joints_warped", None)
            return out
        fn.image_fn = image_fn
        return fn

    for_view._audited = False
    return for_view
