"""TiNeuVox-style dynamic voxel NeRF backbone, functional JAX form.

Re-implements the behaviour of the reference ``TiNeuVox`` module
(lib/tineuvox.py:91-625) with a TPU-first design:

* model state is a pytree of parameters whose *top-level keys* mirror the
  reference's module attribute names (``feature``, ``timenet``,
  ``deformation_net``, ``featurenet``, ``densitynet``, ``rgbnet``) so the
  ``lrate_<name>``-reflection optimizer grouping carries over unchanged,
* the forward pass works on dense ``[n_rays, n_samples]`` sample grids with
  validity masks (instead of the reference's ragged CUDA compaction), and
* the voxel grid is stored channels-last ``[X, Y, Z, C]``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encoding, nn, rays as rayops
from ..ops.activation import raw2alpha
from ..ops.grid import (mult_dist_interp, resize_trilinear,
                        total_variation_grad)
from ..ops.marching import alpha2weights, composite, distortion_loss


@dataclasses.dataclass(frozen=True)
class TiNeuVoxConfig:
    """Static (hashable) model configuration.

    Mirrors the kwargs of the reference constructor (lib/tineuvox.py:92-98)
    plus derived grid geometry (lib/tineuvox.py:169-178).
    """
    xyz_min: Tuple[float, float, float]
    xyz_max: Tuple[float, float, float]
    num_voxels: int
    num_voxels_base: int
    voxel_dim: int = 12
    defor_depth: int = 5
    net_width: int = 128
    posbase_pe: int = 10
    viewbase_pe: int = 4
    timebase_pe: int = 8
    gridbase_pe: int = 2
    alpha_init: float = 1e-3
    fast_color_thres: float = 1e-4
    no_view_dir: bool = False
    add_cam: bool = False
    feat_only: bool = False
    # occupancy-tested samples per group: one occupancy lookup per
    # ``occ_group`` consecutive ray steps (at the group centre, against a
    # grid carrying ONE extra dilation so the centre test stays
    # conservative for every member), and compaction/ray gathers at group
    # granularity. 1 = per-sample testing.
    occ_group: int = 4
    # bf16 deformation/featurenet activations (params stay fp32 in the
    # optimizer; matmul products were already bf16 on TPU — this halves the
    # activation/residual HBM traffic). Not part of get_kwargs: checkpoints
    # reload with fp32 eval.
    mlp_bf16: bool = False

    # ----- derived geometry -----
    @property
    def extent(self):
        return np.asarray(self.xyz_max, np.float64) - np.asarray(self.xyz_min, np.float64)

    @property
    def voxel_size(self) -> float:
        return float((self.extent.prod() / self.num_voxels) ** (1.0 / 3.0))

    @property
    def voxel_size_base(self) -> float:
        return float((self.extent.prod() / self.num_voxels_base) ** (1.0 / 3.0))

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def world_size(self) -> Tuple[int, int, int]:
        ws = (self.extent / self.voxel_size).astype(np.int64)
        return tuple(int(x) for x in ws)

    @property
    def act_shift(self) -> float:
        return float(np.log(1.0 / (1.0 - self.alpha_init) - 1.0))

    # ----- channel bookkeeping -----
    @property
    def times_ch(self) -> int:
        return 1 + 2 * self.timebase_pe

    @property
    def views_ch(self) -> int:
        return 0 if self.no_view_dir else 3 + 3 * self.viewbase_pe * 2

    @property
    def pts_ch(self) -> int:
        return 3 + 3 * self.posbase_pe * 2

    @property
    def timenet_output(self) -> int:
        return self.voxel_dim + self.voxel_dim * 2 * self.gridbase_pe

    @property
    def grid_ch(self) -> int:
        g = self.voxel_dim * 3
        return g + g * 2 * self.gridbase_pe

    @property
    def featurenet_input(self) -> int:
        if self.feat_only:
            return self.grid_ch
        return self.grid_ch + self.timenet_output + self.pts_ch

    def n_samples(self, stepsize: float) -> int:
        """Global sample count for the distortion loss normaliser
        (reference lib/tineuvox.py:542)."""
        ws = np.asarray(self.world_size, np.float64)
        return int(np.linalg.norm(ws + 1) / stepsize) + 1

    def max_steps(self, stepsize: float) -> int:
        """Static per-ray sample budget: bbox diagonal / step distance."""
        return rayops.max_n_steps(self.xyz_min, self.xyz_max,
                                  stepsize * self.voxel_size)

    def with_num_voxels(self, num_voxels: int) -> "TiNeuVoxConfig":
        return dataclasses.replace(self, num_voxels=num_voxels)

    def get_kwargs(self) -> Dict[str, Any]:
        """Checkpoint-reconstruction kwargs (reference lib/tineuvox.py:180-199)."""
        return {
            "xyz_min": tuple(self.xyz_min), "xyz_max": tuple(self.xyz_max),
            "num_voxels": self.num_voxels,
            "num_voxels_base": self.num_voxels_base,
            "alpha_init": self.alpha_init,
            "fast_color_thres": self.fast_color_thres,
            "voxel_dim": self.voxel_dim, "defor_depth": self.defor_depth,
            "net_width": self.net_width, "posbase_pe": self.posbase_pe,
            "viewbase_pe": self.viewbase_pe, "timebase_pe": self.timebase_pe,
            "gridbase_pe": self.gridbase_pe, "add_cam": self.add_cam,
            "no_view_dir": self.no_view_dir, "feat_only": self.feat_only,
            # not in the reference kwargs: dropping these made mid-stage
            # resume silently change the TPU execution config (fp32 MLPs /
            # per-sample occupancy probing)
            "mlp_bf16": self.mlp_bf16, "occ_group": self.occ_group,
        }


# --------------------------------------------------------------------------
# Parameter initialisation
# --------------------------------------------------------------------------

def init_params(key, cfg: TiNeuVoxConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    W = cfg.net_width
    params: Dict[str, Any] = {}
    params["feature"] = jnp.zeros((*cfg.world_size, cfg.voxel_dim), dtype)
    params["timenet"] = nn.init_mlp(ks[0], [cfg.times_ch, W, cfg.timenet_output])
    if cfg.add_cam:
        params["camnet"] = nn.init_mlp(ks[1], [cfg.times_ch, W, cfg.timenet_output])
    # Deformation MLP (reference lib/tineuvox.py:28-62): first layer takes
    # [pts_pe, time_feature]; defor_depth-2 hidden layers; final -> 3.
    d_dims = [cfg.pts_ch + cfg.timenet_output] + [W] * (cfg.defor_depth - 1) + [3]
    params["deformation_net"] = nn.init_mlp(ks[2], d_dims)
    params["featurenet"] = nn.init_mlp(ks[3], [cfg.featurenet_input, W])
    params["densitynet"] = nn.init_mlp(ks[4], [W, 1])
    params["rgbnet"] = init_rgbnet(ks[5], W, cfg.views_ch)
    return params


def init_rgbnet(key, width: int, views_ch: int):
    """Colour head (reference RGBNet, lib/tineuvox.py:65-88)."""
    k1, k2 = jax.random.split(key)
    return {
        "feature_linears": nn.init_linear(k1, width, width),
        "views_linears": nn.init_mlp(k2, [width + views_ch, width // 2, 3]),
    }


def apply_rgbnet(p, h, views_emb=None):
    feat = nn.linear(p["feature_linears"], h)
    if views_emb is not None:
        feat = jnp.concatenate([feat, views_emb], axis=-1)
    return nn.mlp(p["views_linears"], feat)


def apply_deformation(p, pts_emb, t_feature, act_dt=jnp.float32):
    """Reference Deformation.forward (lib/tineuvox.py:49-62): predicts a
    delta added to the raw xyz (first 3 channels of the PE).

    ``act_dt``: activation dtype for the MLP (bf16 on TPU); the delta is
    added to the raw xyz in fp32 either way — positions feed the grid
    interp, only the learned offset runs half-width."""
    h = jnp.concatenate([pts_emb, t_feature], axis=-1)
    if act_dt != jnp.float32:
        p = jax.tree_util.tree_map(lambda x: x.astype(act_dt), p)
    dx = nn.mlp(p, h.astype(act_dt))
    return pts_emb[..., :3] + dx.astype(jnp.float32)


# --------------------------------------------------------------------------
# Forward (volume rendering) — dense layout
# --------------------------------------------------------------------------

# Largest active-sample count run as ONE fused feature pipeline. Budgets
# above this are processed in equal lax.scan chunks: the TPU compiler's
# regalloc RET_CHECK (live_range_finder.cc:29) fires on single fusions
# somewhere above 2^19 samples at 160^3 scale (524288 compiles; 569344,
# 655360 and 786432 all crash — see PERF.md round-3 compile sweep), and
# chunking pins every budget-dependent kernel shape to a known-safe size
# while only the trip count varies.
_MAX_SINGLE_BUDGET = 1 << 19


def _active_chunks(A: int) -> int:
    """Number of scan chunks for an active-sample pipeline of size A."""
    import os
    max_single = int(os.environ.get("APNERF_MAX_SINGLE_BUDGET",
                                    _MAX_SINGLE_BUDGET))
    if A > max_single and A % max_single == 0:
        # exact multiples chunk to EXACTLY max_single (a swept-green pow2
        # shape). The old pow2-count-only split turned 3*2^19 into
        # 3*2^17-shaped chunks — the very non-pow2 member family that
        # crashed the TPU worker in the round-4 train-clock
        # (TRAIN_CLOCK.md, ADVICE r4 medium).
        return min(A // max_single, 1024)
    k = 1
    while A // k > max_single and k < 1024:
        k *= 2
    if A % k:
        return 1                      # non-divisible budgets run unchunked
    return k


def _active_feature_pipeline(params, cfg: TiNeuVoxConfig, pts_act, tfeat_act,
                             views_act, filled, interval):
    """Deformation + grid interp + heads for one block of active samples.

    The budget-shaped heavyweight segment of ``forward`` (reference
    lib/tineuvox.py:479-532 restricted to compacted samples)."""
    h_act, pts_delta = query_density_features(params, cfg, pts_act, tfeat_act)
    density_act = nn.mlp(params["densitynet"], h_act)[..., 0]
    alpha_act = jnp.where(filled,
                          raw2alpha(density_act, cfg.act_shift, interval),
                          0.0)
    rgb_act = jax.nn.sigmoid(apply_rgbnet(params["rgbnet"], h_act, views_act))
    return alpha_act, rgb_act, pts_delta


def _run_active_pipeline(params, cfg: TiNeuVoxConfig, pts_act, tfeat_act,
                         views_act, filled, interval):
    """Run the active-sample pipeline, chunked when it exceeds the safe
    single-fusion size (see _MAX_SINGLE_BUDGET)."""
    A = pts_act.shape[0]
    k = _active_chunks(A)
    if k <= 1:
        return _active_feature_pipeline(params, cfg, pts_act, tfeat_act,
                                        views_act, filled, interval)
    c = A // k

    def resh(x):
        return x.reshape(k, c, *x.shape[1:])

    if views_act is None:
        def body(_, inp):
            p, t, f = inp
            return None, _active_feature_pipeline(params, cfg, p, t, None,
                                                  f, interval)
        xs = (resh(pts_act), resh(tfeat_act), resh(filled))
    else:
        def body(_, inp):
            p, t, v, f = inp
            return None, _active_feature_pipeline(params, cfg, p, t, v, f,
                                                  interval)
        xs = (resh(pts_act), resh(tfeat_act), resh(views_act), resh(filled))
    _, (alpha_act, rgb_act, pts_delta) = jax.lax.scan(body, None, xs)
    return (alpha_act.reshape(A), rgb_act.reshape(A, 3),
            pts_delta.reshape(A, 3))

def query_density_features(params, cfg: TiNeuVoxConfig, pts, times_feature,
                           canonical: bool = False):
    """Shared sample->feature pipeline: PE, deformation, multi-scale grid
    interp, featurenet. ``pts`` [..., 3]; ``times_feature`` broadcastable.

    Returns (h_feature [..., W], pts_delta [..., 3]).
    """
    freqs_pos = encoding.poc_freqs(cfg.posbase_pe)
    freqs_grid = encoding.poc_freqs(cfg.gridbase_pe)
    act_dt = jnp.bfloat16 if cfg.mlp_bf16 else jnp.float32

    def cast_p(p):
        if not cfg.mlp_bf16:
            return p
        return jax.tree_util.tree_map(lambda x: x.astype(act_dt), p)

    pts_emb = encoding.poc_fre(pts, freqs_pos)
    if canonical:
        pts_delta = pts
    else:
        pts_delta = apply_deformation(params["deformation_net"], pts_emb,
                                      times_feature, act_dt=act_dt)
    xyz_min = jnp.asarray(cfg.xyz_min, jnp.float32)
    xyz_max = jnp.asarray(cfg.xyz_max, jnp.float32)
    vox_feat = mult_dist_interp(params["feature"], pts_delta, xyz_min, xyz_max)
    vox_emb = encoding.poc_fre(vox_feat, freqs_grid)
    if cfg.feat_only:
        h_in = vox_emb
    else:
        h_in = jnp.concatenate([vox_emb, pts_emb, times_feature], axis=-1)
    h = nn.mlp(cast_p(params["featurenet"]), h_in.astype(act_dt),
               final_activation=jax.nn.relu)
    return h.astype(jnp.float32), pts_delta


def time_feature(params, cfg: TiNeuVoxConfig, times_sel):
    t_emb = encoding.poc_fre(times_sel, encoding.poc_freqs(cfg.timebase_pe))
    return nn.mlp(params["timenet"], t_emb)


def forward(params, cfg: TiNeuVoxConfig, rays_o, rays_d, viewdirs, times_sel,
            near, far, stepsize, bg, n_max_steps: int, cam_sel=None,
            bg_points_sel=None, occ_grid=None, active_budget=None):
    """Volume render a batch of rays (reference TiNeuVox.forward,
    lib/tineuvox.py:458-564), dense layout.

    Args:
      rays_o/rays_d/viewdirs: [N, 3]; times_sel: [N, 1].
      n_max_steps: static per-ray sample budget (cfg.max_steps(stepsize)).
      occ_grid: optional [X?,Y?,Z?] boolean occupancy volume over the scene
        bbox; samples in unoccupied cells are pruned (a live version of the
        reference's unused maskcache, render_utils_kernel.cu:294-351).
      active_budget: optional static global sample budget; only that many
        valid samples run through the deformation/feature/color pipeline
        (TPU analogue of the reference's ragged compaction).

    Returns a dict of render results; per-sample arrays are [N, S].
    """
    from ..ops import compaction
    N = rays_o.shape[0]
    tfeat = time_feature(params, cfg, times_sel)                   # [N, Ct]
    stepdist = stepsize * cfg.voxel_size
    xyz_min_a = jnp.asarray(cfg.xyz_min, jnp.float32)
    xyz_max_a = jnp.asarray(cfg.xyz_max, jnp.float32)
    S = n_max_steps
    interval = stepsize * cfg.voxel_size_ratio
    step_id = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :],
                               (N, S))

    # group size for occupancy testing/compaction: the group half-width
    # (G-1)/2*stepdist must stay within ONE occupancy cell (= voxel_size)
    # so the centre test against the extra-dilated grid is conservative
    G = int(cfg.occ_group)
    if G > 1 and (active_budget is None or occ_grid is None
                  or stepsize * (G - 1) / 2.0 > 1.0):
        G = 1

    if active_budget is not None and occ_grid is not None and G > 1:
        # ---- coarse-group pipeline: one occupancy lookup per G steps,
        # group-level compaction, group-level ray gathers (the per-sample
        # variant cost ~65 ms/step at 160^3 scale, dominated by 2.3M
        # occupancy gather rows + a 2.3M cumsum + 524k-row pts gathers) --
        M_full = N * S
        SG = (S + G - 1) // G       # groups cover S (last may be partial)
        t_min, t_max = rayops.ray_aabb(rays_o, rays_d, xyz_min_a, xyz_max_a,
                                       near, far)
        n_steps_r = jnp.maximum(
            jnp.ceil((t_max - t_min) / stepdist), 1.0).astype(jnp.int32)
        rays_start = rays_o + rays_d * t_min[:, None]
        unit_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        gcentre_t = (jnp.arange(SG, dtype=jnp.float32) * G
                     + (G - 1) / 2.0) * stepdist
        centre = (rays_start[:, None, :]
                  + unit_d[:, None, :] * gcentre_t[None, :, None])
        # clamp instead of rejecting out-of-grid centres: a group whose
        # centre falls just outside the bbox may still have members inside
        centre = jnp.clip(centre, xyz_min_a, xyz_max_a)
        occ_g = compaction.occupancy_lookup_xyz(occ_grid, xyz_min_a,
                                                xyz_max_a, centre)  # [N,SG]
        valid_g = occ_g & (jnp.arange(SG, dtype=jnp.int32)[None, :] * G
                           < n_steps_r[:, None])
        budget_g = -(-int(active_budget) // G)
        A = budget_g * G            # expanded active count (>= budget)
        src_g, filled_g = compaction.compact_flat(
            valid_g.reshape(N * SG), budget_g)
        ray_g = jnp.minimum(src_g // SG, N - 1)
        g_of = jnp.minimum(src_g % SG, SG - 1)
        # member positions recomputed arithmetically from [budget/G]-row
        # ray-table gathers (no per-sample gathers)
        member = jnp.arange(G, dtype=jnp.float32)
        t_mem = (g_of[:, None].astype(jnp.float32) * G + member) * stepdist
        pts_act = (rays_start[ray_g][:, None, :]
                   + unit_d[ray_g][:, None, :] * t_mem[..., None]
                   ).reshape(A, 3)
        step_act = (g_of[:, None] * G
                    + jnp.arange(G, dtype=jnp.int32)).reshape(-1)
        in_bb = jnp.all((pts_act >= xyz_min_a) & (pts_act <= xyz_max_a),
                        axis=-1)
        ns_act = jnp.repeat(n_steps_r[ray_g], G)
        filled = (jnp.repeat(filled_g, G) & in_bb
                  & (step_act < ns_act))
        src = jnp.where(filled,
                        jnp.repeat(ray_g, G) * S + step_act, M_full)
        tfeat_act = jnp.repeat(tfeat[ray_g], G, axis=0)
        ray_of = jnp.repeat(ray_g, G)
        # fusion barrier between the sampling/compaction pipeline and the
        # feature pipeline: the combined fusion at 160^3 scale breaks the
        # TPU compile (regalloc RET_CHECK) and balloons compile time
        pts_act, tfeat_act, src, filled = jax.lax.optimization_barrier(
            (pts_act, tfeat_act, src, filled))
        if cfg.no_view_dir:
            views_act = None
        else:
            v_emb = encoding.poc_fre(viewdirs,
                                     encoding.poc_freqs(cfg.viewbase_pe))
            if cfg.add_cam:
                cam_emb = encoding.poc_fre(
                    cam_sel, encoding.poc_freqs(cfg.timebase_pe))
                cam_feat = nn.mlp(params["camnet"], cam_emb)
                v_emb = jnp.concatenate([v_emb, cam_feat], axis=-1)
            views_act = v_emb[ray_of]
        alpha_act, rgb_act, pts_delta = _run_active_pipeline(
            params, cfg, pts_act, tfeat_act, views_act, filled, interval)
        alpha = compaction.scatter_back(alpha_act, src, M_full).reshape(N, S)
        rgb = compaction.scatter_back(rgb_act, src, M_full).reshape(N, S, 3)
        valid = compaction.scatter_back(
            filled, src, M_full, fill=False).reshape(N, S)
        # fusion barrier: scatter-back + the [N, S] transmittance cumprod in
        # one fusion breaks the TPU compile (regalloc RET_CHECK) at 160^3
        alpha, rgb, valid = jax.lax.optimization_barrier((alpha, rgb, valid))
    elif active_budget is not None:
        # ---- per-sample compaction (G == 1 fallback) -------------------
        samples = rayops.sample_pts_on_rays(rays_o, rays_d, cfg.xyz_min,
                                            cfg.xyz_max, near, far, stepdist,
                                            n_max_steps)
        valid = samples.valid
        if occ_grid is not None:
            valid = valid & compaction.occupancy_lookup_xyz(
                occ_grid, xyz_min_a, xyz_max_a, samples.pts)
        M_full = N * S
        src, filled = compaction.compact_flat(valid.reshape(M_full),
                                              int(active_budget))
        pts_pad = jnp.concatenate(
            [samples.pts.reshape(M_full, 3), jnp.zeros((1, 3))], 0)
        pts_act = pts_pad[src]
        ray_of = jnp.minimum(src // S, N - 1)
        tfeat_act = tfeat[ray_of]
        # fusion barrier between the sampling/compaction pipeline and the
        # feature pipeline: the combined fusion at 160^3 scale breaks the
        # TPU compile (regalloc RET_CHECK) and balloons compile time
        pts_act, tfeat_act, src, filled = jax.lax.optimization_barrier(
            (pts_act, tfeat_act, src, filled))
        if cfg.no_view_dir:
            views_act = None
        else:
            v_emb = encoding.poc_fre(viewdirs,
                                     encoding.poc_freqs(cfg.viewbase_pe))
            if cfg.add_cam:
                cam_emb = encoding.poc_fre(
                    cam_sel, encoding.poc_freqs(cfg.timebase_pe))
                cam_feat = nn.mlp(params["camnet"], cam_emb)
                v_emb = jnp.concatenate([v_emb, cam_feat], axis=-1)
            views_act = v_emb[ray_of]
        alpha_act, rgb_act, pts_delta = _run_active_pipeline(
            params, cfg, pts_act, tfeat_act, views_act, filled, interval)
        alpha = compaction.scatter_back(alpha_act, src, M_full).reshape(N, S)
        rgb = compaction.scatter_back(rgb_act, src, M_full).reshape(N, S, 3)
        valid = compaction.scatter_back(
            filled, src, M_full, fill=False).reshape(N, S)
        # fusion barrier: scatter-back + the [N, S] transmittance cumprod in
        # one fusion breaks the TPU compile (regalloc RET_CHECK) at 160^3
        alpha, rgb, valid = jax.lax.optimization_barrier((alpha, rgb, valid))
    else:
        samples = rayops.sample_pts_on_rays(rays_o, rays_d, cfg.xyz_min,
                                            cfg.xyz_max, near, far, stepdist,
                                            n_max_steps)
        valid = samples.valid
        if occ_grid is not None:
            valid = valid & compaction.occupancy_lookup_xyz(
                occ_grid, xyz_min_a, xyz_max_a, samples.pts)
        tfeat_b = jnp.broadcast_to(tfeat[:, None, :], (N, S, tfeat.shape[-1]))
        h, pts_delta = query_density_features(params, cfg, samples.pts,
                                              tfeat_b)
        density = nn.mlp(params["densitynet"], h)[..., 0]          # [N, S]
        alpha = raw2alpha(density, cfg.act_shift, interval)
        if cfg.no_view_dir:
            views_emb = None
        else:
            v_emb = encoding.poc_fre(viewdirs,
                                     encoding.poc_freqs(cfg.viewbase_pe))
            if cfg.add_cam:
                cam_emb = encoding.poc_fre(
                    cam_sel, encoding.poc_freqs(cfg.timebase_pe))
                cam_feat = nn.mlp(params["camnet"], cam_emb)
                v_emb = jnp.concatenate([v_emb, cam_feat], axis=-1)
            views_emb = jnp.broadcast_to(v_emb[:, None, :],
                                         (N, S, v_emb.shape[-1]))
        rgb = jax.nn.sigmoid(apply_rgbnet(params["rgbnet"], h, views_emb))

    if cfg.fast_color_thres > 0:
        valid = valid & (alpha > cfg.fast_color_thres)
    weights, alphainv_last = alpha2weights(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)

    rgb_marched = composite(weights, rgb, bg=bg, alphainv_last=alphainv_last)
    depth = composite(weights, step_id.astype(jnp.float32))

    n_samples_global = cfg.n_samples(stepsize)
    s = (step_id.astype(jnp.float32) + 0.5) / n_samples_global

    out = {
        "rgb_marched": rgb_marched,
        "depth": jax.lax.stop_gradient(depth),
        "alphainv_last": alphainv_last,
        "weights": weights,
        "raw_alpha": alpha,
        "raw_rgb": rgb,
        "valid": valid,
        "s": s,
        "n_max": n_samples_global,
        "ray_pts_delta": pts_delta,
    }
    if bg_points_sel is not None:
        freqs_pos = encoding.poc_freqs(cfg.posbase_pe)
        bg_emb = encoding.poc_fre(bg_points_sel, freqs_pos)
        out["bg_points_delta"] = apply_deformation(
            params["deformation_net"], bg_emb, tfeat[: bg_points_sel.shape[0]])
    return out


def ray_density(params, cfg: TiNeuVoxConfig, rays_o, rays_d, times_sel, near,
                far, stepsize, n_max_steps: int):
    """Density-only forward (reference ``TiNeuVox.ray_density``,
    lib/tineuvox.py:566-625): per-ray weights without the deformation warp
    or colour head. Returns weights, s, n_max, valid."""
    N = rays_o.shape[0]
    tfeat = time_feature(params, cfg, times_sel)
    stepdist = stepsize * cfg.voxel_size
    samples = rayops.sample_pts_on_rays(rays_o, rays_d, cfg.xyz_min,
                                        cfg.xyz_max, near, far, stepdist,
                                        n_max_steps)
    S = n_max_steps
    tfeat_b = jnp.broadcast_to(tfeat[:, None, :], (N, S, tfeat.shape[-1]))
    # canonical=True: no deformation (reference :585 uses raw pts)
    h, _ = query_density_features(params, cfg, samples.pts, tfeat_b,
                                  canonical=True)
    density = nn.mlp(params["densitynet"], h)[..., 0]
    interval = stepsize * cfg.voxel_size_ratio
    alpha = raw2alpha(density, cfg.act_shift, interval)
    valid = samples.valid
    if cfg.fast_color_thres > 0:
        valid = valid & (alpha > cfg.fast_color_thres)
    weights, _ = alpha2weights(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)
    n_samples_global = cfg.n_samples(stepsize)
    s = (samples.step_id.astype(jnp.float32) + 0.5) / n_samples_global
    return {"weights": weights, "s": s, "n_max": n_samples_global,
            "valid": valid}


# --------------------------------------------------------------------------
# Dense grid evaluation (export path)
# --------------------------------------------------------------------------

def grid_xyz_coords(cfg: TiNeuVoxConfig, sampling_freq: float = 1.0,
                    world_size=None):
    """Reference ``get_grid_xyz`` (lib/tineuvox.py:238-250)."""
    ws = world_size or cfg.world_size
    axes = [np.linspace(cfg.xyz_min[d], cfg.xyz_max[d],
                        int(ws[d] * sampling_freq)) for d in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return g.astype(np.float32)


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "canonical", "want_features",
                                   "stepsize"))
def _eval_points_batch(params, cfg: TiNeuVoxConfig, pts, time_sel, viewdir,
                       stepsize, canonical, want_features):
    tfeat = time_feature(params, cfg, time_sel.reshape(1, 1))
    tb = jnp.broadcast_to(tfeat, (pts.shape[0], tfeat.shape[-1]))
    h, _ = query_density_features(params, cfg, pts, tb, canonical=canonical)
    density = nn.mlp(params["densitynet"], h)[..., 0]
    interval = stepsize * cfg.voxel_size_ratio
    alpha = raw2alpha(density, cfg.act_shift, interval)
    if not want_features:
        return alpha, alpha, alpha
    if cfg.no_view_dir:
        ve = None
    else:
        v_emb = encoding.poc_fre(viewdir.reshape(1, 3),
                                 encoding.poc_freqs(cfg.viewbase_pe))
        ve = jnp.broadcast_to(v_emb, (pts.shape[0], v_emb.shape[-1]))
    rgb = jax.nn.sigmoid(apply_rgbnet(params["rgbnet"], h, ve))
    return alpha, rgb, h


def eval_alpha_volume(params, cfg: TiNeuVoxConfig, grid_xyz, time_sel,
                      stepsize, canonical=False, batch=2 ** 18,
                      want_features=False, viewdir=None):
    """Evaluate alpha (and optionally rgb/features) on a dense point grid.

    Covers reference ``get_grid_as_point_cloud`` / ``get_alpha_mask``
    (lib/tineuvox.py:201-363). Batches have a fixed padded size so one XLA
    program serves every grid resolution (the export binary search probes
    many sizes).
    """
    shape = grid_xyz.shape[:-1]
    pts_all = np.asarray(grid_xyz, np.float32).reshape(-1, 3)
    n = pts_all.shape[0]
    batch = min(batch, max(4096, 1 << (n - 1).bit_length()))
    pad = (-n) % batch
    if pad:
        pts_all = np.concatenate(
            [pts_all, np.zeros((pad, 3), np.float32)])
    t_dev = jnp.asarray(float(time_sel), jnp.float32)
    v_dev = (jnp.zeros(3) if viewdir is None
             else jnp.asarray(viewdir, jnp.float32).reshape(3))

    alphas, rgbs, feats = [], [], []
    for i in range(0, pts_all.shape[0], batch):
        a, r, f = _eval_points_batch(params, cfg, jnp.asarray(pts_all[i:i + batch]),
                                     t_dev, v_dev, float(stepsize),
                                     bool(canonical), bool(want_features))
        alphas.append(np.asarray(a))
        if want_features:
            rgbs.append(np.asarray(r))
            feats.append(np.asarray(f))
    alpha = np.concatenate(alphas)[:n].reshape(shape)
    if not want_features:
        return alpha
    rgb = np.concatenate(rgbs)[:n].reshape(*shape, -1)
    feat = np.concatenate(feats)[:n].reshape(*shape, -1)
    return alpha, rgb, feat


# --------------------------------------------------------------------------
# Progressive grid scaling + TV
# --------------------------------------------------------------------------

def scale_volume_grid(params, cfg: TiNeuVoxConfig, num_voxels: int):
    """Reference ``scale_volume_grid`` (lib/tineuvox.py:365-372): trilinear
    align-corners resize of the feature grid to the new resolution."""
    new_cfg = cfg.with_num_voxels(num_voxels)
    new_params = dict(params)
    new_params["feature"] = resize_trilinear(
        params["feature"].astype(jnp.float32), new_cfg.world_size)
    return new_params, new_cfg


def feature_tv_grad(params, cfg: TiNeuVoxConfig, weight: float,
                    photo_grad, dense):
    """Feature-grid TV gradient with the caller-side scaling of
    ``feature_total_variation_add_grad`` (lib/tineuvox.py:374-377).

    ``dense`` (traced 0/1 scalar) selects the reference's
    ``global_step < tv_feature_before`` dense mode; otherwise only voxels
    whose photometric gradient is nonzero receive the TV gradient
    (total_variation_kernel.cu:21 ``grad[index] != 0`` skip). Add the
    result to the feature gradient AFTER jax.grad, like the reference adds
    into ``.grad`` after backward (run.py:978-981)."""
    w = weight * max(cfg.world_size) / 128.0
    feat = params["feature"].astype(jnp.float32)
    g = total_variation_grad(feat, w)
    # per-element skip, channel included (the CUDA kernel indexes numel)
    keep = (dense > 0.5) | (photo_grad != 0.0)
    return jnp.where(keep, g, 0.0)
