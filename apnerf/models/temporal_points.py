"""TemporalPoints: forward-warped LBS point cloud + PointNeRF-style renderer.

Functional re-implementation of the reference ``TemporalPoints``
(lib/temporalpoints.py:30-800), TPU-first:

* the ragged "sample rays in the warped-cloud bbox, drop empties, pykeops
  KNN" pipeline becomes: dense slab-test sampling against the per-frame
  bbox, a per-ray compaction to a static sample budget, a tiled exact KNN
  in matmul form, and masked compositing — everything statically shaped
  under one ``jit``;
* rays that miss the cloud simply keep zero weights (the reference's
  ``NoPointsException`` background fallback, lib/temporalpoints.py:26-28,
  598-609, is the all-masked special case here);
* the reference's ``[J,J,J]`` one-hot bmm weight merging
  (lib/temporalpoints.py:401-414) is a single [J, J] matmul.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encoding, nn
from ..ops.activation import raw2alpha
from ..ops.knn import knn
from ..ops.marching import alpha2weights, composite
from ..ops.rays import ray_aabb
from . import point_warper

HIGH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class TemporalPointsConfig:
    n_points: int
    n_joints: int
    feat_dim: int
    neighbours: int = 8
    timebase_pe: int = 8
    posbase_pe: int = 10
    viewbase_pe: int = 4
    stepsize: float = 0.5
    voxel_size: float = 0.0
    voxel_size_ratio: float = 1.0     # from the trained backbone
    act_shift: float = 0.0            # from the trained backbone
    fast_color_thres: float = 1e-4
    no_view_dir: bool = False
    frozen_view_dir: bool = False
    over_parameterized_rot: bool = True
    avg_procrustes: bool = False      # procrustes re-orthonormalise frames
    re_init_mlps: bool = False        # fresh heads instead of backbone copy
    feat_depth: int = 4
    pose_embedding_dim: int = 0
    eps: float = 1e-6
    # budget fractions: measured on the bench workload (scripts/
    # sweep_render.py, PERF.md round 3) — at these values the render
    # matches the untruncated-budget render at 51 dB PSNR (visually
    # lossless) for 1.55x throughput; the stage-2 startup audit and the
    # renderer's budget_audit warning surface any scene where demand
    # exceeds these budgets.
    sample_budget: int = 192          # static per-ray samples after compaction
    max_steps: int = 512              # static pre-compaction sample count
    active_fraction: float = 0.30     # global budget of samples fed to KNN
    pass_fraction: float = 0.30       # of active budget, radius-cutoff passers
    occ_res: int = 64                 # occupancy-grid resolution per axis
    occ_dilations: int = 2            # dilation rounds (finer cells=tighter)
    knn_pts_tile: int = 128           # KNN kernel points per tile (pow2)
    knn_rt: int = 24                  # KNN kernel tiles per selection round
    group_pass_fraction: float = 0.55   # coarse-group k-NN prefilter budget
                                        # (0 disables the prefilter)
    agg_bf16: bool = True             # half-width neighbour aggregation
    coarse_stride: int = 16           # steps per occupancy-tested group
    # subgroup-shared KNN: select ``knn_cand`` candidates ONCE per
    # ``knn_share`` consecutive ray samples (one packed-row gather per
    # subgroup), then each sample takes its exact top-8-of-candidates in
    # registers. Error is one-sided: a sample is never accepted that the
    # exact path rejects; it can be rejected (or weighted without a far
    # neighbour) only when its true kth neighbour is outside the
    # subgroup representative's ``knn_cand`` nearest. 1 = off (exact
    # per-sample two-phase KNN path).
    knn_share: int = 1
    knn_cand: int = 12
    # fused Pallas aggregation kernel for the shared path (forward-only,
    # no VJP; requires feat_depth=4, agg_bf16, no pose embedding, standard
    # render outputs). EXPERIMENTAL, default OFF: measured 484k vs the XLA
    # formulation's 598k rays/s on the bench workload — the in-kernel
    # member fori_loop + 12-lane VPU math + small-GEMM overhead exceed the
    # HBM traffic it saves (PERF.md round-3 fused-agg experiment). Kept
    # flag-gated for future kernel work; exactness-tested in interpret
    # mode either way.
    fused_agg: bool = False
    # fused PE + feat_net + weighted-K-reduction Pallas kernel
    # (kernels/featmlp_pallas.py): keeps the aggregation MLP's activations
    # in VMEM (the XLA formulation is HBM-bound at 13% MXU, PERF.md).
    # Unlike fused_agg it does no selection/ranking — just large GEMMs —
    # and is used by BOTH the shared and exact aggregation paths when
    # agg_bf16 is on. Has a custom VJP (forward Pallas kernel + XLA
    # recompute backward, remat-style); training uses it only when the
    # stage-2 config opts in via featmlp_train (train/stage2.py).
    featmlp_kernel: bool = True

    @property
    def t_dim(self):
        return 1 + 2 * self.timebase_pe

    @property
    def pts_ch(self):
        return 3 + 3 * self.posbase_pe * 2

    @property
    def views_ch(self):
        return 0 if self.no_view_dir else 3 + 3 * self.viewbase_pe * 2

    @property
    def warp_cfg(self):
        return point_warper.WarpConfig(
            n_joints=self.n_joints, t_dim=self.t_dim,
            over_parameterized_rot=self.over_parameterized_rot)


def _reinit_linear_tree(key, tree):
    """Re-sample every linear layer in a params pytree in place of the
    copied values — torch ``reset_parameters`` semantics (uniform
    ±1/sqrt(fan_in) for weight and bias, matching ops.nn.init_linear)."""
    leaves_w = []

    def collect(t):
        if isinstance(t, dict):
            if "w" in t:
                assert set(t) <= {"w", "b"}, (
                    f"re_init_mlps: unexpected layer schema {sorted(t)}")
                leaves_w.append(t)
            else:
                for v in t.values():
                    collect(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                collect(v)
        else:
            # array leaf outside a {w, b} layer: a head with a different
            # schema would otherwise be SILENTLY not re-initialised
            raise ValueError(
                "re_init_mlps: array leaf outside a linear layer "
                f"(shape {getattr(t, 'shape', '?')}); extend "
                "_reinit_linear_tree for this head schema")

    import copy
    tree = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, tree))
    collect(tree)
    keys = jax.random.split(key, max(1, len(leaves_w)))
    for lk, layer in zip(keys, leaves_w):
        din, dout = layer["w"].shape
        bound = 1.0 / np.sqrt(din)
        kw, kb = jax.random.split(lk)
        layer["w"] = jax.random.uniform(kw, (din, dout), jnp.float32,
                                        -bound, bound)
        if "b" in layer:
            layer["b"] = jax.random.uniform(kb, (dout,), jnp.float32,
                                            -bound, bound)
    return tree


def init_params(key, cfg: TemporalPointsConfig, canonical_pcd, joints, bones,
                canonical_feat, canonical_alpha, canonical_rgbs,
                tineuvox_params, noise_gamma=1e-2):
    """Build the stage-2 parameter pytree.

    Top-level keys mirror the reference attribute names so the
    ``lrate_*``-reflection optimizer grouping works:
    weights / joints / theta_weight / gammas / canonical_feat /
    forward_warp / feat_net / rgbnet / densitynet / featurenet(absent) /
    timenet / pose_embedding_net / canonical_rgbs / canonical_alpha /
    direct_eps.
    """
    ks = jax.random.split(key, 6)
    P, J = cfg.n_points, cfg.n_joints
    from ..kinematics.skeletonizer import point_segment_distance
    a = np.array([joints[b[0]] for b in bones], np.float64)
    b = np.array([joints[b[1]] for b in bones], np.float64)
    d = point_segment_distance(np.asarray(canonical_pcd), a, b)   # [J-1, P]
    w = (1.0 / (0.5 * np.e ** d + cfg.eps)).T                     # [P, J-1]
    w = np.concatenate([np.zeros((P, 1)), w], axis=-1)            # zero col
    params: Dict[str, Any] = {
        "weights": jnp.asarray(w, jnp.float32),
        "joints": jnp.asarray(joints, jnp.float32),
        "theta_weight": jnp.asarray([0.1], jnp.float32),
        "gammas": 1.0 + noise_gamma * jax.random.normal(ks[0], (P,)),
        "canonical_feat": jnp.asarray(canonical_feat, jnp.float32),
        "canonical_rgbs": jnp.asarray(canonical_rgbs, jnp.float32),
        "canonical_alpha": jnp.asarray(canonical_alpha, jnp.float32),
        "direct_eps": jnp.full((P,), 0.05, jnp.float32),
    }
    params["forward_warp"] = point_warper.init_params(ks[1], cfg.warp_cfg)
    # feat_net (PointNeRF-style; reference lib/temporalpoints.py:117-130)
    fin = cfg.feat_dim + cfg.pts_ch + cfg.pose_embedding_dim
    dims = [fin] + [cfg.feat_dim] * (cfg.feat_depth)
    params["feat_net"] = nn.init_mlp(ks[2], dims)
    # shared backbone heads (reference lib/temporalpoints.py:132-146)
    params["rgbnet"] = jax.tree_util.tree_map(jnp.asarray,
                                              tineuvox_params["rgbnet"])
    params["densitynet"] = jax.tree_util.tree_map(jnp.asarray,
                                                  tineuvox_params["densitynet"])
    params["timenet"] = jax.tree_util.tree_map(jnp.asarray,
                                               tineuvox_params["timenet"])
    if cfg.re_init_mlps:
        # fresh heads instead of the trained backbone copy (reference
        # ``weight_reset`` / reset_parameters, lib/temporalpoints.py:137-146)
        kre = jax.random.split(ks[4], 3)
        for i, name in enumerate(("rgbnet", "densitynet", "timenet")):
            params[name] = _reinit_linear_tree(kre[i], params[name])
    if cfg.pose_embedding_dim > 0:
        pin = J * cfg.pts_ch
        dims = ([pin, pin // 2] + [pin // 2] * (cfg.feat_depth - 2)
                + [cfg.pose_embedding_dim])
        params["pose_embedding_net"] = nn.init_mlp(ks[3], dims)
    return params


def init_state(cfg: TemporalPointsConfig, canonical_pcd, joints, bones,
               skeleton_pcd, xyz_min, xyz_max, frozen_view_dir=None):
    """Non-learned buffers (KNN tables, kinematic tree, merge state)."""
    pcd = jnp.asarray(canonical_pcd, jnp.float32)
    d2, nn_i = knn(pcd, pcd, k=cfg.neighbours)
    nn_dist = jnp.sqrt(
        ((pcd[:, None, :] - pcd[nn_i]) ** 2).sum(-1) + cfg.eps)
    tree = point_warper.build_tree(np.asarray(joints), bones)
    J = cfg.n_joints
    bone_pairs = np.asarray(bones).reshape(-1)
    state = {
        "canonical_pcd": pcd,
        "skeleton_pcd": jnp.asarray(skeleton_pcd, jnp.float32),
        "original_joints": jnp.asarray(joints, jnp.float32),
        "nn_i": nn_i,
        "nn_distance": nn_dist,
        "mean_min_distance": nn_dist[:, 1].mean(),
        "bone_arap_idx": jnp.asarray(bone_pairs, jnp.int32),
        "tree": {k: jnp.asarray(v) for k, v in tree.items()},
        "rot_mask": jnp.zeros(J, bool),
        "sibling_mask": jnp.arange(J, dtype=jnp.int32),
        "merge_mat": jnp.eye(J, dtype=jnp.float32),
        "xyz_min": jnp.asarray(xyz_min, jnp.float32),
        "xyz_max": jnp.asarray(xyz_max, jnp.float32),
        "frozen_view_dir": (None if frozen_view_dir is None
                            else jnp.asarray(frozen_view_dir, jnp.float32)),
        "bones": np.asarray(bones),
    }
    og = state["original_joints"][state["bone_arap_idx"]]
    state["og_joint_distance"] = og[0::2] - og[1::2]
    return state


def get_weights(params, cfg: TemporalPointsConfig, state):
    """Tempered softmax skinning weights + merge matrix
    (reference get_weights, lib/temporalpoints.py:401-414)."""
    theta = jnp.maximum(cfg.eps, params["theta_weight"])
    w = jax.nn.softmax(params["weights"] / theta, axis=-1)
    return jnp.matmul(w, state["merge_mat"], precision=HIGH)


def warp(params, cfg: TemporalPointsConfig, state, t=None, rot_params=None):
    """Forward-warp the canonical cloud at time t (or explicit rotations)."""
    if t is not None:
        t_embed = encoding.poc_fre(jnp.reshape(t, (1,)),
                                   encoding.poc_freqs(cfg.timebase_pe))
        t_embed = t_embed.reshape(-1)
    else:
        t_embed = None
    weights = get_weights(params, cfg, state)
    out = point_warper.forward(
        params["forward_warp"], cfg.warp_cfg, state["tree"],
        state["canonical_pcd"], weights, params["joints"],
        t_embed=t_embed, rot_params=rot_params,
        rot_mask=state["rot_mask"], sibling_mask=state["sibling_mask"],
        avg_procrustes=cfg.avg_procrustes)
    out["lbs_weights"] = weights
    return out


def _compact_per_ray(valid, budget):
    """Compact valid sample slots to the front of each ray, static budget.

    The b-th valid step index equals ``searchsorted(cumsum(valid), b+1)``
    (the per-ray inclusive cumsum is non-decreasing), which vectorises to a
    fused compare-and-count over [R, S, budget] — a few vector ops instead
    of the full [R, S] sort that ``top_k`` lowers to on TPU (~40 ms ->
    ~2 ms at 8192x512x96).
    Returns src index [R, budget] into the S axis (== S when empty slot)."""
    R, S = valid.shape
    c = jnp.cumsum(valid.astype(jnp.int32), axis=1)           # [R, S]
    thresh = jnp.arange(1, budget + 1, dtype=jnp.int32)       # [B]
    src = jnp.sum((c[:, :, None] < thresh[None, None, :]).astype(jnp.int32),
                  axis=1)                                     # [R, B]
    return src.astype(jnp.int32)                              # == S if empty


OCC_RES = 64  # default occupancy-grid resolution (see cfg.occ_res)


def build_occupancy(t_hat_pcd, bbox_min, bbox_max, radius, occ_res=OCC_RES,
                    margin=0.0, n_dil=2):
    """Binary occupancy grid of the warped cloud, dilated ``n_dil`` cells.

    TPU-side pruning: a ray sample can only pass the reference's
    ``to_nn[:, -1] <= query_radius`` cutoff (lib/temporalpoints.py:440) if
    it lies within ``sqrt(radius)`` of some point; a test position offset
    by up to ``margin`` from the sample (coarse-group centres) must then be
    within ``D = sqrt(radius) + margin`` of a point. The lookup is
    conservative iff ``floor(D/cell) + 1 <= n_dil``, i.e. ``cell > D/n_dil``
    — enforced here by flooring the cell size. More dilation rounds with
    finer cells tighten the acceptance region (~(n_dil+1)*cell) toward D,
    cutting the false-positive samples that reach the KNN: n_dil=2 at
    cell 0.065 accepts within ~0.2; n_dil=6 at cell 0.021 within ~0.15
    (D = 0.121 at the bench scale).
    """
    extent = bbox_max - bbox_min
    D = jnp.sqrt(radius) + margin
    cell = jnp.maximum(jnp.max(extent) / occ_res, D / n_dil * 1.0001)
    dims = occ_res
    idx = jnp.clip(((t_hat_pcd - bbox_min) / cell), 0, dims - 1).astype(jnp.int32)
    grid = jnp.zeros((dims, dims, dims), jnp.float32)
    grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].set(1.0, mode="drop")
    for _ in range(n_dil):
        grid = jax.lax.reduce_window(grid, -jnp.inf, jax.lax.max, (3, 3, 3),
                                     (1, 1, 1), "SAME")
    return grid > 0, cell


def occupancy_lookup(occ, cell, bbox_min, pts):
    dims = occ.shape[0]
    idx = jnp.floor((pts - bbox_min) / cell).astype(jnp.int32)
    ok = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    idx = jnp.clip(idx, 0, dims - 1)
    return ok & occ[idx[..., 0], idx[..., 1], idx[..., 2]]


def sample_rays_compact(cfg: TemporalPointsConfig, rays_o, rays_d, near, far,
                        bbox_min, bbox_max, occ=None, occ_cell=None,
                        occ_margin=0.0):
    """Dense slab sampling against a (dynamic) bbox + per-ray compaction.

    Replaces the reference's ragged ``sample_pts_on_rays`` +
    ``mask_inbbox`` compaction (lib/temporalpoints.py:373-399); with an
    occupancy grid the static per-ray budget concentrates on samples near
    the cloud instead of the whole bbox crossing.
    """
    stepdist = cfg.stepsize * cfg.voxel_size
    t_min, t_max = ray_aabb(rays_o, rays_d, bbox_min, bbox_max, near, far)
    n_steps = jnp.maximum(jnp.ceil((t_max - t_min) / stepdist), 1.0)
    start = rays_o + rays_d * t_min[:, None]
    unit_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    S = cfg.max_steps
    R = rays_o.shape[0]
    B = cfg.sample_budget
    c = cfg.coarse_stride
    if occ is not None and B % c == 0:
        # coarse-group sampling: occupancy-test one centre position per
        # group of ``c`` consecutive steps (4x fewer gathers — the gather
        # COUNT, not bytes, is the TPU floor) and budget whole groups; the
        # occupancy carries an extra dilation round (build_occupancy) so
        # the coarse-centre test stays conservative. The exact filter is
        # the downstream kth-neighbour radius cutoff either way.
        Sc = (S + c - 1) // c
        jc = jnp.arange(Sc, dtype=jnp.float32)
        tc = (jc * c + (c - 1) / 2.0) * stepdist
        pc = start[:, None, :] + unit_d[:, None, :] * tc[None, :, None]

        # the centre test is conservative only when the occupancy grid was
        # built with a margin covering the group half-width
        # (build_occupancy guarantees floor((sqrt(r)+margin)/cell)+1 <=
        # n_dil). When a caller's stepsize/coarse_stride exceed the grid's
        # margin, fall back to per-member occupancy (any over the c member
        # samples) so groups the reference keeps are never pruned.
        def centre_hit(_):
            # CLAMPED lookup (cf. tineuvox.forward's centre clamp): a last
            # partial group's centre can overhang the grid by up to the
            # group half-width while members sit inside the bbox. The
            # clamped probe is within half-width of every member, which the
            # dilation margin already covers (coarse_ok below), so clamping
            # stays conservative; rejecting out-of-range centres pruned
            # samples the reference keeps at the far bbox face.
            dims = occ.shape[0]
            idx = jnp.clip(
                jnp.floor((pc - bbox_min) / occ_cell).astype(jnp.int32),
                0, dims - 1)
            return occ[idx[..., 0], idx[..., 1], idx[..., 2]]

        def member_hit(_):
            tm = (jc[:, None] * c
                  + jnp.arange(c, dtype=jnp.float32)[None, :]) * stepdist
            pm = (start[:, None, None, :]
                  + unit_d[:, None, None, :] * tm[None, :, :, None])
            return occupancy_lookup(occ, occ_cell, bbox_min, pm).any(-1)

        half = (c - 1) / 2.0 * stepdist
        coarse_ok = half <= occ_margin * (1 + 1e-6) + 1e-12
        hit = jax.lax.cond(coarse_ok, centre_hit, member_hit, operand=None)
        hit = hit & (jc[None, :] * c < n_steps[:, None])
        src_c = _compact_per_ray(hit, B // c)                 # [R, B/c]
        src = (src_c[:, :, None] * c
               + jnp.arange(c, dtype=jnp.int32)[None, None, :]).reshape(R, B)
        step_f = src.astype(jnp.float32)
        pts_c = start[:, None, :] + unit_d[:, None, :] * (
            step_f[..., None] * stepdist)
        in_bbox = jnp.all((pts_c >= bbox_min) & (pts_c <= bbox_max), axis=-1)
        valid_c = (step_f < n_steps[:, None]) & (src < S) & in_bbox
        pts_c = jnp.where(valid_c[..., None], pts_c, 1e9)
        return pts_c, valid_c, jnp.minimum(step_f, S - 1)

    step = jnp.arange(S, dtype=jnp.float32)
    pts = start[:, None, :] + unit_d[:, None, :] * (step[None, :, None] * stepdist)
    in_bbox = jnp.all((pts >= bbox_min) & (pts <= bbox_max), axis=-1)
    valid = (step[None, :] < n_steps[:, None]) & in_bbox
    if occ is not None:
        valid = valid & occupancy_lookup(occ, occ_cell, bbox_min, pts)

    src = _compact_per_ray(valid, cfg.sample_budget)          # [R, B]
    pts_pad = jnp.concatenate([pts, jnp.full((pts.shape[0], 1, 3), 1e9)], 1)
    pts_c = jnp.take_along_axis(pts_pad, src[..., None], axis=1)
    valid_c = src < S
    step_c = jnp.minimum(src, S - 1).astype(jnp.float32)
    return pts_c, valid_c, step_c


def prepare_occupancy(cfg: TemporalPointsConfig, state, t_hat_pcd,
                      query_radius, calc_min_max=True):
    """Per-frame bbox + occupancy grid of the warped cloud (hoistable: the
    reference recomputes the warp per ray chunk, run.py:136-151; computing
    this once per frame is free speedup for chunked rendering)."""
    if calc_min_max:
        # sample positions are non-differentiable in the reference (the CUDA
        # sampler has no backward); keep the bbox out of the grad graph too
        pcd_sg = jax.lax.stop_gradient(t_hat_pcd)
        bb_min = pcd_sg.min(0) - query_radius
        bb_max = pcd_sg.max(0) + query_radius
    else:
        bb_min, bb_max = state["xyz_min"], state["xyz_max"]
    # margin covers the coarse-group centre offset so the group-centre
    # occupancy test in sample_rays_compact stays conservative
    margin = (cfg.coarse_stride - 1) / 2.0 * cfg.stepsize * cfg.voxel_size
    occ, occ_cell = build_occupancy(jax.lax.stop_gradient(t_hat_pcd),
                                    bb_min, bb_max, query_radius,
                                    occ_res=cfg.occ_res, margin=margin,
                                    n_dil=cfg.occ_dilations)
    info = {"bb_min": bb_min, "bb_max": bb_max, "occ": occ,
            "occ_cell": occ_cell, "occ_margin": margin}
    from ..ops.knn import _tpu_default
    if _tpu_default():
        # per-frame Morton tiling of the warped cloud for the KNN kernel —
        # every ray chunk of the frame reuses it
        from ..kernels.knn_cells_pallas import build_point_tables
        info["knn_tables"] = build_point_tables(
            jax.lax.stop_gradient(t_hat_pcd),
            pts_per_tile=cfg.knn_pts_tile)
    return info


def _sample_groups_fused(cfg: TemporalPointsConfig, rays_o, rays_d, near,
                         far, bb_min, bb_max, occ, occ_cell, occ_margin,
                         pcd, tables, query_radius, M_act):
    """Fused group sampling + compaction: positions only for SELECTED groups.

    The separate ``sample_rays_compact`` + ``compact_active`` pair
    materialises ALL [R, B, 3] sample positions (plus their bbox tests)
    before the group compaction throws ~70% of them away. Here the
    pipeline stays at GROUP granularity end to end — per-ray centre-hit
    budgeting, global compaction, Morton ordering, the hierarchical k-NN
    prefilter — and member positions are computed only for the ``G_sel``
    surviving groups (c x fewer position evals, no dense intermediate).

    Two deliberate deltas vs the pair (both semantics-preserving outside
    budget-truncation boundaries, where selection order is an
    implementation detail either way):
    * the group representative is the group's ray-segment MIDPOINT (the
      centre step position) instead of the min-corner of member positions
      — every member is within (c-1)/2*stepdist of it, so the prefilter
      threshold tightens from (sqrt(r)+(c-1)*d)^2 to
      (sqrt(r)+(c-1)/2*d)^2 (still conservative: a member within sqrt(r)
      of k points puts the midpoint within sqrt(r)+(c-1)/2*d of them);
    * the budget audit's act_demand counts member SLOTS of non-empty
      groups (group granularity) rather than bbox-valid samples.

    Returns (q [M_slots, 3], src [M_slots], act_ok [M_slots],
    (ray_of_g, c), step_id [R, B], act_demand).
    """
    stepdist = cfg.stepsize * cfg.voxel_size
    t_min, t_max = ray_aabb(rays_o, rays_d, bb_min, bb_max, near, far)
    n_steps = jnp.maximum(jnp.ceil((t_max - t_min) / stepdist), 1.0)
    start = rays_o + rays_d * t_min[:, None]
    unit_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    S = cfg.max_steps
    R = rays_o.shape[0]
    B = cfg.sample_budget
    c = cfg.coarse_stride
    Sc = (S + c - 1) // c
    Bc = B // c

    # ---- per-ray group budgeting (same centre-hit test + conservative
    # fallback as sample_rays_compact's coarse branch) -------------------
    jc = jnp.arange(Sc, dtype=jnp.float32)
    tc = (jc * c + (c - 1) / 2.0) * stepdist
    pc = start[:, None, :] + unit_d[:, None, :] * tc[None, :, None]

    def centre_hit(_):
        dims = occ.shape[0]
        idx = jnp.clip(
            jnp.floor((pc - bb_min) / occ_cell).astype(jnp.int32),
            0, dims - 1)
        return occ[idx[..., 0], idx[..., 1], idx[..., 2]]

    def member_hit(_):
        tm = (jc[:, None] * c
              + jnp.arange(c, dtype=jnp.float32)[None, :]) * stepdist
        pm = (start[:, None, None, :]
              + unit_d[:, None, None, :] * tm[None, :, :, None])
        return occupancy_lookup(occ, occ_cell, bb_min, pm).any(-1)

    half = (c - 1) / 2.0 * stepdist
    coarse_ok = half <= occ_margin * (1 + 1e-6) + 1e-12
    hit = jax.lax.cond(coarse_ok, centre_hit, member_hit, operand=None)
    hit = hit & (jc[None, :] * c < n_steps[:, None])
    src_c = _compact_per_ray(hit, Bc)                     # [R, Bc], ==Sc empty

    # dense step table for the depth composite (pure index math, no
    # positions): slot j of budgeted group g sits at step src_c*c + j
    src_steps = (src_c[:, :, None] * c
                 + jnp.arange(c, dtype=jnp.int32)[None, None, :]
                 ).reshape(R, B)
    step_id = jnp.minimum(src_steps.astype(jnp.float32), S - 1)

    # ---- global group compaction (depth-major drop order, as
    # compact_active) ----------------------------------------------------
    M_grp = R * Bc
    G_act = M_act // c
    gvalid = src_c < Sc                                   # [R, Bc]
    act_demand = (gvalid.sum() * c).astype(jnp.int32)
    gv = gvalid.T.reshape(M_grp)
    pos = jnp.cumsum(gv) - 1
    keep = gv & (pos < G_act)
    dest = jnp.where(keep, pos, G_act)
    gid = jnp.arange(M_grp, dtype=jnp.int32)
    gsrc = jnp.full((G_act + 1,), M_grp, jnp.int32)
    gsrc = gsrc.at[dest].set((gid % R) * Bc + gid // R, mode="drop")[:G_act]

    def group_centre(gs):
        ray = jnp.minimum(gs // Bc, R - 1)
        slot = jnp.minimum(gs % Bc, Bc - 1)
        gstep = src_c[ray, slot].astype(jnp.float32)
        t_g = (gstep * c + (c - 1) / 2.0) * stepdist
        rep = start[ray] + unit_d[ray] * t_g[:, None]
        return jnp.where((gs < M_grp)[:, None], rep, 1e9)

    grep = group_centre(gsrc)
    from ..ops.knn import morton_codes
    gperm = jnp.argsort(morton_codes(grep, bb_min, bb_max))
    gsrc = gsrc[gperm]

    if (query_radius is not None and pcd is not None
            and cfg.group_pass_fraction > 0):
        grep_s = grep[gperm]
        thr = float((np.sqrt(query_radius) + half) ** 2)  # midpoint bound
        from ..ops.knn import knn_count
        gcnt = knn_count(jax.lax.stop_gradient(grep_s),
                         jax.lax.stop_gradient(pcd),
                         radius2=thr, assume_sorted=True,
                         point_tables=tables, rt=cfg.knn_rt)
        gkeep = gcnt >= cfg.neighbours
        G2 = int(G_act * cfg.group_pass_fraction)
        G2 = max(128, (G2 + 127) // 128 * 128)
        G2 = min(G2, G_act)
        if G2 < G_act:
            gpos = jnp.cumsum(gkeep) - 1
            keep2 = gkeep & (gpos < G2)
            gdest = jnp.where(keep2, gpos, G2)
            gsel = jnp.full((G2 + 1,), M_grp, jnp.int32)
            gsrc = gsel.at[gdest].set(gsrc, mode="drop")[:G2]
        else:
            gsrc = jnp.where(gkeep, gsrc, M_grp)

    # ---- member expansion: positions ONLY for the selected groups ------
    G_sel = gsrc.shape[0]
    M_slots = G_sel * c
    real = gsrc < M_grp
    ray_of_g = jnp.minimum(gsrc // Bc, R - 1)
    slot_of_g = jnp.minimum(gsrc % Bc, Bc - 1)
    gstep = src_c[ray_of_g, slot_of_g]                    # [G_sel]
    steps = (gstep[:, None] * c
             + jnp.arange(c, dtype=jnp.int32)[None, :])   # [G_sel, c]
    step_f = steps.astype(jnp.float32)
    pos_m = (start[ray_of_g][:, None, :]
             + unit_d[ray_of_g][:, None, :] * (step_f[..., None] * stepdist))
    in_bbox = jnp.all((pos_m >= bb_min) & (pos_m <= bb_max), axis=-1)
    valid_m = (real[:, None] & in_bbox & (steps < S)
               & (step_f < n_steps[ray_of_g][:, None]))
    q = jnp.where(valid_m[..., None], pos_m, 1e9).reshape(M_slots, 3)
    M_full = R * B
    base = ray_of_g * B + slot_of_g * c
    src = (jnp.where(real, base, M_full)[:, None]
           + jnp.arange(c, dtype=jnp.int32)[None, :]).reshape(M_slots)
    src = jnp.minimum(src, M_full)
    act_ok = q[:, 0] < 1e8
    return q, src, act_ok, (ray_of_g, c), step_id, act_demand


def compact_active(cfg: TemporalPointsConfig, pts, valid, bb_min, bb_max,
                   pcd=None, tables=None, query_radius=None):
    """Global active-sample compaction + Morton ordering.

    Maps the dense [R, B] sample layout to a static active budget
    ``M_act`` of spatially ordered query slots. Returns
    (q [M_slots, 3], src [M_slots] flat index into R*B, act_ok [M_slots],
    group_expand) — ``group_expand`` is (ray_of_group, stride) when the
    compaction ran at coarse-group granularity, else None.

    With ``pcd``/``query_radius`` (group branch only): a hierarchical
    k-NN prefilter runs on the GROUP representatives — a group whose rep's
    kth neighbour lies beyond ``(sqrt(r) + (c-1)*stepdist)^2`` cannot
    contain a sample passing the sample-level kth-neighbour cutoff
    (measured: 52% of occupancy-passing groups survive, 0 violations) —
    and only surviving groups (budgeted by ``cfg.group_pass_fraction``)
    expand to sample slots, halving the sample-level KNN.
    """
    R, B = valid.shape
    M_full = R * B
    q_full = pts.reshape(M_full, 3)

    # ---- global compaction: only occupancy-valid samples reach the KNN +
    # feature MLP. The reference gets the same effect from its ragged
    # nn_mask compaction (lib/temporalpoints.py:440-444); here a static
    # active budget keeps shapes XLA-friendly.
    M_act = int(M_full * cfg.active_fraction)
    M_act = max(1024, ((M_act + 1023) // 1024) * 1024)
    M_act = min(M_act, M_full)
    from ..ops.knn import _tpu_default, morton_codes
    c = cfg.coarse_stride
    q_pad = jnp.concatenate([q_full, jnp.full((1, 3), 1e9)], 0)
    if B % c == 0 and M_act % c == 0:
        # ---- group-level compaction + Morton ordering: cumsum / scatter /
        # morton / argsort run over R*B/c GROUPS (the sampler budgets whole
        # coarse groups anyway), cutting the sort to ~73k keys instead of
        # ~295k samples. Depth-major ([Bc, R] scan) drop order as below.
        Bc = B // c
        M_grp = R * Bc
        G_act = M_act // c
        gvalid = valid.reshape(R, Bc, c).any(-1)             # [R, Bc]
        gv = gvalid.T.reshape(M_grp)
        pos = jnp.cumsum(gv) - 1
        keep = gv & (pos < G_act)
        dest = jnp.where(keep, pos, G_act)
        gid = jnp.arange(M_grp, dtype=jnp.int32)
        gsrc = jnp.full((G_act + 1,), M_grp, jnp.int32)
        gsrc = gsrc.at[dest].set((gid % R) * Bc + gid // R,
                                 mode="drop")[:G_act]
        # group representative = min over member positions (1e9 pads lose)
        grep = pts.reshape(M_grp, c, 3).min(1)
        grep = jnp.concatenate([grep, jnp.full((1, 3), 1e9)], 0)[gsrc]
        gperm = jnp.argsort(morton_codes(grep, bb_min, bb_max))
        gsrc = gsrc[gperm]

        if (query_radius is not None and pcd is not None
                and cfg.group_pass_fraction > 0):
            # hierarchical prefilter: group-rep kth neighbour beyond the
            # enlarged radius => no member can pass the sample cutoff
            # (|member - rep| <= (c-1)*stepdist along the ray). Quantized
            # kernel keys only err toward KEEPING groups — conservative.
            grep_s = grep[gperm]
            stepdist_ = cfg.stepsize * cfg.voxel_size
            thr = float((np.sqrt(query_radius)
                         + (c - 1) * stepdist_) ** 2)
            from ..ops.knn import knn_count
            gcnt = knn_count(jax.lax.stop_gradient(grep_s),
                             jax.lax.stop_gradient(pcd),
                             radius2=thr, assume_sorted=True,
                             point_tables=tables, rt=cfg.knn_rt)
            gkeep = gcnt >= cfg.neighbours
            G2 = int(G_act * cfg.group_pass_fraction)
            G2 = max(128, (G2 + 127) // 128 * 128)
            G2 = min(G2, G_act)
            if G2 < G_act:
                gpos = jnp.cumsum(gkeep) - 1
                keep2 = gkeep & (gpos < G2)
                gdest = jnp.where(keep2, gpos, G2)
                gsel = jnp.full((G2 + 1,), M_grp, jnp.int32)
                gsrc = gsel.at[gdest].set(gsrc, mode="drop")[:G2]
            else:
                gsrc = jnp.where(gkeep, gsrc, M_grp)

        # expand groups to samples; empty groups map to the pad row
        G_sel = gsrc.shape[0]
        M_slots = G_sel * c
        ray_of_g = jnp.minimum(gsrc // Bc, R - 1)
        base = ray_of_g * B + (gsrc % Bc) * c
        src = (jnp.where(gsrc < M_grp, base, M_full)[:, None]
               + jnp.arange(c, dtype=jnp.int32)[None, :]).reshape(M_slots)
        src = jnp.minimum(src, M_full)
        # gather sample positions at GROUP granularity too (the row id in
        # the [M_full/c, 3c] view is exactly gsrc): G_sel rows, not M_slots
        q_groups = jnp.concatenate(
            [q_full.reshape(M_grp, 3 * c), jnp.full((1, 3 * c), 1e9)], 0)
        q = q_groups[jnp.minimum(gsrc, M_grp)].reshape(M_slots, 3)
        # member validity: invalid member slots carry the 1e9 sentinel
        act_ok = q[:, 0] < 1e8
        group_expand = (ray_of_g, c)
    else:
        # depth-major selection: when the static budget is smaller than the
        # number of valid samples, drop the DEEPEST samples of every ray
        # uniformly (transposed [B, R] scan order) instead of whole
        # trailing rays (ray-major would black out the chunk tail)
        vflat = valid.T.reshape(M_full)
        pos = jnp.cumsum(vflat) - 1
        keep = vflat & (pos < M_act)
        dest = jnp.where(keep, pos, M_act)
        flat_id = jnp.arange(M_full, dtype=jnp.int32)
        ray_r = flat_id % R                                  # transposed
        dep_b = flat_id // R
        src = jnp.full((M_act + 1,), M_full, jnp.int32)
        src = src.at[dest].set(ray_r * B + dep_b, mode="drop")[:M_act]
        act_ok = src < M_full                                # filled slots
        q = q_pad[src]                                       # [M_act, 3]
        if _tpu_default():
            # Morton-order the active slots so the KNN kernel's query
            # blocks are spatially compact without per-call kernel sorts;
            # downstream indexes through ``src``, so permuting
            # (q, src, act_ok) together is semantics-free.
            mperm = jnp.argsort(morton_codes(q, bb_min, bb_max))
            q = q[mperm]
            src = src[mperm]
            act_ok = act_ok[mperm]
        group_expand = None
    return q, src, act_ok, group_expand


def _featnet_h(cfg: TemporalPointsConfig, featnet_p, rel_canon, feat_k, w,
               pose_embedding):
    """Aggregated feature h = sum_k w[...,k] * feat_net(PE(rel_canon),
    feat_k, pose) (reference lib/temporalpoints.py:472-494).

    Dispatches to the fused Pallas kernel (kernels/featmlp_pallas.py) on
    TPU when ``cfg.featmlp_kernel`` and the bf16 aggregation mode are
    active; otherwise runs the XLA formulation. APNERF_FEATMLP: "0"
    disables, "force" enables off-TPU (interpret mode, tests only).
    """
    K = rel_canon.shape[-2]
    F = feat_k.shape[-1]
    lead = rel_canon.shape[:-2]
    layers = featnet_p["layers"]
    from ..ops.knn import _tpu_default
    env = os.environ.get("APNERF_FEATMLP", "1")
    eligible = (cfg.featmlp_kernel and cfg.agg_bf16 and env != "0"
                and (_tpu_default() or env == "force")
                and len(layers) >= 2      # kernel stacks hidden layers
                and "b" in layers[0]
                and all(lp["w"].shape == (F, F) and "b" in lp
                        for lp in layers[1:]))
    if eligible:
        from ..kernels.featmlp_pallas import featmlp_agg
        h = featmlp_agg(
            rel_canon.reshape(-1, K, 3).astype(jnp.float32),
            feat_k.reshape(-1, K, F).astype(jnp.bfloat16),
            w.reshape(-1, K).astype(jnp.float32),
            featnet_p, K=K, pe_freqs=int(cfg.posbase_pe),
            pose_embedding=pose_embedding,
            block_rows=int(os.environ.get("APNERF_FEATMLP_ROWS", "2048")))
        return h.reshape(*lead, F)
    rel_emb = encoding.poc_fre(rel_canon, encoding.poc_freqs(cfg.posbase_pe))
    in_dt = jnp.bfloat16 if cfg.agg_bf16 else jnp.float32
    feat_in = [rel_emb.astype(in_dt), feat_k.astype(in_dt)]
    if pose_embedding is not None:
        pe = jnp.broadcast_to(
            pose_embedding.reshape((1,) * len(rel_emb.shape[:-1]) + (-1,)),
            (*rel_emb.shape[:-1], pose_embedding.size))
        feat_in.append(pe.astype(in_dt))
    h_k = nn.mlp(featnet_p, jnp.concatenate(feat_in, -1),
                 activation=nn.leaky_relu, final_activation=nn.leaky_relu)
    return (h_k.astype(jnp.float32) * w[..., None]).sum(-2)


def _aggregate_subgroup_shared(params, cfg: TemporalPointsConfig, state,
                               t_hat_pcd, inv_rot, viewdirs, q, src, act_ok,
                               R, B, M_full, M_act, query_radius, tables,
                               act_demand, pose_embedding=None,
                               render_pcd_direct=False, render_weights=False,
                               lbs_weights=None):
    """Subgroup-shared KNN aggregation (``cfg.knn_share > 1``).

    Candidates are selected ONCE per subgroup of ``share`` consecutive ray
    samples: the selection kernel runs on subgroup representatives with
    ``k' = cfg.knn_cand``, subgroups are pass-compacted on the rep's
    kth-neighbour distance at an enlarged radius (conservative — mirrors
    the group prefilter of compact_active), ONE packed row gather fetches
    the k' candidates per subgroup, and every member takes its exact
    top-k-of-k' (rank mask) with per-sample distances. Error is
    one-sided vs the exact per-sample path (reference
    lib/temporalpoints.py:432-444): a sample can only be *rejected* (or
    lose a far neighbour) when its true kth neighbour is not among the
    rep's k' nearest; it is never accepted with a kth distance beyond the
    radius. Cost: selection queries /share, gather rows ~ share*k/k'
    fewer, and the phase-1 counting kernel disappears.
    """
    K = cfg.neighbours
    kc = int(cfg.knn_cand)
    share = int(cfg.knn_share)
    assert kc >= K
    M_slots = q.shape[0]
    G_sub = M_slots // share
    stepdist = cfg.stepsize * cfg.voxel_size
    # members are consecutive steps on one ray: the AABB midpoint of the
    # valid members is within span/2 of every member, halving the radius
    # enlargement the conservative pass test needs (vs a corner rep)
    span = (share - 1) * stepdist
    r2_sel = float((np.sqrt(query_radius) + span / 2.0) ** 2)

    qg = q.reshape(G_sub, share, 3)
    ok_g = act_ok.reshape(G_sub, share)[..., None]
    lo = jnp.where(ok_g, qg, 1e9).min(1)
    hi = jnp.where(ok_g, qg, -1e9).max(1)
    # all-invalid subgroups get a far-away sentinel rep so they can never
    # pass the test and consume pass-budget slots
    reps = jnp.where(ok_g.any(1), 0.5 * (lo + hi), 2e9)
    d2r, idx = knn(jax.lax.stop_gradient(reps),
                   jax.lax.stop_gradient(t_hat_pcd), k=kc,
                   radius2=r2_sel, assume_sorted=True, point_tables=tables,
                   sorted_point_idx=tables is not None, rt=cfg.knn_rt)

    # ---- subgroup pass-compaction: the rep's kth neighbour beyond the
    # enlarged radius means NO member can pass the sample-level cutoff
    # (|member - rep| <= span). Budgeted like pass_fraction (fraction of
    # the active-sample budget reaching aggregation).
    sub_ok = d2r[:, K - 1] <= r2_sel
    S_pass = max(128, int(M_act * cfg.pass_fraction) // share)
    S_pass = ((S_pass + 127) // 128) * 128
    S_pass = min(S_pass, G_sub)
    if S_pass < G_sub:
        ppos = jnp.cumsum(sub_ok) - 1
        keep = sub_ok & (ppos < S_pass)
        pdest = jnp.where(keep, ppos, S_pass)
        psrc = jnp.full((S_pass + 1,), G_sub, jnp.int32)
        psrc = psrc.at[pdest].set(jnp.arange(G_sub, dtype=jnp.int32),
                                  mode="drop")[:S_pass]
        pass_ok_sub = psrc < G_sub
        psl = jnp.minimum(psrc, G_sub - 1)
        # subgroup-granularity gathers: S_pass rows each
        q_sub = q.reshape(G_sub, share * 3)[psl].reshape(S_pass, share, 3)
        src_sub = jnp.where(pass_ok_sub[:, None],
                            src.reshape(G_sub, share)[psl], M_full)
        idx = idx[psl]
        d2r = d2r[psl]
        ok_sub = act_ok.reshape(G_sub, share)[psl] & pass_ok_sub[:, None]
        pass_demand = sub_ok.sum().astype(jnp.int32) * share
    else:
        q_sub = q.reshape(G_sub, share, 3)
        src_sub = jnp.where(sub_ok[:, None], src.reshape(G_sub, share),
                            M_full)
        ok_sub = act_ok.reshape(G_sub, share) & sub_ok[:, None]
        pass_demand = sub_ok.sum().astype(jnp.int32) * share
        S_pass = G_sub
    # candidate validity: slots beyond the rep's within-radius neighbour
    # count come back as sentinels with ARBITRARY indices — a real point
    # could appear twice among the candidates. Mask them out of the
    # per-sample ranking so no member double-counts a neighbour.
    cand_valid = d2r <= r2_sel                       # [S_pass, kc]

    # ---- per-point source tables (identical packing to the exact path)
    if tables is not None:
        perm = tables["perm"]
        Pp = tables["pts_sorted"].shape[0]

        def permute(arr):
            out = arr[perm]
            pad = Pp - out.shape[0]
            if pad:
                out = jnp.concatenate(
                    [out, jnp.zeros((pad, *out.shape[1:]), out.dtype)], 0)
            return out
    else:
        def permute(arr):
            return arr

    if cfg.no_view_dir:
        views_emb = None
    elif state["frozen_view_dir"] is not None:
        ve = encoding.poc_fre(state["frozen_view_dir"],
                              encoding.poc_freqs(cfg.viewbase_pe))
        views_emb = jnp.broadcast_to(ve[None, None],
                                     (S_pass, share, ve.shape[-1]))
    else:
        ve = encoding.poc_fre(viewdirs, encoding.poc_freqs(cfg.viewbase_pe))
        ray_of = jnp.minimum(src_sub // B, R - 1)          # [S_pass, share]
        views_emb = ve[ray_of.reshape(-1)].reshape(S_pass, share, -1)

    from .tineuvox import apply_rgbnet
    interval = cfg.stepsize * cfg.voxel_size_ratio
    sig_all = permute(state["mean_min_distance"]
                      * jnp.maximum(params["direct_eps"], 0.0))
    geo_src = jnp.concatenate(
        [permute(t_hat_pcd),
         permute(inv_rot.reshape(inv_rot.shape[0], 9))], axis=-1)
    pack_all = cfg.agg_bf16
    if cfg.agg_bf16:
        feat_src = permute(params["canonical_feat"].astype(jnp.bfloat16))
        featnet_p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params["feat_net"])
    else:
        feat_src = permute(params["canonical_feat"])
        featnet_p = params["feat_net"]
    if pack_all:
        geo_bf = jax.lax.bitcast_convert_type(
            geo_src, jnp.bfloat16).reshape(geo_src.shape[0], 24)
        packed_src = jnp.concatenate([geo_bf, feat_src], axis=-1)

    lbs_src = None if lbs_weights is None else permute(lbs_weights)
    cand_ar = jnp.arange(kc, dtype=jnp.int32)

    from ..ops.knn import _tpu_default
    from .tineuvox import apply_rgbnet as _rgbnet
    # APNERF_FUSED_AGG: "0" disables, "force" enables even off-TPU (the
    # kernel then runs in interpret mode — integration tests only)
    _fused_env = os.environ.get("APNERF_FUSED_AGG", "1")
    use_fused = (cfg.fused_agg and pack_all and pose_embedding is None
                 and not render_pcd_direct and not render_weights
                 and cfg.feat_depth == 4
                 and (_tpu_default() or _fused_env == "force")
                 and _fused_env != "0")
    if use_fused:
        # fused Pallas aggregation (kernels/agg_pallas.py): unpack + rank +
        # PE + feat_net GEMMs + weighted reduction run in VMEM; only the
        # [S_pass, share, F] aggregated features return to HBM. The
        # density/rgb heads stay in XLA (identical numerics to the XLA
        # path, and they fuse into the scatter-back).
        from ..kernels.agg_pallas import fused_subgroup_agg
        # candidate-major gather (idx transposed) so the kernel's aligned
        # layouts need NO input transpose
        pk_t = packed_src[idx.T]                   # [kc, S_pass, 24+F] bf16
        geo_t = jax.lax.bitcast_convert_type(
            pk_t[..., :24].reshape(kc, S_pass, 12, 2), jnp.float32)
        # invalid candidate slots get a far sentinel: they rank last, their
        # inverse-distance weight underflows, and any sample whose top-K
        # reaches one gets kd2 >> radius (rejected) — one-sided like the
        # XLA path's inf mask
        nbr_t = jnp.where(cand_valid.T[..., None], geo_t[..., :3], 2e9)
        h, kd2_t = fused_subgroup_agg(q_sub, nbr_t, geo_t[..., 3:],
                                      pk_t[..., 24:], params["feat_net"],
                                      share=share, K=K, eps=float(cfg.eps))
        # heads run member-major ([share, S_pass, .]); only their small
        # outputs transpose back to the scatter's subgroup-major layout
        density = nn.mlp(params["densitynet"], h)[..., 0]
        ve_t = (None if views_emb is None
                else jnp.transpose(views_emb, (1, 0, 2)))
        rgb_t = jax.nn.sigmoid(_rgbnet(params["rgbnet"], h, ve_t))
        agg = {
            "alpha": raw2alpha(density, cfg.act_shift, interval).T,
            "rgb": jnp.transpose(rgb_t, (1, 0, 2)),
            "kd2": kd2_t.T,
        }

    def block_fn(args):
        """Aggregation for one block of SUBGROUPS: [blk, share, k']."""
        qb, idxb, cvb, veb = args                    # [blk, share, 3] etc.
        if pack_all:
            pk = packed_src[idxb]                    # [blk, k', 24+F]
            geo = jax.lax.bitcast_convert_type(
                pk[..., :24].reshape(*pk.shape[:2], 12, 2), jnp.float32)
            feat_k = pk[..., 24:]
        else:
            geo = geo_src[idxb]
            feat_k = feat_src[idxb]
        nbr = geo[..., :3]                           # [blk, k', 3]
        rel_p = qb[:, :, None, :] - nbr[:, None, :, :]   # [blk, share, k', 3]
        to_nn = (rel_p ** 2).sum(-1)                 # [blk, share, k']
        to_nn = jnp.where(cvb[:, None, :], to_nn, jnp.inf)
        if kc == K:
            # every candidate is a selected neighbour: the rank mask below
            # reduces to all-true (invalid slots carry to_nn = inf, so their
            # weight underflows to 0 and kd2 = inf rejects samples with
            # < K valid candidates — identical semantics, minus the
            # O(k'^2) rank computation)
            top = jnp.ones_like(to_nn, bool)
            kd2 = to_nn.max(-1)
            w = jnp.where(jnp.isfinite(to_nn), 1.0 / (to_nn + cfg.eps), 0.0)
        else:
            # exact per-sample top-K-of-k' via a rank mask (ties broken by
            # candidate position — a deterministic total order, so exactly K
            # candidates are selected whenever >= K are valid)
            less = (to_nn[..., :, None] > to_nn[..., None, :]) | (
                (to_nn[..., :, None] == to_nn[..., None, :])
                & (cand_ar[:, None] > cand_ar[None, :]))
            rank = less.sum(-1)                      # [blk, share, k']
            top = rank < K
            kd2 = jnp.max(jnp.where(top, to_nn, -jnp.inf), axis=-1)
            w = jnp.where(top, 1.0 / (to_nn + cfg.eps), 0.0)
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-30)
        if kc > K:
            # compact the k' candidates to the per-member top-K BEFORE the
            # HBM-bound feat_net MLP: the (kc - K) losers carry zero weight,
            # so running PE + MLP on them is pure waste (1/3 of the
            # member-candidate activation traffic at kc=12, K=8). rank is a
            # deterministic total order (ties broken by candidate position),
            # so scattering candidate k to slot rank[k] is an exact one-hot
            # permutation-compaction; the fp32 one-hot contractions at
            # HIGHEST precision reproduce the selected values bit-exactly.
            slot = jnp.arange(K, dtype=rank.dtype)
            # rank == slot with slot < K already implies top (top = rank < K);
            # the & top term is defensive only, kept so a future rank change
            # cannot silently widen sel.
            sel = (rank[..., None, :] == slot[:, None]) & top[..., None, :]
            self_f = sel.astype(jnp.float32)         # [blk, share, K, k']
            w_sel = jnp.einsum("mska,msa->msk", self_f, w, precision=HIGH)
            rel_sel = jnp.einsum("mska,msac->mskc", self_f, rel_p,
                                 precision=HIGH)
            rot_sel = jnp.einsum("mska,mar->mskr", self_f, geo[..., 3:],
                                 precision=HIGH)
            # precision=HIGH so the fp32 (agg_bf16=False) path is not rounded
            # to bf16 by the TPU DEFAULT matmul precision; one-hot contraction
            # at HIGH reproduces the selected rows bit-exactly (ADVICE r3).
            feat_sel = jnp.einsum("mska,maf->mskf",
                                  self_f.astype(feat_k.dtype), feat_k,
                                  precision=HIGH)
            rel_canon = jnp.einsum(
                "mskab,mskb->mska",
                rot_sel.reshape(*rot_sel.shape[:3], 3, 3), rel_sel,
                precision=HIGH)
        else:
            w_sel = w
            feat_sel = jnp.broadcast_to(
                feat_k[:, None], (feat_k.shape[0], rel_p.shape[1],
                                  kc, feat_k.shape[-1]))
            rot_k = geo[..., 3:].reshape(geo.shape[0], kc, 3, 3)
            rel_canon = jnp.einsum("mkab,mskb->mska", rot_k, rel_p,
                                   precision=HIGH)
        h = _featnet_h(cfg, featnet_p, rel_canon, feat_sel, w_sel,
                       pose_embedding)
        density = nn.mlp(params["densitynet"], h)[..., 0]
        alpha = raw2alpha(density, cfg.act_shift, interval)
        rgb = jax.nn.sigmoid(apply_rgbnet(
            params["rgbnet"], h, veb))
        res = {"alpha": alpha, "rgb": rgb, "kd2": kd2}
        if render_pcd_direct:
            sig = sig_all[idxb][:, None, :]          # [blk, 1, k']
            w_dir = jnp.where(top, jnp.exp(-(to_nn ** 2)
                                           / (2.0 * sig ** 2 + 1e-12)), 0.0)
            w_dir_col = w_dir / (w_dir.sum(-1, keepdims=True) + 1e-12)
            a_k = permute(jnp.clip(params["canonical_alpha"], 0, 1))[idxb]
            c_k = permute(jnp.clip(params["canonical_rgbs"], 0, 1))[idxb]
            res["alpha_direct"] = (w_dir / K * a_k[:, None, :]).sum(-1)
            res["rgb_direct"] = (w_dir_col[..., None]
                                 * c_k[:, None, :, :]).sum(2)
        if render_weights and lbs_weights is not None:
            lw = lbs_src[idxb]                       # [blk, k', J]
            res["lbs_w"] = (lw[:, None] * w[..., None]).sum(2)
        return res

    if not use_fused:
        blk = min(4096, S_pass)
        while S_pass % blk != 0 and blk > 128:
            blk //= 2
        if S_pass % blk == 0 and S_pass > blk:
            nb = S_pass // blk
            args = (q_sub.reshape(nb, blk, share, 3),
                    idx.reshape(nb, blk, kc),
                    cand_valid.reshape(nb, blk, kc),
                    None if views_emb is None
                    else views_emb.reshape(nb, blk, share, -1))
            if views_emb is None:
                mapped = jax.lax.map(
                    lambda a: block_fn((a[0], a[1], a[2], None)),
                    (args[0], args[1], args[2]))
            else:
                mapped = jax.lax.map(block_fn, args)
            agg = {k2: v.reshape(S_pass, *v.shape[2:])
                   for k2, v in mapped.items()}
        else:
            agg = block_fn((q_sub, idx, cand_valid, views_emb))

    # ---- scatter back to the dense [R, B] layout, one ROW per subgroup.
    # A subgroup's ``share`` dst slots are consecutive and share-aligned in
    # the flat [R*B] space by construction (group base = ray*B + gpos*c
    # with share | c | B), and slot ownership is exclusive (src runs are
    # disjoint across groups) — so the whole subgroup writes as ONE
    # scatter row (invalid members carry zeros, the buffer default),
    # cutting scatter updates x``share`` (XLA scatter is update-count
    # bound: 4.2 ms -> ~0.3 ms for the rgb buffer at the bench shape).
    n_samp = S_pass * share
    sample_ok = ok_sub & (agg["kd2"] <= query_radius)    # [S_pass, share]
    n_rows = M_full // share
    row_real = src_sub[:, 0] < M_full
    dst_row = jnp.where(row_real, src_sub[:, 0] // share, n_rows)

    def scatter(x, width=None):
        x = jnp.where(sample_ok[(...,) + (None,) * (x.ndim - 2)], x, 0)
        shape = ((n_rows + 1, share) if width is None
                 else (n_rows + 1, share, width))
        out = jnp.zeros(shape, x.dtype).at[dst_row].set(x, mode="drop")
        return out[:n_rows].reshape((M_full,) if width is None
                                    else (M_full, width))

    valid_out = jnp.zeros((n_rows + 1, share), bool).at[dst_row].set(
        sample_ok, mode="drop")[:n_rows].reshape(R, B)
    out = {
        "alpha": scatter(agg["alpha"]).reshape(R, B),
        "rgb": scatter(agg["rgb"], 3).reshape(R, B, 3),
        "valid": valid_out,
        "budget_audit": jnp.stack([
            act_demand, jnp.int32(M_act),
            pass_demand, jnp.int32(n_samp)]),
    }
    if render_pcd_direct:
        out["alpha_direct"] = scatter(agg["alpha_direct"]).reshape(R, B)
        out["rgb_direct"] = scatter(agg["rgb_direct"], 3).reshape(R, B, 3)
    if render_weights and lbs_weights is not None:
        J = lbs_weights.shape[-1]
        out["lbs_w"] = scatter(agg["lbs_w"], J).reshape(R, B, J)
    return out


def aggregate_pts(params, cfg: TemporalPointsConfig, state, t_hat_pcd,
                  inv_rot, rays_o, rays_d, viewdirs, near, far,
                  query_radius, pose_embedding=None, render_pcd_direct=False,
                  render_weights=False, lbs_weights=None, calc_min_max=True,
                  occ_info=None):
    """KNN feature aggregation along rays (reference ``aggregate_pts``,
    lib/temporalpoints.py:416-521), dense masked layout.

    Returns per-sample arrays shaped [R, B(, .)] plus the valid mask.
    """
    R = rays_o.shape[0]
    K = cfg.neighbours
    if occ_info is None:
        occ_info = prepare_occupancy(cfg, state, t_hat_pcd, query_radius,
                                     calc_min_max)
    bb_min, bb_max = occ_info["bb_min"], occ_info["bb_max"]
    B = cfg.sample_budget
    M_full = R * B
    M_act = int(M_full * cfg.active_fraction)
    M_act = max(1024, ((M_act + 1023) // 1024) * 1024)
    M_act = min(M_act, M_full)
    tables = occ_info.get("knn_tables")
    c = cfg.coarse_stride
    if (occ_info.get("occ") is not None and B % c == 0 and M_act % c == 0
            and os.environ.get("APNERF_FUSED_SAMPLER", "1") == "1"):
        # fused group pipeline: member positions are computed only for the
        # groups that survive compaction + the k-NN prefilter (c x fewer
        # position evals than the sample_rays_compact + compact_active
        # pair, and no dense [R, B, 3] intermediate)
        q, src, act_ok, group_expand, step_id, act_demand = (
            _sample_groups_fused(
                cfg, rays_o, rays_d, near, far, bb_min, bb_max,
                occ_info["occ"], occ_info["occ_cell"],
                occ_info.get("occ_margin", 0.0), t_hat_pcd, tables,
                query_radius, M_act))
    else:
        pts, valid, step_id = sample_rays_compact(
            cfg, rays_o, rays_d, near, far, bb_min, bb_max,
            occ=occ_info["occ"], occ_cell=occ_info["occ_cell"],
            occ_margin=occ_info.get("occ_margin", 0.0))
        q, src, act_ok, group_expand = compact_active(
            cfg, pts, valid, bb_min, bb_max, pcd=t_hat_pcd, tables=tables,
            query_radius=query_radius)
        act_demand = valid.sum().astype(jnp.int32)
    share = int(cfg.knn_share)
    if (share > 1 and group_expand is not None
            and group_expand[1] % share == 0):
        out = _aggregate_subgroup_shared(
            params, cfg, state, t_hat_pcd, inv_rot, viewdirs, q, src,
            act_ok, R, B, M_full, M_act, query_radius, tables,
            act_demand=act_demand,
            pose_embedding=pose_embedding,
            render_pcd_direct=render_pcd_direct,
            render_weights=render_weights, lbs_weights=lbs_weights)
        out["step_id"] = step_id
        return out
    M_slots = q.shape[0]                  # <= M_act after the prefilter
    # ---- two-phase KNN (phase 1): count the points within the query
    # radius — ``count >= K`` IS the reference's kth-neighbour radius
    # cutoff (lib/temporalpoints.py:440), decided with exact fp32
    # compares in ONE distance pass (~1/5 of the selection kernel, whose
    # cost is the k extraction passes). Only the ~25-40% of samples that
    # pass reach the full selection kernel below.
    from ..ops.knn import knn_count
    cnt = knn_count(jax.lax.stop_gradient(q),
                    jax.lax.stop_gradient(t_hat_pcd),
                    radius2=float(query_radius), assume_sorted=True,
                    point_tables=tables, rt=cfg.knn_rt)
    nn_ok = (cnt >= K) & act_ok

    # ---- pass-compaction: everything downstream (the k=8 selection
    # kernel, the [*, K] packed-row gathers — the dominant gather-floor
    # term — and the aggregation MLP) is per-sample. Compact the
    # survivors to a static pass budget so the expensive stages run on
    # M_pass, not M_act, slots. Morton order is preserved (monotone
    # destinations; pad slots clamp to the last row, i.e. the tail).
    M_pass = int(M_act * cfg.pass_fraction)
    M_pass = max(1024, ((M_pass + 1023) // 1024) * 1024)
    M_pass = min(M_pass, M_slots)
    if M_pass < M_slots:
        ppos = jnp.cumsum(nn_ok) - 1
        keep = nn_ok & (ppos < M_pass)
        pdest = jnp.where(keep, ppos, M_pass)
        psrc = jnp.full((M_pass + 1,), M_slots, jnp.int32)
        psrc = psrc.at[pdest].set(jnp.arange(M_slots, dtype=jnp.int32),
                                  mode="drop")[:M_pass]
        pass_ok = psrc < M_slots
        psl = jnp.minimum(psrc, M_slots - 1)
        q = q[psl]
        src = jnp.where(pass_ok, src[psl], M_full)
        n_slots = M_pass
    else:
        pass_ok = nn_ok
        src = jnp.where(nn_ok, src, M_full)
        n_slots = M_slots

    # ---- two-phase KNN (phase 2): full k-selection on the survivors.
    # The kernel's d2 are selection keys truncated to 11 mantissa bits;
    # membership at the radius boundary is still decided exactly by the
    # "kd2" recompute on the selected set below.
    d2, idx = knn(jax.lax.stop_gradient(q),
                  jax.lax.stop_gradient(t_hat_pcd), k=K,
                  radius2=float(query_radius), assume_sorted=True,
                  point_tables=tables, sorted_point_idx=tables is not None,
                  rt=cfg.knn_rt)

    # sorted-index mode: ``idx`` indexes the Morton-SORTED point order, so
    # the [M_act, K] index-remap gather (runs at the TPU gather floor,
    # ~30 ms/chunk) is replaced by permuting the per-point arrays once
    # (P = 1e4 rows, free). Padding rows absorb empty slots. The permute is
    # a differentiable gather — gradients still reach the warp/params.
    if tables is not None:
        perm = tables["perm"]
        Pp = tables["pts_sorted"].shape[0]

        def permute(arr):
            out = arr[perm]
            pad = Pp - out.shape[0]
            if pad:
                out = jnp.concatenate(
                    [out, jnp.zeros((pad, *out.shape[1:]), out.dtype)], 0)
            return out
    else:
        def permute(arr):
            return arr

    if cfg.no_view_dir:
        views_emb = None
    elif state["frozen_view_dir"] is not None:
        ve = encoding.poc_fre(state["frozen_view_dir"],
                              encoding.poc_freqs(cfg.viewbase_pe))
        views_emb = jnp.broadcast_to(ve[None], (n_slots, ve.shape[-1]))
    else:
        # per-slot view gather from the per-ray table (post pass-compaction
        # there are only ~M_pass slots, cheaper than any group broadcast)
        ve = encoding.poc_fre(viewdirs, encoding.poc_freqs(cfg.viewbase_pe))
        ray_of = jnp.minimum(src // B, R - 1)
        views_emb = ve[ray_of]                             # [n_slots, C]

    from .tineuvox import apply_rgbnet
    interval = cfg.stepsize * cfg.voxel_size_ratio
    sig_all = permute(state["mean_min_distance"]
                      * jnp.maximum(params["direct_eps"], 0.0))
    # pack [pos(3) | inv_rot(9)] per point: one 48-byte-row gather per
    # neighbour instead of two (the TPU gather floor is per-ROW, not bytes)
    geo_src = jnp.concatenate(
        [permute(t_hat_pcd),
         permute(inv_rot.reshape(inv_rot.shape[0], 9))], axis=-1)
    # with bf16 aggregation, go further: bitcast the fp32 geometry into
    # bf16 lane pairs and append the bf16 features — ONE row gather for
    # everything a neighbour contributes (exact: bitcast round-trips)
    pack_all = cfg.agg_bf16

    # bf16 aggregation (reference analogue: --step_to_half, run.py:898-899):
    # the [M_act, K, feat_dim] neighbour-feature gather + feat_net are
    # HBM-traffic bound; half-width activations halve it. Params stay fp32;
    # matmuls accumulate fp32 on the MXU; geometry (distances, rotations,
    # weights) stays fp32.
    if cfg.agg_bf16:
        feat_src = permute(params["canonical_feat"].astype(jnp.bfloat16))
        featnet_p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params["feat_net"])
    else:
        feat_src = permute(params["canonical_feat"])
        featnet_p = params["feat_net"]
    if pack_all:
        geo_bf = jax.lax.bitcast_convert_type(
            geo_src, jnp.bfloat16).reshape(geo_src.shape[0], 24)
        packed_src = jnp.concatenate([geo_bf, feat_src], axis=-1)

    lbs_src = None if lbs_weights is None else permute(lbs_weights)

    def block_fn(args):
        """Neighbour aggregation for one flat block of samples.

        Gathered [blk, K, 3]-shaped intermediates are the XLA lane-padding
        hazard (3 -> 128 lanes); streaming fixed-size blocks through lax.map
        bounds the padded live set.
        """
        qb, idxb, veb = args
        if pack_all:
            pk = packed_src[idxb]                          # [blk, K, 24+F]
            geo = jax.lax.bitcast_convert_type(
                pk[..., :24].reshape(*pk.shape[:2], 12, 2), jnp.float32)
            feat_k = pk[..., 24:]
        else:
            geo = geo_src[idxb]                            # [blk, K, 12]
            feat_k = feat_src[idxb]
        nbr = geo[..., :3]
        rel_p = qb[:, None, :] - nbr                       # differentiable
        to_nn = (rel_p ** 2).sum(-1)                       # [blk, K]
        w = 1.0 / (to_nn + cfg.eps)
        w = w / w.sum(-1, keepdims=True)
        rot_k = geo[..., 3:].reshape(*geo.shape[:2], 3, 3)
        rel_canon = jnp.einsum("mkab,mkb->mka", rot_k, rel_p, precision=HIGH)
        h = _featnet_h(cfg, featnet_p, rel_canon, feat_k, w,
                       pose_embedding)                     # [blk, F] fp32
        density = nn.mlp(params["densitynet"], h)[..., 0]
        alpha = raw2alpha(density, cfg.act_shift, interval)
        rgb = jax.nn.sigmoid(apply_rgbnet(
            params["rgbnet"], h, None if veb is None else veb))
        # exact kth-neighbour squared distance of the selected set: closes
        # the quantization band of the kernel's selection keys so the radius
        # cutoff is reference-exact for the selected neighbours
        res = {"alpha": alpha, "rgb": rgb, "kd2": to_nn.max(-1)}
        if render_pcd_direct:
            w_dir = jnp.exp(-(to_nn ** 2)
                            / (2.0 * sig_all[idxb] ** 2 + 1e-12))
            w_dir_col = w_dir / (w_dir.sum(-1, keepdims=True) + 1e-12)
            a_k = permute(jnp.clip(params["canonical_alpha"], 0, 1))[idxb]
            c_k = permute(jnp.clip(params["canonical_rgbs"], 0, 1))[idxb]
            res["alpha_direct"] = (w_dir / K * a_k).sum(-1)
            res["rgb_direct"] = (w_dir_col[..., None] * c_k).sum(1)
        if render_weights and lbs_weights is not None:
            lw = lbs_src[idxb]                             # [blk, K, J]
            res["lbs_w"] = (lw * w[..., None]).sum(1)
        return res

    blk = min(32768, n_slots)
    if n_slots % blk != 0 and n_slots % 1024 == 0:
        # largest 1024-multiple block that divides n_slots (bounds the
        # lane-padded [blk, K, 3] live set while keeping an even split)
        units = n_slots // 1024
        d = max(d for d in range(1, 33) if units % d == 0)
        blk = d * 1024
    if n_slots % blk == 0 and n_slots > blk:
        nb = n_slots // blk
        args = (q.reshape(nb, blk, 3), idx.reshape(nb, blk, K),
                None if views_emb is None
                else views_emb.reshape(nb, blk, -1))
        if views_emb is None:
            mapped = jax.lax.map(lambda a: block_fn((a[0], a[1], None)),
                                 (args[0], args[1]))
        else:
            mapped = jax.lax.map(block_fn, args)
        agg = {k: v.reshape(n_slots, *v.shape[2:]) for k, v in mapped.items()}
    else:
        agg = block_fn((q, idx, views_emb))

    # ---- scatter passing results back to the dense [R, B] layout ------
    # (src already points empty/failed slots at the M_full drop row; the
    # exact kd2 recompute closes the kernel's quantization band)
    dst = jnp.where(pass_ok & (agg["kd2"] <= query_radius), src, M_full)

    def scatter(x, width=None):
        shape = (M_full + 1,) if width is None else (M_full + 1, width)
        out = jnp.zeros(shape, x.dtype).at[dst].set(x, mode="drop")
        return out[:M_full]

    valid_out = jnp.zeros(M_full + 1, bool).at[dst].set(
        True, mode="drop")[:M_full].reshape(R, B)

    out = {
        "alpha": scatter(agg["alpha"]).reshape(R, B),
        "rgb": scatter(agg["rgb"], 3).reshape(R, B, 3),
        "valid": valid_out,
        "step_id": step_id,
        # budget audit [act_demand, act_granted, pass_demand,
        # pass_granted]: demand above granted means the static budgets
        # truncated samples on this chunk (renderers warn; the measured
        # fidelity at the default fractions is in the config docstring)
        "budget_audit": jnp.stack([
            act_demand, jnp.int32(M_act),
            nn_ok.sum().astype(jnp.int32), jnp.int32(n_slots)]),
    }
    if render_pcd_direct:
        out["alpha_direct"] = scatter(agg["alpha_direct"]).reshape(R, B)
        out["rgb_direct"] = scatter(agg["rgb_direct"], 3).reshape(R, B, 3)
    if render_weights and lbs_weights is not None:
        J = lbs_weights.shape[-1]
        out["lbs_w"] = scatter(agg["lbs_w"], J).reshape(R, B, J)
    return out


def project_points(points, c2w, K):
    """3D -> 2D projection (reference ``project_point_to_image_plane``,
    lib/utils.py:435-450). points [N,3], c2w [4,4], K [3,3] -> [N,2]."""
    w2c = jnp.linalg.inv(c2w)
    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    pix = cam @ K.T
    return pix[:, :2] / pix[:, 2:]


def _inv3x3(m):
    """Closed-form (adjugate/det) batched 3x3 inverse, fp32 VPU-friendly.

    One Newton-Schulz refinement step (X <- X(2I - MX)) squares the
    adjugate's relative error, which otherwise grows with cond(M)^2 on
    ill-conditioned LBS blends (opposing rotations with ~equal weights).
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv = jnp.stack([jnp.stack([A, B, C], -1),
                     jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, I], -1)], -2)
    x = inv / det[..., None, None]
    eye2 = 2.0 * jnp.eye(3, dtype=m.dtype)
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return mm(x, eye2 - mm(m, x))


def prepare_frame(params, cfg: TemporalPointsConfig, state, t=None,
                  rot_params=None, query_radius=0.01, calc_min_max=True):
    """Per-frame state (warp + inverse frames + pose embedding + occupancy)
    shared by all ray chunks of one render."""
    wout = warp(params, cfg, state, t=t, rot_params=rot_params)
    # inv(frames)[:, :3, :3] == inv(R) for the affine [[R, t], [0, 1]]
    # frames point_warper builds; a closed-form 3x3 adjugate inverse (or a
    # plain transpose when procrustes has orthonormalised R) replaces the
    # batched 4x4 LU jnp.linalg.inv, which lowers to scalar-heavy loops on
    # TPU (prepare_frame is per-frame serving cost).
    R = wout["frames"][:, :3, :3]
    if cfg.avg_procrustes:
        wout["inv_rot"] = jnp.swapaxes(R, -1, -2)
    else:
        wout["inv_rot"] = _inv3x3(R)
    if cfg.pose_embedding_dim > 0:
        delta = jax.lax.stop_gradient(params["joints"] - wout["joints_rel"])
        emb = encoding.poc_fre(delta, encoding.poc_freqs(cfg.posbase_pe))
        wout["pose_embedding"] = nn.mlp(params["pose_embedding_net"],
                                        emb.reshape(1, -1),
                                        activation=nn.leaky_relu,
                                        final_activation=nn.leaky_relu)
    else:
        wout["pose_embedding"] = None
    wout["occ_info"] = prepare_occupancy(cfg, state, wout["xyz"],
                                         query_radius, calc_min_max)
    return wout


def forward(params, cfg: TemporalPointsConfig, state, rays_o, rays_d,
            viewdirs, t=None, rot_params=None, near=0.0, far=1e9, bg=1.0,
            query_radius=0.01, render_depth=False, render_weights=False,
            render_pcd_direct=False, calc_min_max=True, frame=None):
    """Full forward: warp -> aggregate -> composite
    (reference TemporalPoints.forward, lib/temporalpoints.py:540-712).

    ``frame``: optional precomputed ``prepare_frame`` output (chunked
    rendering hoists the per-frame warp/occupancy out of the chunk loop)."""
    wout = frame if frame is not None else prepare_frame(
        params, cfg, state, t=t, rot_params=rot_params,
        query_radius=query_radius, calc_min_max=calc_min_max)
    t_hat = wout["xyz"]
    inv_rot = wout["inv_rot"]
    pose_embedding = wout["pose_embedding"]

    agg = aggregate_pts(params, cfg, state, t_hat, inv_rot, rays_o, rays_d,
                        viewdirs, near, far, query_radius,
                        pose_embedding=pose_embedding,
                        render_pcd_direct=render_pcd_direct,
                        render_weights=render_weights,
                        lbs_weights=wout["lbs_weights"],
                        calc_min_max=calc_min_max,
                        occ_info=wout["occ_info"])

    valid = agg["valid"]
    alpha = agg["alpha"]
    if cfg.fast_color_thres > 0:
        valid = valid & (alpha > cfg.fast_color_thres)
    weights, alphainv_last = alpha2weights(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)

    rgb_marched = composite(weights, agg["rgb"], bg=bg,
                            alphainv_last=alphainv_last)
    out = {
        "t_hat_pcd": t_hat,
        "rgb_marched": rgb_marched,
        "alphainv_last": alphainv_last,
        "weights_per_sample": weights,
        "thetas": wout["thetas"],
        "global_t": wout["global_t"],
        "joints_rel": wout["joints_rel"],
        "joints_warped": wout["joints_warped"],
        "lbs_weights": wout["lbs_weights"],
        "budget_audit": agg["budget_audit"],
    }
    if render_depth:
        out["depth"] = composite(weights, agg["step_id"])
    if render_pcd_direct:
        valid_d = agg["valid"]
        ad = agg["alpha_direct"]
        if cfg.fast_color_thres > 0:
            valid_d = valid_d & (ad > cfg.fast_color_thres)
        wd, ainv_d = alpha2weights(ad, valid_d)
        if cfg.fast_color_thres > 0:
            wd = jnp.where(wd > cfg.fast_color_thres, wd, 0.0)
        out["rgb_marched_direct"] = composite(wd, agg["rgb_direct"], bg=bg,
                                              alphainv_last=ainv_d)
        out["alphainv_last_direct"] = ainv_d
    if render_weights and "lbs_w" in agg:
        out["lbs_w_per_sample"] = agg["lbs_w"]
        out["weights_for_render"] = weights
        out["alphainv_for_render"] = alphainv_last
    return out


# ----------------------------------------------------------------------
# Skeleton simplification (reference simplify_skeleton,
# lib/temporalpoints.py:256-368)
# ----------------------------------------------------------------------

def simplify_skeleton(params, cfg: TemporalPointsConfig, state, times,
                      deg_threshold=10.0, five_percent_heuristic=False):
    """Prune zero-motion bones and merge same-motion siblings.

    ``times``: [T] train times. Returns (new_state, info); the new state
    carries the updated rot/sibling masks and merge matrix, ``info`` carries
    joints/bones before and after for rendering and reporting.
    """
    from ..kinematics.treeprune import merge_joints, flatten_merging_rules
    from ..ops.rotations import rotmat_to_rotvec
    J = cfg.n_joints
    t_embed = encoding.poc_fre(jnp.asarray(times, jnp.float32).reshape(-1, 1),
                               encoding.poc_freqs(cfg.timebase_pe))
    p = point_warper.transform_params(params["forward_warp"], t_embed)
    p = np.asarray(p)                                    # [T, J+1, 4]
    if cfg.over_parameterized_rot:
        rot_angles = p[:, :J, -1]
        R, _ = point_warper.rodrigues(jnp.asarray(p[:, :J, :]).reshape(-1, 4))
    else:
        rot_angles = np.sqrt((p[:, :J, :3] ** 2).sum(-1)) % (2 * np.pi)
        R, _ = point_warper.rodrigues(jnp.asarray(p[:, :J, :3]).reshape(-1, 3))
    T = len(times)
    R = np.asarray(R).reshape(T, J, 3, 3)

    # pairwise rotation-similarity via relative geodesic angle
    rel = np.einsum("tiab,tjcb->tijac", R, R)            # R_i R_j^T
    ang = np.linalg.norm(
        np.asarray(rotmat_to_rotvec(jnp.asarray(rel.reshape(-1, 3, 3)))),
        axis=-1).reshape(T, J, J)
    if five_percent_heuristic:
        th_count = int(T * 0.05)
        sim = (np.rad2deg(ang) >= deg_threshold).sum(0) <= th_count
        zero_motion = ((np.rad2deg(np.abs(rot_angles)) >= deg_threshold)
                       .sum(0) <= th_count)
    else:
        deg_std = np.rad2deg(np.sqrt((ang ** 2).mean(0)))
        sim = deg_std <= deg_threshold
        # avg heuristic (reference lib/temporalpoints.py:292: no sqrt)
        zero_motion = np.rad2deg((rot_angles ** 2).mean(0)) <= deg_threshold
    np.fill_diagonal(sim, True)

    prune = zero_motion.copy()
    prune[0] = False                                     # never prune root

    joints_np = np.asarray(params["joints"])
    bones = [list(map(int, b)) for b in np.asarray(state["bones"])]
    (new_joints, new_bones, merging_rules, joints_to_keep, rotations_to_keep,
     switch_mask, sibling_rules) = merge_joints(
        joints_np, bones, prune, sim, convert_merging_rules=False)

    flat = np.asarray(flatten_merging_rules(merging_rules))
    merge_mat = np.zeros((J, J), np.float32)
    merge_mat[np.arange(J), flat] = 1.0                  # col sums weights

    new_state = dict(state)
    new_state["rot_mask"] = jnp.asarray(np.asarray(state["rot_mask"])
                                        | prune)
    new_state["sibling_mask"] = jnp.asarray(sibling_rules.astype(np.int32))
    new_state["merge_mat"] = jnp.asarray(merge_mat)
    info = {
        "prune_bones": prune, "merging_rules": merging_rules,
        "joints_to_keep": joints_to_keep, "new_joints": new_joints,
        "new_bones": new_bones, "rotations_to_keep": rotations_to_keep,
        "old_joints": joints_np, "old_bones": bones,
    }
    return new_state, info


# ----------------------------------------------------------------------
# Losses (reference lib/temporalpoints.py:714-800)
# ----------------------------------------------------------------------

def arap_loss(state, warped_pcd, eps=1e-6):
    warped_nn = jnp.sqrt(
        ((warped_pcd[:, None, :] - warped_pcd[state["nn_i"]]) ** 2).sum(-1)
        + eps)
    return jnp.abs(state["nn_distance"] - warped_nn).sum()


def neighbour_weight_tv_loss(state, lbs_weights):
    diff = lbs_weights[:, None, :] - lbs_weights[state["nn_i"]]
    return jnp.abs(diff).mean()


def weight_sparsity_loss(lbs_weights, eps=1e-6):
    w = lbs_weights
    return -(w * jnp.log(w + eps) + (1 - w) * jnp.log(1 - w + eps)).mean()


def transformation_reg_loss(global_t, thetas):
    return (jnp.abs(global_t).sum() + jnp.abs(thetas).sum()) / thetas.shape[0]


def joint_chamfer_loss(state, joints):
    d = ((joints[:, None, :] - state["skeleton_pcd"][None]) ** 2).sum(-1)
    return d.min(axis=1).sum()


def batch_chamfer_2d(projected, mask_pts):
    """Symmetric chamfer between projected points and mask pixels
    (reference get_batch_chamfer_loss, lib/temporalpoints.py:765-795)."""
    d = ((projected[:, :, None, :] - mask_pts[:, None, :, :]) ** 2).sum(-1)
    return d.min(2).mean() + d.min(1).mean()
