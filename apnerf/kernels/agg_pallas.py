"""Pallas TPU kernel: fused subgroup-shared neighbour aggregation.

The XLA formulation of the shared-KNN aggregation (temporal_points.
_aggregate_subgroup_shared.block_fn — reference semantics at
lib/temporalpoints.py:432-494) is HBM-bound: the [n_samp, kc, 191]
member-candidate MLP input (the candidate features BROADCAST over the
``share`` members) plus three 128-wide layer activations stream ~2 GB/chunk
through HBM for ~130 GFLOP of GEMM (measured 13% MXU).

This kernel keeps the whole member-candidate pipeline in VMEM: per block of
``SB`` subgroups it computes per-member candidate distances, the exact
top-K-of-kc rank mask, inverse-distance weights, the canonical-frame
rotation, positional encoding, the 4-layer feat_net GEMM stack (bf16 in,
fp32 accum) and the weighted candidate reduction — writing only the
[share, SB, F] aggregated features (and kth distances) back to HBM. HBM
traffic drops to the pre-gathered candidate rows + outputs (~40 MB/chunk).

Layout rules learned the hard way (the first version ran at 1/3 the XLA
path's speed): per-candidate scalar math on [sb, 1] slices runs at ~1%
VPU lane utilisation — all distance/rank/weight/rotation math here is
vectorised with the CANDIDATE axis in lanes ([sb, kc] arrays built once
per block from candidate-major inputs), and the members run as a
fori_loop (an unrolled share=16 body blew the Mosaic compile time).

Forward-only: training keeps the XLA path (stage2 sets fused_agg=False);
the renderers/bench take this kernel on TPU. Off-TPU it runs in interpret
mode for CPU exactness tests (tests/test_kernels_interpret.py).

Channel-order trick: the kernel builds the MLP input as
``[rc(3), sin(f-major)(3*pe), cos(f-major)(3*pe), feat(F)]`` — sin/cos
blocks FREQUENCY-major — and the wrapper permutes the first-layer weight
ROWS once to compensate (exact, no runtime cost).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn_pallas import _interpret_mode

import os as _os
SB = int(_os.environ.get("APNERF_AGG_SB", "128"))   # subgroups per block
_MG = int(_os.environ.get("APNERF_AGG_MG", "2"))    # members per GEMM batch


def _kernel(share, kc, K, pe, F, fin, eps, sb,
            q_ref, nbr_ref, rot_ref, feat_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
            h_ref, kd2_ref):
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (sb, kc), 1)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    w4 = w4_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    b3 = b3_ref[...].astype(jnp.float32)
    b4 = b4_ref[...].astype(jnp.float32)

    # ---- block-level (member-invariant) prep: candidate coordinates and
    # rotation entries with the candidate axis in LANES ------------------
    def lanes(ref, j):
        return jnp.concatenate([ref[k][:, j:j + 1] for k in range(kc)],
                               axis=1)                     # [sb, kc]

    px, py, pz = lanes(nbr_ref, 0), lanes(nbr_ref, 1), lanes(nbr_ref, 2)
    R = [lanes(rot_ref, j) for j in range(9)]              # 9 x [sb, kc]
    f_list = [feat_ref[k] for k in range(kc)]              # kc x [sb, F] bf16
    # f-major frequency multipliers for the PE, built from iota (array
    # constants cannot be captured by a pallas kernel body)
    fi = (jax.lax.broadcasted_iota(jnp.int32, (sb, 3 * pe), 1)
          // 3).astype(jnp.float32)
    freq = jnp.exp2(fi)                                    # [sb, 3*pe]

    def lrelu(v):
        return jnp.where(v > 0, v, 0.01 * v)

    # members run in groups of MG per fori iteration: the VPU math is
    # member-local, but batching MG members' rows into ONE GEMM stack
    # amortises the per-dot MXU pipeline overhead (16 members x 4 layers x
    # n_blocks individual small dots measured slower than the XLA path)
    # MG=4 at sb=128 overflows the 16M scoped-VMEM stack by ~0.25M (the
    # MG*kc live input pieces + GEMM stages); MG=2 fits and still halves
    # the per-dot overhead count
    MG = _MG if share % _MG == 0 else 1

    def group_body(gm, _):
        xs = []
        ws_ = []
        kd2s = []
        for mi in range(MG):
            m = gm * MG + mi
            q_m = q_ref[m]                                 # [sb, 3]
            dx = q_m[:, 0:1] - px                          # [sb, kc]
            dy = q_m[:, 1:2] - py
            dz = q_m[:, 2:3] - pz
            to_nn = dx * dx + dy * dy + dz * dz            # [sb, kc]

            # exact top-K-of-kc rank mask, ties broken by candidate
            # position (the XLA path's total order)
            rank = jnp.zeros((sb, kc), jnp.int32)
            for k in range(kc):
                t_k = to_nn[:, k:k + 1]
                rank = rank + jnp.where(
                    (to_nn > t_k) | ((to_nn == t_k) & (lane_k > k)), 1, 0)
            top = rank < K
            kd2s.append(jnp.max(jnp.where(top, to_nn, -3.4e38), axis=1))
            w = jnp.where(top, 1.0 / (to_nn + eps), 0.0)
            ws_.append(w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True),
                                       1e-30))

            # canonical-frame rotation, candidate axis in lanes:
            # rc_a = sum_b R[a,b] * rel_b (row-major 3x3)
            rc0 = R[0] * dx + R[1] * dy + R[2] * dz        # [sb, kc]
            rc1 = R[3] * dx + R[4] * dy + R[5] * dz
            rc2 = R[6] * dx + R[7] * dy + R[8] * dz

            # per-candidate MLP input rows: [rc(3), sin(f-major), cos, feat]
            for k in range(kc):
                rc_k = jnp.concatenate(
                    [rc0[:, k:k + 1], rc1[:, k:k + 1], rc2[:, k:k + 1]],
                    axis=1)                                # [sb, 3]
                rep = jnp.concatenate([rc_k] * pe, axis=1)  # [sb, 3*pe]
                arg = rep * freq
                x_pe = jnp.concatenate(
                    [rc_k, jnp.sin(arg), jnp.cos(arg)], axis=1)
                xs.append(jnp.concatenate(
                    [x_pe.astype(jnp.bfloat16), f_list[k]], axis=1))
        x = jnp.concatenate(xs, axis=0)                    # [MG*kc*sb, fin]

        # 4-layer feat_net, bf16 inputs / fp32 accumulation, leaky_relu
        # after every layer INCLUDING the last (XLA path: nn.mlp with
        # final_activation=leaky_relu on bf16 activations)
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        h = lrelu(h + b1).astype(jnp.bfloat16)
        h = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        h = lrelu(h + b2).astype(jnp.bfloat16)
        h = jnp.dot(h, w3, preferred_element_type=jnp.float32)
        h = lrelu(h + b3).astype(jnp.bfloat16)
        h = jnp.dot(h, w4, preferred_element_type=jnp.float32)
        h = lrelu(h + b4).astype(jnp.float32)

        # weighted candidate reduction -> [sb, F] per member
        for mi in range(MG):
            hm = jnp.zeros((sb, F), jnp.float32)
            base = mi * kc * sb
            for k in range(kc):
                hm = hm + (h[base + k * sb:base + (k + 1) * sb]
                           * ws_[mi][:, k:k + 1])
            h_ref[gm * MG + mi] = hm
            kd2_ref[gm * MG + mi] = kd2s[mi]
        return 0

    jax.lax.fori_loop(0, share // MG, group_body, 0)


@partial(jax.jit, static_argnames=("share", "K", "eps", "sb"))
def fused_subgroup_agg(q_sub, nbr, rot, feat, featnet_params, share: int,
                       K: int, eps: float, sb: int = SB):
    """Fused aggregation: (h [share, S, F] fp32, kd2 [share, S] fp32) —
    MEMBER-MAJOR outputs: run the density/rgb heads on this layout and
    transpose only their small outputs (transposing the [S, share, F]
    features costs ~1.6 ms at bench shapes; alpha/rgb are 128x smaller).

    q_sub [S, share, 3] f32 member positions; nbr [kc, S, 3] f32
    CANDIDATE-MAJOR candidate positions (gather with transposed indices
    upstream — ``packed[idx.T]`` — so no input transpose is ever paid;
    INVALID candidates must carry a huge sentinel, e.g. 2e9 — they rank
    last, their inverse-distance weight underflows to ~1e-19 relative, and
    any sample whose top-K reaches one gets kd2 >> radius, i.e. rejected —
    one-sided exactly like the XLA path's inf mask); rot [kc, S, 9] f32
    row-major canonical-frame rotations; feat [kc, S, F] bf16 candidate
    features; featnet_params: the feat_net pytree (4 layers, reference
    lib/temporalpoints.py:117-130).
    """
    kc, S = nbr.shape[0], nbr.shape[1]
    F = feat.shape[-1]
    layers = featnet_params["layers"]
    assert len(layers) == 4, "kernel is specialised to feat_depth=4"
    fin = layers[0]["w"].shape[0]
    pe = (fin - F - 3) // 6                       # posbase_pe from the shape
    assert fin == 3 * (1 + 2 * pe) + F, (fin, F, pe)

    # permute the first layer's weight ROWS from the reference poc_fre
    # channel order ([x(3), sin c-major (3*pe), cos c-major, feat]) to the
    # kernel's f-major sin/cos order — exact, done once per call (weights
    # are tiny)
    perm = list(range(3))
    for blk in range(2):                                  # sin block, cos
        base = 3 + blk * 3 * pe
        for f in range(pe):
            for c in range(3):
                perm.append(base + c * pe + f)
    perm += list(range(3 + 6 * pe, fin))
    perm = jnp.asarray(np.asarray(perm, np.int32))

    def bf(x):
        return x.astype(jnp.bfloat16)

    w1 = bf(layers[0]["w"])[perm]
    ws = [w1] + [bf(layers[i]["w"]) for i in (1, 2, 3)]
    bs = [bf(layers[i]["b"])[None, :] for i in range(4)]

    pad = (-S) % sb
    if pad:
        q_sub = jnp.pad(q_sub, ((0, pad), (0, 0), (0, 0)),
                        constant_values=2e9)
        nbr = jnp.pad(nbr, ((0, 0), (0, pad), (0, 0)), constant_values=2e9)
        rot = jnp.pad(rot, ((0, 0), (0, pad), (0, 0)))
        feat = jnp.pad(feat, ((0, 0), (0, pad), (0, 0)))
    Sp = S + pad
    grid = Sp // sb

    # member-major q (the only transposed input — [S, share, 3] is small);
    # candidate tables arrive candidate-major already
    q_in = jnp.transpose(q_sub, (1, 0, 2))                 # [share, Sp, 3]
    nbr_in = nbr
    rot_in = rot
    feat_in = feat

    wspec = [pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                          memory_space=pltpu.VMEM)
             for w in (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3],
                       bs[3])]
    h, kd2 = pl.pallas_call(
        partial(_kernel, share, kc, K, pe, F, fin, float(eps), sb),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((share, sb, 3), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, sb, 3), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, sb, 9), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, sb, F), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + wspec,
        out_specs=[
            pl.BlockSpec((share, sb, F), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((share, sb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((share, Sp, F), jnp.float32),
            jax.ShapeDtypeStruct((share, Sp), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(q_in, nbr_in, rot_in, feat_in,
      ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])

    return h[:, :S], kd2[:, :S]                          # member-major
