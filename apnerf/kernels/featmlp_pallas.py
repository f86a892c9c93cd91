"""Pallas TPU kernel: fused PE + feat_net MLP + weighted K-reduction.

The aggregation MLP is the render chunk's largest stage and it is
HBM-bound in XLA: poc_fre writes a [M*K, 63] encoding to HBM, every MLP
layer round-trips its [M*K, F] activations through HBM, and only then is
the K axis reduced (measured 5.1 ms feat_net + 1.3 ms poc_fre per 8192-ray
chunk at 13% MXU utilisation, PERF.md round 3). This kernel keeps the
whole chain in VMEM: one pass per row block computes the positional
encoding, runs the ``feat_depth`` GEMMs, multiplies by the inverse-distance
weights and reduces over the K neighbour axis — HBM traffic drops to the
packed inputs plus the [M, F] output.

Unlike the round-3 fused-agg kernel (kernels/agg_pallas.py, a measured
negative result kept flag-off), this kernel does NO selection, ranking or
per-candidate math: its body is four large [rows, .] x [., F] GEMMs plus
cheap VPU elementwise work, which is exactly the shape Mosaic runs well.

Positional-encoding trick: poc_fre's layout (reference lib/tineuvox.py:
872-878: [x, sin(x*2^i)..., cos(x*2^i)...]) is produced as one [rows, 3] x
[3, P_pad] MXU matmul scattering each axis into its frequency columns,
followed by sin(X + phase) with phase = pi/2 on the cosine columns and an
identity passthrough on the first 3 columns. The [3, P_pad] scatter matrix
and phase row are built host-side in the wrapper.

Numerics: matches the XLA bf16 aggregation path (agg_bf16=True) up to
bf16 rounding-order differences — GEMMs accumulate in fp32 here
(preferred_element_type) where XLA rounds each dot to bf16, so the kernel
is slightly MORE accurate; equivalence tests use bf16-scale tolerances.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Incremented each time the kernel wrapper is (re)traced — lets callers
# (dryrun_multichip, tests) assert the Pallas path actually engaged instead
# of silently falling back to the XLA formulation.
TRACE_COUNT = 0


def _interpret_mode() -> bool:
    from ..ops.knn import _tpu_default
    return not _tpu_default()


def _leaky(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _kernel(n_layers, K, rel_ref, feat_ref, w_ref, smat_ref, phase_ref,
            w1e_ref, w1f_ref, b1_ref, wl_ref, bl_ref, out_ref):
    rows = rel_ref.shape[0]
    F = feat_ref.shape[-1]
    # ---- positional encoding as one matmul + sin
    x = rel_ref[...]                                    # [rows, 3] f32
    X = jnp.dot(x, smat_ref[...],
                preferred_element_type=jnp.float32)     # [rows, P_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    E = jnp.where(col < 3, X, jnp.sin(X + phase_ref[...]))
    # ---- layer 1, split into PE and feature operands
    h = jnp.dot(E.astype(jnp.bfloat16), w1e_ref[...],
                preferred_element_type=jnp.float32)
    h += jnp.dot(feat_ref[...], w1f_ref[...],
                 preferred_element_type=jnp.float32)
    h = _leaky(h + b1_ref[...]).astype(jnp.bfloat16)
    # ---- remaining layers
    for li in range(n_layers - 1):
        h = jnp.dot(h, wl_ref[li],
                    preferred_element_type=jnp.float32)
        h = _leaky(h + bl_ref[li]).astype(jnp.bfloat16)
    # ---- weighted reduction over the K neighbour axis
    hw = h.astype(jnp.float32) * w_ref[...]             # [rows, F]
    out_ref[...] = hw.reshape(rows // K, K, F).sum(axis=1)


def _xla_reference(rel_canon, feat_sel, w_sel, featnet_p, pose_embedding,
                   pe_freqs):
    """The XLA bf16 formulation of the same aggregation (the featmlp_kernel-
    ineligible branch of models/temporal_points._featnet_h) — used as the
    backward rule: differentiating the Pallas kernel itself is unsupported,
    and recomputing here doubles as rematerialisation (no [M*K, F] layer
    activations are saved across the forward)."""
    from ..ops import encoding, nn
    rel_emb = encoding.poc_fre(rel_canon, encoding.poc_freqs(pe_freqs))
    ins = [rel_emb.astype(jnp.bfloat16), feat_sel.astype(jnp.bfloat16)]
    if pose_embedding is not None:
        pe = jnp.broadcast_to(
            pose_embedding.reshape((1,) * len(rel_emb.shape[:-1]) + (-1,)),
            (*rel_emb.shape[:-1], pose_embedding.size))
        ins.append(pe.astype(jnp.bfloat16))
    h_k = nn.mlp(featnet_p, jnp.concatenate(ins, -1),
                 activation=nn.leaky_relu, final_activation=nn.leaky_relu)
    return (h_k.astype(jnp.float32) * w_sel[..., None]).sum(-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _featmlp(K, pe_freqs, block_rows, interpret, rel_canon, feat_sel, w_sel,
             featnet_p, pose_embedding):
    return _run_kernel(K, pe_freqs, block_rows, interpret, rel_canon,
                       feat_sel, w_sel, featnet_p, pose_embedding)


def _featmlp_fwd(K, pe_freqs, block_rows, interpret, rel_canon, feat_sel,
                 w_sel, featnet_p, pose_embedding):
    out = _run_kernel(K, pe_freqs, block_rows, interpret, rel_canon,
                      feat_sel, w_sel, featnet_p, pose_embedding)
    return out, (rel_canon, feat_sel, w_sel, featnet_p, pose_embedding)


def _featmlp_bwd(K, pe_freqs, block_rows, interpret, res, g):
    rel_canon, feat_sel, w_sel, featnet_p, pose_embedding = res
    _, vjp = jax.vjp(
        lambda r, f, w, p, pe: _xla_reference(r, f, w, p, pe, pe_freqs),
        rel_canon, feat_sel, w_sel, featnet_p, pose_embedding)
    return vjp(g.astype(jnp.float32))


_featmlp.defvjp(_featmlp_fwd, _featmlp_bwd)


@functools.partial(jax.jit, static_argnames=("K", "pe_freqs", "block_rows",
                                             "interpret"))
def featmlp_agg(rel_canon, feat_sel, w_sel, featnet_p, *, K: int,
                pe_freqs: int, pose_embedding=None, block_rows: int = 2048,
                interpret: bool | None = None):
    """h[m] = sum_k w_sel[m,k] * feat_net(concat(poc_fre(rel_canon[m,k]),
    feat_sel[m,k], pose)) — the aggregation of reference
    lib/temporalpoints.py:472-494, fused into one VMEM pass.

    rel_canon [M, K, 3] f32; feat_sel [M, K, F] bf16; w_sel [M, K] f32;
    featnet_p: nn.mlp params (first layer [3*(1+2*pe_freqs)+F(+pd), F]).
    Returns h [M, F] f32.

    Differentiable: forward runs the fused kernel; the VJP recomputes
    through the XLA formulation (bf16-equivalent numerics, remat-style —
    only the inputs are saved).
    """
    return _featmlp(K, pe_freqs, block_rows, interpret, rel_canon, feat_sel,
                    w_sel, featnet_p, pose_embedding)


def _run_kernel(K, pe_freqs, block_rows, interpret, rel_canon, feat_sel,
                w_sel, featnet_p, pose_embedding):
    global TRACE_COUNT
    TRACE_COUNT += 1
    M, Kk, _ = rel_canon.shape
    assert Kk == K
    F = feat_sel.shape[-1]
    P = 3 * (1 + 2 * pe_freqs)
    P_pad = -(-P // 64) * 64

    # scatter matrix + phase row for the PE-as-matmul trick
    smat = np.zeros((3, P_pad), np.float32)
    phase = np.zeros((1, P_pad), np.float32)
    for a in range(3):
        smat[a, a] = 1.0
        for i in range(pe_freqs):
            smat[a, 3 + a * pe_freqs + i] = 2.0 ** i
            smat[a, 3 + 3 * pe_freqs + a * pe_freqs + i] = 2.0 ** i
            phase[0, 3 + 3 * pe_freqs + a * pe_freqs + i] = math.pi / 2.0
    smat = jnp.asarray(smat)
    phase = jnp.asarray(phase)

    layers = featnet_p["layers"]
    n_layers = len(layers)
    W1 = layers[0]["w"]
    assert W1.shape[1] == F
    w1e = jnp.zeros((P_pad, F), jnp.bfloat16).at[:P].set(
        W1[:P].astype(jnp.bfloat16))
    w1f = W1[P:P + F].astype(jnp.bfloat16)
    b1 = layers[0]["b"].astype(jnp.float32).reshape(1, F)
    if pose_embedding is not None:
        # the pose embedding is constant across rows: fold its first-layer
        # contribution into the bias (exact up to fp32 summation order)
        Wp = W1[P + F:].astype(jnp.float32)
        b1 = b1 + pose_embedding.reshape(1, -1).astype(jnp.float32) @ Wp
    wl = jnp.stack([l["w"].astype(jnp.bfloat16) for l in layers[1:]])
    bl = jnp.stack([l["b"].astype(jnp.float32).reshape(1, F)
                    for l in layers[1:]])

    rows = M * K
    blk = min(block_rows, rows)
    # clamp: block_rows (APNERF_FEATMLP_ROWS) below K would round to 0
    blk = max(K, blk - blk % K)
    pad = (-rows) % blk
    rel = rel_canon.reshape(rows, 3).astype(jnp.float32)
    feat = feat_sel.reshape(rows, F).astype(jnp.bfloat16)
    wr = w_sel.reshape(rows, 1).astype(jnp.float32)
    if pad:
        rel = jnp.concatenate([rel, jnp.zeros((pad, 3), rel.dtype)], 0)
        feat = jnp.concatenate([feat, jnp.zeros((pad, F), feat.dtype)], 0)
        wr = jnp.concatenate([wr, jnp.zeros((pad, 1), wr.dtype)], 0)
    n_blk = rel.shape[0] // blk
    bs = blk // K

    out = pl.pallas_call(
        functools.partial(_kernel, n_layers, K),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((blk, 3), lambda i: (i, 0)),
            pl.BlockSpec((blk, F), lambda i: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
            pl.BlockSpec((3, P_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, P_pad), lambda i: (0, 0)),
            pl.BlockSpec((P_pad, F), lambda i: (0, 0)),
            pl.BlockSpec((F, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((n_layers - 1, F, F), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_layers - 1, 1, F), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rel.shape[0] // K, F), jnp.float32),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(rel, feat, wr, smat, phase, w1e, w1f, b1, wl, bl)
    return out[:M]
