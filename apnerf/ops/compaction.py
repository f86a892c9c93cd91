"""Static-budget sample compaction + occupancy grids.

TPU-native replacement for the reference's ragged CUDA sample filtering
(``mask_outbbox`` compaction in sample_pts_on_rays, fast_color_thres drops,
and the bound-but-unused ``maskcache_lookup``,
lib/cuda/render_utils_kernel.cu:138-351): validity masks select work, a
cumsum/top_k compaction packs the valid samples into statically shaped
buffers, and results scatter back into the dense layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_flat(valid_flat, budget: int):
    """Global compaction: indices of the first ``budget`` valid entries.

    Returns (src [budget] with sentinel == M, filled mask [budget])."""
    M = valid_flat.shape[0]
    pos = jnp.cumsum(valid_flat) - 1
    keep = valid_flat & (pos < budget)
    dest = jnp.where(keep, pos, budget)
    src = jnp.full((budget + 1,), M, jnp.int32)
    src = src.at[dest].set(jnp.arange(M, dtype=jnp.int32),
                           mode="drop")[:budget]
    return src, src < M


def scatter_back(values, src, M: int, fill=0.0):
    """Inverse of compact_flat: place values[i] at src[i] (sentinel drops)."""
    shape = (M + 1,) + values.shape[1:]
    out = jnp.full(shape, fill, values.dtype).at[src].set(values, mode="drop")
    return out[:M]


def build_occupancy_grid(flags_volume):
    """Dilate a boolean volume by one cell (26-neighbourhood)."""
    g = flags_volume.astype(jnp.float32)
    g = jax.lax.reduce_window(g, -jnp.inf, jax.lax.max, (3, 3, 3),
                              (1, 1, 1), "SAME")
    return g > 0


def occupancy_lookup_xyz(occ, xyz_min, xyz_max, pts):
    """Boolean occupancy at world points (nearest-cell semantics of the
    reference maskcache_lookup, render_utils_kernel.cu:294-351)."""
    dims = jnp.asarray(occ.shape, jnp.float32)
    u = (pts - xyz_min) / (xyz_max - xyz_min)
    idx = jnp.floor(u * dims).astype(jnp.int32)
    ok = jnp.all((idx >= 0) & (idx < jnp.asarray(occ.shape)), axis=-1)
    idx = jnp.clip(idx, 0, jnp.asarray(occ.shape) - 1)
    return ok & occ[idx[..., 0], idx[..., 1], idx[..., 2]]
