"""Per-ray transmittance, compositing, and the distortion loss — dense layout.

Replaces the sequential CUDA scan ``alpha2weight`` / ``alpha2weight_backward``
(lib/cuda/render_utils_kernel.cu:430-561) with a differentiable cumulative
product over the dense ``[rays, samples]`` axis; the CUDA early-exit at
``T < 1e-3`` becomes a mask (weights past the stop point are zero, and
``alphainv_last`` freezes at the stop value), so forward values match the
reference bit-for-bit semantics while the gradient comes from autodiff of the
same masked expression.
"""
from __future__ import annotations

import jax.numpy as jnp

EARLY_STOP_T = 1e-3


def alpha2weights(alpha, valid=None, early_stop: float = EARLY_STOP_T):
    """Volume-rendering weights for dense per-ray alphas.

    Args:
      alpha: [R, S] per-sample opacities (sorted near->far along S).
      valid: optional [R, S] bool; invalid samples act as alpha=0.
      early_stop: transmittance threshold; matches CUDA kernel's 1e-3 break.

    Returns:
      weights: [R, S]; alphainv_last: [R] (background transmittance).
    """
    if valid is not None:
        alpha = jnp.where(valid, alpha, 0.0)
    one_minus = 1.0 - alpha
    # T_incl[s] = prod_{j<=s} (1 - alpha_j); T_excl[s] = T_incl[s-1]
    t_incl = jnp.cumprod(one_minus, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1)
    # CUDA semantics: weight[s] is still written on the step whose product
    # first drops below the threshold, nothing after it.
    alive = t_excl >= early_stop
    weights = jnp.where(alive, alpha * t_excl, 0.0)
    # alphainv_last = T at the break step (first T_incl < thresh) or final T.
    stopped = t_incl < early_stop
    any_stop = jnp.any(stopped, axis=-1)
    first_stop = jnp.argmax(stopped, axis=-1)
    t_at_stop = jnp.take_along_axis(t_incl, first_stop[..., None], axis=-1)[..., 0]
    alphainv_last = jnp.where(any_stop, t_at_stop, t_incl[..., -1])
    return weights, alphainv_last


def composite(weights, values, bg=None, alphainv_last=None):
    """``segment_coo(weights * values, ray_id)`` in dense form: a plain sum.

    Args:
      weights: [R, S]; values: [R, S, C] (or [R, S] for scalars like depth).
    """
    if values.ndim == weights.ndim + 1:
        out = jnp.sum(weights[..., None] * values, axis=-2)
    else:
        out = jnp.sum(weights * values, axis=-1)
    if bg is not None:
        out = out + alphainv_last[..., None] * bg
    return out


def distortion_loss(weights, s, interval, valid=None):
    """mip-NeRF-360 distortion loss, dense per-ray form.

    Equivalent to ``torch_efficient_distloss.flatten_eff_distloss(w, s,
    1/n_max, ray_id)`` (used at reference run.py:972): per ray
    ``sum_ij w_i w_j |s_i - s_j| + (1/3) * interval * sum_i w_i^2``, summed
    over rays and divided by the number of rays. Uses the O(S) prefix-sum
    identity (samples are sorted along S).
    """
    if valid is not None:
        weights = jnp.where(valid, weights, 0.0)
    w_cum = jnp.cumsum(weights, axis=-1) - weights          # exclusive prefix
    ws = weights * s
    ws_cum = jnp.cumsum(ws, axis=-1) - ws
    loss_bi = 2.0 * (ws * w_cum - weights * ws_cum)
    loss_uni = (1.0 / 3.0) * interval * weights ** 2
    n_rays = weights.shape[0]
    return (loss_bi.sum() + loss_uni.sum()) / n_rays
