"""Density -> alpha activation with custom VJP.

alpha = 1 - (1 + exp(density + shift)) ** (-interval)

Matches the reference CUDA kernels ``raw2alpha`` / ``raw2alpha_backward``
(lib/cuda/render_utils_kernel.cu:357-428) including the overflow guard in the
backward pass (``min(exp, 1e10)``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def raw2alpha(density, shift, interval):
    e = jnp.exp(density + shift)
    return 1.0 - jnp.power(1.0 + e, -interval)


def _raw2alpha_fwd(density, shift, interval):
    e = jnp.exp(density + shift)
    alpha = 1.0 - jnp.power(1.0 + e, -interval)
    return alpha, (e, interval)


def _raw2alpha_bwd(res, g):
    e, interval = res
    # reference lib/cuda/render_utils_kernel.cu:404
    grad = jnp.minimum(e, 1e10) * jnp.power(1.0 + e, -interval - 1.0) * interval * g
    return grad, None, None


raw2alpha.defvjp(_raw2alpha_fwd, _raw2alpha_bwd)


def activate_density(density, interval, act_shift):
    """Reference ``TiNeuVox.activate_density`` (lib/tineuvox.py:396-400)."""
    return raw2alpha(density, act_shift, interval)
