"""Minimal functional NN layers (pytree params, pure apply fns).

Initialisation mirrors ``torch.nn.Linear`` defaults (uniform
±1/sqrt(fan_in) for weight and bias) so that training dynamics match the
reference models (e.g. reference ``lib/tineuvox.py:28-88``).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def init_linear(key, din: int, dout: int, bias: bool = True, dtype=jnp.float32):
    """Parameters for a dense layer; matches torch.nn.Linear default init."""
    bound = 1.0 / math.sqrt(din)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (dout,), dtype, -bound, bound)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_mlp(key, dims: Sequence[int], bias: bool = True, final_bias: bool = True,
             dtype=jnp.float32):
    """A stack of dense layers ``dims[0] -> dims[1] -> ... -> dims[-1]``."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        is_last = i == len(dims) - 2
        layers.append(init_linear(k, dims[i], dims[i + 1],
                                  bias=bias and (final_bias or not is_last),
                                  dtype=dtype))
    return {"layers": layers}


def mlp(p, x, activation=jax.nn.relu, final_activation=None):
    """Apply an MLP; activation between layers, optional final activation."""
    layers = p["layers"]
    for i, lp in enumerate(layers):
        x = linear(lp, x)
        if i < len(layers) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def leaky_relu(x):
    # torch.nn.LeakyReLU default negative_slope=0.01
    return jax.nn.leaky_relu(x, negative_slope=0.01)
