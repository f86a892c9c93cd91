"""Positional (frequency) encoding.

Semantics match reference ``poc_fre`` (lib/tineuvox.py:872-878):
``concat([x, sin(x * 2^i), cos(x * 2^i)])`` over frequency buffers.
"""
from __future__ import annotations

import jax.numpy as jnp


def poc_freqs(n: int, dtype=jnp.float32):
    """Frequency buffer [2^0 .. 2^(n-1)] (reference lib/tineuvox.py:160-163)."""
    return jnp.asarray([2.0 ** i for i in range(n)], dtype=dtype)


def poc_fre(x, freqs):
    """Frequency-encode ``x`` (..., C) -> (..., C * (1 + 2 * len(freqs))).

    Layout matches the reference exactly: raw input first, then all sins,
    then all cosines, with the frequency axis flattened into the channel axis.
    """
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)


def poc_dim(c: int, n_freqs: int) -> int:
    """Output channel count of ``poc_fre`` for input dim ``c``."""
    return c + 2 * c * n_freqs
