import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Micro-bench of 8-corner reduce formulations (the grid-gradient tail).

The production reduce (ops/grid.py accum_chunk) reads the kernel's
[n_cells, 8C] accumulator in 8 row-shifted channel-sliced streams
(48-byte runs at 384-byte stride -> ~109 GB/s effective, 15 ms/scale).
Candidates:
  R0  production flat row-shift (fp32)
  R1  production on a bf16 accumulator
  R2  hierarchical pair-combine: z, then y, then x shift (halves width
      each step; later steps run on 1/2 and 1/4 the bytes)
  R3  hierarchical on bf16
All variants are exactness-checked against R0 before timing.
"""
import time

import numpy as np


def timeit(f, n=8):
    r = f()
    _ = float(np.asarray(r))
    t0 = time.time()
    for _ in range(n):
        r = f()
    _ = float(np.asarray(r))
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    sx = sy = sz = 161
    ex, ey, ez = sx + 1, sy + 1, sz + 1
    n_cells = ex * ey * ez
    C = 12
    rng = np.random.default_rng(0)
    acc_np = rng.uniform(-1, 1, size=(n_cells, 8 * C)).astype(np.float32)
    acc = jnp.asarray(acc_np)
    acc_bf = acc.astype(jnp.bfloat16)
    maxoff = (ey + 1) * ez + 1
    print(f"acc {acc.shape} = {acc.nbytes/1e9:.2f} GB, maxoff={maxoff}")

    def r0(acc):
        accp = jnp.concatenate(
            [acc.astype(jnp.float32),
             jnp.zeros((maxoff, 8 * C), jnp.float32)], 0)
        red = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    k = (dx * 2 + dy) * 2 + dz
                    off = ((1 - dx) * ey + (1 - dy)) * ez + (1 - dz)
                    red = red + jax.lax.dynamic_slice(
                        accp, (off, k * C), (n_cells, C))
        return red.reshape(ex, ey, ez, C)[:sx, :sy, :sz].sum()

    def r2(acc):
        a = acc.astype(jnp.float32).reshape(n_cells, 8, C)
        # z: corner k = (dx*2+dy)*2+dz; dz=0 blocks are k even
        a0 = a[:, 0::2].reshape(n_cells, 4 * C)
        a1 = a[:, 1::2].reshape(n_cells, 4 * C)
        z = a0[1:] + a1[:-1]                       # [n_cells-1, 4C]
        # channel order after the even/odd split: (dx, dy) lexicographic
        z = z.reshape(-1, 2, 2, C)
        y = z[ez:, :, 0] + z[:-ez, :, 1]           # [*, 2, C] (dy combined)
        x = y[ey * ez:, 0] + y[:-ey * ez, 1]       # [*, C]    (dx combined)
        pad = n_cells - x.shape[0]
        x = jnp.concatenate([x, jnp.zeros((pad, C), jnp.float32)], 0)
        return x.reshape(ex, ey, ez, C)[:sx, :sy, :sz].sum()

    f0 = jax.jit(r0)
    f1 = jax.jit(lambda a: r0(a))
    f2 = jax.jit(r2)
    f3 = jax.jit(lambda a: r2(a))

    v0 = float(f0(acc))
    v2 = float(f2(acc))
    assert abs(v0 - v2) < 1e-3 * abs(v0), (v0, v2)
    print(f"R0 flat row-shift fp32 : {timeit(lambda: f0(acc)) * 1e3:7.2f} ms")
    print(f"R1 flat row-shift bf16 : {timeit(lambda: f1(acc_bf)) * 1e3:7.2f} ms")
    print(f"R2 hierarchical fp32   : {timeit(lambda: f2(acc)) * 1e3:7.2f} ms")
    print(f"R3 hierarchical bf16   : {timeit(lambda: f3(acc_bf)) * 1e3:7.2f} ms")

    # R4: transpose-first, then 8 contiguous channel-block streams
    def r4(acc):
        at = acc.astype(jnp.float32).T             # [8C, n_cells]
        atp = jnp.concatenate([at, jnp.zeros((8 * C, maxoff),
                                             jnp.float32)], 1)
        red = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    k = (dx * 2 + dy) * 2 + dz
                    off = ((1 - dx) * ey + (1 - dy)) * ez + (1 - dz)
                    red = red + jax.lax.dynamic_slice(
                        atp, (k * C, off), (C, n_cells))
        return red.sum()

    f4 = jax.jit(r4)
    v4 = float(f4(acc))
    # transpose variant reduces over all extended cells (sum-check only
    # approximate vs the [:sx,:sy,:sz] crop) — timing signal only
    print(f"R4 transpose+stream    : {timeit(lambda: f4(acc)) * 1e3:7.2f} ms"
          f"  (sum over extended cells)")


if __name__ == "__main__":
    main()
