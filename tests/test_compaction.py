"""Compaction / occupancy op tests."""
import numpy as np
import jax.numpy as jnp

from apnerf.ops import compaction as C


def test_compact_flat_and_scatter_back():
    valid = jnp.asarray(
        np.array([0, 1, 0, 1, 1, 0, 1, 1, 0, 1], bool))
    src, filled = C.compact_flat(valid, 4)
    np.testing.assert_array_equal(np.asarray(src), [1, 3, 4, 6])
    assert np.asarray(filled).all()
    vals = jnp.asarray(np.arange(4, dtype=np.float32) + 1)
    out = C.scatter_back(vals, src, 10)
    expected = np.zeros(10, np.float32)
    expected[[1, 3, 4, 6]] = [1, 2, 3, 4]
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_compact_flat_underflow_sentinels():
    valid = jnp.asarray(np.array([0, 0, 1, 0], bool))
    src, filled = C.compact_flat(valid, 3)
    np.testing.assert_array_equal(np.asarray(src), [2, 4, 4])
    np.testing.assert_array_equal(np.asarray(filled), [True, False, False])


def test_occupancy_grid_dilation_and_lookup():
    flags = jnp.zeros((8, 8, 8), bool).at[4, 4, 4].set(True)
    occ = C.build_occupancy_grid(flags)
    o = np.asarray(occ)
    assert o[4, 4, 4] and o[3, 4, 5] and o[5, 5, 5]
    assert not o[1, 1, 1]
    assert o.sum() == 27

    xyz_min = jnp.asarray([0.0, 0.0, 0.0])
    xyz_max = jnp.asarray([8.0, 8.0, 8.0])
    pts = jnp.asarray([[4.5, 4.5, 4.5], [0.5, 0.5, 0.5], [9.0, 4.0, 4.0]])
    hit = np.asarray(C.occupancy_lookup_xyz(occ, xyz_min, xyz_max, pts))
    np.testing.assert_array_equal(hit, [True, False, False])


def test_knn_count_portable_matches_bruteforce():
    import jax.numpy as jnp
    from apnerf.ops.knn import knn_count
    rng = np.random.default_rng(11)
    q = rng.normal(size=(513, 3)).astype(np.float32)
    p = rng.normal(size=(777, 3)).astype(np.float32)
    r2 = 0.2
    cnt = np.asarray(knn_count(jnp.asarray(q), jnp.asarray(p), radius2=r2))
    ref = (((q[:, None, :] - p[None]) ** 2).sum(-1) <= r2).sum(-1)
    np.testing.assert_array_equal(cnt, ref)
