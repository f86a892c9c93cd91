"""Pallas TPU kernel tests (run with APNERF_TPU_TESTS=1 on a TPU host;
skipped on the CPU-default test backend)."""
import os

import numpy as np
import pytest

TPU = os.environ.get("APNERF_TPU_TESTS", "0") == "1"
pytestmark = pytest.mark.skipif(not TPU, reason="TPU kernel tests disabled "
                                "(set APNERF_TPU_TESTS=1 on a TPU host)")


def test_knn_pallas_exact():
    import jax.numpy as jnp
    from apnerf.kernels.knn_pallas import knn_pallas_sorted
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4096, 3)).astype(np.float32)
    p = rng.normal(size=(5000, 3)).astype(np.float32)
    d2, idx = knn_pallas_sorted(jnp.asarray(q), jnp.asarray(p), k=8)
    full = ((q[:, None, :] - p[None]) ** 2).sum(-1)
    ref_d = np.sort(full, 1)[:, :8]
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1), ref_d, rtol=1e-4,
                               atol=1e-6)
    got = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.sort(got, 1), ref_d, rtol=1e-4, atol=1e-6)


def test_knn_pallas_radius_bound_consistent():
    import jax.numpy as jnp
    from apnerf.kernels.knn_pallas import knn_pallas_sorted
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2048, 3)).astype(np.float32)
    p = rng.normal(size=(4000, 3)).astype(np.float32)
    r2 = 0.05
    d_full, _ = knn_pallas_sorted(jnp.asarray(q), jnp.asarray(p), k=8)
    d_bound, _ = knn_pallas_sorted(jnp.asarray(q), jnp.asarray(p), k=8,
                                   radius2=r2)
    ok_full = np.asarray(d_full)[:, -1] <= r2
    ok_bound = np.asarray(d_bound)[:, -1] <= r2
    # queries passing the cutoff must be identical sets with identical d2
    np.testing.assert_array_equal(ok_full, ok_bound)
    np.testing.assert_allclose(np.asarray(d_bound)[ok_bound],
                               np.asarray(d_full)[ok_full], rtol=1e-5)


def test_scatter_kernel_matches_numpy():
    import jax.numpy as jnp
    from apnerf.kernels.scatter_pallas import scatter_add_rows
    rng = np.random.default_rng(2)
    M, G, C = 40000, 20000, 12
    idx = rng.integers(0, G, M).astype(np.int32)
    upd = rng.standard_normal((M, C)).astype(np.float32)
    out = np.asarray(scatter_add_rows(jnp.asarray(idx), jnp.asarray(upd), G))
    ref = np.zeros((G, C), np.float32)
    np.add.at(ref, idx, upd)
    np.testing.assert_allclose(out, ref, atol=2e-5)
