"""Self-contained JAX LPIPS tests (architecture + metric behaviour).

Official pretrained weights are unavailable in this image, so the golden
test pins the seeded-random-feature variant (deterministic by construction)
and a weights-file roundtrip exercises the official-checkpoint load path.
"""
import warnings

import numpy as np
import pytest

from apnerf.render import lpips_jax


def _imgs():
    rng = np.random.default_rng(42)
    gt = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    noisy = np.clip(gt + rng.normal(0, 0.1, gt.shape), 0, 1).astype(
        np.float32)
    very_noisy = np.clip(gt + rng.normal(0, 0.3, gt.shape), 0, 1).astype(
        np.float32)
    return gt, noisy, very_noisy


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_metric_properties(net):
    gt, noisy, very_noisy = _imgs()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        zero = lpips_jax.lpips(gt, gt, net_name=net)
        d1 = lpips_jax.lpips(gt, noisy, net_name=net)
        d2 = lpips_jax.lpips(gt, very_noisy, net_name=net)
        d1_sym = lpips_jax.lpips(noisy, gt, net_name=net)
    assert zero < 1e-6
    assert 0 < d1 < d2                       # monotone in distortion
    np.testing.assert_allclose(d1, d1_sym, rtol=1e-5)


def test_lpips_alex_golden_value():
    """Pins the seeded-random AlexNet-LPIPS forward on a fixed image pair —
    any change to the scaling layer, conv/pool geometry, normalisation or
    calibration shows up here."""
    gt, noisy, _ = _imgs()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        d = lpips_jax.lpips(gt, noisy, net_name="alex")
    np.testing.assert_allclose(d, 0.00186664, rtol=2e-3)


def test_lpips_weight_file_roundtrip(tmp_path):
    """The npz load path (official-checkpoint format) reproduces the exact
    parameters it was saved from."""
    params = lpips_jax.random_params("alex", seed=7)
    payload = {}
    for i, (w, b) in enumerate(params["convs"]):
        payload[f"conv{i}_w"] = w
        payload[f"conv{i}_b"] = b
    for i, lin in enumerate(params["lins"]):
        payload[f"lin{i}"] = lin
    path = str(tmp_path / "alex.npz")
    np.savez(path, **payload)

    loaded = lpips_jax.load_params("alex", weights_path=path)
    for (w0, b0), (w1, b1) in zip(params["convs"], loaded["convs"]):
        np.testing.assert_array_equal(w0, w1)
        np.testing.assert_array_equal(b0, b1)
    gt, noisy, _ = _imgs()
    d_file = lpips_jax.lpips(gt, noisy, net_name="alex", weights_path=path)
    assert np.isfinite(d_file) and d_file > 0
