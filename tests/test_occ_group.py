"""Coarse-group occupancy sampling (TiNeuVoxConfig.occ_group > 1) must be
exact vs the per-sample path: with a fully-occupied grid the render is
identical, and with a real (extra-dilated) grid the coarse test is
conservative — it never prunes a sample the per-sample path keeps."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apnerf.models import tineuvox
from apnerf.ops import compaction
import pytest

# heavier CPU tier (VERDICT r3 #7): default `pytest -q` stays <3 min
pytestmark = pytest.mark.integration


def _setup(fast_color_thres=0.0):
    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3, fast_color_thres=fast_color_thres)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    params["feature"] = params["feature"] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), params["feature"].shape)
    # rays originate INSIDE the bbox and the march ends (far) before any
    # sample approaches a bbox face: the in-bbox test at a face is
    # fp-fragile (fusion/fma differences between separately-jitted
    # programs can flip it), which is measurement noise, not a pipeline
    # difference
    rng = np.random.default_rng(3)
    N = 32
    ro = jnp.asarray(np.zeros((N, 3), np.float32) + [0, 0, 0.9])
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, :2] *= 0.15
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    t = jnp.zeros((N, 1))
    return cfg, params, ro, rd, vd, t


def _fwd(cfg, params, ro, rd, vd, t, occ, budget):
    n_steps = cfg.max_steps(0.5)
    return tineuvox.forward(params, cfg, ro, rd, vd, t, 0.05, 1.53, 0.5, 1.0,
                            n_steps, occ_grid=occ, active_budget=budget)


def test_coarse_group_matches_per_sample_when_fully_occupied():
    cfg, params, ro, rd, vd, t = _setup()
    G = 4
    S = cfg.max_steps(0.5)
    N = ro.shape[0]
    occ = jnp.ones(tuple(cfg.world_size), bool)
    budget = N * (-(-S // G)) * G           # generous: every slot coverable
    cfg1 = dataclasses.replace(cfg, occ_group=1)
    cfg4 = dataclasses.replace(cfg, occ_group=G)
    out1 = jax.jit(lambda p: _fwd(cfg1, p, ro, rd, vd, t, occ, budget))(params)
    out4 = jax.jit(lambda p: _fwd(cfg4, p, ro, rd, vd, t, occ, budget))(params)
    assert bool(jnp.array_equal(out1["valid"], out4["valid"]))
    for k in ("rgb_marched", "weights", "alphainv_last", "raw_alpha", "depth"):
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out4[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_coarse_group_centre_test_is_conservative():
    """Per the stage-1 wiring (train/stage1.py refresh_occupancy): the
    per-sample path tests against the 2-dilated grid, the coarse path
    against the SAME grid with one extra dilation; every per-sample
    survivor must survive the coarse test."""
    cfg, params, ro, rd, vd, t = _setup()
    G = 4
    S = cfg.max_steps(0.5)
    N = ro.shape[0]
    # a small occupied blob in the grid centre
    flags = np.zeros(tuple(cfg.world_size), bool)
    flags[3:5, 3:5, 3:5] = True
    occ2 = compaction.build_occupancy_grid(
        compaction.build_occupancy_grid(jnp.asarray(flags)))
    occ3 = compaction.build_occupancy_grid(occ2)
    budget = N * (-(-S // G)) * G
    cfg1 = dataclasses.replace(cfg, occ_group=1)
    cfg4 = dataclasses.replace(cfg, occ_group=G)
    out1 = jax.jit(lambda p: _fwd(cfg1, p, ro, rd, vd, t, occ2, budget))(params)
    out4 = jax.jit(lambda p: _fwd(cfg4, p, ro, rd, vd, t, occ3, budget))(params)
    v1 = np.asarray(out1["valid"])
    v4 = np.asarray(out4["valid"])
    assert not np.any(v1 & ~v4), "coarse centre test pruned a kept sample"
    # and where both are valid the computed alpha is identical
    both = v1 & v4
    a1 = np.asarray(out1["raw_alpha"])[both]
    a4 = np.asarray(out4["raw_alpha"])[both]
    np.testing.assert_allclose(a1, a4, rtol=1e-6, atol=1e-6)


def test_chunked_active_pipeline_matches_single(monkeypatch):
    """Budgets above the safe single-fusion size run the active feature
    pipeline as a lax.scan over equal chunks (tineuvox._run_active_pipeline,
    the regalloc-RET_CHECK mitigation); output and parameter gradients must
    be identical to the unchunked program."""
    cfg, params, ro, rd, vd, t = _setup()
    G = 4
    S = cfg.max_steps(0.5)
    N = ro.shape[0]
    occ = jnp.ones(tuple(cfg.world_size), bool)
    budget = N * (-(-S // G)) * G

    def loss(p, cfg_):
        out = _fwd(cfg_, p, ro, rd, vd, t, occ, budget)
        return (out["rgb_marched"] ** 2).mean(), out

    cfg4 = dataclasses.replace(cfg, occ_group=G)
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params, cfg4)
    # force chunking: every active block larger than 64 samples scans
    monkeypatch.setenv("APNERF_MAX_SINGLE_BUDGET", "64")
    assert tineuvox._active_chunks(budget) > 1, "test must exercise chunking"
    (l2, out2), g2 = jax.value_and_grad(loss, has_aux=True)(params, cfg4)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["rgb_marched"]),
                               np.asarray(out2["rgb_marched"]),
                               rtol=1e-6, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
