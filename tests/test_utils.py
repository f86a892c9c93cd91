"""Sampler / curriculum / optimizer-schedule unit tests."""
import numpy as np
import jax
import jax.numpy as jnp

from apnerf.utils.samplers import (InverseProportionalSampler,
                                   curriculum_range, curriculum_window)
from apnerf.train.masked_adam import create_optimizer


def test_inverse_proportional_sampler_prefers_unvisited():
    s = InverseProportionalSampler(4, seed=0)
    for _ in range(50):
        s.sample(0, 4)
    counts = s.counts
    # counts equalise (within a margin) because probability ~ 1/count
    assert counts.max() / counts.min() < 2.0


def test_curriculum_range_growth():
    # canonical at index 0: window grows upward only (underflow shifted up)
    assert curriculum_range(0, 10, 2) == (2, 0)
    assert curriculum_range(0, 10, 10) == (10, 0)
    # canonical in the middle
    t_max, t_min = curriculum_range(5, 10, 4)
    assert t_min <= 5 <= t_max
    # full window
    assert curriculum_window(10 ** 9, 10, 100, 0) == (10, 0)


def test_masked_adam_lr_groups_and_decay():
    params = {
        "feature": jnp.ones((4, 3)),
        "rgbnet": {"layers": [{"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}]},
        "frozen_thing": jnp.ones(3),
    }
    cfg = {"lrate_feature": 0.1, "lrate_rgbnet": 0.01, "lrate_decay": 1,
           "skip_zero_grad_fields": ["feature"]}
    opt = create_optimizer(params, cfg)
    st = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # zero-grad rows of the masked field stay untouched
    grads["feature"] = grads["feature"].at[0].set(0.0)
    new_params, st = opt.update(grads, st, params)
    f = np.asarray(new_params["feature"])
    np.testing.assert_allclose(f[0], 1.0)            # masked row unchanged
    assert (f[1:] < 1.0).all()                        # others stepped
    # frozen param untouched
    np.testing.assert_allclose(np.asarray(new_params["frozen_thing"]), 1.0)
    # lr decays by 0.1 ** (1/1000) per step
    p1, st = opt.update(grads, st, new_params)
    step1 = 1.0 - f[1, 0]
    step2 = f[1, 0] - np.asarray(p1["feature"])[1, 0]
    # Adam steps are ~lr-sized once moments warm up; just check monotone decay
    assert step2 < step1 * 1.05


def test_masked_adam_matches_reference_adam_unmasked():
    """Bias-corrected update must match the textbook Adam the CUDA kernel
    implements (lib/cuda/adam_upd_kernel.cu:8-30)."""
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(5).astype(np.float32)
    g = rng.standard_normal(5).astype(np.float32)
    params = {"x": jnp.asarray(p0)}
    cfg = {"lrate_x": 1e-2, "lrate_decay": 1e9,
           "skip_zero_grad_fields": []}
    opt = create_optimizer(params, cfg)
    st = opt.init(params)
    p, m, v = p0.copy(), np.zeros(5), np.zeros(5)
    cur = params
    for t in range(1, 4):
        cur, st = opt.update({"x": jnp.asarray(g)}, st, cur)
        m = 0.9 * m + 0.1 * g
        v = 0.99 * v + 0.01 * g * g
        step_size = 1e-2 * np.sqrt(1 - 0.99 ** t) / (1 - 0.9 ** t)
        p = p - step_size * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(cur["x"]), p, rtol=1e-4, atol=1e-6)


def test_tineuvox_kwargs_roundtrip_covers_all_fields():
    """get_kwargs must reconstruct the EXACT config — a dropped field means
    mid-stage resume silently changes the execution config (mlp_bf16 and
    occ_group were missing)."""
    import dataclasses
    from apnerf.models.tineuvox import TiNeuVoxConfig
    cfg = TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3, mlp_bf16=True, occ_group=8)
    rt = TiNeuVoxConfig(**cfg.get_kwargs())
    assert rt == cfg
    fields = {f.name for f in dataclasses.fields(TiNeuVoxConfig)}
    assert fields == set(cfg.get_kwargs()), \
        fields ^ set(cfg.get_kwargs())
