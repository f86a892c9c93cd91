"""Stage-1 ray microbatching (gradient accumulation) exactness.

The microbatched step exists so large-ray configs stay inside the TPU
compiler's compile envelope (PERF.md round-3 sweep: the 8192-ray zju-scale
single fused program trips the regalloc RET_CHECK); numerically it must be
the full-batch step — every loss term is a per-ray mean over equal-size
microbatches, so mean-of-means == full mean and accumulated grads == the
full-batch grads.
"""
import numpy as np

import jax
import jax.numpy as jnp

from apnerf.models import tineuvox
from apnerf.ops import compaction
from apnerf.train import stage1
from apnerf.train.masked_adam import create_optimizer

from test_parallel_zero1 import _tiny_setup
import pytest

# heavier CPU tier (VERDICT r3 #7): default `pytest -q` stays <3 min
pytestmark = pytest.mark.integration


def _run_steps(cfg_model, params, cfg_train, Ks, poses, batch, n_micro,
               use_occupancy=False, n_steps=3):
    optimizer = create_optimizer(params, cfg_train)
    opt_state = optimizer.init(params)
    kwargs = dict(use_occupancy=use_occupancy, n_micro=n_micro)
    occ = None
    if use_occupancy:
        gd = cfg_model.world_size
        rng = np.random.default_rng(0)
        flags = jnp.asarray(rng.uniform(size=tuple(gd)) < 0.6)
        occ = compaction.build_occupancy_grid(flags)
        kwargs["active_budget"] = 4096
    step = stage1.make_train_step(cfg_model, cfg_train, optimizer, Ks, poses,
                                  32, 32, 0.5, 6.0, 1.0, **kwargs)
    p = params
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(n_steps):
        if use_occupancy:
            p, opt_state, loss, mse = step(p, opt_state, b, jnp.float32(1.0),
                                           occ)
        else:
            p, opt_state, loss, mse = step(p, opt_state, b, jnp.float32(1.0))
        losses.append(float(loss))
    return p, losses


def test_microbatch_matches_full_batch():
    cfg_model, params, cfg_train, Ks, poses, batch = _tiny_setup()
    p1, l1 = _run_steps(cfg_model, params, cfg_train, Ks, poses, batch, 1)
    for n_micro in (2, 4):
        pn, ln = _run_steps(cfg_model, params, cfg_train, Ks, poses, batch,
                            n_micro)
        np.testing.assert_allclose(ln, l1, rtol=1e-5,
                                   err_msg=f"n_micro={n_micro}")
        for k in p1:
            np.testing.assert_allclose(
                np.asarray(jax.tree_util.tree_leaves(pn[k])[0]),
                np.asarray(jax.tree_util.tree_leaves(p1[k])[0]),
                rtol=2e-5, atol=1e-6, err_msg=f"{k} n_micro={n_micro}")


def test_microbatch_matches_full_batch_occupancy():
    # the occupancy path budgets actives PER MICROBATCH; with a budget that
    # never truncates, the compacted pipeline must still match exactly
    cfg_model, params, cfg_train, Ks, poses, batch = _tiny_setup()
    p1, l1 = _run_steps(cfg_model, params, cfg_train, Ks, poses, batch, 1,
                        use_occupancy=True)
    p2, l2 = _run_steps(cfg_model, params, cfg_train, Ks, poses, batch, 2,
                        use_occupancy=True)
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(p2[k])[0]),
            np.asarray(jax.tree_util.tree_leaves(p1[k])[0]),
            rtol=2e-5, atol=1e-6, err_msg=k)
