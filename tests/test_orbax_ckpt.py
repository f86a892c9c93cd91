"""Sharded checkpoint save/restore across a mesh-shape change.

SURVEY.md §5.4 TPU plan: orbax checkpoints with resharding restore — the
elastic-resume path the pickle checkpoints (single-host) cannot provide.
Runs on the conftest-provisioned 8-virtual-CPU-device backend.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices")


def _mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("rays",))


def test_save_on_8_restore_on_4(tmp_path):
    from apnerf.utils.orbax_ckpt import save_sharded, load_sharded

    mesh8 = _mesh(8)
    sharded8 = NamedSharding(mesh8, P("rays"))
    repl8 = NamedSharding(mesh8, P())

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    tree = {
        "params": {"w": jax.device_put(w, repl8)},
        "batch_stats": jax.device_put(batch, sharded8),
    }
    path = str(tmp_path / "ckpt")
    save_sharded(path, tree, step=123)

    # resume on a 4-device mesh with different shardings
    mesh4 = _mesh(4)
    like = {
        "params": {"w": NamedSharding(mesh4, P())},
        "batch_stats": NamedSharding(mesh4, P("rays")),
    }
    out = load_sharded(path, like=like)
    assert int(out["global_step"]) == 123
    np.testing.assert_allclose(np.asarray(out["params"]["w"]),
                               np.asarray(w), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]),
                               np.asarray(batch), rtol=0, atol=0)
    # restored leaves actually live on the 4-device mesh
    assert out["batch_stats"].sharding.mesh.shape["rays"] == 4
    assert len(out["params"]["w"].sharding.device_set) == 4


def test_restore_without_like_gives_numpy(tmp_path):
    from apnerf.utils.orbax_ckpt import save_sharded, load_sharded

    mesh8 = _mesh(8)
    x = jax.device_put(jnp.arange(16.0), NamedSharding(mesh8, P("rays")))
    path = str(tmp_path / "ckpt2")
    save_sharded(path, {"x": x}, step=7)
    out = load_sharded(path)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.arange(16.0))
    assert int(out["global_step"]) == 7
