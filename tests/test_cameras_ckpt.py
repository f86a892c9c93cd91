"""Camera-convention and checkpoint round-trip tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from apnerf.data.rays import pixels_to_rays
from apnerf.ops.rays import get_rays, get_rays_of_a_view


def _torch_reference_rays(H, W, K, c2w, inverse_y, flip_x, flip_y):
    """Independent NumPy port of the torch reference ray generation
    (lib/tineuvox.py:675-703) used as golden data."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64), indexing="xy")
    i = i + 0.5
    j = j + 0.5
    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]
    if inverse_y:
        dirs = np.stack([(i - K[0][2]) / K[0][0], (j - K[1][2]) / K[1][1],
                         np.ones_like(i)], -1)
    else:
        dirs = np.stack([(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1],
                         -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


@pytest.mark.parametrize("inverse_y,flip_x,flip_y", [
    (False, False, False), (True, False, False), (False, True, False),
    (False, False, True), (True, True, True),
])
def test_get_rays_matches_reference_conventions(inverse_y, flip_x, flip_y):
    rng = np.random.default_rng(0)
    H, W = 7, 9
    K = np.array([[50.0, 0, 4.2], [0, 48.0, 3.1], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    c2w[:3, 3] = [0.3, -0.2, 2.0]
    ro, rd = get_rays(H, W, K, c2w, inverse_y=inverse_y, flip_x=flip_x,
                      flip_y=flip_y)
    ro_ref, rd_ref = _torch_reference_rays(H, W, K, c2w, inverse_y, flip_x,
                                           flip_y)
    np.testing.assert_allclose(np.asarray(ro), ro_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("inverse_y,flip_x,flip_y", [
    (False, False, False), (True, False, False), (False, True, True),
])
def test_pixels_to_rays_matches_full_image(inverse_y, flip_x, flip_y):
    """On-device per-pixel ray synthesis == full-image generation."""
    H, W = 6, 8
    K = np.array([[30.0, 0, 4.0], [0, 30.0, 3.0], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 1.0, 3.0]
    ro_full, rd_full, vd_full = get_rays_of_a_view(
        H, W, K, c2w, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
    pix = jnp.arange(H * W, dtype=jnp.int32)
    cam = jnp.zeros_like(pix)
    ro, rd, vd = pixels_to_rays(jnp.asarray(K)[None], jnp.asarray(c2w)[None],
                                cam, pix, H, W, inverse_y=inverse_y,
                                flip_x=flip_x, flip_y=flip_y)
    np.testing.assert_allclose(np.asarray(rd),
                               np.asarray(rd_full).reshape(-1, 3), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vd),
                               np.asarray(vd_full).reshape(-1, 3), rtol=1e-5,
                               atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from apnerf.models import tineuvox
    from apnerf.utils import checkpoint as ckpt

    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck.pkl")
    ckpt.save_checkpoint(path, cfg.get_kwargs(), params, global_step=42)
    payload = ckpt.load_checkpoint(path)
    cfg2 = tineuvox.TiNeuVoxConfig(**payload["model_kwargs"])
    assert cfg2 == cfg
    assert payload["global_step"] == 42
    for k in params:
        a = jax.tree_util.tree_leaves(params[k])
        b = jax.tree_util.tree_leaves(payload["params"][k])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_sharded_render_matches_single_device():
    """Rays-DP forward must be numerically identical to single device
    (SURVEY.md §4 multi-chip test plan)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from apnerf.models import tineuvox

    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("needs >=2 cpu devices")
    cfg = tineuvox.TiNeuVoxConfig(
        xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1), num_voxels=8 ** 3,
        num_voxels_base=8 ** 3, voxel_dim=4, defor_depth=2, net_width=16,
        posbase_pe=2, viewbase_pe=1, timebase_pe=2, gridbase_pe=1,
        alpha_init=1e-3)
    params = tineuvox.init_params(jax.random.PRNGKey(0), cfg)
    params["feature"] = params["feature"] + 0.1
    n_steps = cfg.max_steps(0.5)
    rng = np.random.default_rng(1)
    N = 16
    ro = jnp.asarray(np.zeros((N, 3), np.float32) + [0, 0, 3.0])
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rd = jnp.asarray(d)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    t = jnp.zeros((N, 1))

    def f(params, ro, rd, vd, t):
        return tineuvox.forward(params, cfg, ro, rd, vd, t, 0.5, 6.0, 0.5,
                                1.0, n_steps)["rgb_marched"]

    single = np.asarray(jax.jit(f)(params, ro, rd, vd, t))

    mesh = Mesh(np.array(devices[: min(8, len(devices))]), ("rays",))
    rs = NamedSharding(mesh, P("rays"))
    rep = NamedSharding(mesh, P())
    params_r = jax.device_put(params, rep)
    args_s = [jax.device_put(x, rs) for x in (ro, rd, vd, t)]
    sharded = np.asarray(jax.jit(f)(params_r, *args_s))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
