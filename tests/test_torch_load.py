"""torch_load vs real torch.save round-trips (reference artifact compat).

The reference writes ``pcds/canonical.tar`` / ``skeleton.tar`` with
``torch.save`` (reference run.py:1196-1240); apnerf reads them without
torch via utils/torch_load. torch (cpu) is available in the test image, so
these tests write REAL torch archives and assert bit-exact recovery.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from apnerf.utils.torch_load import torch_load


def test_canonical_schema_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    feat = rng.normal(size=(500, 128)).astype(np.float32)
    payload = {
        "pcd": torch.tensor(pts),
        "feat": torch.tensor(feat),
        "raw_feat": torch.tensor(feat[:, :12]),
        "alphas": torch.tensor(rng.random(500).astype(np.float32)),
        "rgbs": torch.tensor(rng.random((500, 3)).astype(np.float32)),
        "xyz_min": torch.tensor(pts.min(0)),
        "xyz_max": torch.tensor(pts.max(0)),
        "voxel_size": torch.tensor(0.0123),
        "t": 0.0,
    }
    p = tmp_path / "canonical.tar"
    torch.save(payload, str(p))
    out = torch_load(str(p))
    assert set(out) == set(payload)
    np.testing.assert_array_equal(out["pcd"], pts)
    np.testing.assert_array_equal(out["feat"], feat)
    assert float(out["voxel_size"]) == pytest.approx(0.0123)
    assert out["t"] == 0.0


def test_skeleton_schema_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    joints = rng.normal(size=(24, 3)).astype(np.float64)
    bones = [(0, 1), (1, 2), (2, 3)]
    payload = {
        "skeleton_pcd": joints,          # reference stores numpy here
        "joints": joints,
        "root": joints[0],
        "bones": bones,
        "pcd": None,
        "weights": None,
        "binary_volume": torch.zeros((4, 4, 4), dtype=torch.bool),
    }
    p = tmp_path / "skeleton.tar"
    torch.save(payload, str(p))
    out = torch_load(str(p))
    np.testing.assert_array_equal(out["joints"], joints)
    assert out["bones"] == bones
    assert out["pcd"] is None
    assert out["binary_volume"].shape == (4, 4, 4)
    assert out["binary_volume"].dtype == np.bool_


def test_dtypes_strides_and_scalars(tmp_path):
    rng = np.random.default_rng(2)
    base = torch.tensor(rng.normal(size=(8, 6)).astype(np.float32))
    payload = {
        "f64": torch.tensor(rng.normal(size=(3, 5))),
        "i64": torch.arange(7),
        "i32": torch.arange(7, dtype=torch.int32),
        "u8": torch.arange(11, dtype=torch.uint8),
        "f16": torch.tensor(rng.normal(size=(4,)).astype(np.float16)),
        "bf16": torch.tensor([1.5, -2.25, 0.125], dtype=torch.bfloat16),
        "scalar0d": torch.tensor(3.5),
        "transposed": base.t(),          # non-contiguous: stride path
        "sliced": base[2:5, 1:4],
        "shared_a": base,                # two views of ONE storage
        "shared_b": base[0],
    }
    p = tmp_path / "mixed.tar"
    torch.save(payload, str(p))
    out = torch_load(str(p))
    for k in ("f64", "i64", "i32", "u8", "f16"):
        np.testing.assert_array_equal(out[k], payload[k].numpy())
    np.testing.assert_array_equal(out["bf16"], [1.5, -2.25, 0.125])
    assert out["bf16"].dtype == np.float32
    assert out["scalar0d"].shape == ()
    np.testing.assert_array_equal(out["transposed"], base.t().numpy())
    np.testing.assert_array_equal(out["sliced"], base[2:5, 1:4].numpy())
    np.testing.assert_array_equal(out["shared_b"], base[0].numpy())


def test_rejects_malicious_global(tmp_path):
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    p = tmp_path / "evil.tar"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(Exception):
        torch_load(str(p))


def test_export_consumes_reference_tars(tmp_path):
    """export_point_cloud seeds stage-2 from reference torch artifacts."""
    import os
    from apnerf.train.export import export_point_cloud

    rng = np.random.default_rng(3)
    pcd_dir = tmp_path / "pcds"
    os.makedirs(pcd_dir)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    torch.save({
        "pcd": torch.tensor(pts),
        "rgbs": torch.tensor(rng.random((300, 3)).astype(np.float32)),
        "feat": torch.tensor(rng.normal(size=(300, 64)).astype(np.float32)),
        "raw_feat": None,
        "alphas": torch.tensor(rng.random(300).astype(np.float32)),
        "t": 0.0,
        "xyz_min": torch.tensor(pts.min(0)),
        "xyz_max": torch.tensor(pts.max(0)),
        "voxel_size": torch.tensor(0.01),
    }, str(pcd_dir / "canonical.tar"))
    joints = rng.normal(size=(4, 3))
    torch.save({
        "skeleton_pcd": joints, "joints": joints, "root": joints[0],
        "bones": [(0, 1), (1, 2), (1, 3)], "pcd": None, "weights": None,
        "binary_volume": None,
    }, str(pcd_dir / "skeleton.tar"))

    # params/model_cfg are unused on this path: artifacts already exist
    art = export_point_cloud(None, None, str(tmp_path), 0.0, 0.5)
    assert art["canonical"]["pcd"].shape == (300, 3)
    assert art["canonical"]["feat"].shape == (300, 64)
    assert art["skeleton"]["bones"] == [[0, 1], [1, 2], [1, 3]]
    assert float(art["canonical"]["voxel_size"]) == pytest.approx(0.01)
