"""Dependency-free reader for reference-produced ``torch.save`` artifacts.

The reference exports stage-1 artifacts as ``pcds/canonical.tar`` /
``pcds/skeleton.tar`` via ``torch.save`` (reference run.py:1196-1240) and
stage-2 consumes them with ``torch.load`` (run.py:463-477). This module
loads those files without torch so reference-produced artifacts can seed
apnerf's stage-2 directly (cross-framework A/B).

Format: torch >= 1.6 writes a (non-compressed) zip archive containing
``<name>/data.pkl`` — a pickle whose tensors are ``persistent_id``
references ``('storage', StorageType, key, location, numel)`` — plus one
raw little-endian buffer per storage under ``<name>/data/<key>``. Tensors
rebuild through ``torch._utils._rebuild_tensor_v2(storage, offset, size,
stride, ...)``; we map that onto a strided numpy view. Tested bit-exact
against real ``torch.save`` output (tests/test_torch_load.py).
"""
from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    # torch >= 1.13 pickles storages as UntypedStorage + dtype in the
    # _rebuild args; the typed names above cover the versions the
    # reference era uses (torch 1.x torch.save default protocol)
}
# bfloat16 storages can't map to a numpy dtype; decode via uint16 + shift
_BF16 = "BFloat16Storage"


class _StorageType:
    """Stand-in for torch.XStorage classes referenced by the pickle."""

    def __init__(self, name):
        self.name = name


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, zf, prefix):
        super().__init__(f)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        if module.startswith("torch"):
            if name.endswith("Storage"):
                return _StorageType(name)
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return lambda data, *a, **k: data
            if name == "Size":
                return tuple
            if name in ("float32", "float64", "float16", "bfloat16",
                        "int64", "int32", "int16", "int8", "uint8", "bool"):
                return name
            raise pickle.UnpicklingError(
                f"unsupported torch global in artifact: {module}.{name}")
        if (module, name) in (("collections", "OrderedDict"),
                              ("builtins", "complex"),
                              ("_codecs", "encode"),  # numpy bytes payloads
                              ("numpy", "ndarray"), ("numpy", "dtype"),
                              ("numpy.core.multiarray", "_reconstruct"),
                              ("numpy.core.multiarray", "scalar"),
                              ("numpy._core.multiarray", "_reconstruct"),
                              ("numpy._core.multiarray", "scalar")):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing non-allowlisted global {module}.{name} in artifact")

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        styp, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        raw = self._zf.read(f"{self._prefix}data/{key}")
        name = styp.name if isinstance(styp, _StorageType) else str(styp)
        if name == _BF16:
            u16 = np.frombuffer(raw, np.uint16, count=numel)
            return (u16.astype(np.uint32) << 16).view(np.float32)
        if name == "UntypedStorage":
            # raw bytes; dtype applied by _rebuild via tensor metadata is
            # not available here — reference artifacts use typed storages
            return np.frombuffer(raw, np.uint8)
        dt = _DTYPES.get(name)
        if dt is None:
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        return np.frombuffer(raw, dt, count=numel)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    arr = np.asarray(storage)
    it = arr.itemsize
    strides = tuple(s * it for s in stride)
    base = arr[storage_offset:]
    if len(size) == 0:
        return base[:1].reshape(()).copy()
    out = np.lib.stride_tricks.as_strided(base, shape=tuple(size),
                                          strides=strides)
    return out.copy()


def torch_load(path):
    """Load a ``torch.save`` zip archive into numpy containers.

    Tensors come back as ``np.ndarray`` (bf16 upcast to fp32); python
    containers/scalars pass through. Raises ``ValueError`` on the legacy
    (pre-1.6 non-zip) format.
    """
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path}: not a zip-format torch archive (legacy torch.save "
            "format is not supported; re-save with torch >= 1.6)")
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next((n for n in names if n.endswith("/data.pkl")), None)
        if pkl is None:
            raise ValueError(f"{path}: no data.pkl in archive")
        prefix = pkl[: -len("data.pkl")]
        with zf.open(pkl) as f:
            return _Unpickler(io.BytesIO(f.read()), zf, prefix).load()
