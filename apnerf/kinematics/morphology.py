"""Host-side 3-D morphology: thinning, hole filling, largest component.

Replaces the reference's external deps (skimage.morphology.skeletonize_3d /
remove_small_holes, skimage.filters.gaussian, cc3d.largest_k — see reference
skeletonizer.py:7-14) with a native C++ thinning kernel (ctypes-loaded, built
from native/skeletonize3d.cpp) plus scipy.ndimage morphology.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
from scipy import ndimage

_LIB = None
_LIB_FAILED = False


def _native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_native():
    """Build (if needed) and load the C++ thinning library."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_native_dir(), "skeletonize3d.cpp")
    so = os.path.join(_native_dir(), "libapnerf_skel.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.apnerf_skeletonize3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.apnerf_skeletonize3d.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:  # pragma: no cover
        print(f"morphology: native thinning unavailable ({e}); "
              "falling back to python")
        _LIB_FAILED = True
    return _LIB


def skeletonize_3d(volume: np.ndarray) -> np.ndarray:
    """Medial-axis thinning of a binary volume -> binary skeleton."""
    vol = np.ascontiguousarray(volume.astype(np.uint8))
    lib = _load_native()
    if lib is not None:
        lib.apnerf_skeletonize3d(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            vol.shape[0], vol.shape[1], vol.shape[2], 10000)
        return vol.astype(bool)
    return _skeletonize_python(vol)


def _skeletonize_python(vol: np.ndarray) -> np.ndarray:  # pragma: no cover
    """Pure-python fallback (slow; small volumes only)."""
    from itertools import product
    v = vol.astype(bool)

    def euler_patch(nb):
        vert = np.zeros((4, 4, 4), bool)
        ex = np.zeros((3, 4, 4), bool)
        ey = np.zeros((4, 3, 4), bool)
        ez = np.zeros((4, 4, 3), bool)
        fxy = np.zeros((3, 3, 4), bool)
        fxz = np.zeros((3, 4, 3), bool)
        fyz = np.zeros((4, 3, 3), bool)
        cubes = 0
        for i, j, k in product(range(3), range(3), range(3)):
            if not nb[i, j, k]:
                continue
            cubes += 1
            vert[i:i + 2, j:j + 2, k:k + 2] = True
            ex[i, j:j + 2, k:k + 2] = True
            ey[i:i + 2, j, k:k + 2] = True
            ez[i:i + 2, j:j + 2, k] = True
            fxy[i, j, k:k + 2] = True
            fxz[i, j:j + 2, k] = True
            fyz[i:i + 2, j, k] = True
        return (vert.sum() - (ex.sum() + ey.sum() + ez.sum())
                + (fxy.sum() + fxz.sum() + fyz.sum()) - cubes)

    def neighbourhood(x, y, z):
        nb = np.zeros((3, 3, 3), bool)
        for i, j, k in product(range(-1, 2), repeat=3):
            xx, yy, zz = x + i, y + j, z + k
            if 0 <= xx < v.shape[0] and 0 <= yy < v.shape[1] \
                    and 0 <= zz < v.shape[2]:
                nb[i + 1, j + 1, k + 1] = v[xx, yy, zz]
        return nb

    def deletable(x, y, z, d):
        dx, dy, dz = d
        xx, yy, zz = x + dx, y + dy, z + dz
        if (0 <= xx < v.shape[0] and 0 <= yy < v.shape[1]
                and 0 <= zz < v.shape[2] and v[xx, yy, zz]):
            return False
        # anti-collapse guard: must be >1 voxel thick along d
        xo, yo, zo = x - dx, y - dy, z - dz
        if not (0 <= xo < v.shape[0] and 0 <= yo < v.shape[1]
                and 0 <= zo < v.shape[2] and v[xo, yo, zo]):
            return False
        nb = neighbourhood(x, y, z)
        if nb.sum() - 1 <= 1:
            return False
        before = euler_patch(nb)
        nb[1, 1, 1] = False
        if euler_patch(nb) != before:
            return False
        lab, n = ndimage.label(nb, structure=np.ones((3, 3, 3)))
        return n == 1

    dirs = [(0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0), (1, 0, 0),
            (-1, 0, 0)]
    changed = True
    while changed:
        changed = False
        for d in dirs:
            cand = [tuple(c) for c in np.argwhere(v)
                    if deletable(*tuple(c), d)]
            for c in cand:
                if deletable(*c, d):
                    v[c] = False
                    changed = True
    return v


def gaussian(volume, sigma, preserve_range=True):
    return ndimage.gaussian_filter(np.asarray(volume, np.float64), sigma)


def remove_small_holes(binary, area_threshold=256):
    """Fill background cavities smaller than ``area_threshold`` voxels."""
    bg = ~binary.astype(bool)
    lab, n = ndimage.label(bg)  # 6-connectivity for holes
    if n == 0:
        return binary.astype(bool)
    sizes = ndimage.sum_labels(np.ones_like(lab), lab, np.arange(1, n + 1))
    border_labels = set(np.unique(np.concatenate([
        lab[0].ravel(), lab[-1].ravel(), lab[:, 0].ravel(),
        lab[:, -1].ravel(), lab[:, :, 0].ravel(), lab[:, :, -1].ravel()])))
    out = binary.astype(bool).copy()
    for lbl in range(1, n + 1):
        if lbl in border_labels:
            continue
        if sizes[lbl - 1] < area_threshold:
            out[lab == lbl] = True
    return out


def largest_component(binary, connectivity=26):
    """Keep the largest connected component (cc3d.largest_k(k=1) analogue)."""
    structure = np.ones((3, 3, 3)) if connectivity == 26 else None
    lab, n = ndimage.label(binary.astype(bool), structure=structure)
    if n <= 1:
        return binary.astype(bool)
    sizes = ndimage.sum_labels(np.ones_like(lab), lab, np.arange(1, n + 1))
    return lab == (np.argmax(sizes) + 1)


def preprocess_volume(alpha_volume, threshold, sigma=1):
    """Gaussian smooth -> threshold -> fill holes -> largest CC (reference
    run.py:1133-1140 / skeletonizer.py:191-207)."""
    vol = np.asarray(alpha_volume, np.float64)
    if sigma > 0:
        vol = gaussian(vol, sigma)
    binary = vol > threshold
    binary = remove_small_holes(binary, area_threshold=2 ** 8)
    return largest_component(binary, connectivity=26)
