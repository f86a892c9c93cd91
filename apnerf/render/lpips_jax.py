"""Self-contained JAX LPIPS (AlexNet / VGG16 feature architectures).

The reference computes LPIPS through the torch ``lpips`` package
(lib/utils.py:577-589), which downloads pretrained torchvision backbones and
learned linear calibration weights. Neither network access nor those
packages exist in this environment, so this module reimplements the whole
metric in JAX:

* the exact LPIPS v0.1 pipeline: input scaling layer, backbone feature taps
  after each ReLU stage, per-tap channelwise unit normalisation, squared
  difference, non-negative 1x1 linear calibration, spatial mean, sum over
  taps (Zhang et al. 2018);
* official weights are loaded when available — either an ``.npz`` produced
  by :func:`convert_torch_checkpoint`, or the stock ``lpips`` package
  checkpoint (torchvision backbone + ``lin*.model.1.weight``) via torch
  (cpu) — set ``APNERF_LPIPS_WEIGHTS=/path/to/{alex,vgg}.npz`` or pass
  ``weights_path``;
* without weights it falls back to **seeded random features with uniform
  calibration** ("LPIPS-rand"). Randomly initialised backbones are a known
  usable perceptual metric (Zhang et al. 2018, Table 5 "Rand"), but the
  absolute numbers differ from official LPIPS: scores are comparable only
  within this implementation. A warning is printed once.
"""
from __future__ import annotations

import os
import warnings
from functools import partial

import numpy as np

# (out_channels, kernel, stride, pad) per conv; 'M' = 3x3/2 maxpool (alex)
# or 2x2/2 maxpool (vgg). Taps are taken after each ReLU marked 'T'.
_ALEX = [
    (64, 11, 4, 2), "T", ("M", 3, 2),
    (192, 5, 1, 2), "T", ("M", 3, 2),
    (384, 3, 1, 1), "T",
    (256, 3, 1, 1), "T",
    (256, 3, 1, 1), "T",
]
_VGG = [
    (64, 3, 1, 1), (64, 3, 1, 1), "T", ("M", 2, 2),
    (128, 3, 1, 1), (128, 3, 1, 1), "T", ("M", 2, 2),
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "T", ("M", 2, 2),
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "T", ("M", 2, 2),
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "T",
]
_ARCH = {"alex": _ALEX, "vgg": _VGG}
# LPIPS scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_warned_random = set()


def _conv_specs(arch):
    specs, c_in = [], 3
    for item in _ARCH[arch]:
        if isinstance(item, tuple) and item[0] != "M":
            c_out, k, s, p = item
            specs.append((c_in, c_out, k, s, p))
            c_in = c_out
    return specs


def random_params(arch: str, seed: int = 0):
    """Seeded He-initialised backbone + uniform calibration (LPIPS-rand)."""
    rng = np.random.default_rng(seed)
    convs = []
    for c_in, c_out, k, _, _ in _conv_specs(arch):
        fan = c_in * k * k
        w = rng.normal(0, np.sqrt(2.0 / fan),
                       (c_out, c_in, k, k)).astype(np.float32)
        b = np.zeros(c_out, np.float32)
        convs.append((w, b))
    # calibration weights exist only for tapped stages
    lins = [np.full(d, 1.0 / d, np.float32) for d in _tap_dims(arch)]
    return {"convs": convs, "lins": lins}


def _tap_dims(arch):
    dims, c = [], 3
    for item in _ARCH[arch]:
        if isinstance(item, tuple) and item[0] != "M":
            c = item[0]
        elif item == "T":
            dims.append(c)
    return dims


def convert_torch_checkpoint(arch: str, out_path: str):
    """Convert the official lpips-package weights (requires the ``lpips``
    and ``torchvision`` packages with their downloaded checkpoints) into the
    ``.npz`` format this module loads. Run wherever those exist; ship the
    npz."""
    import lpips as lpips_pkg  # pragma: no cover  (needs external env)
    net = lpips_pkg.LPIPS(net=arch, version="0.1").eval()
    payload = {}
    convs = [m for m in net.net.modules()
             if m.__class__.__name__ == "Conv2d"]
    for i, m in enumerate(convs):
        payload[f"conv{i}_w"] = m.weight.detach().numpy()
        payload[f"conv{i}_b"] = m.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        payload[f"lin{i}"] = lin.model[1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **payload)


def load_params(arch: str, weights_path: str | None = None):
    """Load official weights if available, else seeded-random fallback."""
    path = weights_path or os.environ.get("APNERF_LPIPS_WEIGHTS", "")
    if path and os.path.isfile(path):
        z = np.load(path)
        convs, i = [], 0
        while f"conv{i}_w" in z:
            convs.append((z[f"conv{i}_w"].astype(np.float32),
                          z[f"conv{i}_b"].astype(np.float32)))
            i += 1
        lins, i = [], 0
        while f"lin{i}" in z:
            lins.append(np.maximum(z[f"lin{i}"].astype(np.float32), 0.0))
            i += 1
        return {"convs": convs, "lins": lins}
    if arch not in _warned_random:
        _warned_random.add(arch)
        warnings.warn(
            f"LPIPS({arch}): no pretrained weights found (set "
            f"APNERF_LPIPS_WEIGHTS); using seeded-random features — scores "
            f"are self-consistent but not comparable to official LPIPS.")
    return random_params(arch, seed={"alex": 0, "vgg": 1}[arch])


def _features(params, arch, x):
    """Backbone forward; returns the list of tapped activations (NHWC)."""
    import jax
    import jax.numpy as jnp

    taps = []
    ci = 0
    h = x
    for item in _ARCH[arch]:
        if item == "T":
            taps.append(h)
        elif item[0] == "M":
            _, k, s = item
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
                "VALID")
        else:
            _, k, s, p = item
            w, b = params["convs"][ci]
            ci += 1
            # torch OIHW -> HWIO
            w = jnp.asarray(w).transpose(2, 3, 1, 0)
            h = jax.lax.conv_general_dilated(
                h, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu(h + jnp.asarray(b))
    return taps


def _lpips_fn(params, arch, img0, img1):
    import jax.numpy as jnp

    def prep(im):
        x = im * 2.0 - 1.0                       # [0,1] -> [-1,1]
        return (x - _SHIFT) / _SCALE

    f0 = _features(params, arch, prep(img0))
    f1 = _features(params, arch, prep(img1))
    total = 0.0
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        n0 = t0 / jnp.sqrt((t0 ** 2).sum(-1, keepdims=True) + 1e-10)
        n1 = t1 / jnp.sqrt((t1 ** 2).sum(-1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + (d * jnp.asarray(lin)).sum(-1).mean((1, 2))
    return total


_CACHE = {}


def lpips(gt, img, net_name: str = "alex", weights_path: str | None = None):
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    import jax
    import jax.numpy as jnp

    key = (net_name, weights_path)
    if key not in _CACHE:
        params = load_params(net_name, weights_path)
        _CACHE[key] = (params, jax.jit(partial(_lpips_fn, arch=net_name)))
    params, fn = _CACHE[key]
    g = jnp.asarray(np.asarray(gt, np.float32))[None]
    p = jnp.asarray(np.asarray(img, np.float32))[None]
    return float(np.asarray(fn(params, img0=g, img1=p))[0])
