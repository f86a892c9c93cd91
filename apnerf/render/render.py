"""Image/video rendering + evaluation driver.

Covers reference ``render_viewpoints`` / ``render_repose``
(run.py:80-356): chunked full-image rendering for either model family,
PSNR/SSIM/LPIPS accumulation, results.txt, per-frame PNGs, and the skeleton
overlay on LBS-weight renders.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

import jax.numpy as jnp

from ..data.rays import pixels_to_rays
from . import metrics

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def render_image(render_chunk: Callable, K, c2w, H: int, W: int,
                 chunk: int = 8192, inverse_y=False, flip_x=False,
                 flip_y=False, extra_keys=(), async_out=False):
    """Render one full image by chunking rays through ``render_chunk``.

    ``render_chunk(rays_o, rays_d, viewdirs) -> dict`` with at least
    ``rgb_marched`` [B,3] and ``depth`` [B].

    ``async_out`` (single-dispatch path only): return a zero-arg
    ``finalize() -> result`` closure instead of the result — the device
    render is dispatched but not read back, so the caller can overlap the
    host readback/metrics of one view with the device render of the next
    (the readback rides a slow remote tunnel here).
    """
    n = H * W
    Kd = jnp.asarray(K, jnp.float32)[None]
    cd = jnp.asarray(c2w, jnp.float32)[None]
    image_fn = getattr(render_chunk, "image_fn", None)
    if image_fn is not None:
        # single-dispatch path: device ray-gen + lax.scan over chunks
        # (renderers.make_image_scan); one dispatch per image
        out = image_fn(Kd, cd, H, W, chunk, inverse_y, flip_x, flip_y)

        def finalize():
            result = {}
            for k in ("rgb_marched", "depth") + tuple(extra_keys) + (
                    "joints_2d", "bones"):
                if k not in out or out[k] is None:
                    continue
                v = np.asarray(out[k])
                if k in ("joints_2d", "bones"):
                    result[k] = v
                    continue
                v = v.reshape(-1, *v.shape[2:])[:n]
                result[k] = v.reshape(H, W, *v.shape[1:])
            return result

        return finalize if async_out else finalize()
    outs: Dict[str, list] = {}
    for start in range(0, n, chunk):
        pix = np.arange(start, min(start + chunk, n), dtype=np.int32)
        pad = chunk - len(pix)
        pix_p = np.pad(pix, (0, pad))
        ro, rd, vd = pixels_to_rays(Kd, cd, jnp.zeros(chunk, jnp.int32),
                                    jnp.asarray(pix_p), H, W,
                                    inverse_y=inverse_y, flip_x=flip_x,
                                    flip_y=flip_y)
        res = render_chunk(ro, rd, vd)
        for k in ("rgb_marched", "depth") + tuple(extra_keys):
            if k in res and res[k] is not None:
                v = np.asarray(res[k])[: len(pix)]
                outs.setdefault(k, []).append(v)
    result = {}
    for k, parts in outs.items():
        v = np.concatenate(parts, 0)
        result[k] = v.reshape(H, W, *v.shape[1:])
    return result


def overlay_skeleton(img, joints_2d, bones, inverse_y=False, H=None):
    """Draw bones/joints onto a weight render (reference run.py:228-237)."""
    if cv2 is None or joints_2d is None or bones is None:
        return img
    # plain-int, range-clipped coordinates: cv2 5.x rejects np.int32 scalar
    # tuples and coordinates far outside the canvas
    lim = 4 * max(img.shape[0], img.shape[1])
    pts = np.clip(np.nan_to_num(np.asarray(joints_2d), nan=-lim),
                  -lim, lim).astype(np.int32)
    # force a WRITABLE C-CONTIGUOUS copy: arrays view-converted from jax are
    # read-only, may carry a channel-major device layout (strides like
    # (4W, 4, 4HW)), and cv2 draws in place — np.array's default order='K'
    # preserves the strided layout, which cv2 5.x rejects
    img = np.array(img, copy=True, order="C")
    for bone in bones:
        img = cv2.line(img, (int(pts[bone[0]][0]), int(pts[bone[0]][1])),
                       (int(pts[bone[1]][0]), int(pts[bone[1]][1])),
                       color=(0, 0, 0), thickness=1)
    for j in range(len(pts)):
        img = cv2.circle(img, (int(pts[j][0]), int(pts[j][1])), radius=3,
                         color=(0, 0, 0), thickness=-1)
    return img


def render_viewpoints(render_chunk_for, render_poses, HW, Ks, test_times,
                      gt_imgs=None, savedir=None, render_factor=0,
                      eval_psnr=False, eval_ssim=False, eval_lpips_alex=False,
                      eval_lpips_vgg=False, inverse_y=False, flip_x=False,
                      flip_y=False, chunk=8192, verbose=True,
                      extra_keys=("weights",)):
    """Render a sequence of viewpoints; evaluate if gt given.

    ``render_chunk_for(i, time) -> chunk_fn`` returns the per-view chunk
    renderer (lets callers bind time / camera-conditioned state per view).
    """
    HW = np.copy(np.asarray(HW))
    Ks = np.copy(np.asarray(Ks, np.float32))
    if render_factor != 0:
        HW = HW // render_factor
        Ks[:, :2, :3] = Ks[:, :2, :3] / render_factor

    rgbs, depths, weights = [], [], []
    joints_all, bones = {}, None
    psnrs, ssims, lp_a, lp_v = [], [], [], []

    def dispatch(i):
        """Dispatch view i's render; returns a finalize() closure (the
        single-dispatch path defers the host readback so view i+1's device
        render overlaps view i's readback + metrics)."""
        H, W = int(HW[i][0]), int(HW[i][1])
        chunk_fn = render_chunk_for(i, float(test_times[i]))
        res = render_image(chunk_fn, Ks[i], render_poses[i], H, W,
                           chunk=chunk, inverse_y=inverse_y, flip_x=flip_x,
                           flip_y=flip_y, extra_keys=extra_keys,
                           async_out=getattr(chunk_fn, "image_fn", None)
                           is not None)
        return res if callable(res) else (lambda: res)

    pending = dispatch(0) if len(render_poses) else None
    for i in range(len(render_poses)):
        H, W = int(HW[i][0]), int(HW[i][1])
        nxt = dispatch(i + 1) if i + 1 < len(render_poses) else None
        res = pending()
        pending = nxt
        rgb = res["rgb_marched"]
        rgbs.append(rgb)
        depths.append(res.get("depth", np.zeros((H, W))))
        if "weights" in res:
            weights.append(res["weights"])
        if "joints_2d" in res and res["joints_2d"] is not None:
            j2 = res["joints_2d"]
            if not inverse_y:
                # x mirror with the VIEW's width (the reference uses
                # HW[0,0] — its height — run.py:156, correct only because
                # every shipped dataset renders square images)
                j2 = np.copy(j2)
                j2[:, 0] = (W - 1) - j2[:, 0]
            joints_all[i] = j2
            bones = res.get("bones")

        if gt_imgs is not None and render_factor == 0:
            gt = np.asarray(gt_imgs[i], np.float32)
            if gt.dtype == np.uint8 or gt.max() > 1.5:
                gt = gt / 255.0
            if eval_psnr:
                psnrs.append(metrics.psnr(rgb, gt[..., :3]))
            if eval_ssim:
                ssims.append(metrics.rgb_ssim(rgb, gt[..., :3], max_val=1))
            if eval_lpips_alex:
                lp_a.append(metrics.rgb_lpips(gt[..., :3], rgb, "alex"))
            if eval_lpips_vgg:
                lp_v.append(metrics.rgb_lpips(gt[..., :3], rgb, "vgg"))
        if verbose:
            print(f"render_viewpoints: {i + 1}/{len(render_poses)}")

    if psnrs and savedir is not None:
        with open(os.path.join(savedir, "results.txt"), "w") as f:
            if eval_psnr:
                f.write(f"psnr: {np.mean(psnrs)}\n")
            if eval_ssim:
                f.write(f"ssim: {np.mean(ssims)}\n")
            # metric name is tagged honestly: "lpips_rand_*" when only the
            # seeded-random-feature fallback is available (not comparable
            # to published LPIPS numbers)
            if eval_lpips_vgg:
                f.write(f"{metrics.lpips_metric_name('vgg')}: "
                        f"{np.mean(lp_v)}\n")
            if eval_lpips_alex:
                f.write(f"{metrics.lpips_metric_name('alex')}: "
                        f"{np.mean(lp_a)}\n")

    if savedir is not None:
        import imageio.v2 as imageio
        os.makedirs(savedir, exist_ok=True)
        for i, rgb in enumerate(rgbs):
            imageio.imwrite(os.path.join(savedir, f"img_{i:03d}.png"),
                            metrics.to8b(rgb))
        for i, w in enumerate(weights):
            imageio.imwrite(os.path.join(savedir, f"weights_{i:03d}.png"),
                            metrics.to8b(w))

    # skeleton overlay on the weight renders
    for i in range(len(weights)):
        if i in joints_all and bones is not None:
            weights[i] = overlay_skeleton(weights[i], joints_all[i], bones,
                                          inverse_y=inverse_y)

    out = {
        "rgbs": np.array(rgbs), "depths": np.array(depths),
        "weights": np.array(weights) if weights else np.zeros(0),
        "psnrs": psnrs, "ssims": ssims, "lpips_alex": lp_a, "lpips_vgg": lp_v,
    }
    return out


def write_video(path, frames, fps=30):
    """mp4 via imageio/ffmpeg, else cv2 (mp4v), else animated GIF."""
    import imageio.v2 as imageio
    frames8 = metrics.to8b(frames)
    if frames8.size == 0 or frames8.ndim < 3:
        print(f"write_video: no frames for {path}, skipped")
        return
    if frames8.ndim == 3:
        frames8 = frames8[..., None].repeat(3, -1)
    try:
        imageio.mimwrite(path, frames8, fps=fps, quality=8)
        return
    except (ValueError, ImportError):
        pass
    if cv2 is not None:
        h, w = frames8.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        if vw.isOpened():
            for f in frames8:
                vw.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
            vw.release()
            return
    gif = os.path.splitext(path)[0] + ".gif"
    imageio.mimwrite(gif, frames8, duration=1000.0 / fps, loop=0)
    print(f"write_video: no mp4 backend, wrote {gif}")
