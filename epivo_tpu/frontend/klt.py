"""Pyramidal Lucas-Kanade optical flow, vmapped over keypoints.

TPU-native replacement for the reference's ``calcOpticalFlowPyrLK`` sites
(`kitti_ba.cpp:220-228,296-304`, `kitti_E.cpp:82-95`, `euroc.cpp:189-202`).
Same algorithm and defaults as OpenCV (21x21 window, 3+1 pyramid levels,
30 iterations / 0.01 epsilon termination, min-eigenvalue rejection), but:

- all keypoints advance together as one [K, ...] batch (``vmap``), fixed
  iteration count with masked convergence instead of per-point loops;
- status is a boolean lane, not a compacted vector — downstream consumers
  use masks (ref filters at `kitti_E.cpp:89-95` become mask ANDs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from epivo_tpu.frontend import image as imops


class FlowResult(NamedTuple):
    xy: jnp.ndarray  # [K, 2] tracked positions in the target image
    status: jnp.ndarray  # [K] bool
    err: jnp.ndarray  # [K] mean absolute patch residual


def _track_level(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    pt_src: jnp.ndarray,
    guess: jnp.ndarray,
    win: int,
    iters: int,
    eps: float,
    min_eig: float,
):
    """One pyramid level of LK for a batch of points.

    pt_src: [K, 2] source positions at this level's scale.
    guess: [K, 2] current target-position estimates at this level's scale.
    Returns (new_guess [K,2], ok [K]).
    """
    Ix_full, Iy_full = imops.central_gradients(src)

    def per_point(p0, g0):
        coords = imops.patch_coords(p0, win)  # [win, win, 2]
        T = imops.bilinear_sample(src, coords)
        Ix = imops.bilinear_sample(Ix_full, coords)
        Iy = imops.bilinear_sample(Iy_full, coords)
        Gxx = jnp.sum(Ix * Ix)
        Gxy = jnp.sum(Ix * Iy)
        Gyy = jnp.sum(Iy * Iy)
        det = Gxx * Gyy - Gxy * Gxy
        trace = Gxx + Gyy
        # Smaller eigenvalue of G, normalized per pixel (OpenCV's criterion).
        min_ev = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) / 2.0
        ok_g = min_ev / (win * win) > min_eig
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        def body(carry, _):
            g, done = carry
            P = imops.bilinear_sample(tgt, imops.patch_coords(g, win))
            dI = P - T
            bx = jnp.sum(dI * Ix)
            by = jnp.sum(dI * Iy)
            # delta = -G^-1 b (2x2 closed form)
            dx = -(Gyy * bx - Gxy * by) * inv_det
            dy = -(-Gxy * bx + Gxx * by) * inv_det
            step = jnp.stack([dx, dy])
            g_new = jnp.where(done, g, g + step)
            done_new = done | (jnp.linalg.norm(step) < eps)
            return (g_new, done_new), None

        (g_fin, _), _ = jax.lax.scan(body, (g0, jnp.array(False)), None,
                                     length=iters)
        P_fin = imops.bilinear_sample(tgt, imops.patch_coords(g_fin, win))
        err = jnp.mean(jnp.abs(P_fin - T))
        return g_fin, ok_g, err

    g, okg, err = jax.vmap(per_point)(pt_src, guess)
    return g, okg, err


def track(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    pts: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    win: int = 21,
    levels: int = 4,
    iters: int = 30,
    eps: float = 0.01,
    min_eig: float = 1e-4,
    max_err: float = 1e9,
) -> FlowResult:
    """Track points from src to tgt image. pts [K, 2] (x, y) pixels.

    OpenCV-default-equivalent configuration: winSize 21, maxLevel 3
    (4 levels), 30 iterations, eps 0.01.
    """
    pyr_s = imops.build_pyramid(src, levels)
    pyr_t = imops.build_pyramid(tgt, levels)

    scale_top = 2.0 ** (levels - 1)
    g = pts / scale_top
    ok = jnp.ones(pts.shape[0], bool)
    err = jnp.zeros(pts.shape[0], pts.dtype)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        p_lvl = pts / scale
        g, ok_lvl, err = _track_level(
            pyr_s[lvl], pyr_t[lvl], p_lvl, g, win, iters, eps, min_eig
        )
        ok = ok & ok_lvl
        if lvl > 0:
            g = g * 2.0

    H, W = tgt.shape
    inb = (
        (g[:, 0] >= 0) & (g[:, 0] <= W - 1) & (g[:, 1] >= 0) & (g[:, 1] <= H - 1)
    )
    status = ok & inb & (err < max_err)
    if valid is not None:
        status = status & valid
    return FlowResult(xy=g, status=status, err=err)
