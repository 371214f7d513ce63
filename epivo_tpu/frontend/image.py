"""Image utilities: bilinear sampling, gradients, pyramids.

Shared by the detector/tracker kernels. Pure-JAX reference implementations;
the hot paths have Pallas variants (see ``epivo_tpu/frontend/pallas_kernels.py``)
selected automatically on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W] at subpixel positions xy [..., 2] (x, y order).

    Out-of-bounds coordinates clamp to the border (matching OpenCV's
    BORDER_REPLICATE default used by calcOpticalFlowPyrLK's gather).
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0.astype(img.dtype)
    fy = y - y0.astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def patch_coords(center: jnp.ndarray, size: int) -> jnp.ndarray:
    """[..., 2] centers -> [..., size, size, 2] sample coordinates (x, y)."""
    r = (size - 1) / 2.0
    offs = jnp.arange(size, dtype=center.dtype) - r
    ox, oy = jnp.meshgrid(offs, offs)  # [size, size] each; ox varies along x
    grid = jnp.stack([ox, oy], axis=-1)  # [size, size, 2]
    return center[..., None, None, :] + grid


def extract_patch(img: jnp.ndarray, center: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear patch extraction: [H,W] x [...,2] -> [..., size, size]."""
    return bilinear_sample(img, patch_coords(center, size))


def _sep_conv3(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Separable 3-tap convolution with edge padding: kx along x, ky along y."""
    H, W = img.shape
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    h = sum(p[:, i : i + W] * kx[i] for i in range(3))  # [H+2, W]
    return sum(h[i : i + H, :] * ky[i] for i in range(3))  # [H, W]


def scharr_gradients(img: jnp.ndarray):
    """(Ix, Iy) via the 3x3 Scharr operator (what OpenCV's LK derivative
    pyramid uses), normalized so a unit ramp has unit gradient."""
    s = jnp.array([3.0, 10.0, 3.0], img.dtype) / 16.0
    d = jnp.array([-1.0, 0.0, 1.0], img.dtype) * 0.5
    Ix = _sep_conv3(img, d, s)
    Iy = _sep_conv3(img, s, d)
    return Ix, Iy


def central_gradients(img: jnp.ndarray):
    """Simple central-difference gradients (cheap, adequate for LK)."""
    Ix = jnp.zeros_like(img)
    Iy = jnp.zeros_like(img)
    Ix = Ix.at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    Iy = Iy.at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)
    return Ix, Iy


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x downsample: 5-tap binomial blur + stride-2 subsample
    (the construction cv::buildOpticalFlowPyramid uses).

    Decimation is FUSED into the blur: only the even-phase outputs are ever
    computed, via phase-split reshapes (never ``[::2]`` strided slices — a
    stride-2 slice along the lane dimension forces an expensive relayout on
    TPU, while the phase reshape lowers to a cheap reshuffle). Computing
    blurred values solely at kept pixels does ~2.7x less arithmetic than
    blur-everything-then-decimate (5(HW/2 + HW/4) vs 10HW multiply-adds)
    and the values are bit-identical.
    """
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    H, W = img.shape
    Ho, Wo = (H + 1) // 2, (W + 1) // 2

    # --- vertical blur at even output rows only ---
    # out_v[i] = sum_j k[j] * p[2i + j], p = edge-pad(img, 2) vertically.
    p = jnp.pad(img, ((2, 2 * Ho + 2 - H), (0, 0)), mode="edge")  # [2Ho+4, W]
    ph = p.reshape(Ho + 2, 2, W)
    ph0, ph1 = ph[:, 0], ph[:, 1]  # p[2i], p[2i+1] for i in [0, Ho+2)
    out_v = (
        k[0] * ph0[:Ho] + k[1] * ph1[:Ho]
        + k[2] * ph0[1 : Ho + 1] + k[3] * ph1[1 : Ho + 1]
        + k[4] * ph0[2 : Ho + 2]
    )  # [Ho, W]

    # --- horizontal blur at even output cols only (same phase trick) ---
    q = jnp.pad(out_v, ((0, 0), (2, 2 * Wo + 2 - W)), mode="edge")  # [Ho, 2Wo+4]
    qh = q.reshape(Ho, Wo + 2, 2)
    qh0, qh1 = qh[:, :, 0], qh[:, :, 1]
    return (
        k[0] * qh0[:, :Wo] + k[1] * qh1[:, :Wo]
        + k[2] * qh0[:, 1 : Wo + 1] + k[3] * qh1[:, 1 : Wo + 1]
        + k[4] * qh0[:, 2 : Wo + 2]
    )  # [Ho, Wo]


def build_pyramid(img: jnp.ndarray, levels: int):
    """List of images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr
