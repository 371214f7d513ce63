"""Pinhole camera models and coordinate normalization.

Replaces the reference's scattered hardcoded intrinsics and inline K^-1
multiplications (`kitti_E.cpp:38-45,181-182`, `kitti_ba.cpp:1072-1078,838-845`,
`euroc.cpp:92-101`) with one dataclass + batched ops.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Pinhole:
    """Pinhole intrinsics. Distortion handled separately (see datasets.euroc)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 0
    height: int = 0

    def K(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )

    def K_inv(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.array(
            [
                [1.0 / self.fx, 0.0, -self.cx / self.fx],
                [0.0, 1.0 / self.fy, -self.cy / self.fy],
                [0.0, 0.0, 1.0],
            ],
            dtype=dtype,
        )

    @staticmethod
    def from_K(K: np.ndarray, width: int = 0, height: int = 0) -> "Pinhole":
        return Pinhole(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
            width=width, height=height,
        )


# KITTI odometry grayscale intrinsics (seq 00-02; ref `kitti_E.cpp:38-40`).
KITTI_00 = Pinhole(fx=718.8560, fy=718.8560, cx=607.1928, cy=185.2157,
                   width=1241, height=376)

# EuRoC MAV cam0 pinhole part (ref `euroc.cpp:92-96`).
EUROC_CAM0 = Pinhole(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                     width=752, height=480)


def normalize(pix: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Pixel [..., 2] or homogeneous [..., 3] -> normalized homogeneous [..., 3].

    Equivalent to the reference's `cam_ * p` with `cam_ = K.inverse()`
    (`kitti_E.cpp:181-182`).
    """
    if pix.shape[-1] == 2:
        pix = jnp.concatenate([pix, jnp.ones_like(pix[..., :1])], axis=-1)
    return jnp.einsum("ij,...j->...i", K_inv, pix)


def denormalize(p: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Normalized homogeneous [..., 3] -> pixel [..., 2]."""
    q = jnp.einsum("ij,...j->...i", K, p)
    return q[..., :2] / q[..., 2:3]
