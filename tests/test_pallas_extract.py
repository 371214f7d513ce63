"""Correctness of the VMEM-resident window-extraction kernel.

Runs the Pallas kernel in interpret mode (CPU CI) against the reference
``dynamic_slice`` semantics for several window sizes, image sizes, origin
edge cases, and under vmap (the custom batching rule maps batches onto the
kernel grid). On TPU the same kernel runs compiled; ``klt.track``'s pallas
path selects it automatically (klt.py `_extract_windows`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epivo_tpu.frontend.pallas_klt import (
    _extract_windows_batched, extraction_fits_vmem,
)


def _ref(img, oy, ox, S):
    return np.stack([
        np.asarray(img)[y : y + S, x : x + S]
        for y, x in zip(np.asarray(oy), np.asarray(ox))
    ])


@pytest.mark.parametrize("H,W,S,K", [
    (376, 1241, 34, 512),   # KITTI full-res tracking window
    (376, 1241, 46, 512),   # top-level margin-12 window
    (47, 155, 34, 512),     # coarsest pyramid level (origins clamp hard)
    (64, 96, 24, 37),       # tiny image, K not a multiple of the block
])
def test_extract_matches_dynamic_slice(H, W, S, K):
    rng = np.random.default_rng(42)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    oy = jnp.asarray(rng.integers(0, H - S + 1, K).astype(np.int32))
    ox = jnp.asarray(rng.integers(0, W - S + 1, K).astype(np.int32))
    out = _extract_windows_batched(img[None], oy[None], ox[None], S,
                                   interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(out), _ref(img, oy, ox, S))


def test_extract_edges_and_corners():
    H, W, S = 80, 200, 34
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    # Every extreme origin: the four corners and the clamp boundaries.
    oy = jnp.asarray([0, 0, H - S, H - S, 7, 8, 1], jnp.int32)
    ox = jnp.asarray([0, W - S, 0, W - S, 127, 128, 129], jnp.int32)
    out = _extract_windows_batched(img[None], oy[None], ox[None], S,
                                   interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(out), _ref(img, oy, ox, S))


def test_extract_vmap_rule():
    H, W, S, K, B = 60, 150, 24, 16, 3
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    oy = jnp.asarray(rng.integers(0, H - S + 1, (B, K)).astype(np.int32))
    ox = jnp.asarray(rng.integers(0, W - S + 1, (B, K)).astype(np.int32))
    out = _extract_windows_batched(imgs, oy, ox, S, interpret=True)
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(out[b]), _ref(imgs[b], oy[b], ox[b], S)
        )


def test_fits_vmem_guard():
    assert extraction_fits_vmem(376, 1241)       # KITTI: resident
    assert extraction_fits_vmem(480, 752)        # EuRoC: resident
    assert not extraction_fits_vmem(4000, 6000)  # falls back to gather
