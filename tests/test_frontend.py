"""Tests for the image frontend: FAST detection and pyramidal LK tracking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.frontend import fast, image as imops, klt


def checker_corners(H=64, W=96, cell=16):
    """A checkerboard has corners at every cell intersection."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (((yy // cell) + (xx // cell)) % 2).astype(np.float32) * 255.0
    return jnp.asarray(img)


def blob_image(H=96, W=128, centers=((30, 40), (60, 90), (20, 100)), sigma=2.0):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.zeros((H, W), np.float32)
    for cy, cx in centers:
        img += 255.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
    return jnp.asarray(img)


def test_bilinear_sample_exact_on_grid():
    img = jnp.arange(24.0).reshape(4, 6)
    xy = jnp.array([[2.0, 1.0], [0.0, 0.0], [5.0, 3.0]])
    out = imops.bilinear_sample(img, xy)
    np.testing.assert_allclose(np.asarray(out), [8.0, 0.0, 23.0], atol=1e-4)


def test_bilinear_sample_interpolates():
    img = jnp.array([[0.0, 2.0], [4.0, 6.0]])
    out = imops.bilinear_sample(img, jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(out), [3.0])


def test_downsample_shape_and_smoothing():
    img = checker_corners()
    small = imops.downsample2(img)
    assert small.shape == (32, 48)
    assert float(jnp.max(small)) <= 255.0 + 1e-3


def test_fast_detects_blob_corners():
    img = blob_image()
    kp = fast.detect(img, threshold=20.0, max_keypoints=64)
    pts = np.asarray(kp.xy[kp.valid])
    assert pts.shape[0] >= 3
    # Each blob center should have a detection within a few pixels.
    for cy, cx in [(30, 40), (60, 90), (20, 100)]:
        d = np.min(np.hypot(pts[:, 0] - cx, pts[:, 1] - cy))
        assert d < 4.0, (cy, cx, d)


def test_fast_no_detections_on_flat():
    img = jnp.full((64, 64), 128.0)
    kp = fast.detect(img, threshold=10.0, max_keypoints=32)
    assert not bool(jnp.any(kp.valid))


def test_fast_border_excluded():
    img = blob_image()
    kp = fast.detect(img, threshold=5.0, max_keypoints=256)
    pts = np.asarray(kp.xy)[np.asarray(kp.valid)]
    H, W = img.shape
    assert np.all(pts[:, 0] >= 3) and np.all(pts[:, 0] < W - 3)
    assert np.all(pts[:, 1] >= 3) and np.all(pts[:, 1] < H - 3)


def test_fast_fixed_budget_shapes():
    img = blob_image()
    kp = jax.jit(lambda im: fast.detect(im, 20.0, 128))(img)
    assert kp.xy.shape == (128, 2)
    assert kp.valid.shape == (128,)


def test_top_k_two_stage_matches_exact_on_nms_maps():
    """The blockwise top-k equals exact top-k on NMS-sparse score maps
    (what detect() actually feeds it)."""
    rng = np.random.default_rng(7)
    H, W = 376, 600
    s = np.zeros((H, W), np.float32)
    n = 2500
    ys = rng.integers(3, H - 3, n)
    xs = rng.integers(3, W - 3, n)
    s[ys, xs] = rng.uniform(1, 100, n)
    sj = jnp.asarray(s)
    exact = fast.top_k_keypoints(sj, 512, two_stage=False)
    two = fast.top_k_keypoints(sj, 512, two_stage=True)
    se = set(map(tuple, np.asarray(exact.xy)[np.asarray(exact.valid)].astype(int)))
    st = set(map(tuple, np.asarray(two.xy)[np.asarray(two.valid)].astype(int)))
    assert se == st
    np.testing.assert_allclose(np.sort(np.asarray(exact.score)),
                               np.sort(np.asarray(two.score)))


def _shifted_pair(shift=(3.0, 2.0), H=96, W=128, seed=0):
    """Smooth random texture and its subpixel-shifted copy."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(H + 16, W + 16)).astype(np.float32)
    # Smooth for good gradients
    from scipy.ndimage import gaussian_filter, shift as ndi_shift

    base = gaussian_filter(base, 3.0) * 400.0
    src = base[8 : 8 + H, 8 : 8 + W]
    # ndi_shift(input, s): output[i] = input[i - s], i.e. content moves BY s.
    shifted = ndi_shift(base, (shift[1], shift[0]), order=3)
    tgt = shifted[8 : 8 + H, 8 : 8 + W]
    return jnp.asarray(src), jnp.asarray(tgt)


def test_klt_recovers_translation():
    shift = (3.0, 2.0)
    src, tgt = _shifted_pair(shift)
    pts = jnp.array(
        [[40.0, 40.0], [60.0, 30.0], [80.0, 60.0], [30.0, 70.0]], jnp.float32
    )
    res = klt.track(src, tgt, pts, levels=3)
    assert bool(jnp.all(res.status)), np.asarray(res.err)
    flow = np.asarray(res.xy - pts)
    np.testing.assert_allclose(flow[:, 0], shift[0], atol=0.25)
    np.testing.assert_allclose(flow[:, 1], shift[1], atol=0.25)


def test_klt_large_motion_needs_pyramid():
    shift = (11.0, -7.0)
    src, tgt = _shifted_pair(shift, seed=1)
    pts = jnp.array([[50.0, 50.0], [70.0, 40.0]], jnp.float32)
    res = klt.track(src, tgt, pts, levels=4)
    flow = np.asarray(res.xy - pts)
    np.testing.assert_allclose(flow[:, 0], shift[0], atol=0.5)
    np.testing.assert_allclose(flow[:, 1], shift[1], atol=0.5)


def test_klt_flat_region_rejected():
    src = jnp.full((64, 64), 100.0)
    tgt = jnp.full((64, 64), 100.0)
    pts = jnp.array([[32.0, 32.0]], jnp.float32)
    res = klt.track(src, tgt, pts)
    assert not bool(res.status[0])


def test_klt_jit():
    src, tgt = _shifted_pair((1.0, 1.0), seed=2)
    pts = jnp.array([[40.0, 40.0]], jnp.float32)
    fn = jax.jit(lambda a, b, p: klt.track(a, b, p, levels=2))
    res = fn(src, tgt, pts)
    assert res.xy.shape == (1, 2)


def test_downsample_reshape_equals_strided_slice():
    """downsample2's reshape decimation == blur + [::2, ::2] (to float
    rounding: XLA may fuse the two formulations with different summation
    order), including odd dimensions."""
    rng = np.random.default_rng(5)
    for H, W in [(376, 1241), (37, 41), (16, 16), (9, 130)]:
        img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
        k5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
        p = jnp.pad(img, ((2, 2), (2, 2)), mode="edge")
        h = sum(p[:, i : i + W] * k5[i] for i in range(5))
        v = sum(h[i : i + H, :] * k5[i] for i in range(5))
        old = v[::2, ::2]
        new = imops.downsample2(img)
        assert new.shape == old.shape
        np.testing.assert_allclose(
            np.asarray(old), np.asarray(new), atol=1e-6, rtol=0
        )


def test_shift_select_matches_gather():
    """klt._shift_select == per-lane dynamic slice for every offset."""
    from epivo_tpu.frontend import klt

    rng = np.random.default_rng(6)
    L, K, out_len = 34, 16, 22
    n_off = L - out_len + 1
    v = jnp.asarray(rng.normal(size=(L, 5, K)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_off, size=(K,)).astype(np.int32))
    got = klt._shift_select(v, idx, out_len, n_off, axis=0)
    want = np.stack(
        [np.asarray(v)[int(idx[k]) : int(idx[k]) + out_len, :, k]
         for k in range(K)], axis=-1,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
