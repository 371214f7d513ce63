"""Tests for the photometrically realistic corridor fixture + VO accuracy
on it (VERDICT r1 item 10: accuracy evidence beyond Gaussian blobs)."""

import numpy as np

from epivo_tpu.datasets import photoreal
from epivo_tpu.geometry import camera
from epivo_tpu.pipeline import runners
from epivo_tpu.pipeline.config import (
    FrontendConfig, LMConfig, RansacConfig, VOConfig,
)

H, W = 240, 320
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1.0]])


def test_fixture_has_realistic_photometry():
    frames, gt, _ = photoreal.corridor_sequence(
        8, H=H, W=W, K=K, speed=0.5, exposure_drift=0.2, seed=3)
    frames = list(frames)
    f0 = frames[0]
    # Dense texture: a large fraction of pixels carry gradient energy
    # (blob fixtures are ~97% flat background).
    gx = np.abs(np.diff(f0, axis=1))
    assert (gx > 2.0).mean() > 0.4, (gx > 2.0).mean()
    # Occlusion/depth edges: strong gradients exist too.
    assert gx.max() > 50
    # Exposure drift: mean brightness moves across the sequence.
    means = np.array([f.mean() for f in frames])
    assert np.ptp(means) > 3.0, means
    # Frames differ (sensor noise + motion), no degenerate repeats.
    assert np.abs(frames[0] - frames[1]).mean() > 1.0


def test_vo_on_photoreal_corridor():
    """Full VO pipeline on the textured corridor: ATE small relative to
    trajectory length despite exposure drift, noise, and occlusions."""
    F = 14
    frames, gt, _ = photoreal.corridor_sequence(
        F, H=H, W=W, K=K, speed=0.5, exposure_drift=0.15, noise_sigma=2.0,
        seed=1)
    cam = camera.Pinhole(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2,
                         width=W, height=H)
    cfg = VOConfig(
        camera=cam,
        frontend=FrontendConfig(fast_threshold=20.0, max_keypoints=256,
                                klt_levels=3),
        ransac=RansacConfig(n_hyp=256),
        lm=LMConfig(n_points=48),
    )
    res = runners.run_vo_sequence(frames, cfg, gt_poses=gt, batch=7)
    length = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1))
    assert res.ate is not None
    assert res.ate < 0.02 * length, (res.ate, length)  # <2% of trajectory
    assert res.per_frame["n_inliers"].min() > 50
