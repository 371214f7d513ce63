"""Tests for the photometrically realistic corridor fixture + VO accuracy
on it (VERDICT r1 item 10: accuracy evidence beyond Gaussian blobs)."""

import numpy as np
import pytest

from epivo_tpu.datasets import photoreal
from epivo_tpu.geometry import camera
from epivo_tpu.pipeline import runners
from epivo_tpu.pipeline.config import (
    FrontendConfig, LMConfig, RansacConfig, VOConfig,
)

pytestmark = pytest.mark.slow

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


def test_corridor_stereo_sequence_geometry():
    """Stereo corridor: rig convention (right cam at +x => negative
    disparity shift of scene content) and streamed stereo BA recovers
    METRIC scale from the baseline."""
    from epivo_tpu.datasets import photoreal
    from epivo_tpu.eval import metrics as ev
    from epivo_tpu.geometry.camera import Pinhole
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig,
    )

    H, W = 180, 240
    K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1.0]])
    F = 4
    L, R, gt, K_out, T_rig = photoreal.corridor_stereo_sequence(
        F, H=H, W=W, K=K, baseline=0.5, speed=0.4, seed=1)
    assert T_rig[0, 3] == -0.5
    Ls = [np.asarray(f) for f in L]
    Rs = [np.asarray(f) for f in R]
    # A world point at +x appears at smaller u in the right image:
    # cross-correlate a horizontal strip to estimate the disparity sign.
    row = Ls[0][H // 2 + 20]
    rowR = Rs[0][H // 2 + 20]
    best, bests = 0, -1e9
    for s in range(-40, 41):
        a = row[max(0, s):W + min(0, s)]
        b = rowR[max(0, -s):W - max(0, s)]
        n = min(len(a), len(b))
        sc = float(np.corrcoef(a[:n], b[:n])[0, 1])
        if sc > bests:
            best, bests = s, sc
    assert best > 2, (best, bests)  # content shifts left in the right cam

    cam = Pinhole(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, width=W, height=H)
    cfg = BAConfig(
        camera=cam,
        frontend=FrontendConfig(fast_threshold=12.0, max_keypoints=256,
                                klt_levels=3),
        ransac=RansacConfig(n_hyp=256),
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )
    res = runners.run_stereo_ba_sequence(iter(Ls), iter(Rs), cfg,
                                         T_rig=T_rig, n_frames=F)
    gt_aln = np.linalg.inv(gt[0])[None] @ gt[: res.trajectory.shape[0]]
    n = min(len(gt_aln), res.trajectory.shape[0])
    ate = ev.ate_rmse(res.trajectory[:n], gt_aln[:n], align=True,
                      with_scale=False)
    # Metric scale from the rig: absolute step lengths near GT (0.4 m).
    d = np.linalg.norm(np.diff(res.trajectory[:, :3, 3], axis=0), axis=-1)
    gt_d = np.linalg.norm(np.diff(gt_aln[:n, :3, 3], axis=0), axis=-1)
    np.testing.assert_allclose(d, gt_d[: len(d)], rtol=0.35)
    assert ate < 0.3, ate
