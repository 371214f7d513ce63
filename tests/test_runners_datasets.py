"""Tests for sequence runners and dataset adapters (fabricated fixtures)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.datasets import euroc, kitti
from epivo_tpu.geometry import camera, se3
from epivo_tpu.pipeline import runners
from epivo_tpu.pipeline.config import (
    BAConfig, FrontendConfig, LMConfig, RansacConfig, VOConfig,
)
from tests.test_pipeline import render


CAM = camera.Pinhole(fx=200.0, fy=200.0, cx=80.0, cy=60.0, width=160, height=120)
VO_CFG = VOConfig(
    camera=CAM,
    frontend=FrontendConfig(fast_threshold=15.0, max_keypoints=128, klt_levels=3),
    ransac=RansacConfig(n_hyp=256),
    lm=LMConfig(n_points=32, revert_r_norm=1e-4),
)


def make_sequence(F=6, seed=0):
    """Rendered multi-frame sequence with GT camera-to-world poses."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (140,), minval=6.0, maxval=18.0)
    xy = jax.random.uniform(k2, (140, 2), minval=-0.7, maxval=0.7) * z[:, None]
    X = jnp.concatenate([xy, z[:, None]], axis=-1)
    frames, gt = [], [np.eye(4)]
    T_wc = np.eye(4)
    step = np.asarray(se3.se3_exp(jnp.array([0.02, -0.01, 0.35, 0.006, -0.01, 0.004])))
    for f in range(F):
        T_cw = np.linalg.inv(T_wc)  # camera-from-world
        frames.append(np.asarray(render(X, CAM.K(), jnp.asarray(T_cw), 120, 160)))
        # next camera pose: camera moves by inv(step) in world
        T_wc = T_wc @ np.linalg.inv(step)
        gt.append(T_wc)
    return frames, np.stack(gt[:F])


def test_run_vo_sequence():
    frames, gt = make_sequence(F=6)
    res = runners.run_vo_sequence(frames, VO_CFG, gt_poses=gt, batch=3)
    assert res.trajectory.shape == (6, 4, 4)
    assert res.ate is not None and res.ate < 0.1, res.ate
    assert res.cloud.shape[0] > 50
    assert len(res.cloud_limits) == 5
    assert res.per_frame["n_inliers"].min() > 20


def test_run_vo_sequence_no_gt():
    frames, _ = make_sequence(F=4)
    res = runners.run_vo_sequence(frames, VO_CFG, batch=4)
    assert res.ate is None
    # unit-norm steps
    d = np.linalg.inv(res.trajectory[0]) @ res.trajectory[1]
    np.testing.assert_allclose(np.linalg.norm(d[:3, 3]), 1.0, rtol=1e-4)


def test_run_ba_sequence():
    frames, gt = make_sequence(F=7)
    cfg = BAConfig(
        camera=CAM,
        frontend=VO_CFG.frontend,
        ransac=VO_CFG.ransac,
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )
    res = runners.run_ba_sequence(frames, cfg, gt_poses=gt)
    assert res.trajectory.shape[0] >= 6
    assert res.ate is not None and res.ate < 0.15, res.ate


def test_run_gt_triangulation_sequence():
    """C25 (ref `kitti.cpp:39-188`): triangulation against GT motion must
    reconstruct the actual scene — points land near the true landmarks."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (140,), minval=6.0, maxval=18.0)
    xy = jax.random.uniform(k2, (140, 2), minval=-0.7, maxval=0.7) * z[:, None]
    X_true = np.asarray(jnp.concatenate([xy, z[:, None]], axis=-1))
    frames, gt = make_sequence(F=4)
    res = runners.run_gt_triangulation_sequence(frames, VO_CFG, gt_poses=gt)
    # The reference's 1e-2 parallax gate (`kitti_E.cpp:248`) rejects
    # near-epipole points; under this forward-motion fixture only the
    # high-parallax periphery survives.
    assert res.cloud.shape[0] > 20
    np.testing.assert_allclose(res.trajectory, res.gt_trajectory)
    # Every cloud point should be near SOME true landmark (world frame ==
    # frame-0 camera frame in this fixture).
    # Narrow-baseline single-pair triangulation noise floor is
    # z^2/(f*b)*sigma_px ~ 1.0 here; the bound catches frame-convention
    # errors (which offset the cloud by several units), not noise.
    d2 = np.linalg.norm(res.cloud[:, None, :] - X_true[None], axis=-1).min(1)
    assert np.median(d2) < 1.0, np.median(d2)
    assert (d2 < 2.0).mean() > 0.75, (d2 < 2.0).mean()


def test_run_ba_sequence_orb():
    """ORB-matched windowed BA (the reference's really_robust_ass window
    orchestrator, `kitti_ba.cpp:584-754`) recovers the trajectory."""
    frames, gt = make_sequence(F=5)
    cfg = BAConfig(
        camera=CAM,
        frontend=VO_CFG.frontend,
        ransac=VO_CFG.ransac,
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )
    res = runners.run_ba_sequence(frames, cfg, gt_poses=gt, use_orb=True)
    assert res.trajectory.shape[0] >= 4
    assert res.ate is not None and res.ate < 0.3, res.ate


def make_varying_sequence(F=7, seed=0):
    """Rendered sequence whose per-step translation magnitudes VARY —
    the fixture for no-GT scale recovery (a constant-speed sequence would
    hide scale-chaining bugs)."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (140,), minval=6.0, maxval=18.0)
    xy = jax.random.uniform(k2, (140, 2), minval=-0.7, maxval=0.7) * z[:, None]
    X = jnp.concatenate([xy, z[:, None]], axis=-1)
    mags = np.array([0.35, 0.2, 0.5, 0.3, 0.45, 0.25][: F - 1])
    R_step = np.asarray(se3.so3_exp(jnp.array([0.006, -0.01, 0.004])))
    t_dir = np.array([0.06, -0.03, 0.997])
    t_dir /= np.linalg.norm(t_dir)
    frames, gt = [], []
    T_wc = np.eye(4)
    for f in range(F):
        T_cw = np.linalg.inv(T_wc)
        frames.append(np.asarray(render(X, CAM.K(), jnp.asarray(T_cw), 120, 160)))
        gt.append(T_wc)
        if f < F - 1:
            step = np.eye(4)
            step[:3, :3] = R_step
            step[:3, 3] = t_dir * mags[f]
            T_wc = T_wc @ np.linalg.inv(step)
    return frames, np.stack(gt), mags


def test_run_ba_sequence_no_gt_preserves_scale_ratios():
    """Without GT, windowed BA must recover per-step scale RATIOS: the
    joint LM fixes them inside windows, boundary depth-ratio chaining
    carries them across windows (VERDICT r1 item 4; ref scheme
    `kitti_ba.cpp:853-870,896-903`).

    The fixture's speed profile alternates by up to 2.5x BETWEEN
    CONSECUTIVE FRAMES — deliberately unphysical stress for the ratio
    mechanism, so the two defaults that by design treat isolated >1.5x
    speed jumps as measurement catastrophes are adapted here, exactly as
    a deployment with genuinely aggressive per-frame dynamics would:
    the Hampel gate is disabled and the scale-graph's constant-speed
    prior is weakened (graph_prior_sigma 0.10 -> 0.5; the config
    documents this as the aggressive-dynamics knob). Their default
    behaviors are covered in test_scale.py."""
    from epivo_tpu.pipeline.config import ScaleConfig

    frames, _, mags = make_varying_sequence(F=7)
    cfg = BAConfig(
        camera=CAM,
        frontend=VO_CFG.frontend,
        ransac=VO_CFG.ransac,
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
        scale=ScaleConfig(chain_hampel_ratio=0.0, graph_prior_sigma=0.5,
                          graph_cut=2.0),
    )
    res = runners.run_ba_sequence(frames, cfg, gt_poses=None)
    traj = res.trajectory
    n = min(len(mags), traj.shape[0] - 1)
    step_norms = np.array([
        np.linalg.norm((np.linalg.inv(traj[i]) @ traj[i + 1])[:3, 3])
        for i in range(n)
    ])
    # Per-step scale ratios |t_{j+1}| / |t_j| — the quantity the chain
    # estimates per link (errors compound multiplicatively downstream, as
    # in any monocular VO, so the cumulative bound is looser).
    link = step_norms[1:] / step_norms[:-1]
    gt_link = mags[1:n] / mags[: n - 1]
    np.testing.assert_allclose(link, gt_link, rtol=0.3)
    np.testing.assert_allclose(step_norms / step_norms[0],
                               mags[:n] / mags[0], rtol=0.6)


# ---------- dataset adapters on fabricated fixtures ----------


def fake_kitti(tmp_path, F=4):
    root = tmp_path / "kitti"
    seq = root / "sequences" / "00" / "image_0"
    os.makedirs(seq)
    os.makedirs(root / "poses")
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(F):
        arr = (rng.uniform(0, 255, (37, 61))).astype(np.uint8)
        Image.fromarray(arr, "L").save(seq / f"{i:06d}.png")
    with open(root / "sequences" / "00" / "calib.txt", "w") as f:
        P = "7.18856e+02 0 6.071928e+02 0 0 7.18856e+02 1.852157e+02 0 0 0 1 0"
        P1 = "7.18856e+02 0 6.071928e+02 -3.861448e+02 0 7.18856e+02 1.852157e+02 0 0 0 1 0"
        f.write(f"P0: {P}\nP1: {P1}\n")
    poses = []
    T = np.eye(4)
    for i in range(F):
        poses.append(" ".join(f"{v:.6e}" for v in T[:3].reshape(-1)))
        T = T.copy()
        T[2, 3] += 1.5
    with open(root / "poses" / "00.txt", "w") as f:
        f.write("\n".join(poses) + "\n")
    return str(root)


def test_kitti_adapter(tmp_path):
    root = fake_kitti(tmp_path)
    seq = kitti.KittiSequence(root=root, seq="00")
    assert seq.exists()
    assert seq.n_frames() == 4
    img = seq.load_image(0)
    assert img.shape == (37, 61) and img.dtype == np.float32
    intr = seq.intrinsics()
    np.testing.assert_allclose(intr.fx, 718.856, rtol=1e-5)
    poses = seq.load_poses()
    assert poses.shape == (4, 4, 4)
    scales = kitti.gt_step_scales(poses)
    np.testing.assert_allclose(scales, 1.5, rtol=1e-5)
    T_lr = seq.stereo_baseline_T()
    np.testing.assert_allclose(abs(T_lr[0, 3]), 3.861448e2 / 7.18856e2, rtol=1e-4)
    frames = list(seq.frames())
    assert len(frames) == 4


def fake_euroc(tmp_path, F=3):
    root = tmp_path / "MH_01_easy"
    cam = root / "mav0" / "cam0"
    os.makedirs(cam / "data")
    gt_dir = root / "mav0" / "state_groundtruth_estimate0"
    os.makedirs(gt_dir)
    from PIL import Image

    rng = np.random.default_rng(1)
    lines = ["#timestamp [ns],filename"]
    for i in range(F):
        ts = 1000000000 + i * 50000000
        fn = f"{ts}.png"
        Image.fromarray(rng.uniform(0, 255, (48, 75)).astype(np.uint8), "L").save(
            cam / "data" / fn
        )
        lines.append(f"{ts},{fn}")
    with open(cam / "data.csv", "w") as f:
        f.write("\n".join(lines) + "\n")
    gt_lines = ["#timestamp, p_RS_R_x [m], ..."]
    for i in range(2 * F):
        ts = 1000000000 + i * 25000000 + 3000
        gt_lines.append(
            f"{ts},{0.1*i},{0.2*i},{0.05*i},1.0,0.0,0.0,0.0,0,0,0,0,0,0,0,0,0"
        )
    with open(gt_dir / "data.csv", "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    return str(root)


def test_euroc_adapter(tmp_path):
    root = fake_euroc(tmp_path)
    seq = euroc.EurocSequence(root=root)
    assert seq.exists()
    imgs = seq.image_list()
    assert len(imgs) == 3
    ts, poses = seq.load_gt()
    assert poses.shape[0] == 6
    np.testing.assert_allclose(poses[2, :3, 3], [0.2, 0.4, 0.1])
    ts_c, poses_c = seq.load_gt_cam0()
    assert poses_c.shape == poses.shape
    frames = list(seq.undistorted_frames())
    assert len(frames) == 3
    assert frames[0][1].shape == (48, 75)


def test_euroc_associate():
    ref = np.array([100, 200, 300, 400], np.int64)
    q = np.array([105, 195, 401, 950], np.int64)
    idx = euroc.associate(q, ref, tol_ns=10)
    np.testing.assert_array_equal(idx, [0, 1, 3, -1])


def test_quat_to_R():
    R = euroc.quat_to_R(1.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(R, np.eye(3))
    # 90 deg about z
    R = euroc.quat_to_R(np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_undistort_roundtrip_zero_dist():
    """Zero distortion -> identity remap."""
    mx, my = euroc.undistort_map(euroc.EUROC_CAM0_K, np.zeros(4), (48, 75))
    yy, xx = np.meshgrid(np.arange(48), np.arange(75), indexing="ij")
    np.testing.assert_allclose(mx, xx, atol=1e-9)
    np.testing.assert_allclose(my, yy, atol=1e-9)
    img = np.random.default_rng(0).uniform(0, 255, (48, 75)).astype(np.float32)
    out = euroc.remap(img, mx, my)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_stereo_rectify_row_alignment():
    """Rectified projections of any world point land on the SAME row in
    both cameras, and the rectified rig is a pure -x baseline (the full
    stereo counterpart of the reference's cam0 maps, `euroc.cpp:104-111`)."""
    rng = np.random.default_rng(3)
    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1.0]])
    # cam0 = body; cam1 rotated ~2 deg and offset by an 11 cm-ish baseline.
    th = np.deg2rad(2.0)
    R_mis = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]]) @ np.array(
        [[1, 0, 0], [0, np.cos(th / 2), -np.sin(th / 2)],
         [0, np.sin(th / 2), np.cos(th / 2)]])
    T_BS1 = np.eye(4)
    T_BS1[:3, :3] = R_mis
    T_BS1[:3, 3] = [0.11, 0.002, -0.001]
    maps0, maps1, K_new, T_rig, Rrect0 = euroc.stereo_rectify(
        K, np.zeros(4), np.eye(4), K, np.zeros(4), T_BS1, (120, 160))

    # Pure baseline rig in the KITTI convention.
    assert T_rig[0, 3] < 0
    np.testing.assert_allclose(T_rig[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(T_rig[1:3, 3], 0, atol=1e-12)

    T_rel = np.linalg.inv(T_BS1)  # cam0 -> cam1 (T_BS0 = I)
    Rrect1 = Rrect0 @ T_rel[:3, :3].T
    X = rng.uniform([-2, -2, 4], [2, 2, 12], size=(50, 3))  # body frame
    p0 = (Rrect0 @ X.T).T
    X1 = (T_rel[:3, :3] @ X.T).T + T_rel[:3, 3]
    p1 = (Rrect1 @ X1.T).T
    u0 = (p0 / p0[:, 2:]) @ K_new.T
    u1 = (p1 / p1[:, 2:]) @ K_new.T
    np.testing.assert_allclose(u0[:, 1], u1[:, 1], atol=1e-9)  # same rows
    # Disparity consistent with depth: u0_x - u1_x = fx * b / z.
    b = -T_rig[0, 3]
    np.testing.assert_allclose(u0[:, 0] - u1[:, 0],
                               K_new[0, 0] * b / p0[:, 2], rtol=1e-9)


def test_stereo_rectify_remap_matches_direct_render():
    """Remapping a misaligned camera's image with our rectify maps equals
    rendering directly from the rectified camera (interior pixels)."""
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (120,), minval=5.0, maxval=14.0)
    xy = jax.random.uniform(k2, (120, 2), minval=-0.6, maxval=0.6) * z[:, None]
    X = np.asarray(jnp.concatenate([xy, z[:, None]], axis=-1))  # body frame
    K = np.asarray(CAM.K(), np.float64)
    th = np.deg2rad(1.5)
    R_mis = np.array([[1, 0, 0], [0, np.cos(th), -np.sin(th)],
                      [0, np.sin(th), np.cos(th)]])
    T_BS1 = np.eye(4)
    T_BS1[:3, :3] = R_mis
    T_BS1[:3, 3] = [0.3, 0.01, 0.0]
    H, W = 120, 160
    maps0, maps1, K_new, T_rig, Rrect0 = euroc.stereo_rectify(
        K, np.zeros(4), np.eye(4), K, np.zeros(4), T_BS1, (H, W))
    T_rel = np.linalg.inv(T_BS1)
    Rrect1 = Rrect0 @ T_rel[:3, :3].T

    def pose(Rc, tc):
        T = np.eye(4)
        T[:3, :3] = Rc
        T[:3, 3] = tc
        return jnp.asarray(T.astype(np.float32))

    # Smooth blobs (sigma=3): isolates geometric map error from bilinear
    # interpolation error, which scales with image curvature.
    img0 = np.asarray(render(jnp.asarray(X), jnp.asarray(K),
                             pose(np.eye(3), np.zeros(3)), H, W, sigma=3.0))
    img1 = np.asarray(render(jnp.asarray(X), jnp.asarray(K),
                             pose(T_rel[:3, :3], T_rel[:3, 3]), H, W,
                             sigma=3.0))
    # Rectified views rendered directly.
    rect0_direct = np.asarray(render(jnp.asarray(X), jnp.asarray(K_new),
                                     pose(Rrect0, np.zeros(3)), H, W,
                                     sigma=3.0))
    rect1_direct = np.asarray(render(
        jnp.asarray(X), jnp.asarray(K_new),
        pose(Rrect1 @ T_rel[:3, :3], Rrect1 @ T_rel[:3, 3]), H, W,
        sigma=3.0))

    rect0 = euroc.remap(img0, *maps0)
    rect1 = euroc.remap(img1, *maps1)
    # Interior only: the rectified view's edge pixels can map outside the
    # original field of view (remap fills 0 there, a real-data effect too).
    interior = np.s_[12:-12, 12:-12]
    # Thresholds detect plumbing errors (an x/y swap or off-by-one in the
    # maps shifts whole blobs -> errors ~100+); the small residual is blob
    # shape deformation under the homography + bilinear interpolation,
    # which the exact geometric test above already excludes as map error.
    for rect, direct in ((rect0, rect0_direct), (rect1, rect1_direct)):
        err = np.abs(rect[interior] - direct[interior])
        assert np.quantile(err, 0.999) < 20.0, np.quantile(err, 0.999)
        assert err.mean() < 1.5, err.mean()


def test_euroc_style_rectified_stereo_ba():
    """End-to-end: misaligned stereo rig -> our rectification -> stereo BA
    recovers METRIC scale (the EuRoC stereo path the reference lacks)."""
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (140,), minval=6.0, maxval=18.0)
    xy = jax.random.uniform(k2, (140, 2), minval=-0.7, maxval=0.7) * z[:, None]
    X = np.asarray(jnp.concatenate([xy, z[:, None]], axis=-1))
    K = np.asarray(CAM.K(), np.float64)
    H, W = 120, 160
    th = np.deg2rad(1.0)
    R_mis = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
    T_BS1 = np.eye(4)
    T_BS1[:3, :3] = R_mis
    T_BS1[:3, 3] = [0.5, 0.0, 0.0]
    maps0, maps1, K_new, T_rig, Rrect0 = euroc.stereo_rectify(
        K, np.zeros(4), np.eye(4), K, np.zeros(4), T_BS1, (H, W))
    T_rel = np.linalg.inv(T_BS1)

    step = np.asarray(se3.se3_exp(jnp.array([0.02, -0.01, 0.35, 0.006,
                                             -0.01, 0.004])))
    L, R_imgs, gt = [], [], []
    T_wb = np.eye(4)
    for f in range(4):
        T_bw = np.linalg.inv(T_wb)
        img0 = np.asarray(render(jnp.asarray(X), jnp.asarray(K),
                                 jnp.asarray(T_bw.astype(np.float32)), H, W))
        img1 = np.asarray(render(jnp.asarray(X), jnp.asarray(K),
                                 jnp.asarray((T_rel @ T_bw).astype(np.float32)),
                                 H, W))
        L.append(euroc.remap(img0, *maps0))
        R_imgs.append(euroc.remap(img1, *maps1))
        # GT pose of the RECTIFIED cam0 frame: world-from-cam0' with
        # p_C0 = Rrect0^T p_C0'.
        Text = np.eye(4)
        Text[:3, :3] = Rrect0.T
        gt.append(T_wb @ Text)
        T_wb = T_wb @ np.linalg.inv(step)
    gt = np.stack(gt)

    cfg = BAConfig(
        camera=CAM,
        frontend=VO_CFG.frontend,
        ransac=VO_CFG.ransac,
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )
    res = runners.run_stereo_ba_sequence(L, R_imgs, cfg, T_rig=T_rig,
                                         gt_poses=gt)
    d = np.linalg.norm(np.diff(res.trajectory[:, :3, 3], axis=0), axis=-1)
    gt_d = np.linalg.norm(np.diff(res.gt_trajectory[:, :3, 3], axis=0), axis=-1)
    np.testing.assert_allclose(d, gt_d, rtol=0.3)  # metric scale, no GT fed
    assert res.ate is not None and res.ate < 0.25, res.ate


def make_stereo_sequence(F=4, seed=0, baseline=0.5):
    """Rendered stereo L/R sequences with GT left-camera poses."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (140,), minval=6.0, maxval=18.0)
    xy = jax.random.uniform(k2, (140, 2), minval=-0.7, maxval=0.7) * z[:, None]
    X = jnp.concatenate([xy, z[:, None]], axis=-1)
    T_rig = np.eye(4, dtype=np.float32)
    T_rig[0, 3] = -baseline  # right camera at +x in left frame => X_R = X_L - b
    step = np.asarray(se3.se3_exp(jnp.array([0.02, -0.01, 0.35, 0.006, -0.01, 0.004])))
    L, R, gt = [], [], []
    T_wc = np.eye(4)
    for f in range(F):
        T_cw = np.linalg.inv(T_wc)
        L.append(np.asarray(render(X, CAM.K(), jnp.asarray(T_cw), 120, 160)))
        R.append(np.asarray(render(X, CAM.K(), jnp.asarray(T_rig @ T_cw), 120, 160)))
        gt.append(T_wc)
        T_wc = T_wc @ np.linalg.inv(step)
    return L, R, np.stack(gt), T_rig


def test_run_stereo_ba_sequence():
    L, R, gt, T_rig = make_stereo_sequence(F=4)
    cfg = BAConfig(
        camera=CAM,
        frontend=VO_CFG.frontend,
        ransac=VO_CFG.ransac,
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )
    res = runners.run_stereo_ba_sequence(L, R, cfg, T_rig=T_rig, gt_poses=gt)
    assert res.trajectory.shape[0] >= 3
    # Stereo gives METRIC scale without GT injection: check absolute step
    # lengths against GT (0.35 m-ish forward per frame).
    d = np.linalg.norm(np.diff(res.trajectory[:, :3, 3], axis=0), axis=-1)
    gt_d = np.linalg.norm(np.diff(res.gt_trajectory[:, :3, 3], axis=0), axis=-1)
    np.testing.assert_allclose(d, gt_d, rtol=0.25)
    assert res.ate is not None and res.ate < 0.2, res.ate


@pytest.mark.slow
def test_extract_pairs_orb_fallback_recovers_turn_pair():
    """Robust-association fallback (ref `really_robust_ass` as a
    FALLBACK): on a rotation-dominant turn pair past close structure,
    translation-only KLT locks onto wrong texture offsets (few RANSAC
    inliers, rotation at ~40% of truth — and cv2's LK fails the same
    way, measured); the ORB retry pass replaces the association and
    recovers the rotation."""
    import dataclasses

    import jax

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera as cam_mod
    from epivo_tpu.pipeline import runners, stream
    from epivo_tpu.pipeline.config import (
        FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )

    H, W, f = 188, 1241, 718.856  # horizontal band: full focal => the
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    gt = photoreal.loop_trajectory()
    scene = photoreal.CorridorScene()
    tex = scene.textures()
    rng = np.random.default_rng(7)
    k0 = 80  # mid-turn

    def frame(k):
        return photoreal.render_frame(scene, tex, K, gt[k], H, W,
                                      noise_sigma=2.0, rng=rng)

    frames = [frame(k0), frame(k0 + 1)]
    cam = cam_mod.Pinhole(f, f, W / 2.0, H / 2.0, W, H)
    base = VOConfig(camera=cam,
                    frontend=FrontendConfig(fast_threshold=12.0,
                                            max_keypoints=256, klt_levels=4),
                    ransac=RansacConfig(n_hyp=256), lm=LMConfig(n_points=32))
    T_gt = np.linalg.inv(gt[k0 + 1]) @ gt[k0]

    def ang(R):
        return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))

    off = VOConfig(camera=cam,
                   frontend=dataclasses.replace(base.frontend,
                                                orb_fallback_frac=0.0),
                   ransac=base.ransac, lm=base.lm)
    pd_off = runners._extract_pairs(stream.FrameStream(list(frames)),
                                    [(0, 1)], off, 0, n_points=32, batch=2)
    pd_on = runners._extract_pairs(stream.FrameStream(list(frames)),
                                   [(0, 1)], base, 0, n_points=32, batch=2)
    a_off = ang(np.asarray(pd_off[(0, 1)]["T"])[:3, :3])
    a_on = ang(np.asarray(pd_on[(0, 1)]["T"])[:3, :3])
    a_gt = ang(T_gt[:3, :3])
    # KLT alone under-rotates badly; the fallback recovers it.
    assert a_off < 0.7 * a_gt, (a_off, a_gt)
    assert abs(a_on - a_gt) < 0.2 * a_gt, (a_on, a_gt)
    assert pd_on[(0, 1)]["n_inl"] > 2 * pd_off[(0, 1)]["n_inl"]
