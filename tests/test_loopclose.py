"""Loop closure (pipeline/loopclose.py): retrieval, drift spreading, and
the photoreal loop fixture, plus an imagery-level end-to-end check."""

import numpy as np
import pytest

from epivo_tpu.pipeline import loopclose
from epivo_tpu.pipeline.config import LoopConfig


def _rand_signs(rng, n, m, b=256):
    return (rng.integers(0, 2, (n, m, b)) * 2 - 1).astype(np.float32)


def test_retrieval_finds_planted_revisit():
    rng = np.random.default_rng(0)
    N, M = 8, 64
    signs = _rand_signs(rng, N, M)
    # Keyframe 6 revisits keyframe 1: same descriptors, 5% bit noise.
    flips = rng.random((M, 256)) < 0.05
    signs[6] = np.where(flips, -signs[1], signs[1])
    valid = np.ones((N, M), bool)
    scores = np.asarray(loopclose.retrieval_scores(signs, valid, 64.0))
    # Highest off-diagonal score is the planted pair, strongly separated.
    off = scores.copy()
    np.fill_diagonal(off, 0)
    assert off[6, 1] == off.max()
    assert off[6, 1] >= 0.8 * M
    others = np.delete(off[6], [1, 6])
    assert off[6, 1] > 4 * max(1, others.max())

    kf_idx = [0, 8, 16, 24, 32, 40, 48, 56]
    cands = loopclose.shortlist(
        scores, kf_idx, LoopConfig(min_gap=30, min_matches=20))
    assert cands and cands[0][:2] == (6, 1)
    # A tighter gap gate excludes it (48 - 8 = 40 < 64).
    assert not loopclose.shortlist(
        scores, kf_idx, LoopConfig(min_gap=64, min_matches=20))


def _smooth_traj(F=50, seed=1):
    from epivo_tpu.geometry import se3
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    T = np.eye(4)
    out = [T.copy()]
    for _ in range(F - 1):
        xi = np.concatenate([
            rng.normal(0, 0.02, 3), [0.1, 0.02, 0.9] + rng.normal(0, 0.05, 3)
        ])
        step = np.asarray(se3.se3_exp(jnp.asarray(xi)), np.float64)
        T = T @ step
        out.append(T.copy())
    return np.stack(out)


def test_spread_drift_closes_loop_exactly():
    from epivo_tpu.geometry import se3
    import jax.numpy as jnp

    gt = _smooth_traj()
    i, j = 2, 47
    # The measured loop transform comes from the TRUE geometry:
    # traj_j = traj_i @ inv(T_ij)  ->  T_meas = inv(inv(traj_i) @ traj_j).
    T_meas = np.linalg.inv(np.linalg.inv(gt[i]) @ gt[j])

    # Drifted estimate: extra yaw + translation error injected per step.
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([0.0, 0.008, 0.0, 0.02, 0.0, 0.04])),
        np.float64)
    est = gt.copy()
    for k in range(1, len(est)):
        step = np.linalg.inv(gt[k - 1]) @ gt[k]
        est[k] = est[k - 1] @ step @ drift

    pre = np.linalg.norm((np.linalg.inv(est[i]) @ est[j])[:3, 3]
                         - np.linalg.inv(T_meas)[:3, 3])
    out = loopclose.spread_drift(est, i, j, T_meas)
    # Endpoint-exact closure.
    # Endpoint-exact up to the f32 se3 log/exp roundtrip (~3e-6).
    np.testing.assert_allclose(np.linalg.inv(out[i]) @ out[j],
                               np.linalg.inv(T_meas), atol=1e-4)
    assert pre > 0.1  # the drift was material
    # Untouched prefix; rigid carry after j (relative poses preserved).
    np.testing.assert_allclose(out[: i + 1], est[: i + 1], atol=0)
    np.testing.assert_allclose(
        np.linalg.inv(out[j]) @ out[-1],
        np.linalg.inv(est[j]) @ est[-1], atol=1e-9)
    # Interior poses move toward the truth.
    ate_pre = np.sqrt(((est[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
    ate_post = np.sqrt(((out[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
    assert ate_post < 0.5 * ate_pre


def test_loop_trajectory_geometry():
    from epivo_tpu.datasets import photoreal

    gt = photoreal.loop_trajectory()
    # Stays inside the corridor and returns to the start lane with the
    # original heading.
    assert np.abs(gt[:, 0, 3]).max() < 5.5
    assert abs(gt[-1][0, 3]) < 0.3
    fwd = gt[-1][:3, :3] @ np.array([0, 0, 1.0])
    assert fwd[2] > 0.99
    # The closing straight re-traverses the start region.
    assert 0.0 < gt[-1][2, 3] < 12.0


@pytest.mark.slow
def test_close_loops_on_photoreal_fixture():
    """Imagery-level: render the loop course, inject trajectory drift,
    and check retrieval + ORB/RANSAC verification + spreading recover it."""
    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera as cam_mod, se3
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )
    import jax.numpy as jnp

    H, W = 188, 620
    K = np.array([[359.4, 0, W / 2.0], [0, 359.4, H / 2.0], [0, 0, 1.0]])
    frames, gt, _ = photoreal.loop_sequence(H=H, W=W, K=K, noise_sigma=1.0)
    stride = 8
    kf = {}
    for idx, f in enumerate(frames):
        if idx % stride in (0, 1):  # keyframe + adjacent norm-pair frame
            kf[idx] = loopclose.keyframe_half(f)

    # Drifted trajectory: per-step yaw + scale error on the GT chain.
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([0.0, 0.0015, 0.0, 0.0, 0.0, 0.008])),
        np.float64)
    est = gt.copy().astype(np.float64)
    for k in range(1, len(est)):
        step = np.linalg.inv(gt[k - 1]) @ gt[k]
        est[k] = est[k - 1] @ step @ drift

    cfg = BAConfig(
        camera=cam_mod.Pinhole(359.4, 359.4, W / 2.0, H / 2.0, W, H),
        frontend=FrontendConfig(fast_threshold=25.0, max_keypoints=512),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=32),
        loop=LoopConfig(enabled=True, min_gap=60, min_matches=30,
                        min_inliers=25),
    )
    c = cfg.camera
    half_cam = cam_mod.Pinhole(c.fx / 2, c.fy / 2, c.cx / 2, c.cy / 2,
                               c.width // 2, c.height // 2)
    vo_half = VOConfig(camera=half_cam, frontend=cfg.frontend,
                       ransac=cfg.ransac, lm=cfg.lm)
    traj2, loops = loopclose.close_loops(est, kf, cfg, vo_half, seed=0)
    assert loops, "no loop detected+verified on the loop fixture"
    ate_pre = np.sqrt(
        ((est[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
    ate_post = np.sqrt(
        ((traj2[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
    assert ate_post < 0.7 * ate_pre, (ate_pre, ate_post, loops)


def test_runner_loop_stage_noop_on_short_sequence():
    """run_ba_sequence with loop.enabled streams keyframes through the
    tee and runs the post-stage; on a short straight sequence no loop
    passes the gap gate, and the trajectory is identical to loop-off."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_runners_datasets import CAM, VO_CFG, make_sequence
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import BAConfig, LMConfig

    frames, gt = make_sequence(F=6)
    cfg_on = BAConfig(camera=CAM, frontend=VO_CFG.frontend,
                      ransac=VO_CFG.ransac,
                      lm=LMConfig(n_points=32, revert_r_norm=1e-2),
                      loop=LoopConfig(enabled=True, keyframe_stride=2,
                                      min_gap=100))
    res_on = runners.run_ba_sequence(list(frames), cfg_on, gt_poses=gt)
    cfg_off = BAConfig(camera=CAM, frontend=VO_CFG.frontend,
                       ransac=VO_CFG.ransac,
                       lm=LMConfig(n_points=32, revert_r_norm=1e-2))
    frames2, gt2 = make_sequence(F=6)
    res_off = runners.run_ba_sequence(list(frames2), cfg_off, gt_poses=gt2)
    np.testing.assert_allclose(res_on.trajectory, res_off.trajectory,
                               atol=1e-6)


def test_kitti_cli_ba_with_loop_close(tmp_path, monkeypatch):
    """Driver-level smoke: run_kitti.py --mode ba --loop-close --global-ba
    plumbs LoopConfig through the CLI; the tiny noise fixture exercises
    the keyframe tee + the loop stage's too-small-image no-op guard."""
    import importlib.util
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_runners_datasets import fake_kitti

    root = fake_kitti(tmp_path, F=6)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "run_kitti.py")
    spec = importlib.util.spec_from_file_location("run_kitti_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "run_kitti.py", "--root", root, "--seq", "00", "--mode", "ba",
        "--frames", "6", "--batch", "4", "--out", out,
        "--fast-threshold", "10", "--max-keypoints", "64",
        "--n-hyp", "64", "--loop-close", "--global-ba",
    ])
    mod.main()
    assert os.path.exists(os.path.join(out, "kitti.T"))


@pytest.mark.slow
def test_verify_loop_nonzero_baseline_recovers_norm():
    """The scaled-translation branch of verify_loop on imagery: an
    offset-revisit loop (close_offset course) has genuine baseline, so
    the depth-ratio norm recovery must fire (not the t=0 coincidence
    branch) and produce |t_loop| near the true offset (VERDICT r4
    next #6). Also checks the Sim(3) scale-drift measurement reads ~1 on
    drift-free imagery."""
    import jax

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera as cam_mod
    from epivo_tpu.pipeline.config import (
        FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )

    H, W = 188, 620
    K = np.array([[359.4, 0, W / 2.0], [0, 359.4, H / 2.0], [0, 0, 1.0]])
    gt = photoreal.loop_trajectory(close_offset=1.8)
    F = len(gt)
    j = F - 6
    # Nearest outbound pose to the revisit.
    d = np.linalg.norm(gt[:40, :3, 3] - gt[j, :3, 3], axis=-1)
    i = int(np.argmin(d))
    T_loop_gt = np.linalg.inv(gt[j]) @ gt[i]  # X_i -> X_j (vo convention)
    base_gt = float(np.linalg.norm(T_loop_gt[:3, 3]))
    assert 1.2 < base_gt < 2.4, base_gt  # the fixture's planted baseline

    scene = photoreal.CorridorScene()
    tex = scene.textures()
    rng = np.random.default_rng(7)

    def frame(k):
        return photoreal.render_frame(scene, tex, K, gt[k], H, W,
                                      noise_sigma=1.0, rng=rng)

    half = {k: loopclose.keyframe_half(frame(k)).astype(np.float32)
            for k in (i, i + 1, j, j + 1)}
    cam = cam_mod.Pinhole(359.4 / 2, 359.4 / 2, W / 4.0, H / 4.0,
                          W // 2, H // 2)
    vo_half = VOConfig(camera=cam,
                       frontend=FrontendConfig(fast_threshold=25.0,
                                               max_keypoints=1024,
                                               orb_pyramid=True),
                       ransac=RansacConfig(n_hyp=512),
                       lm=LMConfig(n_points=32))
    t_next = np.linalg.inv(gt[i]) @ gt[i + 1]
    t_next_norm = float(np.linalg.norm(t_next[:3, 3]))
    res = loopclose.verify_loop(half[i], half[j], half[i + 1], t_next_norm,
                                vo_half, jax.random.PRNGKey(3))
    assert res is not None
    assert not res.zero_baseline
    norm = float(np.linalg.norm(res.T_meas[:3, 3]))
    assert abs(norm - base_gt) / base_gt < 0.3, (norm, base_gt)

    # Drift-free imagery: the reverse-direction scale-drift measurement
    # must read ~1.
    t_next_j = np.linalg.inv(gt[j]) @ gt[j + 1]
    sigma = loopclose.measure_scale_drift(
        half[j], half[i], half[j + 1],
        float(np.linalg.norm(t_next_j[:3, 3])), norm,
        vo_half, jax.random.PRNGKey(4))
    assert sigma is not None
    assert 0.75 < sigma < 1.33, sigma


@pytest.mark.slow
def test_relocalize_reanchors_after_collapse():
    """Kidnapped-robot re-entry: the post-collapse segment carries a
    garbage anchor; relocalize() retrieves the first post-collapse
    keyframe against pre-collapse keyframes, verifies it, and rigidly
    re-anchors the tail near the truth."""
    import jax  # noqa: F401
    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera as cam_mod
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )

    H, W = 188, 620
    K = np.array([[359.4, 0, W / 2.0], [0, 359.4, H / 2.0], [0, 0, 1.0]])
    frames, gt, _ = photoreal.loop_sequence(H=H, W=W, K=K, noise_sigma=1.0)
    stride = 8
    kf = {}
    for idx, f in enumerate(frames):
        if idx % stride in (0, 1):
            kf[idx] = loopclose.keyframe_half(f)

    # Collapse during the second arc: the tail (closing straight, which
    # revisits the start) is internally consistent but anchored wrong.
    F = len(gt)
    c = F - 30
    est = gt.copy().astype(np.float64)
    wrong = np.eye(4)
    wrong[:3, 3] = [6.0, 0.5, -9.0]  # teleported anchor
    est[c:] = wrong[None] @ gt[c:]

    cfg = BAConfig(
        camera=cam_mod.Pinhole(359.4, 359.4, W / 2.0, H / 2.0, W, H),
        frontend=FrontendConfig(fast_threshold=25.0, max_keypoints=512),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=32),
        loop=LoopConfig(enabled=True, min_gap=0, min_matches=30,
                        min_inliers=25),
    )
    cc = cfg.camera
    half_cam = cam_mod.Pinhole(cc.fx / 2, cc.fy / 2, cc.cx / 2, cc.cy / 2,
                               cc.width // 2, cc.height // 2)
    import dataclasses as _dc

    vo_half = VOConfig(camera=half_cam,
                       frontend=_dc.replace(cfg.frontend, orb_pyramid=True),
                       ransac=cfg.ransac, lm=cfg.lm)
    pre_err = np.linalg.norm(est[-1, :3, 3] - gt[-1, :3, 3])
    traj2, lp = loopclose.relocalize(est, kf, cfg, vo_half, collapse_idx=c,
                                     seed=0)
    assert lp is not None, "no verified re-entry found"
    assert lp.j > c and lp.i + 1 < c
    post_err = np.linalg.norm(
        np.asarray(traj2)[-1, :3, 3] - gt[-1, :3, 3])
    assert pre_err > 5.0
    assert post_err < 0.3 * pre_err, (pre_err, post_err)
    # Pre-collapse prefix untouched.
    np.testing.assert_allclose(np.asarray(traj2)[:c], gt[:c], atol=1e-5)


def test_implied_drift_rate_separates_aliasing_from_true_loops():
    """An aliased candidate between co-linear poses implies ~100% drift;
    a true revisit implies only the accumulated drift."""
    F = 60
    traj = np.eye(4)[None].repeat(F, 0)
    traj[:, 2, 3] = np.arange(F, dtype=np.float64)  # straight +z, 1 m steps
    # Aliased: frames 10 and 40 claim coincidence (T_meas ~ identity)
    # while the chain has them 30 m apart.
    rate_alias = loopclose.implied_drift_rate(traj, 10, 40, np.eye(4))
    assert rate_alias > 0.95
    # True loop: out-and-back where the chain drifted 20% of the path.
    gt = traj.copy()
    gt[30:, 2, 3] = 30 - (np.arange(30) + 1)  # turn around at frame 30
    est = gt.copy()
    est[-1, :3, 3] += [0.0, 0.0, 0.2 * 58]  # 20%-of-path endpoint drift
    T_meas = np.linalg.inv(np.linalg.inv(gt[2]) @ gt[-1])
    rate_true = loopclose.implied_drift_rate(est, 2, F - 1, T_meas)
    assert rate_true < 0.35, rate_true


def test_close_loops_joint_on_two_lap_fixture():
    """Imagery-level multi-loop: render the TWO-LAP course (several true
    revisits with overlapping spans), inject smooth per-step drift with
    a scale component, and check the joint Sim(3) pose-graph branch of
    close_loops collects >= 2 loops and recovers trajectory + length —
    which greedy (one loop per overlapping span) structurally cannot."""
    import dataclasses

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera as cam_mod, se3
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )
    import jax.numpy as jnp

    H, W = 188, 620
    K = np.array([[359.4, 0, W / 2.0], [0, 359.4, H / 2.0], [0, 0, 1.0]])
    frames, gt, _ = photoreal.loop_sequence(H=H, W=W, K=K, noise_sigma=1.0,
                                            laps=2)
    stride = 8
    kf = {}
    for idx, f in enumerate(frames):
        if idx % stride in (0, 1):
            kf[idx] = loopclose.keyframe_half(f)

    # Smooth drift: yaw + forward bias + per-step scale shrink (the
    # monocular failure the Sim(3) graph corrects).
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([0.0, 0.001, 0.0, 0.0, 0.0, 0.006])),
        np.float64)
    est = gt.copy().astype(np.float64)
    for k in range(1, len(est)):
        step = np.linalg.inv(gt[k - 1]) @ gt[k]
        step[:3, 3] *= np.exp(-0.0012 * k)
        est[k] = est[k - 1] @ step @ drift

    cfg = BAConfig(
        camera=cam_mod.Pinhole(359.4, 359.4, W / 2.0, H / 2.0, W, H),
        frontend=FrontendConfig(fast_threshold=25.0, max_keypoints=512),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=32),
        loop=LoopConfig(enabled=True, min_gap=60, min_matches=30,
                        min_inliers=25, max_loops=4),
    )
    c = cfg.camera
    half_cam = cam_mod.Pinhole(c.fx / 2, c.fy / 2, c.cx / 2, c.cy / 2,
                               c.width // 2, c.height // 2)
    vo_half = VOConfig(camera=half_cam, frontend=cfg.frontend,
                       ransac=cfg.ransac, lm=cfg.lm)
    traj2, loops = loopclose.close_loops(est, kf, cfg, vo_half, seed=0)
    assert len(loops) >= 2, loops  # the joint branch actually engaged

    def ate(t):
        return np.sqrt(((np.asarray(t)[:, :3, 3]
                         - gt[:, :3, 3]) ** 2).sum(-1).mean())

    def length(t):
        return float(np.linalg.norm(
            np.diff(np.asarray(t, np.float64)[:, :3, 3], axis=0),
            axis=1).sum())

    assert ate(traj2) < 0.6 * ate(est), (ate(est), ate(traj2), loops)
    # The scale component is recovered through the t=0 loop positions
    # (no direct scale measurement on zero-baseline revisits).
    r_pre = length(est) / length(gt)
    r_post = length(traj2) / length(gt)
    assert abs(np.log(r_post)) < 0.6 * abs(np.log(r_pre)), (r_pre, r_post)

    # Greedy on the same inputs: spans overlap, fewer loops applicable.
    cfg_g = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, pose_graph=False))
    traj_g, loops_g = loopclose.close_loops(est, kf, cfg_g, vo_half, seed=0)
    assert len(loops_g) < len(loops), (loops_g, loops)
