"""Tests for trajectory evaluation and artifact export."""

import os

import numpy as np
import pytest

from epivo_tpu.eval import metrics
from epivo_tpu.viz import export


def make_traj(F=50, seed=0):
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for _ in range(F - 1):
        d = np.eye(4)
        d[:3, 3] = [0.1, 0.0, 1.0] + rng.normal(0, 0.01, 3)
        # small rotation
        th = rng.normal(0, 0.01)
        c, s = np.cos(th), np.sin(th)
        d[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        poses.append(poses[-1] @ d)
    return np.stack(poses)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(40, 3))
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    s, t = 2.5, np.array([1.0, -2.0, 3.0])
    dst = (s * (R @ src.T)).T + t
    a = metrics.umeyama(src, dst)
    np.testing.assert_allclose(a.scale, s, rtol=1e-6)
    np.testing.assert_allclose(a.R, R, atol=1e-6)
    np.testing.assert_allclose(a.t, t, atol=1e-6)


def test_ate_zero_for_identical():
    tr = make_traj()
    assert metrics.ate_rmse(tr, tr) < 1e-9


def test_ate_invariant_to_similarity():
    tr = make_traj()
    p = metrics.positions(tr)
    th = 0.7
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    p2 = (3.0 * (R @ p.T)).T + np.array([5.0, 1.0, -2.0])
    assert metrics.ate_rmse(p2, p) < 1e-6


def test_ate_detects_error():
    tr = make_traj()
    tr2 = make_traj(seed=2)
    assert metrics.ate_rmse(tr2, tr) > 0.01


def test_rpe():
    tr = make_traj()
    t_err, r_err = metrics.rpe(tr, tr)
    assert t_err < 1e-9 and r_err < 1e-6
    tr_bad = tr.copy()
    tr_bad[10:, :3, 3] += 0.5
    t_err2, _ = metrics.rpe(tr_bad, tr)
    assert t_err2 > 0.01


def test_pose_roundtrip(tmp_path):
    tr = make_traj(F=7)
    p = str(tmp_path / "est.pose")
    export.write_poses(p, tr)
    back = export.read_poses(p)
    np.testing.assert_allclose(back, tr, rtol=1e-6, atol=1e-8)


def test_cloud_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(100, 3))
    p = str(tmp_path / "pts.cld")
    export.write_cloud(p, X, lims_path=str(tmp_path / "lims"),
                       limits=[0, 30, 60])
    back = export.read_cloud(p)
    np.testing.assert_allclose(back, X, rtol=1e-6, atol=1e-8)
    lims = np.fromfile(str(tmp_path / "lims"), sep=" ")
    np.testing.assert_allclose(lims, [0, 30, 60])


def test_kitti_format(tmp_path):
    tr = make_traj(F=5)
    p = str(tmp_path / "poses.txt")
    export.write_kitti_format(p, tr)
    raw = np.loadtxt(p)
    assert raw.shape == (5, 12)
    np.testing.assert_allclose(raw[2], tr[2][:3, :].reshape(-1), rtol=1e-6)


def test_plot(tmp_path):
    tr = make_traj()
    png = str(tmp_path / "traj.png")
    export.plot_trajectories(png, {"est": tr, "gt": tr},
                             cloud=np.random.default_rng(0).normal(size=(50, 3)))
    assert os.path.getsize(png) > 1000
