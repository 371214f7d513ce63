"""Sim(3) pose graph (pipeline/posegraph.py): group numerics, joint
multi-loop recovery on a known-drift synthetic course, and the
greedy-vs-joint comparison the module exists for."""

import numpy as np

from epivo_tpu.pipeline import posegraph
from epivo_tpu.pipeline.loopclose import Loop, se3_exp_np, spread_drift


def test_sim3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    worst = 0.0
    for i in range(100):
        xi = rng.normal(0, 1.0, 7)
        if i % 5 == 0:
            xi[3:6] *= 1e-8  # tiny rotation limit
        if i % 7 == 0:
            xi[6] *= 1e-9  # tiny log-scale limit
        if i % 11 == 0:
            xi[3:] = 0.0  # pure translation
        S = posegraph.sim3_exp(xi)
        worst = max(worst, float(np.abs(posegraph.sim3_log(S) - xi).max()))
    assert worst < 1e-10
    S = posegraph.sim3_exp(rng.normal(0, 0.5, 7))
    assert np.abs(posegraph.sim3_inv(S) @ S - np.eye(4)).max() < 1e-12


def _two_lap_course():
    """GT two-lap out-and-back course + a scale-drifting noisy chain +
    four overlapping-span loop measurements derived from GT (translation
    in chain-units-at-i, sigma = accumulated drift ratio) — the
    controlled version of what verify_loop/measure_scale_drift produce."""
    rng = np.random.default_rng(3)
    poses, T = [np.eye(4)], np.eye(4)
    n, dy = 30, np.pi / 30
    for yaw, s in ([(0.0, 0.5)] * 40 + [(dy, 0.3)] * n
                   + [(0.0, 0.5)] * 40 + [(dy, 0.3)] * n) * 2:
        cy, sy = np.cos(yaw), np.sin(yaw)
        step = np.eye(4)
        step[:3, :3] = [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]
        step[:3, 3] = [0, 0, s]
        T = T @ step
        poses.append(T.copy())
    gt = np.stack(poses)
    F = len(gt)
    steps = np.linalg.inv(gt[:-1]) @ gt[1:]
    sigma = np.exp(np.concatenate(
        [[0.0], np.cumsum(rng.normal(0.0015, 0.0015, F - 1))]))
    chain = [gt[0]]
    for k in range(F - 1):
        st = steps[k].copy()
        st[:3, 3] *= sigma[k]
        pert = se3_exp_np(np.concatenate(
            [rng.normal(0, 1e-3, 3), rng.normal(0, 4e-4, 3)]))
        chain.append(chain[-1] @ st @ pert)
    chain = np.stack(chain)
    loops = []
    for (i, j) in [(10, 150), (40, 180), (80, 220), (0, 140)]:
        Tm = np.linalg.inv(np.linalg.inv(gt[i]) @ gt[j])
        Tm[:3, 3] *= sigma[i]
        Tm = Tm @ se3_exp_np(rng.normal(0, 2e-3, 6))
        loops.append(Loop(i, j, Tm, 200, 100,
                          sigma=float(sigma[j] / sigma[i]
                                      * np.exp(rng.normal(0, 0.01)))))
    return gt, chain, loops


def test_joint_multi_loop_recovery_beats_greedy():
    gt, chain, loops = _two_lap_course()

    def err(t):
        return np.linalg.norm(
            np.asarray(t, np.float64)[:, :3, 3] - gt[:, :3, 3], axis=1)

    def length(t):
        return float(np.linalg.norm(
            np.diff(np.asarray(t, np.float64)[:, :3, 3], axis=0),
            axis=1).sum())

    assert err(chain).mean() > 1.5  # the drift is material
    out = posegraph.optimize_pose_graph(chain, loops, stride=8)
    # All four spans overlap: greedy can apply exactly one loop.
    greedy = spread_drift(chain, loops[0].i, loops[0].j, loops[0].T_meas,
                          sigma=loops[0].sigma)
    assert err(out).mean() < 0.5 * err(greedy).mean()
    assert err(out).mean() < 0.2 * err(chain).mean()
    assert err(out).max() < 1.0
    # Scale drift absorbed: corrected length within 5% of GT.
    assert abs(length(out) / length(gt) - 1.0) < 0.05
    assert abs(length(chain) / length(gt) - 1.0) > 0.15


def test_single_loop_graph_comparable_to_greedy():
    gt, chain, loops = _two_lap_course()
    out1 = posegraph.optimize_pose_graph(chain, loops[:1], stride=8)
    greedy = spread_drift(chain, loops[0].i, loops[0].j, loops[0].T_meas,
                          sigma=loops[0].sigma)

    def err(t):
        return np.linalg.norm(
            np.asarray(t, np.float64)[:, :3, 3] - gt[:, :3, 3], axis=1)

    # Same ballpark (the graph balances odometry against the loop edge
    # instead of forcing exact closure) — and both far below the chain.
    assert err(out1).mean() < 1.5 * err(greedy).mean() + 0.2
    assert err(out1).mean() < 0.5 * err(chain).mean()


def test_no_loops_is_identity():
    _, chain, _ = _two_lap_course()
    out = posegraph.optimize_pose_graph(chain, [], stride=8)
    assert np.array_equal(out, chain)


def test_huber_rejects_false_loop():
    """A geometrically-plausible but FALSE loop (wrong by many units)
    among three true ones must not bend the solution: the robust cost
    downweights it and the recovery stays close to the all-true case."""
    gt, chain, loops = _two_lap_course()
    bad_T = loops[1].T_meas.copy()
    bad_T[:3, 3] += np.array([8.0, 0.0, 5.0])  # ~9 units of lie
    bad = Loop(loops[1].i, loops[1].j, bad_T, 150, 80, sigma=loops[1].sigma)

    def err(t):
        return np.linalg.norm(
            np.asarray(t, np.float64)[:, :3, 3] - gt[:, :3, 3], axis=1)

    clean = posegraph.optimize_pose_graph(chain, loops, stride=8)
    mixed = posegraph.optimize_pose_graph(chain, loops + [bad], stride=8)
    assert err(mixed).mean() < err(clean).mean() + 0.3
    assert err(mixed).mean() < 0.3 * err(chain).mean()


def test_self_consistency_gate():
    gt, chain, loops = _two_lap_course()
    good = posegraph.optimize_pose_graph(chain, loops, stride=8)
    ok, stats = posegraph.self_consistency(chain, good, loops)
    assert ok, stats  # a genuine recovery passes
    assert stats["loop_gap_after"] < stats["loop_gap_before"]
    # A scale blow-up (the measured chip failure mode: length factor
    # 0.46 -> 3.37) is rejected by the length budget even if gaps close.
    blown = np.asarray(good, np.float64).copy()
    steps = np.linalg.inv(blown[:-1]) @ blown[1:]
    steps[:, :3, 3] *= 4.0
    for k in range(len(steps)):
        blown[k + 1] = blown[k] @ steps[k]
    ok2, stats2 = posegraph.self_consistency(chain, blown, loops)
    assert not ok2, stats2
    # A 'correction' that leaves the loop gaps unimproved is rejected.
    ok3, stats3 = posegraph.self_consistency(chain, chain, loops)
    assert not ok3, stats3
