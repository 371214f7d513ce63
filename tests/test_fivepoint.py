"""Batched Nister/Stewenius 5-point solver (geometry/fivepoint.py).

The reference's minimal solver is OpenCV's 5-point (`kitti_E.cpp:98-104`);
these tests pin (a) per-sample solution recall on exact minimal samples,
(b) that every emitted candidate IS a solution of its minimal problem,
and (c) the adoption criterion from VERDICT r2 #9: at high outlier
ratios, 5-point RANSAC beats the 8-point-minimal pipeline at the same
sample budget (P[all-inlier sample] is (1-out)^5 vs (1-out)^8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu import ransac as rm
from epivo_tpu.datasets import synthetic
from epivo_tpu.geometry import essential, fivepoint, se3

pytestmark = pytest.mark.slow


def _sample_batch(key, S):
    ks = jax.random.split(key, S)
    ps, pts, Es = [], [], []
    for k in ks:
        k1, k2 = jax.random.split(k)
        T = synthetic.random_pose(k1)
        _, p, p_t = synthetic.gen_points(k2, 5, T)
        ps.append(p)
        pts.append(p_t)
        E = np.array(se3.hat(T[:3, 3]) @ T[:3, :3])
        Es.append(E / np.linalg.norm(E))
    return jnp.stack(ps), jnp.stack(pts), Es


def test_five_point_recovers_true_solution():
    """The true E is among the candidates for >= 70% of random minimal
    samples (misses are close-root pairs below grid resolution; RANSAC
    draws many samples, so per-sample recall < 1 is fine)."""
    p, p_t, Es_true = _sample_batch(jax.random.PRNGKey(0), 48)
    Es, valid = fivepoint.five_point(p, p_t)
    Es_n, val = np.asarray(Es), np.asarray(valid)
    hits = 0
    for s in range(48):
        best = min(
            [min(np.linalg.norm(Es_n[s, c] - Es_true[s]),
                 np.linalg.norm(Es_n[s, c] + Es_true[s]))
             for c in range(10) if val[s, c]] or [np.inf])
        hits += best < 1e-2
    assert hits >= 0.7 * 48, hits


def test_five_point_candidates_satisfy_constraints():
    """Every valid candidate satisfies its 5 epipolar constraints (it IS a
    minimal-problem solution) and lies on the essential manifold."""
    p, p_t, _ = _sample_batch(jax.random.PRNGKey(1), 16)
    Es, valid = fivepoint.five_point(p, p_t)
    err = np.asarray(essential.sampson_error(Es, p[:, None], p_t[:, None]))
    val = np.asarray(valid)
    assert val.any()
    flat = err[val].max(-1)
    # Most candidates are exact; the tail holds imprecise close-pair roots
    # (still valid hypotheses — RANSAC scoring rejects them naturally).
    assert np.quantile(flat, 0.9) < 1e-5, np.quantile(flat, 0.9)
    assert flat.max() < 1e-2, flat.max()
    # Essential-manifold check on the accurate candidates.
    good = val.copy()
    good[val] = flat < 1e-5
    Ev = np.asarray(Es)[good]
    dets = np.abs(np.linalg.det(Ev))
    assert dets.max() < 1e-4, dets.max()
    EEt = Ev @ np.transpose(Ev, (0, 2, 1))
    tr = np.trace(EEt, axis1=1, axis2=2)
    G = 2.0 * EEt @ Ev - tr[:, None, None] * Ev
    assert np.abs(G).max() < 1e-3, np.abs(G).max()


@pytest.mark.parametrize("outlier_ratio", [0.6, 0.7])
def test_five_point_ransac_beats_eight_point_high_outliers(outlier_ratio):
    """VERDICT r2 #9 adoption criterion: with the same sample budget at
    60-70% outliers, the 5-point minimal sample finds the model where the
    8-point minimal sample usually cannot (0.4^8 ~ 6.5e-4 vs 0.4^5 = 1%)."""
    wins_5, wins_8 = 0, 0
    n_seeds = 5
    for seed in range(n_seeds):
        key = jax.random.PRNGKey(300 + seed)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        T = synthetic.random_pose(k1)
        N = 128
        _, p, p_t = synthetic.gen_points(k2, N, T, pixel_noise=5e-4)
        n_out = int(outlier_ratio * N)
        # Gross outliers: replace target points with random directions.
        noise = jax.random.uniform(k3, (n_out, 2), minval=-0.8, maxval=0.8)
        p_t = p_t.at[:n_out, :2].set(noise)

        R_gt = np.array(T)[:3, :3]

        def rot_err(res):
            R, t, _ = essential.recover_pose(res.E, p, p_t,
                                             mask=res.inliers)
            c = (np.trace(np.asarray(R, np.float64).T @ R_gt) - 1) / 2
            return float(np.arccos(np.clip(c, -1, 1)))

        res5 = rm.ransac_essential(k4, p, p_t, n_hyp=384, threshold=4e-5,
                                   solver="5pt")
        res8 = rm.ransac_essential(k5, p, p_t, n_hyp=384, threshold=4e-5,
                                   solver="8pt")
        e5, e8 = rot_err(res5), rot_err(res8)
        ok5 = e5 < np.deg2rad(2.0)
        ok8 = e8 < np.deg2rad(2.0)
        wins_5 += ok5
        wins_8 += ok8
    # 5-point must succeed in most trials and at least as often as the
    # 8-point pipeline (whose LO-refit gives it some high-outlier
    # robustness of its own).
    assert wins_5 >= 4, (wins_5, wins_8)
    assert wins_5 >= wins_8, (wins_5, wins_8)
