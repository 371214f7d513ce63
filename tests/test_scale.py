"""f64 joint metric-scale refinement (pipeline/scale.py).

Verifies on controlled synthetic stereo geometry that
(a) the r3 ratio-median initializer IS biased high when far points
    dominate (the 1/disparity convexity that produced the +11% length
    bias in STEREO_STREAM r3), and
(b) ``estimate_step_scale`` removes that bias (reprojection-space ML has
    zero-mean pixel noise, no inverted disparity).
"""

import numpy as np
import pytest

from epivo_tpu.pipeline import scale as scale_mod


def _proj(v):
    return v[..., :2] / v[..., 2:3]


def _make_step(N=600, far_frac=0.75, noise_px=0.6, fx=718.0, s_true=0.8,
               baseline=0.54, seed=0):
    """Synthetic stereo step: KITTI-like rig, forward motion, a far-heavy
    depth mixture, i.i.d. pixel noise on every tracked observation."""
    rng = np.random.default_rng(seed)
    n_far = int(N * far_frac)
    z = np.concatenate([rng.uniform(6.0, 30.0, N - n_far),
                        rng.uniform(80.0, 350.0, n_far)])
    x = rng.uniform(-0.6, 0.6, N) * z
    y = rng.uniform(-0.25, 0.25, N) * z
    X = np.stack([x, y, z], 1)  # L_k frame

    t_rig = np.array([-baseline, 0.0, 0.0])  # L -> R (right cam at +x)
    R_rig = np.eye(3)
    # Temporal step: forward motion with small yaw. zeta maps L_k -> L_{k+1}.
    th = 0.004
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = R @ np.array([0.01, 0.0, -s_true])  # camera moves +z by s_true
    u = t / np.linalg.norm(t)

    sig = noise_px / fx
    p = X / X[:, 2:3]  # exact source keypoints (detector grid: noiseless)
    q3 = X @ R_rig.T + t_rig
    p23 = X @ R.T + t
    q = np.concatenate([_proj(q3) + rng.normal(0, sig, (N, 2)),
                        np.ones((N, 1))], 1)
    p2 = np.concatenate([_proj(p23) + rng.normal(0, sig, (N, 2)),
                         np.ones((N, 1))], 1)
    return p, q, p2, R_rig, t_rig, R, u, s_true, sig


def _tri_depth(Rm, tm, p, pt):
    """Closed-form epipolar depth d = |P̄t| / |P̄Rp| (the runner's
    formula, `jac_Rt_gen_.cpp:212-259`), numpy f64."""
    Pbar = np.stack([
        np.stack([np.ones_like(pt[:, 0]), np.zeros_like(pt[:, 0]),
                  -pt[:, 0]], 1),
        np.stack([np.zeros_like(pt[:, 0]), np.ones_like(pt[:, 0]),
                  -pt[:, 1]], 1),
    ], 1)  # [N, 2, 3]
    A = Pbar @ tm
    B = np.einsum("nij,nj->ni", Pbar, p @ Rm.T)
    return np.linalg.norm(A, axis=1) / np.maximum(
        np.linalg.norm(B, axis=1), 1e-12)


def test_ratio_median_biased_refinement_unbiased():
    """The far-point depth-ratio bias vs the reprojection-space ML fix.

    Measured on this fixture (8 seeds): ungated ratio median +5.4% at
    0.6 px noise / +18.3% at 1.2 px (pure 1/disparity convexity — the
    corridor's +11% mechanism); the ML refinement is unbiased to <0.1%
    USING ALL POINTS, i.e. it needs no fragile nearest-quantile gate."""
    errs_ungated, errs_ml = [], []
    for seed in range(6):
        p, q, p2, R_rig, t_rig, R, u, s_true, sig = _make_step(
            seed=seed, noise_px=1.2)
        d_met = _tri_depth(R_rig, t_rig, p, q)
        d_mono = _tri_depth(R, u, p, p2)
        mask = np.ones(len(p), bool)
        s_un, n_used, _ = scale_mod.ratio_median_scale(
            d_met, d_mono, mask, rig_depth_quantile=1.0, min_common=4)
        s0, _, _ = scale_mod.ratio_median_scale(
            d_met, d_mono, mask, rig_depth_quantile=0.4, min_common=4)
        assert n_used >= 4
        est = scale_mod.estimate_step_scale(
            p, q, p2, R_rig, t_rig, R, u, mask, s0, huber=3 * sig, iters=25)
        assert est.converged
        errs_ungated.append(s_un / s_true - 1.0)
        errs_ml.append(est.s / s_true - 1.0)
    errs_ungated = np.array(errs_ungated)
    errs_ml = np.array(errs_ml)
    # The 1/disparity convexity bias is real and positive ...
    assert errs_ungated.mean() > 0.08, errs_ungated
    # ... the ML refinement is unbiased and tight on every trial.
    assert np.all(np.abs(errs_ml) < 0.03), errs_ml
    assert abs(errs_ml.mean()) < 0.01, errs_ml


def test_refinement_handles_outliers():
    p, q, p2, R_rig, t_rig, R, u, s_true, sig = _make_step(seed=3)
    rng = np.random.default_rng(9)
    n_out = 120  # 20% gross track failures in the temporal view
    idx = rng.choice(len(p), n_out, replace=False)
    p2 = p2.copy()
    p2[idx, :2] += rng.normal(0, 0.05, (n_out, 2))
    est = scale_mod.estimate_step_scale(
        p, q, p2, R_rig, t_rig, R, u, np.ones(len(p), bool),
        s0=s_true * 1.3, huber=3 * sig, iters=30)
    assert est.converged
    assert abs(est.s / s_true - 1.0) < 0.02, est
    assert est.inlier_frac < 0.95  # the outliers were actually downweighted


def test_refinement_falls_back_on_degenerate():
    p, q, p2, R_rig, t_rig, R, u, s_true, sig = _make_step(N=10, seed=4)
    # Too few valid points -> not converged, caller keeps s0.
    est = scale_mod.estimate_step_scale(
        p, q, p2, R_rig, t_rig, R, u, np.zeros(len(p), bool), s0=1.7)
    assert not est.converged and est.s == pytest.approx(1.7)
    # Bad s0 -> flagged.
    est2 = scale_mod.estimate_step_scale(
        p, q, p2, R_rig, t_rig, R, u, np.ones(len(p), bool), s0=np.nan)
    assert not est2.converged


def test_hampel_log_replaces_outliers_keeps_smooth_changes():
    rng = np.random.default_rng(0)
    # Smooth speed profile with mild noise ...
    true = 0.8 * (1 + 0.3 * np.sin(0.13 * np.arange(60)))
    s = true * np.exp(rng.normal(0, 0.03, 60))
    # ... plus catastrophic outliers and a failed (NaN) step.
    s[20] *= 8.0
    s[33] *= 0.12
    s[40] = np.nan
    out, repl = scale_mod.hampel_log(s, window=7, max_ratio=1.5)
    assert repl[20] and repl[33] and repl[40]
    assert np.all(np.isfinite(out))
    # Outliers land near truth; the smooth profile is untouched.
    assert abs(np.log(out[20] / true[20])) < 0.15
    assert abs(np.log(out[33] / true[33])) < 0.15
    untouched = ~repl
    np.testing.assert_allclose(out[untouched], s[untouched])
    assert repl.sum() <= 5  # smooth changes pass through


# ---------------------------------------------------------------------------
# No-GT mono chain gates (runners._chained_scales; ScaleConfig.chain_*)
# ---------------------------------------------------------------------------


def _chain_pair_data(steps, depths_z, n_pts=160, seed=3, T_noise=None):
    """Synthetic pair_data for _chained_scales: identity-rotation forward
    motion with per-step sizes ``steps``; landmarks at depths ``depths_z``
    spread laterally. T entries are the unit-translation two-view poses
    (X_j = R X_i + t convention, |t| = 1); observations are exact
    projections of the true geometry. ``T_noise`` optionally maps
    (i, j, T) -> T to inject pose error without touching observations."""
    rng = np.random.default_rng(seed)
    F = len(steps) + 1
    C = np.concatenate([[0.0], np.cumsum(steps)])  # camera z-positions
    z = np.asarray(depths_z)[rng.integers(0, len(depths_z), n_pts)]
    z = z + rng.uniform(0, 1, n_pts)
    x = rng.uniform(-0.5, 0.5, n_pts) * z
    y = rng.uniform(-0.3, 0.3, n_pts) * z
    Xw = np.stack([x, y, z + 40.0], 1)  # world frame = frame 0

    def in_frame(i):
        Xi = Xw.copy()
        Xi[:, 2] -= C[i]
        return Xi

    def homog(X):
        return np.concatenate([X[:, :2] / X[:, 2:3],
                               np.ones((n_pts, 1))], 1).astype(np.float32)

    pd = {}
    for i in range(F):
        for j in (i - 2, i - 1, i + 1, i + 2):
            if not (0 <= j < F):
                continue
            t = np.array([0.0, 0.0, -(C[j] - C[i])])
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = t / np.linalg.norm(t)
            if T_noise is not None:
                T = T_noise(i, j, T)
            pd[(i, j)] = dict(
                T=T, p_full=homog(in_frame(i)), p_t_full=homog(in_frame(j)),
                mask_full=np.ones(n_pts, bool))
    return pd


def test_chained_scales_recovers_step_ratios():
    from epivo_tpu.pipeline.config import ScaleConfig
    from epivo_tpu.pipeline.runners import _chained_scales

    steps = np.array([1.0, 1.15, 0.9, 1.05, 0.95, 1.1, 1.0])
    pd = _chain_pair_data(steps, [10, 20, 35])
    c = _chained_scales(pd, len(steps), ScaleConfig())
    np.testing.assert_allclose(c, steps / steps[0], rtol=2e-2)


def test_chain_hampel_gate_blocks_catastrophic_boundary():
    from epivo_tpu.pipeline.config import ScaleConfig
    import dataclasses

    from epivo_tpu.pipeline.runners import _chained_scales

    steps = np.array([1.0] * 9)
    pd = _chain_pair_data(steps, [10, 20, 35])
    # Boundary 3's backward pair comes from a world where that step was
    # 5x bigger: its unit-|t| depths are 5x off — one catastrophically
    # wrong two-view estimate, exactly the measured failure mode.
    steps_bad = steps.copy()
    steps_bad[2] = 5.0
    pd[(3, 2)] = _chain_pair_data(steps_bad, [10, 20, 35])[(3, 2)]
    sc_off = dataclasses.replace(ScaleConfig(), chain_hampel_ratio=0.0,
                                 chain_flow_topfrac=0.0)
    c_off = _chained_scales(pd, len(steps), sc_off)
    sc_on = dataclasses.replace(ScaleConfig(), chain_flow_topfrac=0.0)
    c_on = _chained_scales(pd, len(steps), sc_on)
    # Ungated: the bad boundary rescales the whole tail (carry-forward).
    assert abs(np.log(c_off[-1])) > 0.3
    # Gated: the outlier ratio is replaced by the local median; the tail
    # stays at the true (constant-speed) scale.
    np.testing.assert_allclose(c_on, np.ones(len(steps)), rtol=5e-2)


def test_chain_flow_gate_cuts_common_mode_pose_bias():
    from epivo_tpu.pipeline.config import ScaleConfig
    import dataclasses

    from epivo_tpu.pipeline.runners import _chained_scales

    steps = np.array([1.0] * 7)
    rng = np.random.default_rng(11)

    def tilt(i, j, T):
        # Every pair pose carries an independent small rotation error (the
        # two-view estimate is never exact). Small-parallax points divide
        # it by a tiny baseline -> common-mode depth bias the median
        # keeps, different at every boundary, compounding down the chain.
        th = rng.normal(0, 0.002)
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        T = T.copy()
        T[:3, :3] = R
        return T

    # Far-heavy scene: most landmarks have tiny flow.
    pd = _chain_pair_data(steps, [15, 300, 400, 500, 600], T_noise=tilt)
    sc_off = dataclasses.replace(ScaleConfig(), chain_flow_topfrac=0.0,
                                 chain_hampel_ratio=0.0)
    sc_on = dataclasses.replace(ScaleConfig(), chain_hampel_ratio=0.0)
    err_off = np.abs(np.log(_chained_scales(pd, len(steps), sc_off))).max()
    err_on = np.abs(np.log(_chained_scales(pd, len(steps), sc_on))).max()
    assert err_on < 0.6 * err_off


def test_scale_graph_recovers_step_ratios():
    """Joint graph solve (boundary + boundary_own + skip_boundary rows)
    recovers varying per-step scales; the weak constant-speed prior
    shrinks each log-ratio by a few percent at most."""
    from epivo_tpu.pipeline import scale as scale_mod
    from epivo_tpu.pipeline.config import ScaleConfig

    steps = np.array([1.0, 1.15, 0.9, 1.05, 0.95, 1.1, 1.0])
    pd = _chain_pair_data(steps, [10, 20, 35])
    sc = ScaleConfig()
    meas = scale_mod.scale_graph_measurements(pd, len(steps), sc)
    kinds = {m.kind for m in meas}
    assert {"boundary", "boundary_own", "skip_boundary"} <= kinds
    c = scale_mod.scale_graph_solve(meas, len(steps), sc)
    np.testing.assert_allclose(c, steps / steps[0], rtol=6e-2)


def test_scale_graph_rejects_catastrophic_boundary_without_hampel():
    """The r4 failure mode (one wrong two-view pose permanently rescales
    the chain tail — the 88x length blow-up): the joint solve's
    redescending stage rejects the corrupted boundary outright, with the
    Hampel net switched OFF — robustness lives in the solve itself, not
    the post-filter (VERDICT r4 next #1)."""
    import dataclasses

    from epivo_tpu.pipeline import scale as scale_mod
    from epivo_tpu.pipeline.config import ScaleConfig
    from epivo_tpu.pipeline.runners import _chained_scales

    steps = np.array([1.0] * 9)
    pd = _chain_pair_data(steps, [10, 20, 35])
    steps_bad = steps.copy()
    steps_bad[2] = 5.0
    pd[(3, 2)] = _chain_pair_data(steps_bad, [10, 20, 35])[(3, 2)]
    sc = dataclasses.replace(ScaleConfig(), chain_hampel_ratio=0.0,
                             chain_flow_topfrac=0.0)
    # The sequential chain inherits the corrupted boundary forever.
    c_chain = _chained_scales(pd, len(steps), sc)
    assert abs(np.log(c_chain[-1])) > 0.3
    # The graph solve rejects it: constant speed recovered everywhere.
    meas = scale_mod.scale_graph_measurements(pd, len(steps), sc)
    c = scale_mod.scale_graph_solve(meas, len(steps), sc)
    np.testing.assert_allclose(c, np.ones(len(steps)), rtol=2e-2)
