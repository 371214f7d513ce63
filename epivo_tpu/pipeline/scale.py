"""Stereo metric-scale estimation (host, f64, vectorized numpy).

The reference extracts absolute scale *through the frozen-baseline
constraint inside its f64 LM* (`kitti_ba.cpp:567-574`): the rig zeta is
pinned at calibration, so the temporal translations that minimize the
joint reprojection energy come out in metres. Our on-device LM runs in
f32 with the huber-crushed energy (`jac_Rt_gen_.cpp:17` delta regime),
where that signal is numerically too flat (documented in runners.py since
r3) — so scale must be recovered on the side.

Round 3 used the median of (rig-triangulated metric depth / mono
temporal depth) ratios. Triangulated depth is ~1/disparity, and
E[1/x] > 1/E[x]: far points' depths are noise-dominated AND biased high,
which left a +11% trajectory-length bias at 240 frames even behind a
nearest-40% gate (STEREO_STREAM r3; VERDICT r3 missing #2).

This module replaces the ratio estimator with a tiny maximum-likelihood
refinement per temporal step, in f64 on host: jointly estimate the step
scale ``s`` and per-landmark inverse depths ``w_j`` by minimizing robust
reprojection error in BOTH the rig view and the next left view. The
measurement noise lives in *pixels* (zero-mean), never in an inverted
disparity, so the estimator has no convexity bias:

    landmark:   X_j = p_j / w_j            (L_k frame, p normalized)
    rig view:   q_j  ~ pi(R_r p_j + w_j t_r)     calibrated, metric
    next view:  p'_j ~ pi(R p_j + w_j s u), |u|=1 two-view direction

(projection is scale-invariant, so X can be multiplied through by w_j —
the residuals stay smooth as w_j -> 0, i.e. points at infinity are
handled exactly and simply stop constraining s.)

Solved by alternating per-point 1-D Gauss-Newton on w_j and a global 1-D
Gauss-Newton on s, with Huber IRLS weights; everything is vectorized over
points and costs ~1e2 flops/point/iteration — microseconds per step.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class StepScale(NamedTuple):
    s: float  # metric |t| of the temporal step (scale of the unit pose)
    n_used: int  # points entering the refinement
    inlier_frac: float  # fraction with final Huber weight == 1 (next view)
    converged: bool  # finite positive scale AND identifiable (see rel_err)
    rel_err: float  # estimated relative std error of s (profile Fisher info)


def _proj(v: np.ndarray) -> np.ndarray:
    """[..., 3] -> [..., 2] pinhole projection (f64)."""
    return v[..., :2] / v[..., 2:3]


def _huber_w(r2: np.ndarray, delta: float) -> np.ndarray:
    """IRLS weight for Huber loss on residual-norm^2 ``r2``."""
    rn = np.sqrt(np.maximum(r2, 1e-30))
    return np.minimum(1.0, delta / rn)


def estimate_step_scale(
    p: np.ndarray,
    q: np.ndarray,
    p2: np.ndarray,
    R_rig: np.ndarray,
    t_rig: np.ndarray,
    R: np.ndarray,
    u: np.ndarray,
    mask: np.ndarray,
    s0: float,
    w0: np.ndarray | None = None,
    huber: float = 3e-3,
    iters: int = 25,
    w_min: float = 1e-4,
    w_max: float = 10.0,
    rel_err_max: float = 0.08,
    trust_region: float = 1.3,
) -> StepScale:
    """Joint (s, {w_j}) ML refinement for one temporal step.

    Args:
      p: [N, 3] normalized keypoints in L_k (source of both tracks).
      q: [N, 3] normalized rig-view (R_k) observations of the same points.
      p2: [N, 3] normalized next-view (L_{k+1}) observations.
      R_rig, t_rig: calibrated rig rotation/translation (metric).
      R, u: temporal two-view rotation and UNIT translation direction.
      mask: [N] points valid in both views.
      s0: initial scale (e.g. the gated ratio median).
      w0: [N] optional initial inverse depths (default: from s0 and the
        temporal parallax via the rig — computed internally if None).
      huber: robust threshold in NORMALIZED image units (pixels / fx).
      iters: alternation rounds.
      rel_err_max: identifiability gate — accept only when the profile
        (w-marginalized) Fisher information of s bounds its relative
        standard error below this. When too few / too-near points leave
        the joint likelihood nearly FLAT in s (measured: blob fixtures
        with ~20 close points vary the profiled energy <1% over ±30% of
        s), alternating GN wanders to whichever shallow minimum the
        systematic tracking errors favor; the gate detects exactly this
        and falls back to ``s0``.
      trust_region: reject refinements further than this RATIO from
        ``s0`` in either direction. Fisher info is blind to *systematic*
        observation errors (e.g. KLT undershoot on large disparities,
        which inflates rig depths and drags s up 40%+ on low-res blob
        fixtures while residuals still fit); the refinement is a
        refinement, and a step that contradicts the robust init by >30%
        means the model, not the init, is wrong. Measured: photoreal
        corridor corrections stay within [0.82, 1.22] of the init.

    Returns StepScale; ``converged=False`` means the caller should fall
    back to ``s0`` (degenerate geometry, too few points, or
    unidentifiable scale).
    """
    m = np.asarray(mask, bool)
    if m.sum() < 3 or not np.isfinite(s0) or s0 <= 0:
        return StepScale(float(s0), int(m.sum()), 0.0, False, float("inf"))
    p = np.asarray(p, np.float64)[m]
    q = np.asarray(q, np.float64)[m]
    p2 = np.asarray(p2, np.float64)[m]
    R_rig = np.asarray(R_rig, np.float64)
    t_rig = np.asarray(t_rig, np.float64)
    R = np.asarray(R, np.float64)
    u = np.asarray(u, np.float64)
    u = u / max(np.linalg.norm(u), 1e-12)
    N = p.shape[0]

    a_rig = p @ R_rig.T  # [N, 3] rotated rays, rig view
    a_tmp = p @ R.T  # [N, 3] rotated rays, next view
    qxy = q[:, :2]
    p2xy = p2[:, :2]

    if w0 is None:
        # Closed-form per-point least-squares w from the rig view alone
        # (good init; the refinement removes its bias).
        # residual(w) ~ pi(a + w t) - q is approximately linear in w near
        # the solution: solve the 2x1 LS from the linearization at w=0+.
        v0 = a_rig
        g = (t_rig[None, :2] - _proj(v0) * t_rig[2]) / v0[:, 2:3]  # [N, 2]
        r0 = _proj(v0) - qxy
        denom = np.sum(g * g, axis=1)
        w = np.where(denom > 1e-18, -np.sum(g * r0, axis=1) / np.maximum(denom, 1e-18), 1.0 / 50.0)
        w = np.clip(w, w_min, w_max)
    else:
        w = np.clip(np.asarray(w0, np.float64)[m], w_min, w_max)

    s = float(s0)
    om_t = np.ones(N)
    for _ in range(iters):
        # Residuals and per-view derivative rows at the current state.
        v_r = a_rig + w[:, None] * t_rig[None]
        v_t = a_tmp + (s * w)[:, None] * u[None]
        # Guard: points behind either camera get zero weight this round.
        ok = (v_r[:, 2] > 1e-6) & (v_t[:, 2] > 1e-6)
        pr_r = _proj(np.where(ok[:, None], v_r, np.array([0.0, 0.0, 1.0])))
        pr_t = _proj(np.where(ok[:, None], v_t, np.array([0.0, 0.0, 1.0])))
        r_r = pr_r - qxy  # [N, 2]
        r_t = pr_t - p2xy
        # d pi(a + c b)/dc = (b_xy - pi(v) b_z) / v_z
        g_r = (t_rig[None, :2] - pr_r * t_rig[2]) / v_r[:, 2:3]  # dr_r/dw
        g_c = (u[None, :2] - pr_t * u[2]) / v_t[:, 2:3]  # dr_t/dc, c = s*w
        om_r = _huber_w(np.sum(r_r * r_r, 1), huber) * ok
        om_t = _huber_w(np.sum(r_t * r_t, 1), huber) * ok

        # --- w-step: per-point 1-D GN over both views -------------------
        Jw_r = g_r  # [N, 2]
        Jw_t = s * g_c
        num = om_r * np.sum(Jw_r * r_r, 1) + om_t * np.sum(Jw_t * r_t, 1)
        den = om_r * np.sum(Jw_r * Jw_r, 1) + om_t * np.sum(Jw_t * Jw_t, 1)
        dw = -num / np.maximum(den, 1e-18)
        w = np.clip(w + np.where(den > 1e-18, dw, 0.0), w_min, w_max)

        # --- s-step: global 1-D GN over the next view -------------------
        v_t = a_tmp + (s * w)[:, None] * u[None]
        ok = ok & (v_t[:, 2] > 1e-6)
        pr_t = _proj(np.where(ok[:, None], v_t, np.array([0.0, 0.0, 1.0])))
        r_t = pr_t - p2xy
        g_c = (u[None, :2] - pr_t * u[2]) / v_t[:, 2:3]
        om_t = _huber_w(np.sum(r_t * r_t, 1), huber) * ok
        Js = w[:, None] * g_c  # dr_t/ds
        num_s = float(np.sum(om_t[:, None] * Js * r_t))
        den_s = float(np.sum(om_t[:, None] * Js * Js))
        if den_s > 1e-18:
            s = s - num_s / den_s
        if not np.isfinite(s) or s <= 1e-9:
            return StepScale(float(s0), N, 0.0, False, float("inf"))

    # Identifiability: profile Fisher information of s with each w_j
    # eliminated (Gauss-Newton marginalization). The rig view does not
    # depend on s, so the only cross term is through the temporal view.
    v_r = a_rig + w[:, None] * t_rig[None]
    v_t = a_tmp + (s * w)[:, None] * u[None]
    ok = (v_r[:, 2] > 1e-6) & (v_t[:, 2] > 1e-6)
    pr_r = _proj(np.where(ok[:, None], v_r, np.array([0.0, 0.0, 1.0])))
    pr_t = _proj(np.where(ok[:, None], v_t, np.array([0.0, 0.0, 1.0])))
    r_r = pr_r - qxy
    r_t = pr_t - p2xy
    g_r = (t_rig[None, :2] - pr_r * t_rig[2]) / v_r[:, 2:3]
    g_c = (u[None, :2] - pr_t * u[2]) / v_t[:, 2:3]
    om_r = _huber_w(np.sum(r_r * r_r, 1), huber) * ok
    om_t = _huber_w(np.sum(r_t * r_t, 1), huber) * ok
    Jw_r, Jw_t, Js = g_r, s * g_c, w[:, None] * g_c
    den_w = om_r * np.sum(Jw_r * Jw_r, 1) + om_t * np.sum(Jw_t * Jw_t, 1)
    i_ss = om_t * np.sum(Js * Js, 1)
    cross = om_t * np.sum(Js * Jw_t, 1)
    info = float(np.sum(np.maximum(
        i_ss - cross**2 / np.maximum(den_w, 1e-18), 0.0)))
    # Per-coordinate residual variance under the final weights.
    wsum = float(np.sum(2.0 * (om_r + om_t)))
    sigma2 = float(np.sum(om_r * np.sum(r_r * r_r, 1)
                          + om_t * np.sum(r_t * r_t, 1))) / max(wsum, 1e-9)
    rel_err = float(np.sqrt(sigma2 / max(info, 1e-30)) / max(s, 1e-9))

    inl = float((om_t > 0.999).mean()) if N else 0.0
    ratio = max(s / s0, s0 / s) if s > 0 else float("inf")
    ok_s = bool(np.isfinite(s) and s > 0 and rel_err < rel_err_max
                and ratio <= trust_region)
    return StepScale(float(s), N, inl, ok_s, rel_err)


def hampel_log(
    s: np.ndarray,
    window: int = 7,
    max_ratio: float = 1.5,
    mad_k: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Temporal consistency filter for per-step ABSOLUTE scales.

    Unlike the mono chain (where ratios compound and smoothing was
    measured to distort the trajectory), stereo per-step scales are
    independent absolute measurements against the calibrated rig, so
    replacing an outlier with its neighborhood median is benign. A step
    more than ``max_ratio`` away (in either direction, log space) from
    the median of the surrounding ``window`` steps is replaced by that
    median; NaN entries (failed steps) are filled the same way. Genuine
    smooth speed changes pass through untouched (adjacent GT ratios are
    a few percent); only full stops — degenerate for VO regardless —
    would be distorted.

    With ``mad_k`` the threshold is volatility-adaptive:
    ``max(log(max_ratio), mad_k * MAD(neighborhood logs))`` — a profile
    whose NEIGHBORS genuinely jump around (e.g. aggressive speed changes
    at every step) widens its own gate and passes through, while an
    isolated catastrophic step in an otherwise tight neighborhood is
    still caught. Used by the mono chain, whose per-boundary ratios may
    legitimately carry large genuine jumps.

    Returns (cleaned array, replaced/filled mask).
    """
    s = np.asarray(s, np.float64)
    n = len(s)
    out = s.copy()
    replaced = np.zeros(n, bool)
    if n == 0:
        return out, replaced
    h = max(1, window // 2)
    lim = np.log(max_ratio)
    logs = np.where(s > 0, np.log(np.maximum(s, 1e-30)), np.nan)
    for k in range(n):
        lo, hi = max(0, k - h), min(n, k + h + 1)
        neigh = np.concatenate([logs[lo:k], logs[k + 1 : hi]])
        neigh = neigh[np.isfinite(neigh)]
        if neigh.size == 0:
            continue
        m = np.median(neigh)
        thr = lim
        if mad_k is not None:
            # 1.4826 * MAD ~ sigma for a normal neighborhood.
            thr = max(lim, mad_k * 1.4826 * np.median(np.abs(neigh - m)))
        if not np.isfinite(logs[k]) or abs(logs[k] - m) > thr:
            out[k] = np.exp(m)
            replaced[k] = True
    # A fully-empty input stays as-is (caller handles).
    return out, replaced


def ratio_median_scale(
    d_met: np.ndarray,
    d_mono: np.ndarray,
    mask: np.ndarray,
    rig_depth_quantile: float = 0.4,
    min_common: int = 4,
) -> tuple[float, int, float]:
    """The r3 gated ratio-median initializer (kept as the refinement's
    starting point and as the fallback when refinement is disabled).

    Returns (scale, n_used, gated_fraction); scale = nan when underfilled.
    """
    m = np.asarray(mask, bool)
    if m.sum() < min_common:
        return float("nan"), int(m.sum()), 0.0
    near = d_met <= np.quantile(d_met[m], rig_depth_quantile)
    m2 = m & near
    gated_frac = 1.0 - float(m2.sum()) / float(m.sum())
    if m2.sum() >= min_common:
        m = m2
    return float(np.median(d_met[m] / d_mono[m])), int(m.sum()), gated_frac
