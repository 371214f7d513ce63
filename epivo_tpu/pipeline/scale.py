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


class GraphMeasurement(NamedTuple):
    """One scale-graph measurement (log units).

    - kind ``boundary``: ``value`` estimates x_b = log(m_b / m_{b-1})
      (the log speed ratio at boundary ``b``).
    - kind ``skip_boundary``: ``value`` estimates
      log |t_(b,b+2)| - log |t_(b-2,b)| — the ratio of the two COMPOSED
      two-step translation norms meeting at frame b. Couples the four
      log-scales s_{b-2}..s_{b+1} through the closure norms
      n2(k)^2 = e^{2 s_k} + e^{2 s_{k+1}} + 2 c_k e^{s_k + s_{k+1}};
      ``aux`` carries (c_{b-2}, c_b), the step-direction cosines.
    """

    b: int
    value: float
    kind: str  # 'boundary' | 'skip_boundary'
    n: int  # points behind the median
    sigma: float  # estimated std of ``value`` (log units; see below)
    aux: tuple = ()


# Per-kind error-variance floors (log-ratio units), from the measured
# per-kind error distributions on the 300-frame photoreal corridor
# (scripts/diag_scalegraph.py): the per-point scatter underestimates the
# COMMON-MODE pose-error component (a pair-pose error shifts every
# point's ratio coherently), so each kind carries an empirical floor.
# (Single-edge skip CLOSURES — solving the two-step vector triangle for
# one ratio — were evaluated and dropped: med|err| 0.17 vs 0.08, a -0.10
# systematic bias on the forward form, and their failures correlate with
# the boundary kind's. The composed-norm skip_boundary form measured
# med|err| 0.05-0.07 with ~2x the baseline parallax, and bridges two
# edges, which de-correlates it from any single bad boundary.)
GRAPH_SIGMA_FLOOR = {"boundary": 0.07, "boundary_own": 0.07,
                     "skip_boundary": 0.07}


def _gated_median_ratio(num, den, ok, flows,
                        sc) -> tuple[float, int, float] | None:
    """Flow-gated median of num/den over ok (the chain's parallax gate:
    small-parallax pose error is common-mode, so the median cannot
    average it away — keep only the best-conditioned fraction).

    Returns (median, n_used, sigma_med): sigma_med is the estimated std
    of the LOG median from the per-point log-ratio scatter
    (1.4826 * MAD / sqrt(n) * sqrt(pi/2), the asymptotic efficiency of
    the median) — an ill-conditioned boundary (noise-dominated depths)
    shows itself as wide scatter and is downweighted by the solver.
    """
    ok = np.asarray(ok, bool)
    if sc.chain_flow_topfrac > 0 and ok.sum() >= 2 * sc.min_common:
        thr = np.quantile(flows[ok], 1 - sc.chain_flow_topfrac)
        g = ok & (flows >= thr)
        if g.sum() >= sc.min_common:
            ok = g
    n = int(ok.sum())
    if n < sc.min_common:
        return None
    r = np.log(np.maximum(num[ok], 1e-12) / np.maximum(den[ok], 1e-12))
    med = float(np.median(r))
    mad = float(np.median(np.abs(r - med)))
    sigma = 1.4826 * mad / np.sqrt(n) * np.sqrt(np.pi / 2.0)
    return float(np.exp(med)), n, float(sigma)


def scale_graph_measurements(pair_data: dict, n_zeta: int,
                             sc) -> list[GraphMeasurement]:
    """Every scale measurement the extracted pairs support.

    Two measurement families, built from DIFFERENT pair poses so one bad
    two-view pose cannot corrupt them all (the failure mode of the
    sequential chain — VERDICT r4 weak #1):

    - ``boundary``: frame-b keypoints tracked backward (b, b-1) and
      forward (b, b+1); depth ratio = m_b / m_{b-1} directly (the r4
      chain's measurement).
    - ``skip_boundary``: frame-b keypoints in the backward-skip pair
      (b, b-2) and the forward-skip pair (b, b+2); depth ratio =
      |t_(b,b+2)| / |t_(b-2,b)| — twice the baseline (better
      conditioned in low-parallax stretches, the late-corridor failure
      regime) and SPANNING two edges on each side, which makes the
      measurement graph 2-connected: a single corrupted boundary can be
      bridged over instead of inherited.

    All epipolar depths run as ONE vmapped device dispatch.
    """
    import jax
    import jax.numpy as jnp

    from epivo_tpu.geometry import epipolar as _epi, se3 as _se3

    N = None
    # Depth jobs keyed by (pair_key, pose_source): rows of (T, p, p_t).
    jobs: dict = {}
    job_rows = []

    def add_job(key, T, p, pt):
        nonlocal N
        if key in jobs:
            return
        N = p.shape[0]
        jobs[key] = len(job_rows)
        job_rows.append((np.asarray(T, np.float32), p, pt))

    def flow(pair):
        return np.linalg.norm(
            (pair["p_t_full"] - pair["p_full"])[:, :2], axis=-1)

    # Enumerate measurement plans first (host), then batch the depths.
    plans = []  # (b, kind, jobA, jobB, maskA, maskB, flows, extra)
    for b in range(1, n_zeta):
        # boundary: backward pair under the previous FORWARD pose
        # (inverted) — depths in m_{b-1} units; forward pair own pose.
        back, fwd, prev = (pair_data.get((b, b - 1)),
                           pair_data.get((b, b + 1)),
                           pair_data.get((b - 1, b)))
        if back is not None and fwd is not None and prev is not None:
            Tb = np.asarray(_se3.inverse(jnp.asarray(prev["T"])))
            add_job(("bk", b), Tb, back["p_full"], back["p_t_full"])
            add_job(("fw", b), fwd["T"], fwd["p_full"], fwd["p_t_full"])
            plans.append((b, "boundary", ("bk", b), ("fw", b),
                          back["mask_full"], fwd["mask_full"],
                          np.minimum(flow(back), flow(fwd)), None))
            # Same depth sets with the backward pair's OWN pose instead
            # of the inverted forward pose: the backward-side common-mode
            # error comes from a different RANSAC solve, partially
            # de-correlating the two rows (the forward side is shared).
            add_job(("bko", b), back["T"], back["p_full"],
                    back["p_t_full"])
            plans.append((b, "boundary_own", ("bko", b), ("fw", b),
                          back["mask_full"], fwd["mask_full"],
                          np.minimum(flow(back), flow(fwd)), None))
    def step_cosine(k: int) -> float:
        """cos angle between step k's direction (rotated into frame k+2)
        and step k+1's: c_k in the composed-norm model. 1.0 (colinear)
        when a pose is missing — exact for straight motion and a benign
        approximation elsewhere (|c| <= 1 regardless)."""
        pa = pair_data.get((k, k + 1))
        pb2 = pair_data.get((k + 1, k + 2))
        if pa is None or pb2 is None:
            return 1.0
        t1 = np.asarray(pa["T"], np.float64)[:3, 3]
        R2 = np.asarray(pb2["T"], np.float64)[:3, :3]
        t2 = np.asarray(pb2["T"], np.float64)[:3, 3]
        n = np.linalg.norm(t1) * np.linalg.norm(t2)
        if n < 1e-12:
            return 1.0
        return float(np.clip(t2 @ (R2 @ t1) / n, -1.0, 1.0))

    for b in range(2, n_zeta - 1):
        # skip_boundary: backward-skip (b, b-2) and forward-skip
        # (b, b+2), both under their OWN two-view poses.
        bs_ = pair_data.get((b, b - 2))
        fs_ = pair_data.get((b, b + 2))
        if bs_ is not None and fs_ is not None:
            add_job(("bs", b), bs_["T"], bs_["p_full"], bs_["p_t_full"])
            add_job(("fs", b), fs_["T"], fs_["p_full"], fs_["p_t_full"])
            plans.append((b, "skip_boundary", ("bs", b), ("fs", b),
                          bs_["mask_full"], fs_["mask_full"],
                          np.minimum(flow(bs_), flow(fs_)),
                          (step_cosine(b - 2), step_cosine(b))))
    if not plans:
        return []

    @jax.jit
    def depths_all(T, p, pt):
        def one(T1, p1, pt1):
            return _epi.epipolar_depth(T1[:3, :3], T1[:3, 3], p1, pt1)

        return jax.vmap(one)(T, p, pt)

    Ts = jnp.asarray(np.stack([r[0] for r in job_rows]))
    ps = jnp.asarray(np.stack([r[1] for r in job_rows]))
    pts = jnp.asarray(np.stack([r[2] for r in job_rows]))
    d_all, v_all = map(np.asarray, depths_all(Ts, ps, pts))

    out = []
    for b, kind, ja, jb, ma, mb, flows, extra in plans:
        ia, ib = jobs[ja], jobs[jb]
        da, va = d_all[ia], v_all[ia]
        db_, vb_ = d_all[ib], v_all[ib]
        ok = (va & vb_ & np.asarray(ma, bool) & np.asarray(mb, bool)
              & (da > sc.depth_min) & (da < sc.depth_max)
              & (db_ > sc.depth_min) & (db_ < sc.depth_max))
        med = _gated_median_ratio(da, db_, ok, flows, sc)
        if med is None:
            continue
        ratio, n_used, sig = med
        if ratio > 0 and np.isfinite(ratio):
            sig = float(max(sig, GRAPH_SIGMA_FLOOR.get(kind, 0.1)))
            out.append(GraphMeasurement(b, float(np.log(ratio)), kind,
                                        n_used, sig,
                                        extra if extra is not None else ()))
    return out


def _log_n2(sa: np.ndarray, sb: np.ndarray, c: float):
    """log |composed two-step translation| for log-scales (sa, sb) with
    direction cosine c, plus its partials d/dsa, d/dsb."""
    ea2 = np.exp(2 * sa)
    eb2 = np.exp(2 * sb)
    eab = np.exp(sa + sb)
    n2 = np.maximum(ea2 + eb2 + 2 * c * eab, 1e-30)
    da = (ea2 + c * eab) / n2
    db = (eb2 + c * eab) / n2
    return 0.5 * np.log(n2), da, db


def scale_graph_solve(meas: list[GraphMeasurement], n_zeta: int,
                      sc) -> np.ndarray:
    """Joint Huber-robust solve of the scale measurement graph -> c_scale.

    Unknowns are the per-step LOG scales s_0..s_{Z-1} (gauge s_0 = 0).
    The energy is

        sum_m  w_m * huber((model_m(s) - value_m) / sigma_m)
      + sum_b  ((s_b - s_{b-1}) / graph_prior_sigma)^2

    with model = s_b - s_{b-1} for ``boundary`` rows and the composed-
    norm difference for ``skip_boundary`` rows (see
    :func:`scale_graph_measurements`). Solved by IRLS Gauss-Newton (the
    system is a banded Z x Z solve, microseconds at trajectory sizes),
    initialized from the per-edge weighted-median chain.

    Why this beats the sequential chain (VERDICT r4 weak #1): a chain
    inherits every boundary error forever; here a corrupted boundary is
    (a) down-weighted by its own scatter-based sigma, (b) out-voted by
    the skip_boundary rows that BRIDGE it with twice the baseline, and
    (c) capped by the Huber loss, while the weak constant-speed prior
    holds the scale through stretches where every measurement family
    degrades together (low parallax). A final Hampel pass over the
    solved ratios (config ``chain_hampel_*``) remains as the
    catastrophic net. Returns c [n_zeta] with c[0] = 1.
    """
    Z = n_zeta
    delta = float(sc.graph_huber)
    wp = 1.0 / max(sc.graph_prior_sigma, 1e-6) ** 2

    # Init: per-edge weighted median of the boundary rows (prior-free),
    # cumulated into s.
    x0 = np.zeros(Z, np.float64)
    by_edge: dict[int, list[GraphMeasurement]] = {}
    for m in meas:
        if m.kind in ("boundary", "boundary_own") and 1 <= m.b < Z:
            by_edge.setdefault(m.b, []).append(m)
    for b, ms in by_edge.items():
        v = np.array([m.value for m in ms])
        w0 = 1.0 / np.array([m.sigma for m in ms]) ** 2
        order = np.argsort(v)
        cw = np.cumsum(w0[order])
        x0[b] = float(v[order][np.searchsorted(cw, 0.5 * cw[-1])])
    s = np.concatenate([[0.0], np.cumsum(x0[1:])])

    rows = [m for m in meas
            if (m.kind in ("boundary", "boundary_own") and 1 <= m.b < Z)
            or (m.kind == "skip_boundary" and 2 <= m.b < Z - 1
                and len(m.aux) == 2)]
    if rows and Z >= 2:
        vals = np.array([m.value for m in rows])
        sigs = np.array([m.sigma for m in rows])
        # Stage 1: Huber IRLS (bounded outlier pull, safe from any init).
        # Stage 2: redescending — from the Huber solution, measurements
        # whose ABSOLUTE log residual exceeds graph_cut are rejected
        # outright instead of retaining the constant pull Huber grants
        # them. The cut is absolute (not sigma-normalized): a
        # catastrophic row comes from a wrong two-view pose and is off
        # by 1.5+ in log (a >2x per-frame speed error, physically
        # implausible), while honest low-parallax rows err <=~0.5 —
        # sigma-normalized cuts were measured to over-reject exactly
        # those honest rows in the late-corridor cluster and push the
        # solve onto the bare prior (len_ratio 1.4-1.6).
        for it in range(28):
            cut = it >= 20
            A_rows, resid = [], []
            for m in rows:
                if m.kind != "skip_boundary":
                    pred = s[m.b] - s[m.b - 1]
                    jac = {m.b: 1.0, m.b - 1: -1.0}
                else:
                    cl, cr = m.aux
                    lr, dra, drb = _log_n2(s[m.b], s[m.b + 1], cr)
                    ll, dla, dlb = _log_n2(s[m.b - 2], s[m.b - 1], cl)
                    pred = lr - ll
                    jac = {m.b: dra, m.b + 1: drb,
                           m.b - 2: -dla, m.b - 1: -dlb}
                A_rows.append(jac)
                resid.append(pred)
            resid = np.array(resid) - vals
            r_n = resid / sigs
            w = np.minimum(1.0, delta / np.maximum(np.abs(r_n), 1e-12)) \
                / sigs**2
            if cut:
                w = w * (np.abs(resid) < sc.graph_cut)
            # Normal equations H ds = -g over s[1:] (s[0] gauge-fixed).
            H = np.zeros((Z, Z))
            g = np.zeros(Z)
            for jac, r, wi in zip(A_rows, resid, w):
                ks = list(jac)
                for k1 in ks:
                    g[k1] += wi * jac[k1] * r
                    for k2 in ks:
                        H[k1, k2] += wi * jac[k1] * jac[k2]
            # Constant-speed prior on consecutive differences.
            for b in range(1, Z):
                d = s[b] - s[b - 1]
                g[b] += wp * d
                g[b - 1] -= wp * d
                H[b, b] += wp
                H[b - 1, b - 1] += wp
                H[b, b - 1] -= wp
                H[b - 1, b] -= wp
            Hs = H[1:, 1:] + 1e-9 * np.eye(Z - 1)
            ds = np.linalg.solve(Hs, -g[1:])
            s[1:] += ds
            if np.abs(ds).max() < 1e-9:
                break

    ratios = np.exp(np.diff(s))
    if sc.chain_hampel_ratio > 0 and Z > 2:
        ratios, _ = hampel_log(
            ratios, window=sc.chain_hampel_window,
            max_ratio=sc.chain_hampel_ratio,
            mad_k=sc.chain_hampel_mad_k or None)
    c = np.concatenate([[1.0], np.cumprod(ratios)])
    return c.astype(np.float32)


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
