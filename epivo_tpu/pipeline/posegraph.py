"""Multi-loop Sim(3) pose-graph optimization (host f64).

``close_loops`` applies verified loops GREEDILY — one loop per
non-overlapping span, each spread independently — which is exact for a
single revisit but cannot reconcile several loops whose spans overlap
(two laps of a course constrain the same intervening poses twice; the
greedy pass must drop one). This module closes that gap (PARITY known
gaps, "multi-loop Sim(3) pose-GRAPH optimization") with the standard
scale-drift-aware pose graph [Strasdat et al., CVPR'10] built the way
everything host-side in this package is built: tiny, f64, numpy — the
graph has O(F/stride) nodes with 7 DoF each, far below anything worth a
device dispatch (the reference has no loop machinery at all; its global
polish, kitti_ba.cpp:853-870, only ever sees short-span constraints).

Formulation
-----------
Node k carries a Sim(3) ``N_k = [[s_k R_k, t_k], [0, 1]]`` mapping the
frame's SCALED local coordinates to world: monocular chain poses drift
in scale, so local structure at node k lives in units ``sigma_k`` times
the gauge; ``s_k`` estimates ``1 / sigma_k`` (drift inverse) and is
initialized to 1 with the chain pose. Relative prediction
``P_ab = N_a^{-1} N_b`` has scale ``s_b / s_a`` and translation in a's
local units — exactly matching the two measurement families:

- **odometry edges** (consecutive nodes): the chain's relative SE(3)
  embedded with scale 1 (the chain cannot see its own drift, so the
  scale component gets a weak, span-proportional weight);
- **loop edges**: ``verify_loop``'s relative pose (translation already
  in chain-units-at-i) embedded with scale ``1 / sigma_meas`` where
  ``sigma_meas`` is ``measure_scale_drift``'s accumulated drift factor
  (zero-baseline loops carry no scale observation: weight ~0).

Residual per edge: ``r = log_sim3(M^{-1} P_ab)`` in R^7, diagonal
per-component weights, Huber IRLS on loop edges (a geometrically
verified but false loop must not bend the whole graph), Levenberg
damping, gauge fixed by pinning node 0. Jacobians are forward
differences on the 14 involved parameters — each column is two 4x4
matmuls and a log, negligible at graph size.

The corrected full-resolution trajectory is rebuilt segment-by-segment:
within each node interval the original steps are kept, their norms
re-scaled by the geometric interpolation of the solved drift, and the
remaining endpoint discrepancy spread rigidly (same local-frame ramp as
``loopclose.spread_drift``) — endpoint-exact at every node.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from epivo_tpu.pipeline.loopclose import (Loop, se3_exp_np, se3_log_np,
                                          _so3_exp_np)

_EPS = 1e-10


# ---------------------------------------------------------------------------
# Sim(3) exp / log (closed form, f64)


def _hat(w: np.ndarray) -> np.ndarray:
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def _so3_log_np(R: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(cos)
    if th < 1e-9:
        return 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                               R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])


def _calc_W(phi: np.ndarray, lam: float) -> np.ndarray:
    """W(phi, lam) = integral_0^1 e^{t lam} e^{t hat(phi)} dt.

    The Sim(3) analogue of SE(3)'s V matrix: t = W rho. Closed form via
    the three scalar integrals (series guards for the small-angle /
    small-log-scale limits)."""
    th = float(np.linalg.norm(phi))
    s = np.exp(lam)
    K = _hat(phi)
    if abs(lam) > 1e-5:
        a = (s - 1.0) / lam
    else:
        a = 1.0 + lam / 2.0 + lam * lam / 6.0
    den = lam * lam + th * th
    if th > 1e-5:
        b = (s * (lam * np.sin(th) - th * np.cos(th)) + th) / den
        c = a - (s * (lam * np.cos(th) + th * np.sin(th)) - lam) / den
        return a * np.eye(3) + (b / th) * K + (c / th**2) * (K @ K)
    # th -> 0: b/th -> int t e^{t lam}, c/th^2 -> int (t^2/2) e^{t lam}
    if abs(lam) > 1e-5:
        b_over_th = (s * (lam - 1.0) + 1.0) / (lam * lam)
        c_over_th2 = (s * (lam * lam - 2 * lam + 2) - 2.0) / (2 * lam**3)
    else:
        b_over_th = 0.5 + lam / 3.0
        c_over_th2 = 1.0 / 6.0 + lam / 8.0
    return a * np.eye(3) + b_over_th * K + c_over_th2 * (K @ K)


def sim3_exp(xi: np.ndarray) -> np.ndarray:
    """[7] (rho, phi, lam) -> [4, 4] [[e^lam R, W rho], [0, 1]]."""
    xi = np.asarray(xi, np.float64)
    rho, phi, lam = xi[:3], xi[3:6], float(xi[6])
    S = np.eye(4)
    S[:3, :3] = np.exp(lam) * _so3_exp_np(phi)
    S[:3, 3] = _calc_W(phi, lam) @ rho
    return S


def sim3_log(S: np.ndarray) -> np.ndarray:
    """[4, 4] Sim(3) -> [7] (rho, phi, lam)."""
    S = np.asarray(S, np.float64)
    sR = S[:3, :3]
    s = float(np.cbrt(np.linalg.det(sR)))
    lam = np.log(max(s, _EPS))
    R = sR / s
    phi = _so3_log_np(R)
    rho = np.linalg.solve(_calc_W(phi, lam), S[:3, 3])
    return np.concatenate([rho, phi, [lam]])


def sim3_inv(S: np.ndarray) -> np.ndarray:
    sR = S[:3, :3]
    s2 = float(np.cbrt(np.linalg.det(sR))) ** 2
    out = np.eye(4)
    out[:3, :3] = sR.T / s2  # (sR)^-1 = R^T / s
    out[:3, 3] = -out[:3, :3] @ S[:3, 3]
    return out


# ---------------------------------------------------------------------------
# Graph construction + Gauss-Newton


class Sim3Edge(NamedTuple):
    a: int  # node position (not frame index)
    b: int
    M: np.ndarray  # [4, 4] measured Sim3, maps X_b -> X_a (a <- b)
    w: np.ndarray  # [7] per-component sqrt-information (rho, phi, lam)
    huber: float  # residual-norm Huber delta; 0 = quadratic (odometry)


def _edge_residual(nodes: np.ndarray, e: Sim3Edge) -> np.ndarray:
    P = sim3_inv(nodes[e.a]) @ nodes[e.b]
    return sim3_log(sim3_inv(e.M) @ P)


def optimize_sim3_graph(nodes: np.ndarray, edges: list[Sim3Edge],
                        iters: int = 30, mu0: float = 1e-4,
                        ) -> tuple[np.ndarray, float]:
    """Levenberg-damped Gauss-Newton over Sim(3) nodes; node 0 pinned.

    nodes: [N, 4, 4] initial Sim(3) guesses (chain poses, s=1).
    Returns (optimized nodes, final robust cost). Forward-difference
    Jacobians on the 14 parameters each edge touches; Huber IRLS weights
    recomputed every iteration from the edge's current residual norm.
    """
    nodes = np.asarray(nodes, np.float64).copy()
    N = len(nodes)
    dim = 7 * (N - 1)  # node 0 pinned

    def robust_w(e: Sim3Edge, r: np.ndarray) -> float:
        if e.huber <= 0:
            return 1.0
        nrm = float(np.linalg.norm(e.w * r))
        return 1.0 if nrm <= e.huber else e.huber / nrm

    def cost(nds) -> float:
        c = 0.0
        for e in edges:
            r = e.w * _edge_residual(nds, e)
            n2 = float(r @ r)
            if e.huber > 0 and n2 > e.huber**2:
                n = np.sqrt(n2)
                c += e.huber * (2 * n - e.huber)
            else:
                c += n2
        return c

    mu = mu0
    cur = cost(nodes)
    h = 1e-7
    for _ in range(iters):
        H = np.zeros((dim, dim))
        g = np.zeros(dim)
        for e in edges:
            r0 = _edge_residual(nodes, e)
            rw = robust_w(e, r0)
            J = np.zeros((7, 14))
            for c in range(14):
                node, k = (e.a, c) if c < 7 else (e.b, c - 7)
                if node == 0:
                    continue
                d = np.zeros(7)
                d[k] = h
                pert = nodes[node] @ sim3_exp(d)
                if c < 7:
                    P = sim3_inv(pert) @ nodes[e.b]
                else:
                    P = sim3_inv(nodes[e.a]) @ pert
                J[:, c] = (sim3_log(sim3_inv(e.M) @ P) - r0) / h
            Jw = (e.w[:, None] * J) * np.sqrt(rw)
            rw_vec = (e.w * r0) * np.sqrt(rw)
            idx = []
            cols = []
            if e.a != 0:
                idx.append(np.arange(7 * (e.a - 1), 7 * e.a))
                cols.append(Jw[:, :7])
            if e.b != 0:
                idx.append(np.arange(7 * (e.b - 1), 7 * e.b))
                cols.append(Jw[:, 7:])
            for ii, Ji in zip(idx, cols):
                g[ii] += Ji.T @ rw_vec
                for jj, Jj in zip(idx, cols):
                    H[np.ix_(ii, jj)] += Ji.T @ Jj
        if float(np.abs(g).max(initial=0.0)) < 1e-12:
            break
        ok = False
        for _try in range(8):
            try:
                delta = np.linalg.solve(
                    H + mu * np.diag(np.maximum(np.diag(H), 1e-12)), -g)
            except np.linalg.LinAlgError:
                mu *= 10
                continue
            cand = nodes.copy()
            for k in range(1, N):
                cand[k] = nodes[k] @ sim3_exp(delta[7 * (k - 1): 7 * k])
            c_new = cost(cand)
            if c_new < cur:
                nodes, cur = cand, c_new
                mu = max(mu / 3, 1e-9)
                ok = True
                break
            mu *= 10
        if not ok:
            break
    return nodes, cur


# ---------------------------------------------------------------------------
# Building the graph from a trajectory + verified loops


def _se3_embed(T: np.ndarray, s_rel: float) -> np.ndarray:
    """Embed an SE(3) measurement as Sim(3) with relative scale s_rel
    (scale multiplies only the rotation block: the translation is fixed
    in the SOURCE node's local units by construction of P_ab)."""
    M = np.asarray(T, np.float64).copy()
    M[:3, :3] = s_rel * M[:3, :3]
    return M


def build_graph(traj: np.ndarray, loops: list[Loop],
                node_idx: list[int],
                odo_t_sigma: float = 0.03,
                # Rotation trust is deliberately LOOSE (0.02 rad/edge):
                # swept across a clean-drift and a catastrophic-turn
                # regime (30% rotation collapse through one arc, the
                # failure KLT actually produces), 0.02 is neutral on the
                # former and 20% better on the latter — verified loop
                # rotations (Huber + chi2-pruned) deserve to dominate a
                # chain segment that is grossly wrong.
                odo_r_sigma: float = 0.02,
                odo_s_rate: float = 0.004,
                loop_t_frac: float = 0.05,
                loop_r_sigma: float = 0.01,
                loop_s_sigma: float = 0.05,
                huber: float = 3.0) -> tuple[np.ndarray, list[Sim3Edge]]:
    """Nodes (chain poses at node_idx, s=1) + odometry and loop edges.

    Odometry scale sigma grows as ``odo_s_rate * span_frames`` — the
    chain's scale random-walk — so loop scale observations dominate over
    long spans but cannot bend a single step. Translation sigmas are
    relative (fraction of the measured norm, floored) since both
    families measure in local chain units.
    """
    traj = np.asarray(traj, np.float64)
    pos = {f: k for k, f in enumerate(node_idx)}
    nodes = traj[np.asarray(node_idx)].copy()
    edges: list[Sim3Edge] = []
    for k in range(len(node_idx) - 1):
        a, b = node_idx[k], node_idx[k + 1]
        T_ab = np.linalg.inv(traj[a]) @ traj[b]
        tn = float(np.linalg.norm(T_ab[:3, 3]))
        span = max(b - a, 1)
        w = np.concatenate([
            np.full(3, 1.0 / max(odo_t_sigma * max(tn, 0.1), _EPS)),
            np.full(3, 1.0 / odo_r_sigma),
            [1.0 / (odo_s_rate * span)],
        ])
        edges.append(Sim3Edge(k, k + 1, _se3_embed(T_ab, 1.0), w, 0.0))
    for lp in loops:
        if lp.i not in pos or lp.j not in pos:
            continue
        # verify_loop's T_meas maps X_i -> X_j; the edge measurement is
        # the i <- j map with relative scale 1/sigma (sigma = accumulated
        # drift sigma_j / sigma_i; s_k estimates its inverse).
        T_ij = np.linalg.inv(np.asarray(lp.T_meas, np.float64))
        tn = float(np.linalg.norm(T_ij[:3, 3]))
        zero_baseline = tn < 1e-9 or not np.isfinite(lp.sigma)
        s_rel = 1.0 if zero_baseline else 1.0 / float(lp.sigma)
        # Measurement information grows ~ sqrt(inliers): a 400-inlier
        # revisit must out-pull a marginal 30-inlier one when they
        # conflict (Huber alone equalizes large residuals to a constant
        # pull, so relative weight IS the tie-breaker).
        inl = np.clip(np.sqrt(max(lp.n_inliers, 1) / 100.0), 0.5, 4.0)
        w = inl * np.concatenate([
            np.full(3, 1.0 / max(loop_t_frac * max(tn, 0.1), _EPS)),
            np.full(3, 1.0 / loop_r_sigma),
            [0.0 if zero_baseline or lp.sigma == 1.0
             else 1.0 / loop_s_sigma],
        ])
        edges.append(Sim3Edge(pos[lp.i], pos[lp.j], _se3_embed(T_ij, s_rel),
                              w, huber))
    return nodes, edges


def _fit_segment(sub: np.ndarray, Ta_new: np.ndarray, Tb_new: np.ndarray,
                 ls_a: float, ls_b: float) -> np.ndarray:
    """Rebuild poses between two solved nodes, endpoint-exact at both.

    sub: original chain poses [m+1, 4, 4] from node a to node b. Step
    norms are multiplied by the geometric interpolation of the solved
    drift-inverse exp(ls) (= s_k, chain units -> gauge units), then the
    remaining endpoint discrepancy is spread rigidly in the local frame
    (the spread_drift ramp restricted to one segment)."""
    m = len(sub) - 1
    if m == 0:
        return Ta_new[None].copy()
    steps = np.linalg.inv(sub[:-1]) @ sub[1:]
    for k in range(m):
        a = (k + 0.5) / m
        steps[k, :3, 3] *= np.exp((1 - a) * ls_a + a * ls_b)
    out = np.empty_like(sub)
    out[0] = Ta_new
    for k in range(m):
        out[k + 1] = out[k] @ steps[k]
    Ta_inv = np.linalg.inv(Ta_new)
    Delta = Ta_inv @ Tb_new @ np.linalg.inv(out[m]) @ Ta_new
    xi = se3_log_np(Delta)
    base = out.copy()
    for k in range(1, m + 1):
        out[k] = Ta_new @ se3_exp_np(k / m * xi) @ Ta_inv @ base[k]
    return out


def optimize_pose_graph(traj: np.ndarray, loops: list[Loop],
                        stride: int = 8, iters: int = 30,
                        **graph_kwargs) -> np.ndarray:
    """Joint multi-loop correction of a full trajectory.

    Nodes are placed on the keyframe stride plus every loop endpoint and
    both trajectory ends; the Sim(3) graph is solved; the full-res
    trajectory is rebuilt segment-by-segment (original steps, solved
    scale ramp, rigid endpoint spread). With a single loop this agrees
    with ``spread_drift``'s behavior (endpoint-exact closure, drift
    distributed along the span) while overlapping multi-loop spans are
    reconciled jointly instead of greedily dropped."""
    traj64 = np.asarray(traj, np.float64)
    F = len(traj64)
    idx = set(range(0, F, stride)) | {F - 1}
    for lp in loops:
        idx.update((int(lp.i), int(lp.j)))
    node_idx = sorted(i for i in idx if 0 <= i < F)
    nodes0, edges = build_graph(traj64, loops, node_idx, **graph_kwargs)
    if not any(e.huber > 0 for e in edges):
        return np.asarray(traj)
    nodes, _ = optimize_sim3_graph(nodes0, edges, iters=iters)
    # Outlier-edge pruning (the essential-graph chi^2 pass): a FALSE
    # loop that survived geometric verification keeps a large robust
    # residual at the Huber-converged solution — mutually-consistent
    # true loops are satisfied, the contradiction cannot be. Drop loop
    # edges whose weighted residual norm stays far outside the Huber
    # band and re-solve FROM THE CHAIN (the first solution was bent by
    # the outlier's constant pull). Never prunes the whole loop set.
    loop_edges = [e for e in edges if e.huber > 0]
    resid = {id(e): float(np.linalg.norm(e.w * _edge_residual(nodes, e)))
             for e in loop_edges}
    cut = 4.0 * max(e.huber for e in loop_edges)
    keep_best = min(loop_edges, key=lambda e: resid[id(e)])
    pruned = [e for e in loop_edges
              if resid[id(e)] > cut and e is not keep_best]
    if pruned:
        pruned_ids = {id(e) for e in pruned}
        survivors = [e for e in edges if id(e) not in pruned_ids]
        nodes, _ = optimize_sim3_graph(nodes0, survivors, iters=iters)
    # Per-node solved pose (SE(3) part) + log drift-inverse.
    ls = np.empty(len(nodes))
    T_new = np.empty_like(nodes)
    for k, S in enumerate(nodes):
        s = float(np.cbrt(np.linalg.det(S[:3, :3])))
        ls[k] = np.log(max(s, _EPS))
        T_new[k] = np.eye(4)
        T_new[k, :3, :3] = S[:3, :3] / s
        T_new[k, :3, 3] = S[:3, 3]
    out = np.empty_like(traj64)
    for k in range(len(node_idx) - 1):
        a, b = node_idx[k], node_idx[k + 1]
        seg = _fit_segment(traj64[a: b + 1], T_new[k], T_new[k + 1],
                           ls[k], ls[k + 1])
        out[a: b + 1] = seg
    return out.astype(np.asarray(traj).dtype)
