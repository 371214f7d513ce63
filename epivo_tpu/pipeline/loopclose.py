"""Loop closure: keyframe retrieval + verification + drift correction.

The reference framework has no loop closure or relocalization of any
kind (PARITY known gaps) — windowed BA and the global polish only see
short-span constraints, so long-trajectory drift is uncorrectable there.
This module adds the standard three-stage closure, each stage built the
TPU way:

1. **Retrieval** — every keyframe's ORB descriptors are matched against
   every earlier keyframe's in ONE jitted pass: the [M, M] Hamming
   tables are MXU matmuls over the whole keyframe set (`lax.map` over
   queries, batched table per query), mutual-match counts are the
   similarity score. No vocabulary tree / BoW: at framework keyframe
   counts (hundreds) brute-force descriptor scoring on the MXU is faster
   than tree traversal and has no training artifact.
2. **Verification** — the shortlisted pair runs the existing two-view
   ORB pipeline (`vo.vo_step_orb`: match -> RANSAC-E -> recoverPose ->
   LM), giving the loop relative pose with an inlier count to gate on.
   The loop's translation NORM (monocular!) is recovered through shared
   structure: frame i's keypoints are triangulated in BOTH the loop pair
   (units |t_loop|) and the ADJACENT-frame pair (i, i+1) (units
   |t_i,i+1|), and the depth-ratio median gives |t_loop| / |t_i,i+1|;
   |t_i,i+1| is read off the trajectory chain. The adjacent frame — not
   the next keyframe — is stored precisely for this: descriptor matching
   across a multi-metre forward step dies of scale change (measured on
   the loop fixture: 1 match at 4.8 m vs 445 at the zero-baseline
   revisit), while the one-frame pair is trivial.
3. **Correction** — SE(3) drift spreading: the discrepancy between the
   trajectory-predicted and measured loop transforms is distributed
   along the intervening poses in each pose's local frame
   (`spread_drift`), exactly closing the loop at the endpoints. (A full
   Sim(3) pose graph that also redistributes per-step scale is the
   natural next stage on top of `parallel/global_ba`.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from epivo_tpu.geometry import se3
from epivo_tpu.pipeline.config import LoopConfig, VOConfig


class Loop(NamedTuple):
    i: int  # earlier frame index
    j: int  # later frame index (revisit)
    T_meas: np.ndarray  # [4, 4] measured i->j transform, |t| in chain units
    n_inliers: int
    score: int  # retrieval mutual-match count


def keyframe_half(frame: np.ndarray) -> np.ndarray:
    """Half-resolution keyframe copy (2x2 box filter): quarter memory and
    4x cheaper ORB, while verification angles are resolution-invariant."""
    f = np.asarray(frame, np.float32)
    H2, W2 = f.shape[0] // 2, f.shape[1] // 2
    f = f[: 2 * H2, : 2 * W2]
    return 0.25 * (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2]
                   + f[1::2, 1::2])


def _describe_batch(imgs: jnp.ndarray, cfg: LoopConfig, fast_threshold):
    """[N, H, W] keyframes -> (signs [N, M, 256], valid [N, M]) via the
    pyramid ORB detector (one jitted vmap)."""
    from epivo_tpu.frontend import orb

    def one(img):
        kp, d, _ = orb.detect_and_describe_pyramid(
            img, fast_threshold, cfg.max_keypoints)
        return d.signs, kp.valid & d.valid

    return jax.jit(jax.vmap(one))(imgs)


def retrieval_scores(signs: jnp.ndarray, valid: jnp.ndarray,
                     max_dist: float) -> jnp.ndarray:
    """[N, N] mutual-match counts between all keyframe pairs.

    score[q, k] = number of descriptors in q whose nearest neighbor in k
    is mutual AND within the Hamming gate — the same criterion the
    verifier's matcher applies, so retrieval score predicts verifiability.
    One jitted lax.map over queries; each row is a batch of MXU matmuls.
    """

    @jax.jit
    def run(signs, valid):
        B = signs.shape[-1]

        def score_query(q):
            sq, vq = signs[q], valid[q]  # [M, B], [M]
            D = (B - jnp.einsum("mb,knb->kmn", sq, signs)) * 0.5
            big = jnp.float32(1e9)
            D = jnp.where(vq[None, :, None], D, big)
            D = jnp.where(valid[:, None, :], D, big)
            best2 = jnp.argmin(D, axis=2)  # [N, M]
            dist = jnp.min(D, axis=2)
            best1 = jnp.argmin(D, axis=1)  # [N, M']
            mutual = (
                jnp.take_along_axis(best1, best2, axis=1)
                == jnp.arange(sq.shape[0])[None, :]
            )
            return jnp.sum(mutual & (dist <= max_dist), axis=1)  # [N]

        return jax.lax.map(score_query, jnp.arange(signs.shape[0]))

    return run(signs, valid)


def shortlist(scores: np.ndarray, kf_idx: list[int],
              cfg: LoopConfig) -> list[tuple[int, int, int]]:
    """Pick per-query best earlier keyframe passing gap + score gates.

    Returns [(qi_pos, ki_pos, score)] sorted by score descending (at most
    one candidate per query keyframe)."""
    scores = np.asarray(scores)
    out = []
    for q in range(len(kf_idx)):
        best, bk = 0, -1
        for k in range(q):
            if kf_idx[q] - kf_idx[k] < cfg.min_gap:
                continue
            if scores[q, k] > best:
                best, bk = int(scores[q, k]), k
        if bk >= 0 and best >= cfg.min_matches:
            out.append((q, bk, best))
    out.sort(key=lambda r: -r[2])
    return out


def verify_loop(img_i: np.ndarray, img_j: np.ndarray,
                img_i_next: np.ndarray, t_next_norm: float,
                vo_cfg: VOConfig, key) -> tuple[np.ndarray, int] | None:
    """Geometric verification + monocular norm recovery for one candidate.

    Runs the ORB two-view step on (i, j) and on the adjacent pair
    (i, i+1); frame i's keypoints shared between the two triangulations
    give |t_loop| / |t_i,i+1| as a depth-ratio median (same
    shared-structure scheme as the no-GT chain); ``t_next_norm`` (the
    trajectory's step norm) converts to chain units.
    Returns (T_meas [4, 4] with scaled translation, n_inliers) or None.
    """
    from epivo_tpu.pipeline import vo

    k1, k2 = jax.random.split(key)
    step = jax.jit(lambda a, b, k: vo.vo_step_orb(a, b, k, vo_cfg))
    r_loop = step(jnp.asarray(img_i), jnp.asarray(img_j), k1)
    r_next = step(jnp.asarray(img_i), jnp.asarray(img_i_next), k2)
    n_inl = int(r_loop.n_inliers)
    if bool(np.asarray(r_loop.reverted)) or bool(np.asarray(r_next.reverted)):
        return None
    T = np.asarray(r_loop.T, np.float64).copy()
    n = np.linalg.norm(T[:3, 3])
    d_loop = np.asarray(r_loop.points)[:, 2]
    d_next = np.asarray(r_next.points)[:, 2]
    lv = np.asarray(r_loop.points_valid)
    ok = (lv & np.asarray(r_next.points_valid)
          & (d_loop > 1e-3) & (d_next > 1e-3))
    if ok.sum() >= 8 and n > 1e-9:
        # Shared structure available: monocular norm through the
        # depth-ratio median against the adjacent pair.
        ratio = float(np.median(d_next[ok] / d_loop[ok]))
        if not np.isfinite(ratio) or ratio <= 0:
            return None
        T[:3, 3] *= ratio * t_next_norm / n
        return T, n_inl
    if lv.sum() < 0.2 * max(n_inl, 1):
        # The loop pair itself is parallax-degenerate: virtually no
        # inlier triangulates (||P' R p|| gate fails when p_t ~ R p) —
        # i.e. the match is epipolar-consistent with ZERO baseline. That
        # IS the measurement: the revisit coincides with the original
        # pose up to a translation the image data cannot resolve. Use the
        # (accurately recovered) rotation with t = 0 — the strongest
        # possible positional constraint, and exactly right for
        # out-and-back / stop-and-revisit loops.
        T[:3, 3] = 0.0
        return T, n_inl
    return None


def spread_drift(traj: np.ndarray, i: int, j: int,
                 T_meas: np.ndarray) -> np.ndarray:
    """Distribute the loop discrepancy along poses i..j (local frames).

    traj: [F, 4, 4] camera-to-world. T_meas maps X_i -> X_j (the vo pair
    convention), translation already in chain units. The measured world
    pose of j is traj_i @ inv(T_meas); the discrepancy, anchored in pose
    i's frame (Delta = inv(traj_i) @ traj_j_meas @ inv(traj_j) @ traj_i),
    is applied as traj'_k = traj_i @ exp(alpha_k log(Delta)) @
    inv(traj_i) @ traj_k with alpha ramping 0 -> 1 over [i, j] and
    staying 1 after j (a rigid carry of the post-loop segment).
    Anchoring at pose i gives rotational drift its physical lever arm —
    interior position corrections grow with distance from the anchor,
    matching how yaw drift actually accumulates. Endpoint-exact:
    inv(traj'_i) @ traj'_j == inv(T_meas).
    """
    traj = np.asarray(traj, np.float64)
    Ti = traj[i]
    Ti_inv = np.linalg.inv(Ti)
    traj_j_meas = Ti @ np.linalg.inv(T_meas)
    Delta = Ti_inv @ traj_j_meas @ np.linalg.inv(traj[j]) @ Ti
    xi = np.asarray(se3.se3_log(jnp.asarray(Delta)))
    out = traj.copy()
    F = traj.shape[0]
    for k in range(i + 1, F):
        a = min(1.0, (k - i) / max(j - i, 1))
        C = np.asarray(se3.se3_exp(jnp.asarray(a * xi)), np.float64)
        out[k] = Ti @ C @ Ti_inv @ traj[k]
    return out


def close_loops(traj: np.ndarray, keyframes: dict[int, np.ndarray],
                config, vo_cfg_half: VOConfig, seed: int = 0,
                mlog=None) -> tuple[np.ndarray, list[Loop]]:
    """Full loop-closure pass over an assembled trajectory.

    keyframes: {frame_idx: half-res image}; each keyframe index k must
    also have its adjacent frame k+1 stored (the norm-recovery pair).
    Returns (corrected trajectory, applied loops). Detection is one
    jitted retrieval pass; each accepted loop is verified and spread in
    turn (later candidates are re-predicted against the already-corrected
    trajectory).
    """
    from epivo_tpu.frontend.orb import PATCH

    lcfg: LoopConfig = config.loop
    kf_idx = [k for k in sorted(keyframes)
              if k % lcfg.keyframe_stride == 0 and k + 1 in keyframes]
    if len(kf_idx) < 3:
        return traj, []
    if min(keyframes[kf_idx[0]].shape) < 2 * PATCH:
        # Half-res keyframes too small for the oriented-BRIEF patch
        # (tiny test fixtures): loop closure has nothing to work with.
        return traj, []
    imgs = jnp.asarray(np.stack([keyframes[k] for k in kf_idx]))
    signs, valid = _describe_batch(imgs, lcfg,
                                   vo_cfg_half.frontend.fast_threshold)
    scores = retrieval_scores(signs, valid, lcfg.max_dist)
    cands = shortlist(np.asarray(scores), kf_idx, lcfg)

    key = jax.random.PRNGKey(seed + 7777)
    applied: list[Loop] = []
    closed_spans: list[tuple[int, int]] = []
    traj = np.asarray(traj, np.float64)
    for (qp, kp_, score) in cands:
        if len(applied) >= lcfg.max_loops:
            break
        i, j = kf_idx[kp_], kf_idx[qp]  # i earlier, j revisit
        # One loop per overlapping span: spreading twice over overlapping
        # ranges double-corrects.
        if any(not (j < a or i > b) for (a, b) in closed_spans):
            continue
        if i + 1 >= traj.shape[0] or j >= traj.shape[0]:
            continue
        t_next = np.linalg.inv(traj[i]) @ traj[i + 1]
        key, kv = jax.random.split(key)
        res = verify_loop(keyframes[i], keyframes[j], keyframes[i + 1],
                          float(np.linalg.norm(t_next[:3, 3])),
                          vo_cfg_half, kv)
        if res is None:
            continue
        T_meas, n_inl = res
        if n_inl < lcfg.min_inliers:
            continue
        traj = spread_drift(traj, i, j, T_meas)
        applied.append(Loop(i, j, T_meas, n_inl, score))
        closed_spans.append((i, j))
        if mlog is not None:
            mlog.log({"stage": "loop_close", "i": i, "j": j,
                      "inliers": n_inl, "score": score})
    return traj.astype(np.float32), applied
