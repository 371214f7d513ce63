"""Two-view visual odometry pipeline — the kitti_E-equivalent end-to-end slice.

One fully-jitted device step per frame pair (ref main loop
`kitti_E.cpp:54-255`):

    images -> FAST -> KLT -> RANSAC essential -> recoverPose -> fallbacks
           -> top-K cheirality-filtered normalized matches -> LM refine
           -> revert-on-high-uncertainty -> relative pose + triangulated cloud

Everything after image upload runs on-device with static shapes; the frame
loop, scale injection, and trajectory accumulation are thin host code (the
reference's equivalents are its file-IO tail, `kitti_E.cpp:203-254`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from epivo_tpu import ransac as ransac_mod
from epivo_tpu.datasets import synthetic  # noqa: F401 (doc cross-ref)
from epivo_tpu.frontend import fast, klt
from epivo_tpu.geometry import camera as cam, epipolar, essential, se3
from epivo_tpu.optim import lm
from epivo_tpu.pipeline.config import VOConfig


class VOStepResult(NamedTuple):
    T: jnp.ndarray  # [4, 4] refined relative pose (source -> target)
    n_tracked: jnp.ndarray  # [] int32
    n_inliers: jnp.ndarray  # [] int32
    r_norm: jnp.ndarray  # [] LM residual norm
    reverted: jnp.ndarray  # [] bool — LM result rejected, E-pose kept
    points: jnp.ndarray  # [K, 3] triangulated points (source frame)
    points_valid: jnp.ndarray  # [K] bool (tracked & inlier & triangulable)
    matches_src: jnp.ndarray  # [K, 2] pixel coords in source image
    matches_tgt: jnp.ndarray  # [K, 2]
    inlier_mask: jnp.ndarray  # [K] bool — tracked & epipolar-inlier (no
    # parallax gate; superset of points_valid, for depth-ratio consumers)


def _unit_translation(T: jnp.ndarray) -> jnp.ndarray:
    """Normalize the pose's translation to unit norm (degenerate zero
    translation left untouched)."""
    t = T[..., :3, 3]
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    safe = jnp.where(n > 1e-12, n, 1.0)
    return T.at[..., :3, 3].set(t / safe)


def _select_top(mask: jnp.ndarray, k: int):
    """Indices of the first k True lanes (score-ordered input assumed);
    returns (idx [k], valid [k])."""
    order = jnp.argsort(~mask)  # stable: True lanes first
    idx = order[:k]
    return idx, mask[idx]


@functools.partial(jax.jit, static_argnums=(3, 4))
def vo_step(img0: jnp.ndarray, img1: jnp.ndarray, key, config: VOConfig,
            hyp_mesh=None) -> VOStepResult:
    """One two-view VO step. img0/img1: [H, W] float grayscale.

    ``hyp_mesh``: optional (hashable) mesh with a 'hyp' axis — RANSAC's
    hypothesis work is sharding-constrained over it so a multi-device
    jit distributes the accuracy-critical n_hyp knob (see
    ransac_essential)."""
    fc, rc, lc = config.frontend, config.ransac, config.lm
    K_inv = config.camera.K_inv(img0.dtype)

    kp = fast.detect(img0, fc.fast_threshold, fc.max_keypoints)
    flow = klt.track(
        img0, img1, kp.xy, valid=kp.valid, win=fc.klt_window,
        levels=fc.klt_levels, iters=fc.klt_iters, min_eig=fc.klt_min_eig,
    )
    n_tracked = jnp.sum(flow.status).astype(jnp.int32)

    p0 = cam.normalize(kp.xy, K_inv)
    p1 = cam.normalize(flow.xy, K_inv)

    thr = (rc.threshold_px / config.camera.fx) ** 2
    rres = ransac_mod.ransac_essential(
        key, p0, p1, n_hyp=rc.hypotheses(), threshold=thr, mask=flow.status,
        method=rc.method, solver=rc.solver, hyp_mesh=hyp_mesh,
    )
    E = rres.E
    if rc.refine_e:
        # 5-DoF manifold GN on the Sampson cost over the support set — the
        # accuracy counterpart of the reference's Nistér 5-point E
        # (`kitti_E.cpp:98-104`); closes the 8-point-minimal accuracy gap.
        E = essential.refine_essential(E, p0, p1, mask=rres.inliers,
                                       iters=rc.refine_iters)
    R_e, t_e, front = essential.recover_pose(E, p0, p1, mask=rres.inliers)
    R_e, t_e = essential.pose_fallback(R_e, t_e)
    T_e = se3.rt_to_matrix(R_e, t_e)

    # Top-N cheirality-passing inliers for LM refinement (ref `kitti_E.cpp:170-192`).
    sel = rres.inliers & front & flow.status
    idx, sel_valid = _select_top(sel, lc.n_points)
    pr = p0[idx][None]
    p_r = p1[idx][None]
    pmask = sel_valid[None]

    out = lm.solve(
        T_e[None], jnp.zeros((1, 2), jnp.int32), pr, p_r, pmask=pmask,
        lambda0=lc.lambda0, epsilon=lc.epsilon, max_iters=lc.max_iters,
        huber_delta=lc.huber_delta,
    )
    # Revert to the E-pose when LM uncertainty is high (ref `kitti_E.cpp:198-200`)
    # or too few points were available to refine. The reference refines on
    # however many (<= 48) points pass cheirality (`kitti_E.cpp:170-196`);
    # min_points is a floor, not the full budget.
    enough = jnp.sum(sel_valid) >= lc.min_points
    revert = (out.r_norm > lc.revert_r_norm) | ~enough
    T = jnp.where(revert, T_e, out.T0s[0])
    # Two-view geometry is gauge-free in |t| (the epipolar energy is exactly
    # invariant to scaling the translation), so LM can drift it arbitrarily;
    # pin the canonical unit norm (recoverPose convention, `kitti_E.cpp:120`).
    T = _unit_translation(T)

    # Triangulate the tracked inliers for the cloud (ref `kitti_E.cpp:235-254`).
    R, t = se3.matrix_to_rt(T)
    pts, pts_valid = epipolar.triangulate(R, t, p0, p1)
    track_inl = flow.status & rres.inliers

    return VOStepResult(
        T=T,
        n_tracked=n_tracked,
        n_inliers=rres.n_inliers,
        r_norm=out.r_norm,
        reverted=revert,
        points=pts,
        points_valid=pts_valid & track_inl,
        matches_src=kp.xy,
        matches_tgt=flow.xy,
        inlier_mask=track_inl,
    )


@functools.partial(jax.jit, static_argnums=(3, 4))
def vo_step_orb(img0: jnp.ndarray, img1: jnp.ndarray, key,
                config: VOConfig, hyp_mesh=None) -> VOStepResult:
    """Two-view VO with ORB descriptor matching instead of KLT tracking.

    The reference's `really_robust_ass` path (`kitti_ba.cpp:584-754`):
    ORB detect+describe in both frames, brute-force Hamming with
    cross-check, >= 8-match gate with identity fallback, then the same
    robust-E + recoverPose + LM refinement as :func:`vo_step`. Descriptor
    matching survives larger motions than KLT at the cost of subpixel
    accuracy.
    """
    from epivo_tpu.frontend import match as match_mod, orb

    fc, rc, lc = config.frontend, config.ransac, config.lm
    K_inv = config.camera.K_inv(img0.dtype)

    if fc.orb_pyramid:
        # Multi-scale path (ref regime `kitti_ba.cpp:128`): detection and
        # description per pyramid level — survives zoom/scale change that
        # kills the single-scale descriptors.
        kp0, d0, _ = orb.detect_and_describe_pyramid(
            img0, fc.fast_threshold, fc.max_keypoints,
            n_levels=fc.orb_levels, scale_factor=fc.orb_scale_factor)
        kp1, d1, _ = orb.detect_and_describe_pyramid(
            img1, fc.fast_threshold, fc.max_keypoints,
            n_levels=fc.orb_levels, scale_factor=fc.orb_scale_factor)
    else:
        kp0 = fast.detect(img0, fc.fast_threshold, fc.max_keypoints)
        kp1 = fast.detect(img1, fc.fast_threshold, fc.max_keypoints)
        d0 = orb.describe(img0, kp0.xy, kp0.valid)
        d1 = orb.describe(img1, kp1.xy, kp1.valid)
    m = match_mod.match(d0.signs, d1.signs, valid1=kp0.valid,
                        valid2=kp1.valid, max_dist=64.0)
    # Matched target coordinates per source keypoint (invalid lanes get a
    # harmless in-bounds index and are masked).
    tgt_xy = kp1.xy[jnp.maximum(m.idx, 0)]
    status = m.valid
    n_matches = jnp.sum(status).astype(jnp.int32)

    p0 = cam.normalize(kp0.xy, K_inv)
    p1 = cam.normalize(tgt_xy, K_inv)

    thr = (rc.threshold_px / config.camera.fx) ** 2
    rres = ransac_mod.ransac_essential(
        key, p0, p1, n_hyp=rc.hypotheses(), threshold=thr, mask=status,
        method=rc.method, solver=rc.solver, hyp_mesh=hyp_mesh,
    )
    E = rres.E
    if rc.refine_e:
        E = essential.refine_essential(E, p0, p1, mask=rres.inliers,
                                       iters=rc.refine_iters)
    R_e, t_e, front = essential.recover_pose(E, p0, p1, mask=rres.inliers)
    R_e, t_e = essential.pose_fallback(R_e, t_e)
    # >= 8 matches gate -> identity fallback (ref `kitti_ba.cpp:701,741-744`).
    too_few = n_matches < 8
    R_e = jnp.where(too_few, jnp.eye(3, dtype=R_e.dtype), R_e)
    t_e = jnp.where(too_few, jnp.asarray([0.1, 0.1, -0.9], t_e.dtype), t_e)
    T_e = se3.rt_to_matrix(R_e, t_e)

    sel = rres.inliers & front & status
    idx, sel_valid = _select_top(sel, lc.n_points)
    out = lm.solve(
        T_e[None], jnp.zeros((1, 2), jnp.int32), p0[idx][None], p1[idx][None],
        pmask=sel_valid[None], lambda0=lc.lambda0, epsilon=lc.epsilon,
        max_iters=lc.max_iters, huber_delta=lc.huber_delta,
    )
    enough = jnp.sum(sel_valid) >= lc.min_points
    revert = (out.r_norm > lc.revert_r_norm) | ~enough | too_few
    T = jnp.where(revert, T_e, out.T0s[0])
    T = _unit_translation(T)

    R, t = se3.matrix_to_rt(T)
    pts, pts_valid = epipolar.triangulate(R, t, p0, p1)
    track_inl = status & rres.inliers

    return VOStepResult(
        T=T,
        n_tracked=n_matches,
        n_inliers=rres.n_inliers,
        r_norm=out.r_norm,
        reverted=revert,
        points=pts,
        points_valid=pts_valid & track_inl,
        matches_src=kp0.xy,
        matches_tgt=tgt_xy,
        inlier_mask=track_inl,
    )


def apply_scale(T: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Keep rotation + translation *direction*, set translation magnitude
    (the reference's per-frame GT-scale injection, `kitti_E.cpp:218-223`)."""
    t = T[..., :3, 3]
    t_unit = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    return T.at[..., :3, 3].set(t_unit * scale[..., None])


def accumulate_trajectory(dTs: jnp.ndarray, T_init: jnp.ndarray | None = None):
    """cT_{i+1} = cT_i @ inv(dT_i) (ref accumulation `kitti_E.cpp:225-228`).

    dTs: [F, 4, 4] per-step relative poses. Returns [F+1, 4, 4] camera-to-
    world trajectory starting at identity (or T_init).
    """
    T0 = jnp.eye(4, dtype=dTs.dtype) if T_init is None else T_init

    def step(cT, dT):
        nT = cT @ se3.inverse(dT)
        return nT, nT

    _, traj = jax.lax.scan(step, T0, dTs)
    return jnp.concatenate([T0[None], traj], axis=0)
