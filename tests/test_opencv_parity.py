"""Parity tests against OpenCV — the library the reference is built on.

cv2 is a *test-only* oracle here: the framework never imports it. These
tests pin our TPU-native kernels to the exact behaviors the reference
relies on (FAST corners, pyramidal LK, essential matrix + recoverPose).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from epivo_tpu import ransac as rm
from epivo_tpu.datasets import synthetic
from epivo_tpu.frontend import fast, klt
from epivo_tpu.geometry import essential, se3


def textured(H=160, W=200, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.normal(size=(H, W)), 2.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


def test_fast_corners_match_opencv():
    """Same corners (positions) as cv2 FAST with NMS at equal threshold."""
    img = textured()
    thr = 25
    det = cv2.FastFeatureDetector_create(thr, nonmaxSuppression=True)
    kp_cv = det.detect(img.astype(np.uint8), None)
    cv_pts = {(int(round(k.pt[0])), int(round(k.pt[1]))) for k in kp_cv
              if 3 <= k.pt[0] < 200 - 3 and 3 <= k.pt[1] < 160 - 3}

    ours = fast.detect(jnp.asarray(np.float32(np.uint8(img))), float(thr), 512)
    our_pts = {
        (int(x), int(y))
        for (x, y), v in zip(np.asarray(ours.xy), np.asarray(ours.valid)) if v
    }
    if not cv_pts:
        pytest.skip("no cv2 corners on this texture")
    # Allow NMS tie-break differences at adjacent pixels: count cv corners
    # with one of ours within 1 px.
    hit = 0
    for (x, y) in cv_pts:
        if any(abs(x - a) <= 1 and abs(y - b) <= 1 for (a, b) in our_pts):
            hit += 1
    recall = hit / len(cv_pts)
    assert recall > 0.9, (recall, len(cv_pts), len(our_pts))


def test_klt_matches_opencv_flow():
    img0 = textured(seed=1)
    from scipy.ndimage import shift as ndi_shift

    img1 = ndi_shift(img0, (2.3, -3.7), order=3).astype(np.float32)
    pts = np.array([[60.0, 50.0], [120.0, 80.0], [90.0, 100.0], [140.0, 40.0]],
                   np.float32)

    cv_next, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8),
        pts.reshape(-1, 1, 2), None,
        winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    ours = klt.track(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
                     levels=4)
    ok = np.asarray(ours.status) & (cv_st.reshape(-1) == 1)
    assert ok.sum() >= 3
    diff = np.abs(np.asarray(ours.xy)[ok] - cv_next.reshape(-1, 2)[ok])
    assert diff.max() < 0.5, diff


@pytest.mark.parametrize("flow", [(12.0, -8.0), (26.0, 17.0), (-41.0, 23.0),
                                  (58.0, -31.0)])
def test_klt_large_displacement_matches_opencv(flow):
    """KITTI-scale flows (VERDICT r2 weak #3): near-field motion reaches
    30-80 px between frames (`kitti_E.cpp:82-95` relies on cv2 defaults
    handling this). The default margin schedule (6/6/6/12) must absorb the
    full motion at the top pyramid level; this pins recall AND accuracy vs
    cv2 at 12-58 px displacements."""
    dx, dy = flow
    img0 = textured(H=240, W=320, seed=4)
    from scipy.ndimage import shift as ndi_shift

    img1 = ndi_shift(img0, (dy, dx), order=3).astype(np.float32)
    rng = np.random.default_rng(5)
    m = 70  # keep both endpoints well inside the frame
    pts = rng.uniform([m, m], [320 - m, 240 - m], size=(12, 2)).astype(
        np.float32)

    cv_next, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8),
        pts.reshape(-1, 1, 2), None,
        winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    ours = klt.track(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
                     levels=4)
    # Recall: our tracker must keep at least as many points as cv2 - 2.
    n_cv = int((cv_st.reshape(-1) == 1).sum())
    n_us = int(np.asarray(ours.status).sum())
    assert n_us >= max(n_cv - 2, 8), (n_us, n_cv)
    ok = np.asarray(ours.status) & (cv_st.reshape(-1) == 1)
    # Accuracy vs the TRUE flow (cv2 itself errs on interpolated texture).
    true_next = pts + np.array([dx, dy], np.float32)
    err_us = np.abs(np.asarray(ours.xy)[ok] - true_next[ok]).max()
    err_cv = np.abs(cv_next.reshape(-1, 2)[ok] - true_next[ok]).max()
    assert err_us < max(2.0 * err_cv, 0.6), (err_us, err_cv)


def test_klt_rotation_matches_opencv():
    """In-plane rotation (~4.5 deg): per-point flow varies across the frame,
    so the coarse-to-fine guess must adapt per keypoint, not per frame."""
    img0 = textured(H=240, W=320, seed=6)
    ang = 4.5
    M = cv2.getRotationMatrix2D((160.0, 120.0), ang, 1.0)
    img1 = cv2.warpAffine(img0, M, (320, 240), flags=cv2.INTER_CUBIC)
    rng = np.random.default_rng(7)
    pts = rng.uniform([60, 60], [260, 180], size=(16, 2)).astype(np.float32)
    true_next = (np.c_[pts, np.ones(len(pts))] @ M.T).astype(np.float32)

    cv_next, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8),
        pts.reshape(-1, 1, 2), None, winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    ours = klt.track(jnp.asarray(img0), jnp.asarray(img1.astype(np.float32)),
                     jnp.asarray(pts), levels=4)
    ok = np.asarray(ours.status) & (cv_st.reshape(-1) == 1)
    assert ok.sum() >= 10, ok.sum()
    err_us = np.abs(np.asarray(ours.xy)[ok] - true_next[ok]).max()
    err_cv = np.abs(cv_next.reshape(-1, 2)[ok] - true_next[ok]).max()
    assert err_us < max(2.0 * err_cv, 0.8), (err_us, err_cv)


def test_essential_matches_opencv():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    T = synthetic.random_pose(k1)
    _, p, p_t = synthetic.gen_points(k2, 64, T)
    p_np = np.asarray(p)[:, :2]
    p_t_np = np.asarray(p_t)[:, :2]

    E_cv, _ = cv2.findEssentialMat(
        p_np, p_t_np, np.eye(3), method=cv2.RANSAC, prob=0.999, threshold=1e-3
    )
    E_cv = E_cv[:3] / np.linalg.norm(E_cv[:3])
    E_ours = np.asarray(essential.eight_point(p, p_t))
    E_ours = E_ours / np.linalg.norm(E_ours)
    err = min(np.linalg.norm(E_ours - E_cv), np.linalg.norm(E_ours + E_cv))
    assert err < 5e-3, err


def test_recover_pose_matches_opencv():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    T = synthetic.random_pose(k1)
    _, p, p_t = synthetic.gen_points(k2, 64, T)
    E = np.asarray(se3.hat(T[:3, 3]) @ T[:3, :3], dtype=np.float64)
    E = E / np.linalg.norm(E)
    p_np = np.asarray(p, dtype=np.float64)[:, :2]
    p_t_np = np.asarray(p_t, dtype=np.float64)[:, :2]

    _, R_cv, t_cv, _ = cv2.recoverPose(E, p_np, p_t_np, np.eye(3))
    R_ours, t_ours, _ = essential.recover_pose(jnp.asarray(E), p, p_t)
    np.testing.assert_allclose(np.asarray(R_ours), R_cv, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_ours), t_cv.reshape(-1), atol=1e-4)


def _pose_errors(R_est, t_est, T_gt):
    """(rotation angle, translation direction angle) in radians vs GT."""
    R_gt = np.asarray(T_gt)[:3, :3]
    t_gt = np.asarray(T_gt)[:3, 3]
    R_est = np.asarray(R_est, np.float64)
    t_est = np.asarray(t_est, np.float64).reshape(-1)
    c = (np.trace(R_est.T @ R_gt) - 1.0) / 2.0
    rot = float(np.arccos(np.clip(c, -1.0, 1.0)))
    tu = t_est / (np.linalg.norm(t_est) + 1e-12)
    gu = t_gt / (np.linalg.norm(t_gt) + 1e-12)
    ang = float(np.arccos(np.clip(np.dot(tu, gu), -1.0, 1.0)))
    return rot, ang


def test_refine_essential_ab_vs_cv2_5point():
    """A/B: manifold GN refinement closes the 8-point gap to cv2's Nistér
    5-point (the reference's solver, `kitti_E.cpp:98-104`) under pixel noise.

    Three estimators on the same noisy matches: (a) our batched RANSAC
    8-point alone, (b) (a) + refine_essential (what vo_step now ships),
    (c) cv2 findEssentialMat (5-point) + recoverPose. Averaged over seeds:
    (b) must not be worse than (a) and must be in cv2's accuracy class.
    """
    raws, refs, cvs = [], [], []
    for seed in range(6):
        key = jax.random.PRNGKey(100 + seed)
        k1, k2, k3 = jax.random.split(key, 3)
        T = synthetic.random_pose(k1)
        _, p, p_t = synthetic.gen_points(k2, 96, T, pixel_noise=1.5e-3)

        rres = rm.ransac_essential(k3, p, p_t, n_hyp=512, threshold=4e-5)
        R8, t8, _ = essential.recover_pose(rres.E, p, p_t, mask=rres.inliers)
        raws.append(_pose_errors(R8, t8, T))

        E_ref = essential.refine_essential(rres.E, p, p_t, mask=rres.inliers)
        Rr, tr, _ = essential.recover_pose(E_ref, p, p_t, mask=rres.inliers)
        refs.append(_pose_errors(Rr, tr, T))

        p_np = np.asarray(p, np.float64)[:, :2]
        p_t_np = np.asarray(p_t, np.float64)[:, :2]
        E_cv, _ = cv2.findEssentialMat(
            p_np, p_t_np, np.eye(3), method=cv2.RANSAC, prob=0.999,
            threshold=4.5e-3,
        )
        E_cv = E_cv[:3]
        _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p_np, p_t_np, np.eye(3))
        cvs.append(_pose_errors(R_cv, t_cv, T))

    raw_rot, raw_t = np.mean(raws, axis=0)
    ref_rot, ref_t = np.mean(refs, axis=0)
    cv_rot, cv_t = np.mean(cvs, axis=0)
    # Refinement improves the total pose error. (Per-component "never
    # hurts" is statistically wrong: the Sampson ML estimate under noise
    # reaches a LOWER cost than the ground-truth pose — verified — so
    # individual components, rotation especially, fluctuate seed to seed
    # while the combined error and the dominant translation-direction
    # error improve.)
    assert ref_rot + ref_t <= (raw_rot + raw_t) * 1.05 + 1e-3, (
        (ref_rot, ref_t), (raw_rot, raw_t))
    # Loose per-component backstop: the summed bound alone would let a
    # gross rotation-only regression hide behind the dominant translation
    # term (ADVICE r2). The Sampson ML estimate legitimately trades a few
    # hundredths of a degree of rotation for the (dominant) translation
    # gain, and the statistic over 6 seeds moves with benign arithmetic
    # reordering — the backstop catches order-of-magnitude regressions.
    assert ref_rot <= max(raw_rot * 3.0, np.deg2rad(0.35)), (ref_rot, raw_rot)
    # ...and lands in the 5-point accuracy class (same order of magnitude).
    assert ref_rot <= cv_rot * 1.5 + np.deg2rad(0.05), (ref_rot, cv_rot)
    assert ref_t <= cv_t * 1.5 + np.deg2rad(0.5), (ref_t, cv_t)


def test_lmeds_matches_opencv():
    """LMedS path parity: same inlier decisions and pose class as cv2's
    LMEDS on outlier-contaminated matches (the reference's kitti_E policy,
    `kitti_E.cpp:98-104`)."""
    agrees, ours_err, cv_err = [], [], []
    for seed in range(4):
        key = jax.random.PRNGKey(200 + seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        T = synthetic.random_pose(k1)
        _, p, p_t = synthetic.gen_points(k2, 128, T, pixel_noise=5e-4)
        # 30% gross outliers.
        n_out = 38
        noise = jax.random.normal(k3, (n_out, 2)) * 0.2
        p_t = p_t.at[:n_out, :2].add(noise)

        res = rm.ransac_essential(k4, p, jnp.asarray(p_t), n_hyp=512,
                                  threshold=4e-5, method="lmeds")
        Ro, to, _ = essential.recover_pose(res.E, p, p_t, mask=res.inliers)
        ours_err.append(_pose_errors(Ro, to, T))

        p_np = np.asarray(p, np.float64)[:, :2]
        p_t_np = np.asarray(p_t, np.float64)[:, :2]
        E_cv, mask_cv = cv2.findEssentialMat(
            p_np, p_t_np, np.eye(3), method=cv2.LMEDS, prob=0.99
        )
        _, R_cv, t_cv, _ = cv2.recoverPose(E_cv[:3], p_np, p_t_np, np.eye(3))
        cv_err.append(_pose_errors(R_cv, t_cv, T))
        agree = (np.asarray(res.inliers) == mask_cv.reshape(-1).astype(bool)).mean()
        agrees.append(agree)

    assert np.mean(agrees) > 0.85, agrees
    o_rot, o_t = np.mean(ours_err, axis=0)
    c_rot, c_t = np.mean(cv_err, axis=0)
    assert o_rot <= c_rot * 2.0 + np.deg2rad(0.2), (o_rot, c_rot)
    assert o_t <= c_t * 2.0 + np.deg2rad(1.0), (o_t, c_t)


def test_ransac_inliers_match_opencv_quality():
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    T = synthetic.random_pose(k1)
    _, p, p_t = synthetic.gen_points(k2, 128, T)
    noise = jax.random.normal(k3, (38, 2)) * 0.3
    p_t = p_t.at[:38, :2].add(noise)
    p_np = np.asarray(p)[:, :2]
    p_t_np = np.asarray(p_t)[:, :2]

    _, mask_cv = cv2.findEssentialMat(
        p_np, p_t_np, np.eye(3), method=cv2.RANSAC, prob=0.999, threshold=3e-3
    )
    res = rm.ransac_essential(jax.random.PRNGKey(0), p, jnp.asarray(p_t),
                              n_hyp=512, threshold=9e-6)
    ours = np.asarray(res.inliers)
    cv = mask_cv.reshape(-1).astype(bool)
    agree = (ours == cv).mean()
    assert agree > 0.9, agree
