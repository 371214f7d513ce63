"""Tests for essential-matrix estimation, pose recovery, and batched RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu import ransac
from epivo_tpu.datasets import synthetic
from epivo_tpu.geometry import essential, se3


def make_pair(seed=0, N=64, pixel_noise=0.0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    T = synthetic.random_pose(k1)
    X, p, p_t = synthetic.gen_points(k2, N, T, pixel_noise=pixel_noise)
    R, t = se3.matrix_to_rt(T)
    return R, t, p, p_t


def true_E(R, t):
    return se3.hat(t) @ R


def test_design_rows_zero_on_gt():
    R, t, p, p_t = make_pair()
    E = true_E(R, t)
    resid = jnp.einsum("ni,ij,nj->n", p_t, E, p)
    np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-4)


def test_eight_point_recovers_E():
    R, t, p, p_t = make_pair()
    E_hat = essential.eight_point(p, p_t)
    E_gt = true_E(R, t)
    E_gt = E_gt / jnp.linalg.norm(E_gt)
    E_hat_n = E_hat / jnp.linalg.norm(E_hat)
    err = min(
        float(jnp.linalg.norm(E_hat_n - E_gt)),
        float(jnp.linalg.norm(E_hat_n + E_gt)),
    )
    assert err < 1e-2, err


def test_eight_point_batched():
    Rs, ts, ps, pts = [], [], [], []
    for s in range(3):
        R, t, p, p_t = make_pair(seed=s)
        Rs.append(R); ts.append(t); ps.append(p); pts.append(p_t)
    E_b = essential.eight_point(jnp.stack(ps), jnp.stack(pts))
    for i in range(3):
        E_i = essential.eight_point(ps[i], pts[i])
        d = min(
            float(jnp.linalg.norm(E_b[i] - E_i)),
            float(jnp.linalg.norm(E_b[i] + E_i)),
        )
        assert d < 1e-4


def test_sampson_error_small_on_inliers():
    R, t, p, p_t = make_pair()
    E = true_E(R, t)
    err = essential.sampson_error(E, p, p_t)
    assert float(jnp.max(err)) < 1e-8


def test_recover_pose():
    R, t, p, p_t = make_pair()
    E = true_E(R, t)
    R_hat, t_hat, front = recover = essential.recover_pose(E, p, p_t)
    np.testing.assert_allclose(np.asarray(R_hat), np.asarray(R), atol=1e-3)
    t_unit = t / jnp.linalg.norm(t)
    np.testing.assert_allclose(np.asarray(t_hat), np.asarray(t_unit), atol=1e-3)
    # All synthetic points are in front of both cameras.
    assert float(jnp.mean(front.astype(jnp.float32))) > 0.95


def test_recover_pose_from_estimated_E():
    R, t, p, p_t = make_pair(seed=3)
    E_hat = essential.eight_point(p, p_t)
    R_hat, t_hat, front = essential.recover_pose(E_hat, p, p_t)
    np.testing.assert_allclose(np.asarray(R_hat), np.asarray(R), atol=5e-3)
    t_unit = np.asarray(t / jnp.linalg.norm(t))
    np.testing.assert_allclose(np.asarray(t_hat), t_unit, atol=5e-3)


def test_pose_fallback():
    # Degenerate rotation triggers identity + canned translation
    R_bad = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    t = jnp.array([0.0, 0.0, 1.0])
    R_out, t_out = essential.pose_fallback(R_bad, t)
    np.testing.assert_allclose(np.asarray(R_out), np.eye(3))
    np.testing.assert_allclose(np.asarray(t_out), [0.1, 0.1, -0.9])
    # Vanishing translation triggers canned translation only
    R_ok = jnp.eye(3) * 1.0
    R_out2, t_out2 = essential.pose_fallback(R_ok, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(t_out2), [0.1, 0.1, -0.9])
    # Healthy pose (small rotation, trace > 2.7) passes through
    R = se3.so3_exp(jnp.array([0.05, -0.03, 0.08]))
    t = jnp.array([0.2, 0.1, -0.9])
    R_out3, t_out3 = essential.pose_fallback(R, t)
    np.testing.assert_allclose(np.asarray(R_out3), np.asarray(R))
    np.testing.assert_allclose(np.asarray(t_out3), np.asarray(t))


@pytest.mark.parametrize("method", ["ransac", "lmeds"])
def test_ransac_with_outliers(method):
    R, t, p, p_t = make_pair(seed=7, N=128)
    key = jax.random.PRNGKey(42)
    # Corrupt 30% of matches.
    n_out = 38
    noise = jax.random.normal(key, (n_out, 2)) * 0.3
    p_t = p_t.at[:n_out, :2].add(noise)
    res = ransac.ransac_essential(
        jax.random.PRNGKey(1), p, p_t, n_hyp=512, threshold=1e-5,
        method=method,
    )
    inl = np.asarray(res.inliers)
    # Outliers rejected, inliers kept.
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.2
    R_hat, t_hat, _ = essential.recover_pose(res.E, p, p_t, mask=res.inliers)
    np.testing.assert_allclose(np.asarray(R_hat), np.asarray(R), atol=2e-2)


def test_ransac_mask_padding():
    R, t, p, p_t = make_pair(seed=9, N=64)
    # Pad to 96 with garbage; mask marks the valid 64.
    pad = jnp.ones((32, 3))
    p_pad = jnp.concatenate([p, pad])
    p_t_pad = jnp.concatenate([p_t, -pad])
    mask = jnp.arange(96) < 64
    res = ransac.ransac_essential(
        jax.random.PRNGKey(2), p_pad, p_t_pad, n_hyp=256, threshold=1e-5,
        mask=mask,
    )
    assert not bool(jnp.any(res.inliers[64:]))
    assert int(res.n_inliers) > 50


def test_ransac_jit():
    R, t, p, p_t = make_pair(seed=11, N=64)
    fn = jax.jit(
        lambda k, a, b: ransac.ransac_essential(k, a, b, n_hyp=128,
                                                threshold=1e-5)
    )
    res = fn(jax.random.PRNGKey(0), p, p_t)
    assert np.all(np.isfinite(np.asarray(res.E)))


def test_n_iterations():
    assert ransac.n_iterations(0.99, 0.0) == 1
    assert ransac.n_iterations(0.99, 0.5) > 1000


def test_refine_essential_improves_noisy_E():
    """GN manifold refinement reduces Sampson error of a perturbed E."""
    R, t, p, p_t = make_pair(seed=21, N=96)
    # noisy matches
    key = jax.random.PRNGKey(5)
    p_t_n = p_t.at[:, :2].add(jax.random.normal(key, (96, 2)) * 2e-3)
    E0 = essential.eight_point(p[:32], p_t_n[:32])  # fit on a subset: imperfect
    e_before = float(jnp.mean(essential.sampson_error(E0, p, p_t_n)))
    E1 = essential.refine_essential(E0, p, p_t_n)
    e_after = float(jnp.mean(essential.sampson_error(E1, p, p_t_n)))
    assert e_after <= e_before * 1.0001, (e_before, e_after)
    # Pose from the refined E should be at least as close to GT.
    R0_hat, t0_hat, _ = essential.recover_pose(E0, p, p_t_n)
    R1_hat, t1_hat, _ = essential.recover_pose(E1, p, p_t_n)
    err0 = float(jnp.linalg.norm(R0_hat - R))
    err1 = float(jnp.linalg.norm(R1_hat - R))
    assert err1 <= err0 + 1e-3, (err0, err1)


def test_refine_essential_preserves_perfect_E():
    R, t, p, p_t = make_pair(seed=22)
    E_gt = true_E(R, t)
    E_gt = E_gt / jnp.linalg.norm(E_gt)
    E1 = essential.refine_essential(E_gt, p, p_t)
    d = min(float(jnp.linalg.norm(E1 - E_gt)), float(jnp.linalg.norm(E1 + E_gt)))
    assert d < 1e-3, d


def test_refine_essential_respects_mask():
    R, t, p, p_t = make_pair(seed=23, N=64)
    # Corrupt the masked-out half badly; refinement must ignore it.
    key = jax.random.PRNGKey(9)
    p_t_bad = p_t.at[32:, :2].add(jax.random.normal(key, (32, 2)) * 0.5)
    E0 = essential.eight_point(p[:32], p_t_bad[:32])
    mask = jnp.arange(64) < 32
    E1 = essential.refine_essential(E0, p, p_t_bad, mask=mask)
    err_clean = float(jnp.mean(essential.sampson_error(E1, p[:32], p_t_bad[:32])))
    assert err_clean < 1e-6
