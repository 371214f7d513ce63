"""Tests for the epipolar-depth residual and its analytic Jacobian.

The key property (which the reference never verified mechanically): the
hand-derived generator-chain Jacobian must equal jax.jacfwd of the residual
through T(eps) = Tl @ expm(sign*eps) @ Tr at eps = 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.datasets import synthetic
from epivo_tpu.geometry import epipolar, se3


def make_scene(seed=0, N=32):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    T = synthetic.random_pose(k1)
    X, p, p_t = synthetic.gen_points(k2, N, T)
    return T, X, p, p_t


def test_depth_recovers_gt():
    """With exact correspondences, closed-form depth == true source depth."""
    T, X, p, p_t = make_scene()
    R, t = se3.matrix_to_rt(T)
    d, valid = epipolar.epipolar_depth(R, t, p, p_t)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(d), np.asarray(X[:, 2]), rtol=2e-4)


def test_residual_zero_at_gt():
    T, X, p, p_t = make_scene()
    R, t = se3.matrix_to_rt(T)
    r = epipolar.residual(R, t, p, p_t, huber_delta=1.0)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-8)


def test_residual_positive_off_gt():
    T, X, p, p_t = make_scene()
    key = jax.random.PRNGKey(9)
    T0 = synthetic.perturb_pose(key, T)
    R, t = se3.matrix_to_rt(T0)
    r = epipolar.residual(R, t, p, p_t, huber_delta=1.0)
    assert float(jnp.max(r)) > 1e-6


def test_residual_mask():
    T, X, p, p_t = make_scene()
    key = jax.random.PRNGKey(9)
    T0 = synthetic.perturb_pose(key, T)
    R, t = se3.matrix_to_rt(T0)
    mask = jnp.arange(p.shape[0]) < 10
    r = epipolar.residual(R, t, p, p_t, huber_delta=1.0, mask=mask)
    assert float(jnp.max(jnp.abs(r[10:]))) == 0.0
    assert float(jnp.max(jnp.abs(r[:10]))) > 0.0


def test_triangulate_matches_depth():
    T, X, p, p_t = make_scene()
    R, t = se3.matrix_to_rt(T)
    Xhat, valid = epipolar.triangulate(R, t, p, p_t)
    np.testing.assert_allclose(
        np.asarray(Xhat)[np.asarray(valid)], np.asarray(X)[np.asarray(valid)],
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("huber_delta", [1.0, 1e-5])
def test_jacobian_matches_ad(reverse, huber_delta):
    """Analytic Jacobian == jax.jacfwd of the residual, fwd & reverse chains."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    Tl = synthetic.random_pose(k1)
    Tr = synthetic.random_pose(k2)
    T = Tl @ Tr
    # Points from a *perturbed* pose so residuals are non-zero (both Huber
    # branches get exercised with delta=1e-5).
    _, p, p_t = synthetic.gen_points(k3, 24, synthetic.perturb_pose(k4, T))

    sign = -1.0 if reverse else 1.0

    def res_of_eps(eps):
        Te = Tl @ se3.se3_exp(sign * eps) @ Tr
        return epipolar.residual_from_T(Te, p, p_t, huber_delta=huber_delta)

    J_ad = jax.jacfwd(res_of_eps)(jnp.zeros(6))
    J_an = epipolar.residual_jacobian(
        Tl, Tr, p, p_t, reverse=reverse, huber_delta=huber_delta
    )
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad), atol=5e-4, rtol=5e-3)


def test_jacobian_batched():
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 4)
    Tl = jnp.stack([synthetic.random_pose(k) for k in ks[:2]])
    Tr = jnp.stack([synthetic.random_pose(k) for k in ks[2:]])
    _, p, p_t = synthetic.gen_points(jax.random.PRNGKey(5), 16,
                                     synthetic.random_pose(jax.random.PRNGKey(6)))
    p = jnp.broadcast_to(p, (2, 16, 3))
    p_t = jnp.broadcast_to(p_t, (2, 16, 3))
    J = epipolar.residual_jacobian(Tl, Tr, p, p_t, reverse=jnp.array([False, True]))
    assert J.shape == (2, 16, 6)
    for b, rev in enumerate([False, True]):
        J_single = epipolar.residual_jacobian(Tl[b], Tr[b], p[b], p_t[b], reverse=rev)
        np.testing.assert_allclose(np.asarray(J[b]), np.asarray(J_single), atol=1e-6)
