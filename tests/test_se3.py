"""Unit tests for batched SE(3) operations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.geometry import se3


def random_xi(key, batch=(), scale=0.5):
    return jax.random.normal(key, batch + (6,)) * scale


def test_hat_vee_roundtrip():
    w = jnp.array([[1.0, -2.0, 3.0], [0.1, 0.2, 0.3]])
    np.testing.assert_allclose(se3.vee(se3.hat(w)), w, atol=1e-7)


def test_so3_exp_orthonormal():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 3))
    R = se3.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (32, 3)) * 0.8
    w2 = se3.so3_log(se3.so3_exp(w))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = se3.so3_exp(w)
    np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-8)
    assert not np.any(np.isnan(np.asarray(R)))
    np.testing.assert_allclose(se3.so3_log(R), w, atol=1e-8)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    xi = random_xi(key, (32,))
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(se3.se3_log(T), xi, atol=1e-4)


def test_se3_exp_matches_expm():
    """Against scipy's dense matrix exponential of the 4x4 Lie algebra element."""
    from scipy.linalg import expm

    key = jax.random.PRNGKey(3)
    xi = np.asarray(random_xi(key, (8,)))
    G = np.asarray(se3.generators())
    for x in xi:
        M = np.tensordot(x, G, axes=(0, 0))
        np.testing.assert_allclose(
            np.asarray(se3.se3_exp(jnp.array(x))), expm(M), atol=1e-5
        )


def test_inverse():
    key = jax.random.PRNGKey(4)
    T = se3.se3_exp(random_xi(key, (16,)))
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    np.testing.assert_allclose(T @ se3.inverse(T), eye, atol=1e-5)


def test_chain_compose():
    key = jax.random.PRNGKey(5)
    Ts = se3.se3_exp(random_xi(key, (5,)))
    expect = np.eye(4)
    for i in range(5):
        expect = np.asarray(Ts[i]) @ expect
    np.testing.assert_allclose(se3.chain_compose(Ts), expect, atol=1e-5)


def test_prefix_products():
    key = jax.random.PRNGKey(6)
    Z = 6
    Ts = se3.se3_exp(random_xi(key, (Z,)))
    P = se3.prefix_products(Ts)
    Ts_np = np.asarray(Ts)
    for j in range(Z):
        for k in range(Z):
            if j > k:
                np.testing.assert_allclose(P[j, k], np.eye(4), atol=1e-6)
            else:
                expect = np.eye(4)
                for m in range(j, k + 1):
                    expect = Ts_np[m] @ expect
                np.testing.assert_allclose(P[j, k], expect, atol=1e-5)


def test_generators_match_ad():
    """d/de se3_exp(e * e_k) at 0 must equal the generator matrices."""
    G = se3.generators()
    for k in range(6):
        e_k = jnp.zeros((6,)).at[k].set(1.0)
        J = jax.jacfwd(lambda s: se3.se3_exp(s * e_k))(0.0)
        np.testing.assert_allclose(J, G[k], atol=1e-6)


def test_jit_and_vmap():
    key = jax.random.PRNGKey(7)
    xi = random_xi(key, (128,))
    f = jax.jit(jax.vmap(se3.se3_exp))
    T = f(xi)
    assert T.shape == (128, 4, 4)
