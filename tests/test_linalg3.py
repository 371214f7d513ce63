"""Closed-form 3x3 SVD/eigh vs LAPACK-class references."""

import jax
import jax.numpy as jnp
import numpy as np

from epivo_tpu.geometry import linalg3, se3


def random_batch(n=256, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32) * scale)


def test_sym_eigh3_matches_numpy():
    M = random_batch(128, 1)
    A = jnp.einsum("nij,nkj->nik", M, M)  # SPD
    w, V = linalg3.sym_eigh3_desc(A)
    w_np = np.linalg.eigvalsh(np.asarray(A, np.float64))[:, ::-1]
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=2e-4, atol=2e-3)
    # V columns are eigenvectors: ||A v - w v|| small.
    Av = np.einsum("nij,njk->nik", np.asarray(A), np.asarray(V))
    wV = np.asarray(w)[:, None, :] * np.asarray(V)
    resid = np.abs(Av - wV).max(axis=(1, 2)) / (np.abs(np.asarray(w)).max(1) + 1)
    assert np.quantile(resid, 0.99) < 5e-3, np.quantile(resid, 0.99)
    # Orthonormal, right-handed.
    VtV = np.einsum("nji,njk->nik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=2e-3)
    assert np.all(np.linalg.det(np.asarray(V)) > 0.99)


def test_svd3_reconstructs_rank2():
    """On essential-class (rank-2) matrices the factorization is exact."""
    key = jax.random.PRNGKey(2)
    keys = jax.random.split(key, 64)
    Es = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        R = se3.so3_exp(jax.random.normal(k1, (3,)))
        t = jax.random.normal(k2, (3,))
        t = t / jnp.linalg.norm(t)
        Es.append(se3.hat(t) @ R)
    E = jnp.stack(Es)
    U, s, Vt = linalg3.svd3(E)
    recon = np.einsum("nij,nj,njk->nik", np.asarray(U), np.asarray(s),
                      np.asarray(Vt))
    # f32 closed-form accuracy floor is ~sqrt(eps) ~= 3e-4.
    np.testing.assert_allclose(recon, np.asarray(E), atol=2e-3)
    # Essential spectrum: (sigma, sigma, 0).
    s_np = np.asarray(s)
    np.testing.assert_allclose(s_np[:, 0], s_np[:, 1], rtol=2e-3)
    np.testing.assert_allclose(s_np[:, 2], 0.0, atol=1e-3)
    # Proper rotations.
    assert np.all(np.linalg.det(np.asarray(U)) > 0.99)
    assert np.all(np.linalg.det(np.asarray(Vt)) > 0.99)


def test_svd3_singular_values_match_lapack():
    M = random_batch(256, 3)
    _, s, _ = linalg3.svd3(M)
    s_ref = np.linalg.svd(np.asarray(M, np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-3, atol=2e-3)


def test_svd3_subspaces_match_lapack():
    """U/V column SPANS match LAPACK (signs/handedness may differ)."""
    M = random_batch(64, 4)
    U, s, Vt = linalg3.svd3(M)
    for i in range(64):
        Un, sn, Vtn = np.linalg.svd(np.asarray(M[i], np.float64))
        for col in range(3):
            # compare up to sign
            dot_u = abs(np.dot(np.asarray(U[i])[:, col], Un[:, col]))
            dot_v = abs(np.dot(np.asarray(Vt[i])[col], Vtn[col]))
            assert dot_u > 0.999, (i, col, dot_u)
            assert dot_v > 0.999, (i, col, dot_v)
