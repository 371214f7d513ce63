"""GT-recovery property tests for the LM pose-chain optimizer.

Formalizes the reference's de-facto test strategy (SURVEY.md §4): random
SE(3) scenes with known ground truth are perturbed and re-optimized; success
is convergence of rotation error and per-axis translation ratios to a
constant scale (the parametrization is scale-blind, like
`test_jac_Rt_gen.cpp:482-509`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.datasets import synthetic
from epivo_tpu.geometry import se3
from epivo_tpu.optim import lm


def rot_err(Ta, Tb):
    return float(jnp.linalg.norm(Ta[..., :3, :3] - Tb[..., :3, :3]))


def t_dir_err(Ta, Tb):
    ta = Ta[..., :3, 3]
    tb = Tb[..., :3, 3]
    ca = ta / (jnp.linalg.norm(ta) + 1e-12)
    cb = tb / (jnp.linalg.norm(tb) + 1e-12)
    return float(jnp.linalg.norm(ca - cb))


def test_single_pose_recovery():
    """One zeta, one constraint — the kitti_E refinement configuration
    (`kitti_E.cpp:138-196`)."""
    key = jax.random.PRNGKey(0)
    scene = synthetic.gen_scene_sequence(
        key, N=48, n_zeta=1, reps=[(0, 0)], rot_noise=0.05, t_noise=0.1
    )
    res = lm.solve(scene.T0s, scene.reps, scene.p, scene.p_t, huber_delta=1.0)
    # Initial errors for comparison
    init_rot = rot_err(scene.T0s[0], scene.Ts[0])
    fin_rot = rot_err(res.T0s[0], scene.Ts[0])
    assert fin_rot < init_rot * 0.1, (init_rot, fin_rot)
    assert t_dir_err(res.T0s[0], scene.Ts[0]) < 0.02
    assert float(res.r_norm) < 1e-3


def test_forward_chain_recovery():
    """Multi-zeta forward chain, reps {(i,i), (0,i)} like
    `test_jac_Rt_gen.cpp:294-297`."""
    key = jax.random.PRNGKey(1)
    n_zeta = 4
    reps = [(i, i) for i in range(n_zeta)] + [(0, i) for i in range(1, n_zeta)]
    scene = synthetic.gen_scene_sequence(
        key, N=24, n_zeta=n_zeta, reps=reps, rot_noise=0.04, t_noise=0.08
    )
    res = lm.solve(scene.T0s, scene.reps, scene.p, scene.p_t, huber_delta=1.0)
    for i in range(n_zeta):
        init_rot = rot_err(scene.T0s[i], scene.Ts[i])
        fin_rot = rot_err(res.T0s[i], scene.Ts[i])
        assert fin_rot < max(0.1 * init_rot, 5e-3), (i, init_rot, fin_rot)


def test_reverse_chain_recovery():
    """Reversed reprojections (z0 > z1) via inverse composition, the case
    `jac_Rt_gen_backup.cpp:286-557` exists to exercise."""
    key = jax.random.PRNGKey(2)
    n_zeta = 3
    reps = [(i, i) for i in range(n_zeta)] + [(n_zeta - 1, 0)]
    scene = synthetic.gen_scene_sequence(
        key, N=24, n_zeta=n_zeta, reps=reps, rot_noise=0.04, t_noise=0.08
    )
    res = lm.solve(scene.T0s, scene.reps, scene.p, scene.p_t, huber_delta=1.0)
    for i in range(n_zeta):
        init_rot = rot_err(scene.T0s[i], scene.Ts[i])
        fin_rot = rot_err(res.T0s[i], scene.Ts[i])
        assert fin_rot < max(0.1 * init_rot, 5e-3), (i, init_rot, fin_rot)


def test_residual_decreases_monotone_in_energy():
    key = jax.random.PRNGKey(3)
    scene = synthetic.gen_scene_sequence(key, N=32, n_zeta=2,
                                         reps=[(0, 0), (1, 1), (0, 1)])
    r0, _ = lm.build_system(
        scene.T0s, jnp.asarray(scene.reps), jnp.ones(3), scene.p, scene.p_t, 1.0
    )
    res = lm.solve(scene.T0s, scene.reps, scene.p, scene.p_t, huber_delta=1.0)
    assert float(res.r_norm) < float(jnp.linalg.norm(r0.reshape(-1)))


def test_weight_zero_freezes_constraint():
    """w=0 must remove a constraint's influence entirely (the stereo-baseline
    trick, ref `kitti_ba.cpp:567-574`) — even with garbage points."""
    key = jax.random.PRNGKey(4)
    scene = synthetic.gen_scene_sequence(key, N=24, n_zeta=2,
                                         reps=[(0, 0), (1, 1)])
    # Corrupt the second constraint's points and zero its weight.
    bad_pt = scene.p_t.at[1].set(jax.random.normal(key, scene.p_t[1].shape))
    w = jnp.array([1.0, 0.0])
    res = lm.solve(scene.T0s, scene.reps, scene.p, bad_pt, wreps=w,
                   huber_delta=1.0)
    # Zeta 0 should still be recovered; zeta 1 untouched by constraint 1.
    init_rot = rot_err(scene.T0s[0], scene.Ts[0])
    fin_rot = rot_err(res.T0s[0], scene.Ts[0])
    assert fin_rot < max(0.1 * init_rot, 5e-3)
    np.testing.assert_allclose(np.asarray(res.T0s[1]), np.asarray(scene.T0s[1]),
                               atol=1e-6)


def test_zeta_mask_freezes_pose():
    key = jax.random.PRNGKey(5)
    scene = synthetic.gen_scene_sequence(key, N=24, n_zeta=2,
                                         reps=[(0, 0), (1, 1), (0, 1)])
    res = lm.solve(scene.T0s, scene.reps, scene.p, scene.p_t,
                   zeta_mask=jnp.array([True, False]), huber_delta=1.0)
    np.testing.assert_allclose(np.asarray(res.T0s[1]), np.asarray(scene.T0s[1]),
                               atol=1e-7)


def test_point_mask():
    """Masked points contribute nothing: corrupt them and verify recovery."""
    key = jax.random.PRNGKey(6)
    scene = synthetic.gen_scene_sequence(key, N=32, n_zeta=1, reps=[(0, 0)])
    p_t = scene.p_t.at[:, 24:].set(
        jax.random.normal(key, (1, 8, 3)) * 5.0
    )
    pmask = jnp.arange(32)[None, :] < 24
    res = lm.solve(scene.T0s, scene.reps, scene.p, p_t, pmask=pmask,
                   huber_delta=1.0)
    init_rot = rot_err(scene.T0s[0], scene.Ts[0])
    fin_rot = rot_err(res.T0s[0], scene.Ts[0])
    assert fin_rot < max(0.1 * init_rot, 5e-3)


def test_batched_windows():
    """vmapped solve over independent windows equals per-window solve."""
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    scenes = [
        synthetic.gen_scene_sequence(k, N=16, n_zeta=2, reps=[(0, 0), (1, 1)])
        for k in keys
    ]
    T0s = jnp.stack([s.T0s for s in scenes])
    p = jnp.stack([s.p for s in scenes])
    p_t = jnp.stack([s.p_t for s in scenes])
    reps = jnp.asarray(scenes[0].reps)
    batched = lm.solve_batched(T0s, reps, p, p_t, huber_delta=1.0)
    for b, s in enumerate(scenes):
        single = lm.solve(s.T0s, reps, s.p, s.p_t, huber_delta=1.0)
        # f32 reduction order differs between vmapped and sequential paths;
        # agreement is to ~1e-3, which is far below the scene noise scale.
        np.testing.assert_allclose(
            np.asarray(batched.T0s[b]), np.asarray(single.T0s), atol=2e-3
        )


def test_jit_no_retrace_and_finite():
    key = jax.random.PRNGKey(8)
    scene = synthetic.gen_scene_sequence(key, N=16, n_zeta=2,
                                         reps=[(0, 0), (1, 1)])
    solver = jax.jit(
        lambda T, p, pt: lm.solve(T, jnp.asarray(scene.reps), p, pt,
                                  huber_delta=1.0)
    )
    res = solver(scene.T0s, scene.p, scene.p_t)
    assert np.all(np.isfinite(np.asarray(res.T0s)))
    res2 = solver(scene.T0s * 1.0, scene.p, scene.p_t)
    assert np.all(np.isfinite(np.asarray(res2.T0s)))


def test_nan_guard():
    """Degenerate inputs (all-zero points) must not produce NaN poses."""
    T0s = se3.identity((1,))
    reps = np.array([[0, 0]], np.int32)
    p = jnp.zeros((1, 8, 3))
    p_t = jnp.zeros((1, 8, 3))
    res = lm.solve(T0s, reps, p, p_t, huber_delta=1.0)
    assert np.all(np.isfinite(np.asarray(res.T0s)))
