"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

Asserts the same code produces tolerance-equal results on 1-device vs
8-device meshes (the multi-chip test strategy from SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu import ransac
from epivo_tpu.datasets import synthetic
from epivo_tpu.geometry import essential, se3
from epivo_tpu.parallel import dist, mesh as mesh_mod
from epivo_tpu.pipeline import ba
from epivo_tpu.pipeline.config import BAConfig, LMConfig


def test_device_count():
    assert len(jax.devices()) == 8


def _windows_scene(key, n_windows, spec, N=16):
    scenes = [
        synthetic.gen_scene_sequence(
            k, N=N, n_zeta=spec.n_zeta, reps=[tuple(r) for r in spec.reps],
            rot_noise=0.03, t_noise=0.06,
        )
        for k in jax.random.split(key, n_windows)
    ]
    Ts = jnp.stack([s.Ts for s in scenes])
    T0s = jnp.stack([s.T0s for s in scenes])
    p = jnp.stack([s.p for s in scenes])
    p_t = jnp.stack([s.p_t for s in scenes])
    return Ts, T0s, p, p_t


def test_distributed_ba_matches_single():
    spec = ba.mono_window_spec(ws=3)
    cfg = BAConfig(lm=LMConfig(n_points=16, huber_delta=1.0, revert_r_norm=10.0))
    Ts, T0s, p, p_t = _windows_scene(jax.random.PRNGKey(0), 8, spec)
    wreps = jnp.ones((8, spec.reps.shape[0]))

    m8 = mesh_mod.make_mesh(n_win=8, n_hyp=1)
    step8 = dist.distributed_ba_step(m8, spec, cfg)
    pmask = jnp.ones(p.shape[:3], bool)
    out8 = step8(T0s, p, p_t, wreps, pmask)

    # Single-device reference result.
    out1 = ba.ba_windows(T0s, spec, p, p_t, wreps=wreps, config=cfg)

    # f32 SPMD reduction order differs from single-device; ~5e-3 envelope.
    np.testing.assert_allclose(
        np.asarray(out8.T_opt), np.asarray(out1.T_opt), atol=5e-3
    )
    assert out8.trajectory.shape == (8 * spec.n_zeta + 1, 4, 4)
    # Trajectory consistent with sequential composition.
    zetas = ba.stitch_windows(out1.T_opt)
    traj_ref = ba.trajectory_from_zetas(zetas)
    np.testing.assert_allclose(
        np.asarray(out8.trajectory), np.asarray(traj_ref), atol=5e-3
    )
    assert float(out8.reverted_frac) == 0.0


def test_distributed_ba_sharded_inputs():
    """Explicitly place sharded inputs and check the step runs SPMD."""
    spec = ba.mono_window_spec(ws=3)
    cfg = BAConfig(lm=LMConfig(n_points=16, huber_delta=1.0, revert_r_norm=10.0))
    Ts, T0s, p, p_t = _windows_scene(jax.random.PRNGKey(1), 8, spec)
    wreps = jnp.ones((8, spec.reps.shape[0]))

    m = mesh_mod.make_mesh(n_win=8, n_hyp=1)
    ws = mesh_mod.win_sharding(m)
    T0s_s = jax.device_put(T0s, ws)
    p_s = jax.device_put(p, ws)
    p_t_s = jax.device_put(p_t, ws)
    w_s = jax.device_put(wreps, ws)
    pm_s = jax.device_put(jnp.ones(p.shape[:3], bool), ws)
    step = dist.distributed_ba_step(m, spec, cfg)
    out = step(T0s_s, p_s, p_t_s, w_s, pm_s)
    # Output windows stay sharded over the mesh.
    assert len(out.T_opt.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(out.T_opt)))


def test_distributed_ransac_matches_quality():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    T = synthetic.random_pose(k1)
    _, p, p_t = synthetic.gen_points(k2, 96, T)
    # 25% outliers
    noise = jax.random.normal(k3, (24, 2)) * 0.3
    p_t = p_t.at[:24, :2].add(noise)
    mask = jnp.ones(96, bool)

    m = mesh_mod.make_mesh(n_win=1, n_hyp=8)
    fn = dist.distributed_ransac_essential(m, n_hyp_per_device=64,
                                           threshold=1e-5)
    E, inl = fn(jax.random.PRNGKey(0), p, p_t, mask)
    inl = np.asarray(inl)
    assert inl[24:].mean() > 0.9
    assert inl[:24].mean() < 0.2
    R, t = se3.matrix_to_rt(T)
    R_hat, t_hat, _ = essential.recover_pose(E, p, p_t, mask=jnp.asarray(inl))
    np.testing.assert_allclose(np.asarray(R_hat), np.asarray(R), atol=3e-2)
