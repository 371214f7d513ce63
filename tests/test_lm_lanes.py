"""Parity: lane-major batched LM == the reference-layout solver.

``lm_lanes.solve_batched_lanes`` must match ``lm.solve_batched`` on the
same windows — same math, same schedule, different memory layout. f32
summation order differs, so comparisons are tolerance-based; the accept/
reject trajectory is identical in practice on these fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.datasets import synthetic
from epivo_tpu.optim import lm, lm_lanes
from epivo_tpu.pipeline import ba

pytestmark = pytest.mark.slow


def _windows(key, n_windows, spec, N=24, rot_noise=0.04, t_noise=0.08):
    scenes = [
        synthetic.gen_scene_sequence(
            k, N=N, n_zeta=spec.n_zeta, reps=[tuple(r) for r in spec.reps],
            rot_noise=rot_noise, t_noise=t_noise,
        )
        for k in jax.random.split(key, n_windows)
    ]
    return (jnp.stack([s.T0s for s in scenes]),
            jnp.stack([s.Ts for s in scenes]),
            jnp.stack([s.p for s in scenes]),
            jnp.stack([s.p_t for s in scenes]))


def _compare(out_a, out_b, pose_atol=3e-3):
    np.testing.assert_allclose(np.asarray(out_a.T0s), np.asarray(out_b.T0s),
                               atol=pose_atol)
    np.testing.assert_allclose(np.asarray(out_a.r_norm),
                               np.asarray(out_b.r_norm), rtol=0.2, atol=1e-5)
    # Accept/reject paths can diverge by a few steps once the iterates are
    # inside the converged basin (f32 ties go either way under different
    # summation orders); the pose/r_norm agreement above is the real
    # parity statement.
    acc_a = np.asarray(out_a.n_accepted)
    acc_b = np.asarray(out_b.n_accepted)
    assert np.all(np.abs(acc_a.astype(int) - acc_b.astype(int)) <= 8), (
        acc_a, acc_b)


def test_lanes_matches_reference_forward():
    spec = ba.mono_window_spec(ws=3)
    T0s, Ts, p, p_t = _windows(jax.random.PRNGKey(0), 4, spec)
    kw = dict(max_iters=25, huber_delta=1.0)
    ref = lm.solve_batched(T0s, jnp.asarray(spec.reps), p, p_t, **kw)
    lanes = lm_lanes.solve_batched_lanes(T0s, spec.reps, p, p_t, **kw)
    _compare(ref, lanes)
    # Both recover GT.
    for w in range(4):
        for z in range(spec.n_zeta):
            fin = float(jnp.linalg.norm(
                lanes.T0s[w, z, :3, :3] - Ts[w, z, :3, :3]))
            assert fin < 1e-2, (w, z, fin)


def test_lanes_matches_reference_weights_masks():
    spec = ba.mono_window_spec(ws=3)
    W = 3
    T0s, Ts, p, p_t = _windows(jax.random.PRNGKey(1), W, spec)
    R_, N = spec.reps.shape[0], p.shape[2]
    rng = np.random.default_rng(2)
    wreps = jnp.asarray(rng.uniform(0.5, 1.5, (W, R_)).astype(np.float32))
    wreps = wreps.at[1, 2].set(0.0)  # a zero-weight constraint
    pmask = jnp.asarray(rng.uniform(size=(W, R_, N)) > 0.2)
    kw = dict(max_iters=20, huber_delta=1.0)
    ref = lm.solve_batched(T0s, jnp.asarray(spec.reps), p, p_t,
                           wreps=wreps, pmask=pmask, **kw)
    lanes = lm_lanes.solve_batched_lanes(T0s, spec.reps, p, p_t,
                                         wreps=wreps, pmask=pmask, **kw)
    _compare(ref, lanes)


def test_lanes_matches_reference_zeta_mask_and_reverse():
    """Stereo spec (frozen rig zetas) + an added reverse-span constraint."""
    spec, w_pat = ba.stereo_window_spec(ws=3, freeze_rig=True)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 10)
    T_rig = jnp.asarray(np.diag([1.0, 1, 1, 1]).astype(np.float32)
                        ).at[0, 3].set(0.5)
    Ts = []
    for s in range(2):
        Ts.append(T_rig)
        Ts.append(synthetic.random_pose(ks[s]))
    Ts = jnp.stack(Ts)

    reps = np.concatenate([spec.reps, [[3, 1]]], axis=0)  # reverse span
    w_pat = np.concatenate([w_pat, [1.0]]).astype(np.float32)
    ps, pts = [], []
    for i, (z0, z1) in enumerate(reps):
        T = synthetic.compose_span(Ts, int(z0), int(z1))
        _, p_, p_t_ = synthetic.gen_points(ks[2 + i], 16, T)
        ps.append(p_)
        pts.append(p_t_)
    p = jnp.stack(ps)[None]
    p_t = jnp.stack(pts)[None]
    T0s = Ts
    for z in [1, 3]:
        T0s = T0s.at[z].set(synthetic.perturb_pose(ks[8], Ts[z]))
    T0s = T0s[None]
    wreps = jnp.asarray(w_pat)[None]

    kw = dict(max_iters=25, huber_delta=1.0)
    ref = lm.solve_batched(T0s, jnp.asarray(reps), p, p_t, wreps=wreps,
                           zeta_mask=jnp.asarray(spec.zeta_mask), **kw)
    lanes = lm_lanes.solve_batched_lanes(T0s, reps, p, p_t, wreps=wreps,
                                         zeta_mask=spec.zeta_mask, **kw)
    _compare(ref, lanes)
    # Frozen rig zetas exactly at calibration in both.
    np.testing.assert_allclose(np.asarray(lanes.T0s[0, 0]),
                               np.asarray(T_rig), atol=1e-6)


def test_lanes_huber_1e5_regime():
    """The reference's production huber_delta=1e-5 regime also matches."""
    spec = ba.mono_window_spec(ws=3)
    T0s, Ts, p, p_t = _windows(jax.random.PRNGKey(4), 2, spec,
                               rot_noise=0.01, t_noise=0.02)
    kw = dict(max_iters=15, huber_delta=1e-5)
    ref = lm.solve_batched(T0s, jnp.asarray(spec.reps), p, p_t, **kw)
    lanes = lm_lanes.solve_batched_lanes(T0s, spec.reps, p, p_t, **kw)
    _compare(ref, lanes, pose_atol=5e-3)
