"""Tests for the native C++ loader runtime (threaded PNG decode + prefetch)."""

import os

import numpy as np
import pytest

from epivo_tpu import runtime


@pytest.fixture(scope="module")
def built():
    if not runtime.available():
        try:
            runtime.build()
        except Exception as e:
            pytest.skip(f"native build failed: {e}")
    return True


def make_pngs(tmp_path, n=6, H=40, W=56, mode="L"):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(n):
        arr = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
        img = Image.fromarray(arr, "L")
        if mode == "RGB":
            img = img.convert("RGB")
        p = str(tmp_path / f"f{i:03d}.png")
        img.save(p)
        paths.append(p)
        arrays.append(arr.astype(np.float32))
    return paths, arrays


def test_native_decode_matches_pil(built, tmp_path):
    paths, arrays = make_pngs(tmp_path, n=2)
    out = runtime.decode_png(paths[0])
    np.testing.assert_allclose(out, arrays[0])
    assert out.dtype == np.float32


def test_native_decode_rgb(built, tmp_path):
    paths, arrays = make_pngs(tmp_path, n=1, mode="RGB")
    out = runtime.decode_png(paths[0])
    # RGB of a gray image -> same luma values
    np.testing.assert_allclose(out, arrays[0], atol=1.0)


def test_native_decode_missing_file(built):
    with pytest.raises(IOError):
        runtime.decode_png("/nonexistent/nope.png")


def test_loader_in_order_stream(built, tmp_path):
    paths, arrays = make_pngs(tmp_path, n=6)
    frames = list(runtime.NativeLoader(paths, n_workers=3, capacity=3))
    assert len(frames) == 6
    for f, a in zip(frames, arrays):
        np.testing.assert_allclose(f, a)


def test_loader_more_workers_than_frames(built, tmp_path):
    paths, arrays = make_pngs(tmp_path, n=2)
    frames = list(runtime.NativeLoader(paths, n_workers=8, capacity=16))
    assert len(frames) == 2


def test_native_lm_recovers_pose(built):
    """The native LM (benchmark-baseline kernel) recovers a perturbed pose
    on exact synthetic matches, and agrees with the JAX solver."""
    import jax
    import jax.numpy as jnp

    from epivo_tpu.datasets import synthetic
    from epivo_tpu.geometry import se3
    from epivo_tpu.optim import lm

    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    T_gt = synthetic.random_pose(k1)
    _, p, p_t = synthetic.gen_points(k2, 48, T_gt)
    T0 = synthetic.perturb_pose(k3, T_gt, rot_noise=0.03, t_noise=0.05)

    # huber_delta=1.0 — the reference's synthetic-test regime
    # (`test_jac_Rt_gen.cpp:16`); the 1e-5 regime crushes gradients by
    # design and stalls any LM on this problem (JAX solver included).
    T_ref, acc = runtime.lm_refine_pose(np.asarray(T0), np.asarray(p),
                                        np.asarray(p_t), max_iters=30,
                                        huber_delta=1.0)
    assert acc > 0
    # Up-to-scale comparison: translation direction + rotation.
    R_err = np.linalg.norm(T_ref[:3, :3] - np.asarray(T_gt)[:3, :3])
    td = T_ref[:3, 3] / np.linalg.norm(T_ref[:3, 3])
    gd = np.asarray(T_gt)[:3, 3] / np.linalg.norm(np.asarray(T_gt)[:3, 3])
    assert R_err < 5e-3, R_err
    assert np.dot(td, gd) > 0.999, (td, gd)

    out = lm.solve(jnp.asarray(T0)[None], jnp.zeros((1, 2), jnp.int32),
                   p[None], p_t[None], max_iters=30, huber_delta=1.0)
    T_jax = np.asarray(out.T0s[0])
    R_err_j = np.linalg.norm(T_jax[:3, :3] - T_ref[:3, :3])
    assert R_err_j < 5e-3, R_err_j


def test_loader_feeds_vo_runner(built, tmp_path):
    """The native stream plugs directly into the sequence runner API."""
    paths, _ = make_pngs(tmp_path, n=3, H=64, W=80)
    from epivo_tpu.geometry import camera
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import (
        FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )

    cfg = VOConfig(
        camera=camera.Pinhole(fx=100.0, fy=100.0, cx=40.0, cy=32.0),
        frontend=FrontendConfig(fast_threshold=30.0, max_keypoints=64,
                                klt_levels=2),
        ransac=RansacConfig(n_hyp=64),
        lm=LMConfig(n_points=16),
    )
    res = runners.run_vo_sequence(
        runtime.NativeLoader(paths), cfg, batch=2, collect_cloud=False
    )
    # Random-noise frames: pipeline must complete without crashing.
    assert res.trajectory.shape == (3, 4, 4)
    assert np.all(np.isfinite(res.trajectory))


def test_native_lm_windowed_matches_jax(built):
    """The native windowed multi-zeta LM (BA benchmark baseline kernel)
    recovers a perturbed 2-zeta window and agrees with optim.lm.solve on
    the same constraints (same spans, weights, masks)."""
    import jax
    import jax.numpy as jnp

    from epivo_tpu.datasets import synthetic
    from epivo_tpu.optim import lm
    from epivo_tpu.pipeline import ba

    spec = ba.mono_window_spec(ws=3)
    key = jax.random.PRNGKey(21)
    scene = synthetic.gen_scene_sequence(
        key, N=24, n_zeta=spec.n_zeta,
        reps=[tuple(r) for r in spec.reps],
        rot_noise=0.04, t_noise=0.08,
    )
    wreps = np.ones(spec.reps.shape[0])
    pmask = np.ones((spec.reps.shape[0], 24), bool)
    pmask[0, -4:] = False  # exercise the mask path

    T_nat, r_norm, acc, iters = runtime.lm_windowed(
        np.asarray(scene.T0s), spec.reps, np.asarray(scene.p),
        np.asarray(scene.p_t), wreps=wreps, pmask=pmask,
        max_iters=30, huber_delta=1.0,
    )
    assert acc > 0 and iters > 0
    out = lm.solve(scene.T0s, jnp.asarray(spec.reps), scene.p, scene.p_t,
                   wreps=jnp.asarray(wreps, jnp.float32),
                   pmask=jnp.asarray(pmask), max_iters=30, huber_delta=1.0)
    T_jax = np.asarray(out.T0s)
    for z in range(spec.n_zeta):
        init = np.linalg.norm(np.asarray(scene.T0s)[z, :3, :3]
                              - np.asarray(scene.Ts)[z, :3, :3])
        fin_nat = np.linalg.norm(T_nat[z, :3, :3]
                                 - np.asarray(scene.Ts)[z, :3, :3])
        assert fin_nat < max(0.1 * init, 5e-3), (z, init, fin_nat)
        # Native and JAX land in the same basin.
        assert np.linalg.norm(T_nat[z, :3, :3] - T_jax[z, :3, :3]) < 2e-2
    assert r_norm == pytest.approx(float(out.r_norm), rel=0.5, abs=1e-3)
