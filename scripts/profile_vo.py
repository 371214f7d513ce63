"""Stage-level timing of the vo_step hot path on the current backend.

Times each jitted sub-stage of the flagship two-view VO step (FAST, KLT,
RANSAC, recoverPose, LM, triangulation) plus the fused step. Each stage is
measured as a fused ``lax.scan`` of N perturbed invocations (the same
methodology as bench.py — through the axon relay, repeated identical
dispatches are cached and per-dispatch timing is meaningless). Not part of
the test suite.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from epivo_tpu import ransac as ransac_mod
from epivo_tpu.frontend import fast, klt
from epivo_tpu.geometry import camera as cam, epipolar, essential, se3
from epivo_tpu.optim import lm
from epivo_tpu.pipeline import vo
from epivo_tpu.pipeline.config import (
    FrontendConfig, LMConfig, RansacConfig, VOConfig,
)

N_SCAN = 50


def scan_time_ms(fn, *args):
    """ms per call of fn(*args), measured as one fused scan of N_SCAN
    perturbed calls; every arg gets a tiny iteration-dependent bump so the
    relay/XLA cannot cache or CSE the body."""

    def many(*a):
        def body(carry, _):
            bumped = [
                x + carry * 1e-6 if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in a
            ]
            out = fn(*bumped)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                    for l in jax.tree.leaves(out))
            return s * 1e-9, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_SCAN)
        return s

    f = jax.jit(many)
    np.asarray(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_SCAN * 1e3


def main():
    cfg = VOConfig(
        camera=cam.KITTI_00,
        frontend=FrontendConfig(fast_threshold=40.0, max_keypoints=512,
                                klt_levels=4),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=48),
    )
    fc, rc, lc = cfg.frontend, cfg.ransac, cfg.lm
    H, W = cfg.camera.height, cfg.camera.width
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # Realistic intermediates for downstream stages.
    kp = fast.detect(img0, fc.fast_threshold, fc.max_keypoints)
    flow = klt.track(img0, img1, kp.xy, valid=kp.valid, win=fc.klt_window,
                     levels=fc.klt_levels, iters=fc.klt_iters,
                     min_eig=fc.klt_min_eig)
    K_inv = cfg.camera.K_inv(img0.dtype)
    p0 = cam.normalize(kp.xy, K_inv)
    p1 = cam.normalize(flow.xy, K_inv)
    thr = (rc.threshold_px / cfg.camera.fx) ** 2
    rres = ransac_mod.ransac_essential(key, p0, p1, n_hyp=rc.n_hyp,
                                       threshold=thr, mask=flow.status,
                                       method=rc.method)
    R_e, t_e, front = essential.recover_pose(rres.E, p0, p1, mask=rres.inliers)
    T_e = se3.rt_to_matrix(R_e, t_e)
    sel = rres.inliers & front & flow.status
    idx, sel_valid = vo._select_top(sel, lc.n_points)
    pr, p_r, pmask = p0[idx][None], p1[idx][None], sel_valid[None]
    (kp, flow, rres, R_e, t_e, T_e, pr, p_r, pmask) = jax.block_until_ready(
        (kp, flow, rres, R_e, t_e, T_e, pr, p_r, pmask))

    fmask = flow.status
    inl = rres.inliers
    stages = [
        ("fast.detect", lambda im: fast.detect(im, fc.fast_threshold,
                                               fc.max_keypoints), (img0,)),
        ("klt.track", lambda a, b, xy: klt.track(
            a, b, xy, valid=kp.valid, win=fc.klt_window, levels=fc.klt_levels,
            iters=fc.klt_iters, min_eig=fc.klt_min_eig),
         (img0, img1, kp.xy)),
        ("ransac", lambda a, b: ransac_mod.ransac_essential(
            key, a, b, n_hyp=rc.n_hyp, threshold=thr, mask=fmask,
            method=rc.method), (p0, p1)),
        ("recover_pose", lambda E, a, b: essential.recover_pose(
            E, a, b, mask=inl), (rres.E, p0, p1)),
        ("lm.solve", lambda T, a, b: lm.solve(
            T[None], jnp.zeros((1, 2), jnp.int32), a, b, pmask=pmask,
            lambda0=lc.lambda0, epsilon=lc.epsilon, max_iters=lc.max_iters,
            huber_delta=lc.huber_delta), (T_e, pr, p_r)),
        ("triangulate", lambda R, t, a, b: epipolar.triangulate(R, t, a, b),
         (R_e, t_e, p0, p1)),
        ("FULL vo_step", lambda a, b: vo.vo_step(a, b, key, cfg),
         (img0, img1)),
    ]
    only = sys.argv[1:]  # optional stage-name substrings to run
    total = 0.0
    for name, f, args in stages:
        if only and not any(o.lower() in name.lower() for o in only):
            continue
        ms = scan_time_ms(f, *args)
        if name != "FULL vo_step":
            total += ms
        print(f"{name:16s} {ms:8.3f} ms", flush=True)
    print(f"{'sum(stages)':16s} {total:8.3f} ms")


if __name__ == "__main__":
    main()
