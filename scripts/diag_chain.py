"""Diagnose the no-GT mono scale chain against GT per-step norms.

Runs stage 1 of the mono BA runner (`runners.prepare_mono_windows`) on
the photoreal corridor and prints the per-boundary chain log-ratio error
vs GT — to locate where (and why) the chain drifts or collapses.

Usage: python scripts/diag_chain.py [--frames N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig,
    )

    H, W = 376, 1241
    cam = camera.KITTI_00
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    frames, gt, _ = photoreal.corridor_sequence(
        args.frames, H=H, W=W, K=K, speed=0.8, exposure_drift=0.15,
        noise_sigma=2.0, seed=7)
    cfg = BAConfig(
        camera=cam,
        frontend=FrontendConfig(fast_threshold=30.0, max_keypoints=512,
                                klt_levels=4),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )
    cache = "/tmp/diag_chain_pd_%d.npz" % args.frames
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        pair_data = z["pd"].item()
    else:
        mw = runners.prepare_mono_windows(frames, cfg, gt_poses=None,
                                          n_frames=args.frames, batch=32,
                                          pipeline_depth=2)
        pair_data = mw.pair_data
        np.savez(cache, pd=np.array(pair_data, dtype=object))
    c = np.asarray(
        runners._chained_scales(pair_data, args.frames - 1, cfg.scale),
        np.float64)
    c = c / c[0]

    gt_step = np.linalg.norm(
        np.diff(np.asarray(gt)[:, :3, 3], axis=0), axis=-1)
    c_gt = gt_step / gt_step[0]

    r_est = np.diff(np.log(np.maximum(c, 1e-9)))
    r_gt = np.diff(np.log(np.maximum(c_gt[: len(c)], 1e-9)))
    dr = r_est - r_gt
    print("boundary log-ratio error: std=%.4f  |  worst 10:" % dr.std())
    for i in np.argsort(-np.abs(dr))[:10]:
        print("  b=%3d  r_est=%+.4f  r_gt=%+.4f  err=%+.4f" %
              (i + 1, r_est[i], r_gt[i], dr[i]))
    print("cum log drift at end: %+.4f (len-weighted ratio ~ %.3f)" %
          (dr.sum(), np.exp(dr.sum())))
    cum = np.cumsum(dr)
    for j in range(0, len(cum), max(1, len(cum) // 40)):
        print("  up to b=%3d: cum=%+.4f" % (j + 1, cum[j]))
    print("  up to b=%3d: cum=%+.4f (end)" % (len(cum), cum[-1]))


if __name__ == "__main__":
    main()
