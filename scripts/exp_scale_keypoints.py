"""Experiment: does more-keypoints-per-boundary cut the no-GT scale drift?

ScaleConfig.chain_smooth's docstring names "more keypoints per boundary"
as the generalizing lever against the ~7% no-GT sim3 ATE (median sigma
~ 1/sqrt(n)). This measures it: identical photoreal no-GT BA runs with
max_keypoints swept, reporting sim3 ATE + length ratio per setting.

Usage: python scripts/exp_scale_keypoints.py [--frames N] [--kps 512,1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--kps", type=str, default="512,1024")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.eval import metrics as ev
    from epivo_tpu.geometry import camera
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig,
    )

    H, W = 376, 1241
    cam = camera.KITTI_00
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    _, gt, _ = photoreal.corridor_sequence(
        args.frames, H=H, W=W, K=K, speed=0.8, exposure_drift=0.15,
        noise_sigma=2.0, seed=7)
    length = float(np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0),
                                         axis=-1)))
    gt_aln = np.linalg.inv(gt[0])[None] @ gt

    results = {}
    for kp in [int(x) for x in args.kps.split(",")]:
        cfg = BAConfig(
            camera=cam,
            frontend=FrontendConfig(fast_threshold=30.0, max_keypoints=kp,
                                    klt_levels=4),
            ransac=RansacConfig(n_hyp=512),
            lm=LMConfig(n_points=32, revert_r_norm=1e-2),
        )
        frames, _, _ = photoreal.corridor_sequence(
            args.frames, H=H, W=W, K=K, speed=0.8, exposure_drift=0.15,
            noise_sigma=2.0, seed=7)
        t0 = time.time()
        res = runners.run_ba_sequence(frames, cfg, gt_poses=None,
                                      n_frames=args.frames, batch=32,
                                      pipeline_depth=2)
        wall = time.time() - t0
        traj = res.trajectory
        ate_sim3 = ev.ate_rmse(traj, gt_aln[: traj.shape[0]], align=True,
                               with_scale=True)
        est_len = float(np.sum(np.linalg.norm(
            np.diff(traj[:, :3, 3], axis=0), axis=-1)))
        results[kp] = {
            "ate_sim3_rmse_m": round(float(ate_sim3), 4),
            "ate_sim3_pct": round(100.0 * float(ate_sim3) / length, 3),
            "len_ratio": round(est_len / length, 4),
            "wall_s": round(wall, 1),
        }
        print(kp, json.dumps(results[kp]), flush=True)

    print(json.dumps({"frames": args.frames, "length_m": round(length, 2),
                      "results": results}))


if __name__ == "__main__":
    main()
