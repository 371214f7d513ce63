"""Run monocular VO on a EuRoC MAV sequence (ref euroc_E driver,
`euroc_E.cpp:89-388`): undistorted cam0 stream -> two-view VO with
timestamp-associated GT scale -> trajectory + ATE + artifacts.

Usage:
  python scripts/run_euroc.py --root /path/to/V2_01_easy --frames 500 \
      --out out/euroc_v201
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="EuRoC sequence dir (contains mav0/)")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="out/euroc")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from epivo_tpu.datasets import euroc
    from epivo_tpu.geometry.camera import EUROC_CAM0
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import (
        FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )
    from epivo_tpu.viz import export

    seq = euroc.EurocSequence(root=args.root)
    if not seq.exists():
        print(f"ERROR: sequence not found at {seq.cam_dir}", file=sys.stderr)
        sys.exit(2)

    stop = args.start + args.frames if args.frames else None
    stamped = list(seq.undistorted_frames(args.start, stop))
    ts = np.array([t for t, _ in stamped], np.int64)
    frames = [f for _, f in stamped]

    gt = None
    try:
        gt_ts, gt_poses = seq.load_gt_cam0()
        idx = euroc.associate(ts, gt_ts)
        if np.all(idx >= 0):
            gt = gt_poses[idx]
        else:
            keep = idx >= 0
            frames = [f for f, k in zip(frames, keep) if k]
            gt = gt_poses[idx[keep]]
            print(f"dropped {int((~keep).sum())} frames without GT within tolerance")
    except OSError:
        print("no GT found; monocular scale will be unit-norm")

    cfg = VOConfig(
        camera=EUROC_CAM0,
        frontend=FrontendConfig(fast_threshold=20.0, max_keypoints=1024),
        # ref euroc_E uses RANSAC 0.99 / 0.3px (`euroc_E.cpp:202-208`)
        ransac=RansacConfig(n_hyp=512, threshold_px=0.3),
        lm=LMConfig(n_points=48, revert_r_norm=1e-4),
    )
    res = runners.run_vo_sequence(frames, cfg, gt_poses=gt, batch=args.batch)

    os.makedirs(args.out, exist_ok=True)
    export.write_poses(os.path.join(args.out, "euroc.T"), res.trajectory)
    if res.gt_trajectory is not None:
        export.write_poses(os.path.join(args.out, "euroc.GT"), res.gt_trajectory)
    if res.cloud.shape[0]:
        export.write_cloud(os.path.join(args.out, "pts.cld"), res.cloud,
                           lims_path=os.path.join(args.out, "lims"),
                           limits=res.cloud_limits)
    export.plot_trajectories(
        os.path.join(args.out, "traj.png"),
        {k: v for k, v in [("est", res.trajectory),
                           ("gt", res.gt_trajectory)] if v is not None},
    )
    summary = {"frames": len(frames), "ate_m": res.ate, "rpe_t": res.rpe_t}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
