"""Run VO / stereo BA on a EuRoC MAV sequence.

--mode vo (default): ref euroc_E driver (`euroc_E.cpp:89-388`) —
undistorted cam0 stream -> two-view VO with timestamp-associated GT scale
-> trajectory + ATE + artifacts.

--mode stereo: fully rectified cam0/cam1 pairs (Bouguet split-rotation
rectification, the full-stereo counterpart of the reference's cam0-only
maps `euroc.cpp:104-111`) -> windowed stereo BA with the calibrated
baseline providing metric scale (no GT in the estimation path); streamed
with bounded memory.

Usage:
  python scripts/run_euroc.py --root /path/to/V2_01_easy --frames 500 \
      --out out/euroc_v201 [--mode vo|stereo]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="EuRoC sequence dir (contains mav0/)")
    ap.add_argument("--mode", choices=["vo", "stereo"], default="vo")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="out/euroc")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--devices", type=int, default=0,
                    help="shard the stereo window solve over an N-device "
                         "mesh (0 = single device)")
    ap.add_argument("--pipeline-depth", type=int, default=2)
    ap.add_argument("--loop-close", action="store_true",
                    help="enable loop closure (keyframe retrieval + "
                         "ORB/RANSAC verification + Sim(3) spreading); "
                         "EuRoC MH sequences contain real loops")
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

    if args.mode == "stereo":
        run_stereo(args, seq)
        return

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
    kf_store = None
    if args.loop_close:
        from epivo_tpu.pipeline import loopclose
        from epivo_tpu.pipeline.config import LoopConfig

        loop_cfg = LoopConfig(enabled=True)
        kf_store = loopclose.KeyframeStore(loop_cfg.keyframe_stride,
                                           loop_cfg.keyframe_budget)
        for idx, f in enumerate(frames):
            kf_store.offer(idx, f)
    res = runners.run_vo_sequence(frames, cfg, gt_poses=gt, batch=args.batch)
    n_loops = 0
    if kf_store:
        from epivo_tpu.pipeline.config import BAConfig

        ba_like = BAConfig(camera=cfg.camera, frontend=cfg.frontend,
                           ransac=cfg.ransac, lm=cfg.lm, loop=loop_cfg)
        traj2, loops = runners._loop_stage(res.trajectory, kf_store,
                                           ba_like, seed=0, mlog=None)
        n_loops = len(loops)
        ate2 = rpe2 = None
        if res.gt_trajectory is not None:
            from epivo_tpu.eval import metrics as ev

            n = min(len(res.gt_trajectory), traj2.shape[0])
            ate2 = float(ev.ate_rmse(traj2[:n], res.gt_trajectory[:n],
                                     align=True, with_scale=False))
            rpe2 = float(ev.rpe(traj2[:n], res.gt_trajectory[:n])[0])
        res = res._replace(trajectory=traj2, loops=tuple(loops),
                           ate=ate2 if ate2 is not None else res.ate,
                           rpe_t=rpe2 if rpe2 is not None else res.rpe_t)

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
    summary = {"frames": len(frames), "ate_m": res.ate, "rpe_t": res.rpe_t,
               "loops_applied": n_loops}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


def run_stereo(args, seq):
    """Rectified stereo pairs -> windowed stereo BA (metric scale from the
    calibrated baseline; GT used for evaluation only)."""
    import jax  # noqa: F401  (platform configured by caller)

    from epivo_tpu.datasets import euroc
    from epivo_tpu.eval import metrics as ev
    from epivo_tpu.geometry.camera import Pinhole
    from epivo_tpu.pipeline import runners
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig,
    )
    from epivo_tpu.viz import export

    stop = args.start + args.frames if args.frames else None
    ts = seq.stereo_timestamps(args.start, stop)
    if len(ts) < 3:
        print("ERROR: not enough matched stereo pairs", file=sys.stderr)
        sys.exit(2)
    # Rectification geometry (one probe image for the shape).
    probe = seq.load_image(seq.image_list()[0][1])
    _, _, K_new, T_rig, Rrect0 = seq.stereo_rectification(probe.shape)
    H, W = probe.shape
    cam = Pinhole(fx=float(K_new[0, 0]), fy=float(K_new[1, 1]),
                  cx=float(K_new[0, 2]), cy=float(K_new[1, 2]),
                  width=W, height=H)

    # ONE decode pass, bounded memory: tee the triple stream; the stereo
    # runner consumes L/R alternately so the tee buffer stays at one item.
    t1, t2 = itertools.tee(seq.rectified_stereo_frames(args.start, stop))
    L = (l for _, l, _ in t1)
    R = (r for _, _, r in t2)

    loop_kw = {}
    if args.loop_close:
        from epivo_tpu.pipeline.config import LoopConfig

        loop_kw["loop"] = LoopConfig(enabled=True)
    cfg = BAConfig(
        camera=cam,
        frontend=FrontendConfig(fast_threshold=20.0, max_keypoints=1024),
        ransac=RansacConfig(n_hyp=512, threshold_px=0.3),
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
        **loop_kw,
    )
    mesh = None
    if args.devices:
        from epivo_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh(n_win=args.devices, n_hyp=1,
                                  devices=jax.devices()[: args.devices])

    os.makedirs(args.out, exist_ok=True)
    res = runners.run_stereo_ba_sequence(
        L, R, cfg, T_rig=T_rig, n_frames=len(ts),
        batch=args.batch, pipeline_depth=args.pipeline_depth, mesh=mesh,
        metrics_path=os.path.join(args.out, "metrics.jsonl"),
    )

    # GT (evaluation only): cam0 poses mapped into the rectified frame.
    summary = {"mode": "stereo", "frames": len(ts),
               "baseline_m": float(-T_rig[0, 3]),
               "loops_applied": len(res.loops),
               "windows_reverted": int(res.per_frame["window_reverted"].sum()),
               "config": {"batch": args.batch,
                          "pipeline_depth": args.pipeline_depth,
                          "devices": args.devices or 1,
                          "platform": jax.devices()[0].platform}}
    try:
        gt_ts, gt_cam0 = seq.load_gt_cam0()
        idx = euroc.associate(np.asarray(ts, np.int64), gt_ts)
        if np.all(idx >= 0):
            R_r = np.eye(4)
            R_r[:3, :3] = Rrect0.T  # world-from-rect = world-from-cam0 @ R^T
            gt = gt_cam0[idx] @ R_r[None]
            gt = np.linalg.inv(gt[0])[None] @ gt
            n = min(len(gt), res.trajectory.shape[0])
            # Metric (NO scale alignment): the baseline must supply scale.
            summary["ate_m"] = float(ev.ate_rmse(
                res.trajectory[:n], gt[:n], align=True, with_scale=False))
            summary["rpe_t"] = float(ev.rpe(res.trajectory[:n], gt[:n])[0])
            export.write_poses(os.path.join(args.out, "euroc.GT"), gt[:n])
    except OSError:
        summary["ate_m"] = None

    export.write_poses(os.path.join(args.out, "euroc.T"), res.trajectory)
    export.plot_trajectories(os.path.join(args.out, "traj.png"),
                             {"est": res.trajectory})
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
