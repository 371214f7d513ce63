"""Per-point diagnosis of biased scale-chain boundaries.

Loads the pair_data cache written by diag_chain.py and, for chosen
boundaries, dumps the per-point depth-ratio distribution plus candidate
conditioning covariates (parallax, depth, residual) — to find WHY a
boundary's ratio median is biased and which gate would fix it.

Usage: python scripts/diag_boundary.py [--frames N] [--bs 76,104,134]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--bs", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera, epipolar as epi, se3
    from epivo_tpu.pipeline.config import ScaleConfig

    cache = "/tmp/diag_chain_pd_%d.npz" % args.frames
    pd = np.load(cache, allow_pickle=True)["pd"].item()

    H, W = 376, 1241
    cam = camera.KITTI_00
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    _, gt, _ = photoreal.corridor_sequence(
        args.frames, H=H, W=W, K=K, speed=0.8, exposure_drift=0.15,
        noise_sigma=2.0, seed=7)
    gt_step = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1)
    sc = ScaleConfig()

    bs = ([int(x) for x in args.bs.split(",") if x]
          or list(range(1, args.frames - 2)))
    rows = []
    for b in bs:
        back = pd.get((b, b - 1))
        fwd = pd.get((b, b + 1))
        prev = pd.get((b - 1, b))
        if back is None or fwd is None or prev is None:
            continue
        Tb = np.asarray(se3.inverse(jnp.asarray(prev["T"])))
        db, vb = epi.epipolar_depth(jnp.asarray(Tb[:3, :3]),
                                    jnp.asarray(Tb[:3, 3]),
                                    jnp.asarray(back["p_full"]),
                                    jnp.asarray(back["p_t_full"]))
        df, vf = epi.epipolar_depth(jnp.asarray(fwd["T"][:3, :3]),
                                    jnp.asarray(fwd["T"][:3, 3]),
                                    jnp.asarray(fwd["p_full"]),
                                    jnp.asarray(fwd["p_t_full"]))
        db, vb, df, vf = map(np.asarray, (db, vb, df, vf))
        both = (vb & vf & back["mask_full"] & fwd["mask_full"]
                & (db > sc.depth_min) & (db < sc.depth_max)
                & (df > sc.depth_min) & (df < sc.depth_max))
        if both.sum() < 4:
            continue
        # True ratio: d_back is depth at frame b in units of |t(b-1,b)|;
        # d_fwd in units of |t(b,b+1)|. ratio = db/df estimates
        # |t(b,b+1)|/|t(b-1,b)| -> r_gt = gt_step[b]/gt_step[b-1].
        ratio = db[both] / df[both]
        r_true = gt_step[b] / gt_step[b - 1]
        lr = np.log(np.maximum(ratio, 1e-12)) - np.log(r_true)
        # Parallax proxies: pixel flow of the shared keypoints in each pair.
        flow_f = np.linalg.norm(
            (fwd["p_t_full"] - fwd["p_full"])[both][:, :2], axis=-1)
        rows.append((b, int(both.sum()), np.median(lr), lr.mean(), lr.std(),
                     np.median(df[both]), np.median(db[both]),
                     np.median(flow_f)))
    print("  b    n  med(err) mean(err) std   med(df) med(db) med(flow)")
    for r in rows:
        print("%4d %4d  %+.3f   %+.3f  %.3f  %7.1f %7.1f  %6.4f" % r)
    errs = np.array([r[2] for r in rows])
    print("over %d boundaries: med-err mean=%+.4f std=%.4f" %
          (len(rows), errs.mean(), errs.std()))


if __name__ == "__main__":
    main()
