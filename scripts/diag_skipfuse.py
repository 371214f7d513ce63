"""Offline eval: fuse skip-pair vector-closure boundary-ratio estimates.

For boundary b (ratio m_b / m_{b-1}, a := b-1):
  base:  median depth ratio backward/forward at frame b (current chain).
  fwd-skip:  frame-a keypoints in pairs (a,a+1) and (a,a+2):
      rho = |t_skip|/m_a  (median d_fwd/d_skip over shared points)
      ||R2 t1 + x t2|| = rho  ->  x^2 + 2cx + (1-rho^2) = 0,
      x = -c + sqrt(c^2 - 1 + rho^2),  c = t2 . (R2 t1),
      with R2,t2 from pair (a+1,a+2), t1 from (a,a+1): x = m_{a+1}/m_a.
  back-skip: frame-(a+2) keypoints in pairs (a+2,a+1) and (a+2,a):
      rho' = |t_skip|/m_{a+1} -> y = -c + sqrt(c^2 - 1 + rho'^2) = m_a/m_{a+1},
      x' = 1/y.
Fusion: median of the available log-estimates per boundary.

Skip pairs exist only at even a (window stride 2), so odd boundaries get
3 estimates, even get 1.

Usage: python scripts/diag_skipfuse.py [--frames N]
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
    ap.add_argument("--frames", type=int, default=300)
    args = ap.parse_args()

    import jax.numpy as jnp

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera, epipolar as epi, se3
    from epivo_tpu.pipeline import scale as scale_mod
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
    F = args.frames

    def depths(T, p, pt):
        d, v = epi.epipolar_depth(jnp.asarray(T[:3, :3]),
                                  jnp.asarray(T[:3, 3]),
                                  jnp.asarray(p), jnp.asarray(pt))
        return np.asarray(d), np.asarray(v)

    def gated_median(num, den, ok, flows):
        """median(num/den) over ok, flow-gated like the chain."""
        if sc.chain_flow_topfrac > 0 and ok.sum() >= 2 * sc.min_common:
            thr = np.quantile(flows[ok], 1 - sc.chain_flow_topfrac)
            g = ok & (flows >= thr)
            if g.sum() >= sc.min_common:
                ok = g
        if ok.sum() < sc.min_common:
            return None
        return float(np.median(num[ok] / den[ok]))

    def flow(pair):
        return np.linalg.norm(
            (pair["p_t_full"] - pair["p_full"])[:, :2], axis=-1)

    def ratio_base(b):
        back, fwd, prev = pd.get((b, b - 1)), pd.get((b, b + 1)), pd.get(
            (b - 1, b))
        if back is None or fwd is None or prev is None:
            return None
        Tb = np.asarray(se3.inverse(jnp.asarray(prev["T"])))
        db, vb = depths(Tb, back["p_full"], back["p_t_full"])
        df, vf = depths(np.asarray(fwd["T"]), fwd["p_full"], fwd["p_t_full"])
        ok = (vb & vf & back["mask_full"] & fwd["mask_full"]
              & (db > sc.depth_min) & (db < sc.depth_max)
              & (df > sc.depth_min) & (df < sc.depth_max))
        return gated_median(db, df, ok, np.minimum(flow(back), flow(fwd)))

    def solve_x(rho, c):
        disc = c * c - 1.0 + rho * rho
        if disc < 0 or rho <= 0:
            return None
        x = -c + np.sqrt(disc)
        return x if x > 1e-3 else None

    def ratio_fwd_skip(b):
        a = b - 1
        p1, p2, skip = pd.get((a, a + 1)), pd.get((a + 1, a + 2)), pd.get(
            (a, a + 2))
        if p1 is None or p2 is None or skip is None:
            return None
        d1, v1 = depths(np.asarray(p1["T"]), p1["p_full"], p1["p_t_full"])
        ds, vs = depths(np.asarray(skip["T"]), skip["p_full"],
                        skip["p_t_full"])
        ok = (v1 & vs & p1["mask_full"] & skip["mask_full"]
              & (d1 > sc.depth_min) & (d1 < sc.depth_max)
              & (ds > sc.depth_min) & (ds < sc.depth_max))
        rho = gated_median(d1, ds, ok, np.minimum(flow(p1), flow(skip)))
        if rho is None:
            return None
        t1 = np.asarray(p1["T"])[:3, 3]
        R2 = np.asarray(p2["T"])[:3, :3]
        t2 = np.asarray(p2["T"])[:3, 3]
        c = float(t2 @ (R2 @ t1))
        return solve_x(rho, c)

    def ratio_back_skip(b):
        a = b - 1
        pb, skipb = pd.get((a + 2, a + 1)), pd.get((a + 2, a))
        p1, p2 = pd.get((a, a + 1)), pd.get((a + 1, a + 2))
        if pb is None or skipb is None or p1 is None or p2 is None:
            return None
        dbk, vbk = depths(np.asarray(pb["T"]), pb["p_full"], pb["p_t_full"])
        dsb, vsb = depths(np.asarray(skipb["T"]), skipb["p_full"],
                          skipb["p_t_full"])
        ok = (vbk & vsb & pb["mask_full"] & skipb["mask_full"]
              & (dbk > sc.depth_min) & (dbk < sc.depth_max)
              & (dsb > sc.depth_min) & (dsb < sc.depth_max))
        rho = gated_median(dbk, dsb, ok, np.minimum(flow(pb), flow(skipb)))
        if rho is None:
            return None
        t1 = np.asarray(p1["T"])[:3, 3]
        R2 = np.asarray(p2["T"])[:3, :3]
        t2 = np.asarray(p2["T"])[:3, 3]
        c = float(t2 @ (R2 @ t1))
        y = solve_x(rho, c)
        return None if y is None else 1.0 / y

    variants = {
        "base": lambda b: [ratio_base(b)],
        "fwd_skip only": lambda b: [ratio_fwd_skip(b)],
        "back_skip only": lambda b: [ratio_back_skip(b)],
        "fuse3 median": lambda b: [ratio_base(b), ratio_fwd_skip(b),
                                   ratio_back_skip(b)],
    }
    for name, fn in variants.items():
        ratios, navail = np.ones(F - 2), []
        for b in range(1, F - 1):
            ests = [e for e in fn(b) if e is not None and e > 0]
            navail.append(len(ests))
            if ests:
                ratios[b - 1] = float(np.exp(np.median(np.log(ests))))
        ratios_f, nrep = scale_mod.hampel_log(
            ratios, sc.chain_hampel_window, sc.chain_hampel_ratio,
            mad_k=sc.chain_hampel_mad_k)
        dr = (np.log(ratios_f)
              - np.log(gt_step[1:F - 1] / gt_step[:F - 2]))
        cum = np.cumsum(dr)
        w = gt_step[:F - 2] / gt_step[:F - 2].sum()
        print("%-15s avail=%.2f rep=%2d end=%+.3f max|cum|=%.3f "
              "rms=%.3f len_ratio=%.3f"
              % (name, np.mean(navail), int(nrep.sum()), cum[-1],
                 np.abs(cum).max(), np.sqrt((cum ** 2).mean()),
                 float((w * np.exp(cum)).sum())))


if __name__ == "__main__":
    main()
