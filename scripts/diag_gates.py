"""Offline sweep of boundary-ratio estimator variants on cached pairs.

Evaluates per-boundary log-ratio error (vs GT) for several point-gating
and aggregation strategies, using the pair_data cache from diag_chain.py.
The metric that matters for trajectory drift is the MEAN of the
per-boundary error (systematic bias compounds linearly) plus its std.

Usage: python scripts/diag_gates.py [--frames N]
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
    args = ap.parse_args()

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

    # Collect per-boundary raw data once.
    data = []
    for b in range(1, args.frames - 2):
        back = pd.get((b, b - 1))
        fwd = pd.get((b, b + 1))
        prev = pd.get((b - 1, b))
        if back is None or fwd is None or prev is None:
            continue
        Tb = np.asarray(se3.inverse(jnp.asarray(prev["T"])))
        db, vb = map(np.asarray, epi.epipolar_depth(
            jnp.asarray(Tb[:3, :3]), jnp.asarray(Tb[:3, 3]),
            jnp.asarray(back["p_full"]), jnp.asarray(back["p_t_full"])))
        df, vf = map(np.asarray, epi.epipolar_depth(
            jnp.asarray(fwd["T"][:3, :3]), jnp.asarray(fwd["T"][:3, 3]),
            jnp.asarray(fwd["p_full"]), jnp.asarray(fwd["p_t_full"])))
        ok = (vb & vf & back["mask_full"] & fwd["mask_full"]
              & (db > sc.depth_min) & (db < sc.depth_max)
              & (df > sc.depth_min) & (df < sc.depth_max))
        if ok.sum() < 8:
            continue
        flow_b = np.linalg.norm(
            (back["p_t_full"] - back["p_full"])[:, :2], axis=-1)
        flow_f = np.linalg.norm(
            (fwd["p_t_full"] - fwd["p_full"])[:, :2], axis=-1)
        r_true = gt_step[b] / gt_step[b - 1]
        data.append(dict(b=b, db=db, df=df, ok=ok, flow_b=flow_b,
                         flow_f=flow_f, r_true=r_true))

    def evaluate(name, fn):
        errs = []
        for d in data:
            r = fn(d)
            if r is None or not np.isfinite(r) or r <= 0:
                continue
            errs.append(np.log(r) - np.log(d["r_true"]))
        e = np.array(errs)
        # Drop the self-cancelling catastrophic pairs via hampel-style clip
        # (the chain gate handles them); bias/std of the REMAINING matters.
        keep = np.abs(e - np.median(e)) < 0.4
        print("%-34s n=%3d  mean=%+.4f  std=%.4f  |  gated: mean=%+.4f "
              "std=%.4f" % (name, len(e), e.mean(), e.std(),
                            e[keep].mean(), e[keep].std()))

    def base(d):
        both = d["ok"]
        return np.median(d["db"][both] / d["df"][both])

    def flow_top(frac):
        def fn(d):
            both = d["ok"]
            if both.sum() < 8:
                return None
            mf = np.minimum(d["flow_b"], d["flow_f"])
            thr = np.quantile(mf[both], 1 - frac)
            g = both & (mf >= thr)
            if g.sum() < 4:
                return None
            return np.median(d["db"][g] / d["df"][g])
        return fn

    def flow_abs(px):
        thr = px / 718.0
        def fn(d):
            both = d["ok"]
            g = both & (d["flow_b"] > thr) & (d["flow_f"] > thr)
            if g.sum() < 4:
                return base(d)
            return np.median(d["db"][g] / d["df"][g])
        return fn

    def trimmed(d):
        both = d["ok"]
        lr = np.log(np.maximum(d["db"][both] / d["df"][both], 1e-12))
        lo, hi = np.quantile(lr, [0.25, 0.75])
        m = (lr >= lo) & (lr <= hi)
        return float(np.exp(lr[m].mean()))

    def depth_near(frac):
        def fn(d):
            both = d["ok"]
            thr = np.quantile(d["df"][both], frac)
            g = both & (d["df"] <= thr)
            if g.sum() < 4:
                return base(d)
            return np.median(d["db"][g] / d["df"][g])
        return fn

    evaluate("median (current)", base)
    evaluate("trimmed-mean IQR", trimmed)
    for f in (0.5, 0.3):
        evaluate("flow top-%d%%" % int(f * 100), flow_top(f))
    for px in (1.0, 2.0, 3.0):
        evaluate("flow > %.0fpx both" % px, flow_abs(px))
    for f in (0.5, 0.3):
        evaluate("nearest-%d%% by df" % int(f * 100), depth_near(f))


if __name__ == "__main__":
    main()


def chain_eval(frames=150):
    """End-to-end chain drift per variant (with the chain Hampel gate)."""
    import jax.numpy as jnp

    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera, epipolar as epi, se3
    from epivo_tpu.pipeline import scale as scale_mod
    from epivo_tpu.pipeline.config import ScaleConfig

    cache = "/tmp/diag_chain_pd_%d.npz" % frames
    pd = np.load(cache, allow_pickle=True)["pd"].item()
    H, W = 376, 1241
    cam = camera.KITTI_00
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    _, gt, _ = photoreal.corridor_sequence(
        frames, H=H, W=W, K=K, speed=0.8, exposure_drift=0.15,
        noise_sigma=2.0, seed=7)
    gt_step = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1)
    sc = ScaleConfig()

    raw = {}
    for b in range(1, frames - 2):
        back, fwd, prev = pd.get((b, b - 1)), pd.get((b, b + 1)), pd.get((b - 1, b))
        if back is None or fwd is None or prev is None:
            continue
        Tb = np.asarray(se3.inverse(jnp.asarray(prev["T"])))
        db, vb = map(np.asarray, epi.epipolar_depth(
            jnp.asarray(Tb[:3, :3]), jnp.asarray(Tb[:3, 3]),
            jnp.asarray(back["p_full"]), jnp.asarray(back["p_t_full"])))
        df, vf = map(np.asarray, epi.epipolar_depth(
            jnp.asarray(fwd["T"][:3, :3]), jnp.asarray(fwd["T"][:3, 3]),
            jnp.asarray(fwd["p_full"]), jnp.asarray(fwd["p_t_full"])))
        ok = (vb & vf & back["mask_full"] & fwd["mask_full"]
              & (db > sc.depth_min) & (db < sc.depth_max)
              & (df > sc.depth_min) & (df < sc.depth_max))
        fb = np.linalg.norm((back["p_t_full"] - back["p_full"])[:, :2], axis=-1)
        ff = np.linalg.norm((fwd["p_t_full"] - fwd["p_full"])[:, :2], axis=-1)
        raw[b] = (db, df, ok, np.minimum(fb, ff))

    def run(name, frac):
        ratios = np.ones(frames - 2)
        for b, (db, df, ok, mf) in raw.items():
            g = ok
            if frac is not None and ok.sum() >= 8:
                thr = np.quantile(mf[ok], 1 - frac)
                g2 = ok & (mf >= thr)
                if g2.sum() >= 4:
                    g = g2
            if g.sum() >= sc.min_common:
                ratios[b - 1] = np.median(db[g] / df[g])
        ratios_f, nrep = scale_mod.hampel_log(ratios, 7, 1.5)
        dr = np.log(ratios_f) - np.log(gt_step[1:frames - 1] / gt_step[:frames - 2])
        cum = np.cumsum(dr)
        print("%-20s replaced=%2d end=%+.3f max|cum|=%.3f rms(cum)=%.3f"
              % (name, int(nrep.sum()), cum[-1], np.abs(cum).max(),
                 np.sqrt((cum ** 2).mean())))

    run("median (current)", None)
    for f in (0.5, 0.4, 0.3, 0.2):
        run("flow top-%d%%" % int(f * 100), f)


if __name__ == "__main__" and os.environ.get("CHAIN_EVAL"):
    chain_eval(int(os.environ.get("FRAMES", "150")))
