"""Scratch analysis: per-boundary measurement error structure for the
scale graph (development aid for round-5 scale-graph work)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from scripts.diag_scalegraph import cache_path, get_scene
    from epivo_tpu.pipeline import scale as scale_mod
    from epivo_tpu.pipeline.config import ScaleConfig

    pd = np.load(cache_path(args.frames, args.seed),
                 allow_pickle=True)["pd"].item()
    _, gt, _ = get_scene(args.frames)
    F = args.frames
    gt_step = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1)
    r_gt = np.log(gt_step[1:] / gt_step[:-1])
    sc = ScaleConfig()

    meas = scale_mod.scale_graph_measurements(pd, F - 1, sc)
    by_b = {}
    for m in meas:
        by_b.setdefault(m.b, []).append(m)

    print("gt_step: first=%.3f last=%.3f min=%.4f" %
          (gt_step[0], gt_step[-1], gt_step.min()))
    # Error per boundary per kind; flag rows where ALL kinds are bad.
    print("%5s %9s %9s %9s  %s" % ("b", "bnd", "fwd", "bck", "gt_step[b]"))
    bad_common = 0
    for b in range(1, F - 1):
        errs = {}
        for m in by_b.get(b, []):
            errs[m.kind] = m.value - r_gt[b - 1]
        vals = [errs.get(k, np.nan)
                for k in ("boundary", "fwd_skip", "back_skip")]
        absv = [abs(v) for v in vals if np.isfinite(v)]
        if absv and min(absv) > 0.15:
            bad_common += 1
            print("%5d %9.3f %9.3f %9.3f  %.4f  ALLBAD" %
                  (b, vals[0], vals[1], vals[2], gt_step[b]))
    print("boundaries where ALL kinds err > 0.15: %d" % bad_common)

    # Error vs index percentile: early vs late thirds.
    for kind in ("boundary", "fwd_skip", "back_skip"):
        es, ls = [], []
        for m in meas:
            if m.kind != kind or not (1 <= m.b <= len(r_gt)):
                continue
            e = abs(m.value - r_gt[m.b - 1])
            (es if m.b < 2 * F // 3 else ls).append(e)
        print("%s: early med=%.4f p90=%.3f n=%d | late med=%.4f p90=%.3f n=%d"
              % (kind, np.median(es), np.quantile(es, 0.9), len(es),
                 np.median(ls), np.quantile(ls, 0.9), len(ls)))


if __name__ == "__main__":
    main()
