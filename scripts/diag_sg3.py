"""Scale-graph variant sweep with a scale-only ATE proxy.

Reconstructs the trajectory from GT rotations/directions with ESTIMATED
step norms (the r4 decomposition measured the no-GT error to be ~100%
scale), sim3-aligns, and reports ATE%% — the offline stand-in for the
full-pipeline artifact metric.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def scale_ate(gt, c):
    """Trajectory from GT steps with norms rescaled by c (len F-1);
    returns (sim3 ATE % of length, gauge0 length ratio)."""
    from epivo_tpu.eval import metrics as ev

    F = len(c) + 1
    steps = np.linalg.inv(gt[: F - 1]) @ gt[1:F]
    gt_norm = np.linalg.norm(steps[:, :3, 3], axis=-1)
    est = np.eye(4)[None].repeat(F, 0)
    T = np.eye(4)
    out = [T.copy()]
    for k in range(F - 1):
        s = steps[k].copy()
        s[:3, 3] *= c[k] / max(gt_norm[k], 1e-12) * gt_norm[0] / max(c[0], 1e-12)
        T = T @ s
        out.append(T.copy())
    est = np.stack(out)
    length = gt_norm[: F - 1].sum()
    ate = ev.ate_rmse(est, gt[:F], align=True, with_scale=True)
    est_step = np.linalg.norm(np.diff(est[:, :3, 3], axis=0), axis=-1)
    g0 = gt_norm[0] / max(est_step[0], 1e-12)
    lr = est_step.sum() * g0 / gt_norm.sum()
    return 100.0 * float(ate) / length, float(lr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--seeds", type=str, default="0")
    args = ap.parse_args()

    import dataclasses

    from scripts.diag_scalegraph import cache_path, get_scene
    from epivo_tpu.pipeline import runners, scale as scale_mod
    from epivo_tpu.pipeline.config import ScaleConfig

    _, gt, _ = get_scene(args.frames)
    F = args.frames

    for seed in [int(s) for s in args.seeds.split(",")]:
        pd = np.load(cache_path(args.frames, seed),
                     allow_pickle=True)["pd"].item()
        sc = ScaleConfig()
        meas = scale_mod.scale_graph_measurements(pd, F - 1, sc)

        def run(tag, sc2, kinds=None):
            ms = meas if kinds is None else [m for m in meas
                                            if m.kind in kinds]
            c = scale_mod.scale_graph_solve(ms, F - 1, sc2)
            a, lr = scale_ate(gt, np.asarray(c, np.float64))
            print("  s%d %-36s ate_sim3=%6.2f%%  len_ratio=%.3f"
                  % (seed, tag, a, lr))

        c_chain = runners._chained_scales(pd, F - 1, sc)
        a, lr = scale_ate(gt, np.asarray(c_chain, np.float64))
        print("  s%d %-36s ate_sim3=%6.2f%%  len_ratio=%.3f"
              % (seed, "chain(r4)", a, lr))

        run("graph default", sc)
        run("boundary only", sc, kinds={"boundary"})
        run("boundary+prior0.15", dataclasses.replace(
            sc, graph_prior_sigma=0.15), kinds={"boundary"})
        for ps in (0.1, 0.15, 0.2, 0.5):
            run("all prior%.2f" % ps,
                dataclasses.replace(sc, graph_prior_sigma=ps))
        run("all prior0.15 nohampel", dataclasses.replace(
            sc, graph_prior_sigma=0.15, chain_hampel_ratio=0.0))
        run("all huber1.0", dataclasses.replace(sc, graph_huber=1.0))


if __name__ == "__main__":
    main()
