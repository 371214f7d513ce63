"""Offline development harness for the no-GT scale GRAPH solve.

The sequential chain (`runners._chained_scales`) makes every boundary
error permanent: c[b] = c[b-1] * ratio_b, so one bad two-view pose
rescales the entire tail (measured: 88x length blow-up on seed 1 of the
300-frame corridor, ATE_photoreal.json ba_no_gt_seed1; VERDICT r4
weak #1 / next #1). This script extracts an EXTENDED pair set — skip
pairs (a, a+2) at every a (not just even anchors) and backward-skip
pairs (b, b-2) — caches it, and evaluates boundary-ratio estimators that
fuse several INDEPENDENT measurements per boundary, plus a joint
Huber-IRLS solve over the whole measurement graph.

Modes:
  --extract          run pair extraction on the current platform (chip)
                     and cache to /tmp/sg_pd_f{F}_s{seed}.npz
  (default)          load cache, compute measurements, evaluate solvers

Usage:
  python scripts/diag_scalegraph.py --extract --frames 300 --seed 0
  python scripts/diag_scalegraph.py --frames 300 --seed 0
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cache_path(frames: int, seed: int) -> str:
    return "/tmp/sg_pd_f%d_s%d.npz" % (frames, seed)


def graph_pairs(F: int) -> list:
    """The extended no-GT pair set: consecutive, skip at EVERY a,
    backward, and backward-skip."""
    need = set()
    need |= {(i, i + 1) for i in range(F - 1)}
    need |= {(a, a + 2) for a in range(F - 2)}
    need |= {(b, b - 1) for b in range(1, F)}
    need |= {(b, b - 2) for b in range(2, F)}
    return sorted(need)


def build_cfg():
    from epivo_tpu.geometry import camera
    from epivo_tpu.pipeline.config import (
        BAConfig, FrontendConfig, LMConfig, RansacConfig,
    )

    cam = camera.KITTI_00
    return BAConfig(
        camera=cam,
        frontend=FrontendConfig(fast_threshold=30.0, max_keypoints=512,
                                klt_levels=4),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=32, revert_r_norm=1e-2),
    )


def get_scene(frames: int):
    from epivo_tpu.datasets import photoreal
    from epivo_tpu.geometry import camera

    H, W = 376, 1241
    cam = camera.KITTI_00
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    return photoreal.corridor_sequence(
        frames, H=H, W=W, K=K, speed=0.8, exposure_drift=0.15,
        noise_sigma=2.0, seed=7)


def do_extract(frames: int, seed: int):
    from epivo_tpu.pipeline import runners, stream
    from epivo_tpu.pipeline.config import VOConfig

    cfg = build_cfg()
    vo_cfg = VOConfig(camera=cfg.camera, frontend=cfg.frontend,
                      ransac=cfg.ransac, lm=cfg.lm)
    frames_it, gt, _ = get_scene(frames)
    fs = stream.FrameStream(frames_it, n_frames=frames)
    t0 = time.time()
    pd = runners._extract_pairs(fs, graph_pairs(frames), vo_cfg, seed,
                                n_points=cfg.lm.n_points, batch=32,
                                pipeline_depth=2)
    print("extracted %d pairs in %.1f s" % (len(pd), time.time() - t0))
    np.savez(cache_path(frames, seed), pd=np.array(pd, dtype=object))


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--extract", action="store_true")
    args = ap.parse_args()

    if args.extract:
        do_extract(args.frames, args.seed)
        return

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from epivo_tpu.pipeline import scale as scale_mod
    from epivo_tpu.pipeline.config import ScaleConfig

    pd = np.load(cache_path(args.frames, args.seed),
                 allow_pickle=True)["pd"].item()
    _, gt, _ = get_scene(args.frames)
    F = args.frames
    gt_step = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1)
    sc = ScaleConfig()

    meas = scale_mod.scale_graph_measurements(pd, F - 1, sc)
    by_b = {}
    for m in meas:
        by_b.setdefault(m.b, []).append(m)
    avail = np.array([len(by_b.get(b, [])) for b in range(1, F - 1)])
    print("measurements: %d total, per-boundary avail mean=%.2f min=%d"
          % (len(meas), avail.mean(), avail.min()))

    r_gt = np.log(gt_step[1:F - 1] / gt_step[:F - 2])

    def report(name, c):
        c = np.asarray(c, np.float64)
        r_est = np.diff(np.log(np.maximum(c, 1e-12)))
        dr = r_est[: len(r_gt)] - r_gt
        cum = np.cumsum(dr)
        w = gt_step[: len(cum)] / gt_step[: len(cum)].sum()
        print("%-28s end=%+.3f max|cum|=%.3f rms=%.3f len_ratio=%.3f "
              "worst_dr=%.3f" % (name, cum[-1], np.abs(cum).max(),
                                 np.sqrt((cum ** 2).mean()),
                                 float((w * np.exp(cum)).sum()),
                                 np.abs(dr).max()))
        return cum

    # Baseline: the r4 sequential chain.
    from epivo_tpu.pipeline import runners
    c_chain = runners._chained_scales(pd, F - 1, sc)
    report("chain (r4)", c_chain)

    # Graph solve.
    c_graph = scale_mod.scale_graph_solve(meas, F - 1, sc)
    report("graph", c_graph)

    # Per-boundary measurement errors by kind (to see which kinds carry).
    for kind in sorted({m.kind for m in meas}):
        errs = [m.value - r_gt[m.b - 1] for m in meas
                if m.kind == kind and 1 <= m.b <= len(r_gt)]
        errs = np.array(errs)
        print("  kind=%-10s n=%4d  med|err|=%.4f  p90|err|=%.4f  "
              "max|err|=%.3f" % (kind, len(errs),
                                 np.median(np.abs(errs)),
                                 np.quantile(np.abs(errs), 0.9),
                                 np.abs(errs).max()))


if __name__ == "__main__":
    main()
