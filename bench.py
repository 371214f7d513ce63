"""Benchmark: two-view VO frames/s per chip (kitti_E-equivalent workload).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the full jitted device step (FAST -> KLT -> RANSAC-512 ->
recoverPose -> 48-pt LM refine -> triangulation) on KITTI-sized
(376 x 1241) synthetic frames — the same per-frame work as the reference's
kitti_E driver (`kitti_E.cpp:54-255`, SURVEY.md §6 workload table).

Baseline: the reference publishes no numbers (BASELINE.md), so the
comparison point is the same pipeline executed on ONE host CPU core
(single-threaded XLA-CPU) — the reference's own execution model (1 CPU
core, `kitti_E` row in BASELINE.md). Measured once and cached in
``bench_baseline.json``; delete that file to re-measure. The north-star
target is vs_baseline >= 5 (BASELINE.json).

Usage:
  python bench.py                 # full: TPU measure + cached CPU baseline
  python bench.py --cpu-baseline  # internal: emits CPU single-core fps
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")
N_WARMUP = 1
N_ITERS = 10
N_ITERS_CPU = 3
N_REPS = 3


def build_workload():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from epivo_tpu.datasets import synthetic
    from epivo_tpu.geometry import camera, se3
    from epivo_tpu.pipeline import vo
    from epivo_tpu.pipeline.config import (
        FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )

    cfg = VOConfig(
        camera=camera.KITTI_00,
        frontend=FrontendConfig(fast_threshold=40.0, max_keypoints=512,
                                klt_levels=4),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=48),
    )
    H, W = camera.KITTI_00.height, camera.KITTI_00.width

    # Deterministic KITTI-like pair: blob texture moved by a forward motion.
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n_pts = 400
    z = jax.random.uniform(k1, (n_pts,), minval=6.0, maxval=40.0)
    xy = jax.random.uniform(k2, (n_pts, 2), minval=-0.8, maxval=0.8) * z[:, None]
    X = jnp.concatenate([xy, z[:, None]], axis=-1)
    T_gt = se3.se3_exp(jnp.array([0.04, -0.02, 0.8, 0.004, -0.01, 0.003]))

    K = cfg.camera.K()

    def render(T):
        R, t = se3.matrix_to_rt(T)
        Xc = X @ R.T + t
        uv = (Xc / Xc[:, 2:3]) @ K.T
        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        img = jnp.zeros((H, W), jnp.float32)
        # Rasterize additively in chunks to bound memory.
        for i0 in range(0, n_pts, 100):
            u = uv[i0 : i0 + 100, 0][:, None, None]
            v = uv[i0 : i0 + 100, 1][:, None, None]
            img += jnp.sum(
                200.0 * jnp.exp(-((xx[None] - u) ** 2 + (yy[None] - v) ** 2)
                                / (2 * 1.5**2)),
                axis=0,
            )
        return jnp.clip(img, 0, 255)

    img0 = jax.block_until_ready(render(se3.identity()))
    img1 = jax.block_until_ready(render(T_gt))
    step = jax.jit(lambda a, b, k: vo.vo_step(a, b, k, cfg))
    return step, img0, img1, k3


def measure(n_iters):
    """Steady-state frames/s, measured as a fused scan of n_iters steps.

    The scan+fetch structure is deliberate: through the axon relay,
    host-side ``block_until_ready`` is unreliable (async completion /
    identical-call caching) and every dispatch carries ~30 ms of relay
    round-trip. Fusing the frame loop into one program and fetching the
    result bytes measures what the device actually sustains — which is
    also how a production frame loop runs (device-resident stream).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    step, img0, img1, key = build_workload()

    def many(a, b, k):
        def body(carry, kk):
            out = step(a + carry * 1e-6, b, kk)  # data dep: no DCE/caching
            return jnp.sum(out.T), None

        s, _ = jax.lax.scan(body, 0.0, jax.random.split(k, n_iters))
        return s

    f = jax.jit(many)
    np.asarray(f(img0, img1, key))  # compile + warm
    best = float("inf")
    reps = N_REPS if n_iters >= N_ITERS else 1
    for r in range(reps):
        k_r = jax.random.fold_in(key, r)
        t0 = time.perf_counter()
        np.asarray(f(img0, img1, k_r))
        best = min(best, time.perf_counter() - t0)
    return n_iters / best


def cpu_baseline_fps() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cpu_single_core_fps"]
    # Measure in a child process pinned to one core with single-threaded XLA.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_cpu_multi_thread_eigen=false"
    env["EPIVO_FORCE_CPU"] = "1"
    cmd = ["taskset", "-c", "0", sys.executable, os.path.abspath(__file__),
           "--cpu-baseline"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    fps = json.loads(line)["cpu_single_core_fps"]
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"cpu_single_core_fps": fps,
                   "note": "same vo_step pipeline, XLA-CPU, 1 core "
                           "(reference runs 1 CPU core; no published numbers "
                           "to compare against — see BASELINE.md)"}, f)
    return fps


def main():
    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        fps = measure(N_ITERS_CPU)
        print(json.dumps({"cpu_single_core_fps": fps}))
        return

    fps = measure(N_ITERS)
    try:
        base = cpu_baseline_fps()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        base = None
    vs = (fps / base) if base else -1.0
    print(json.dumps({
        "metric": "vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
