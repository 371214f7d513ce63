"""Benchmark: two-view VO frames/s per chip (kitti_E-equivalent workload).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the full jitted device step (FAST -> KLT -> RANSAC-512 ->
refine-E -> recoverPose -> 48-pt LM refine -> triangulation) on KITTI-sized
(376 x 1241) synthetic frames — the same per-frame work as the reference's
kitti_E driver (`kitti_E.cpp:54-255`, SURVEY.md §6 workload table).

Two device numbers are reported:
  - value (headline): BATCHED throughput — B frame pairs per dispatch
    (vmap), the production frame-stream shape; this is what the chip
    sustains.
  - latency_fps: sequentially-dependent single-pair rate (a scan with a
    data dependency), the per-frame latency view.

Baseline (``vs_baseline``): a faithful re-execution of the reference's
kitti_E pipeline in the reference's OWN execution model — OpenCV C++
kernels + native C++ LM on ONE pinned CPU core
(``baselines/cv2_kitti_e.py``; the reference publishes no numbers,
BASELINE.md, so the baseline is measured here and cached in
``bench_baseline.json`` keyed by a workload fingerprint — changing the
workload invalidates the cache). North-star target: vs_baseline >= 5
(BASELINE.json).

A per-stage device breakdown (ms/frame) is written to
``bench_stages.json`` and included in the JSON line.

Usage:
  python bench.py            # TPU measure + cached cv2 baseline
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")
# Long scans amortize the host<->device relay's fixed ~25-30 ms program
# round-trip (measured r2) so the numbers reflect what the DEVICE
# sustains, as in a production frame stream, not the relay tax.
N_ITERS = 64          # frames per timed program (latency mode)
N_BATCH = 8           # pairs per dispatch (batched mode)
N_BATCH_ITERS = 16    # scan length in batched mode
N_REPS = 3

# Workload fingerprint: any change invalidates the cached baseline
# (VERDICT r1 weak #9 — a stale cache must not pin an old baseline).
WORKLOAD = {
    "image": [376, 1241], "n_scene_pts": 400, "kp_budget": 512,
    "ransac_hyp": 512, "lm_points": 48, "baseline": "cv2+native-lm-1core",
    "version": 2,
}


def _config():
    from epivo_tpu.geometry import camera
    from epivo_tpu.pipeline.config import (
        FrontendConfig, LMConfig, RansacConfig, VOConfig,
    )

    return VOConfig(
        camera=camera.KITTI_00,
        frontend=FrontendConfig(fast_threshold=40.0, max_keypoints=512,
                                klt_levels=4),
        ransac=RansacConfig(n_hyp=512),
        lm=LMConfig(n_points=48),
    )


def render_bench_frames():
    """Deterministic KITTI-sized frame pair (blob texture under forward
    motion). Shared with the cv2 baseline so both execution models see the
    SAME pixels. Returns (img0, img1, K) as host numpy arrays."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from epivo_tpu.geometry import camera, se3

    cfg = _config()
    H, W = camera.KITTI_00.height, camera.KITTI_00.width
    key = jax.random.PRNGKey(0)
    k1, k2, _ = jax.random.split(key, 3)
    n_pts = WORKLOAD["n_scene_pts"]
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
        for i0 in range(0, n_pts, 100):  # chunked additive rasterization
            u = uv[i0 : i0 + 100, 0][:, None, None]
            v = uv[i0 : i0 + 100, 1][:, None, None]
            img += jnp.sum(
                200.0 * jnp.exp(-((xx[None] - u) ** 2 + (yy[None] - v) ** 2)
                                / (2 * 1.5**2)),
                axis=0,
            )
        return jnp.clip(img, 0, 255)

    img0 = np.asarray(jax.block_until_ready(render(se3.identity())))
    img1 = np.asarray(jax.block_until_ready(render(T_gt)))
    return img0, img1, np.asarray(K)


def _timed(fn, *args):
    """Best-of-N wall time of a jitted program, fetching the result bytes.

    Through the axon relay, host ``block_until_ready`` is unreliable and
    each dispatch carries ~30 ms round-trip; fusing loops into one program
    and fetching the output measures what the device sustains.
    """
    import numpy as np

    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_latency(step, img0, img1, key):
    """Sequentially-dependent single-pair scan: per-frame latency."""
    import jax
    import jax.numpy as jnp

    def many(a, b, k):
        def body(carry, kk):
            out = step(a + carry * 1e-6, b, kk)  # data dep: no DCE/caching
            return jnp.sum(out.T), None

        s, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_ITERS))
        return s

    t = _timed(jax.jit(many), img0, img1, key)
    return N_ITERS / t


def measure_batched(step, img0, img1, key):
    """B pairs per dispatch (vmap), scanned with a data dependency:
    sustained throughput. Each lane gets a distinct brightness epsilon so
    no two lanes are identical programs/data."""
    import jax
    import jax.numpy as jnp

    eps = jnp.arange(N_BATCH, dtype=jnp.float32)[:, None, None] * 1e-5

    def many(a, b, k):
        a_b = a[None] + eps  # [B, H, W]
        b_b = jnp.broadcast_to(b, a_b.shape)

        def body(carry, kk):
            out = jax.vmap(step)(a_b + carry * 1e-6, b_b,
                                 jax.random.split(kk, N_BATCH))
            return jnp.sum(out.T), None

        s, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_BATCH_ITERS))
        return s

    t = _timed(jax.jit(many), img0, img1, key)
    return N_BATCH * N_BATCH_ITERS / t


def measure_stages(config, img0, img1, key):
    """Per-stage device ms/frame: each stage scanned N_ITERS times with a
    data dependency, timed as its own program. Sums can exceed the fused
    step's time (XLA fuses across stage boundaries in the real program)."""
    import jax
    import jax.numpy as jnp

    from epivo_tpu import ransac as ransac_mod
    from epivo_tpu.frontend import fast, klt
    from epivo_tpu.geometry import camera as cam, epipolar, essential, se3
    from epivo_tpu.optim import lm

    fc, rc, lc = config.frontend, config.ransac, config.lm
    K_inv = config.camera.K_inv(jnp.float32)

    kp = fast.detect(jnp.asarray(img0), fc.fast_threshold, fc.max_keypoints)
    flow = klt.track(jnp.asarray(img0), jnp.asarray(img1), kp.xy,
                     valid=kp.valid, win=fc.klt_window, levels=fc.klt_levels,
                     iters=fc.klt_iters, min_eig=fc.klt_min_eig)
    p0 = cam.normalize(kp.xy, K_inv)
    p1 = cam.normalize(flow.xy, K_inv)
    thr = (rc.threshold_px / config.camera.fx) ** 2
    rres = ransac_mod.ransac_essential(key, p0, p1, n_hyp=rc.hypotheses(),
                                       threshold=thr, mask=flow.status)
    T_e = se3.rt_to_matrix(
        *essential.pose_fallback(*essential.recover_pose(
            rres.E, p0, p1, mask=rres.inliers)[:2]))

    def scan_stage(fn, seed_val):
        def many(x, k):
            def body(carry, kk):
                return fn(x, carry, kk), None

            s, _ = jax.lax.scan(body, seed_val, jax.random.split(k, N_ITERS))
            return s

        return _timed(jax.jit(many), jnp.float32(0.0), key) / N_ITERS * 1e3

    img0j, img1j = jnp.asarray(img0), jnp.asarray(img1)
    stages = {}
    stages["fast_detect"] = scan_stage(
        lambda _, c, k: jnp.sum(
            fast.detect(img0j + c * 1e-6, fc.fast_threshold,
                        fc.max_keypoints).score), 0.0)
    stages["klt_track"] = scan_stage(
        lambda _, c, k: jnp.sum(
            klt.track(img0j + c * 1e-6, img1j, kp.xy, valid=kp.valid,
                      win=fc.klt_window, levels=fc.klt_levels,
                      iters=fc.klt_iters, min_eig=fc.klt_min_eig).xy), 0.0)
    stages["ransac_recover"] = scan_stage(
        lambda _, c, k: jnp.sum(essential.recover_pose(
            essential.refine_essential(
                ransac_mod.ransac_essential(
                    k, p0 + c * 1e-9, p1, n_hyp=rc.hypotheses(),
                    threshold=thr, mask=flow.status).E,
                p0, p1, mask=rres.inliers),
            p0, p1, mask=rres.inliers)[0]), 0.0)
    stages["lm_refine"] = scan_stage(
        lambda _, c, k: jnp.sum(lm.solve(
            T_e[None], jnp.zeros((1, 2), jnp.int32),
            p0[None, : lc.n_points] + c * 1e-9, p1[None, : lc.n_points],
            lambda0=lc.lambda0, epsilon=lc.epsilon, max_iters=lc.max_iters,
            huber_delta=lc.huber_delta).T0s), 0.0)
    stages["triangulate"] = scan_stage(
        lambda _, c, k: jnp.sum(epipolar.triangulate(
            T_e[:3, :3], T_e[:3, 3], p0 + c * 1e-9, p1)[0]), 0.0)
    return {k: round(v, 3) for k, v in stages.items()}


def cv2_baseline_fps() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("workload") == WORKLOAD:
            return cached["cv2_fps"]
    script = os.path.join(REPO, "baselines", "cv2_kitti_e.py")
    cmd = ["taskset", "-c", "0", sys.executable, script]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # frame rendering inside the child
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"baseline failed: {out.stderr[-500:]}")
    fps = json.loads(lines[-1])["cv2_fps"]
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"cv2_fps": fps, "workload": WORKLOAD,
                   "note": "reference execution model: OpenCV C++ frontend "
                           "+ native C++ LM, 1 pinned core "
                           "(baselines/cv2_kitti_e.py)"}, f, indent=1)
    return fps


def main():
    import jax

    config = _config()
    img0, img1, _ = render_bench_frames()

    from epivo_tpu.pipeline import vo

    step = jax.jit(lambda a, b, k: vo.vo_step(a, b, k, config))
    key = jax.random.PRNGKey(7)

    batched_fps = measure_batched(step, img0, img1, key)
    latency_fps = measure_latency(step, img0, img1, key)
    stages = measure_stages(config, img0, img1, key)
    with open(os.path.join(REPO, "bench_stages.json"), "w") as f:
        json.dump({"stages_ms_per_frame": stages,
                   "batched_fps": round(batched_fps, 3),
                   "latency_fps": round(latency_fps, 3),
                   "batch": N_BATCH, "workload": WORKLOAD}, f, indent=1)

    try:
        base = cv2_baseline_fps()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        base = None
    vs = (batched_fps / base) if base else -1.0
    print(json.dumps({
        "metric": "vo_frames_per_s_per_chip",
        "value": round(batched_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
        "latency_fps": round(latency_fps, 3),
        "baseline_fps": round(base, 3) if base else None,
        "stages_ms": stages,
    }))


if __name__ == "__main__":
    main()
