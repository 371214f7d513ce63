"""Micro-profile of suspected hot ops in the fused VO step (real chip)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_SCAN = 30


def scan_ms(fn, *args, n=N_SCAN):
    def many(k, *a):
        def body(carry, kk):
            bumped = [
                x + carry * 1e-6 if jnp.issubdtype(x.dtype, jnp.floating)
                else x
                for x in a
            ]
            out = fn(kk, *bumped)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                    for l in jax.tree.leaves(out))
            return s * 1e-9, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(k, n))
        return s

    f = jax.jit(many)
    key = jax.random.PRNGKey(0)
    np.asarray(f(key, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(key, *args))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def main():
    from epivo_tpu import ransac as rm
    from epivo_tpu.frontend import fast
    from epivo_tpu.frontend.pallas_fast import fast_score_map_pallas
    from epivo_tpu.geometry import essential

    H, W = 376, 1241
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))

    print("--- FAST pieces ---", flush=True)
    print(f"score_map_pallas      {scan_ms(lambda k, im: fast_score_map_pallas(im, 40.0), img):8.3f} ms", flush=True)
    print(f"nms3                  {scan_ms(lambda k, im: fast.nms3(im), img):8.3f} ms", flush=True)
    print(f"top_k(512) full image {scan_ms(lambda k, im: fast.top_k_keypoints(im, 512).xy, img):8.3f} ms", flush=True)
    print(f"detect (all)          {scan_ms(lambda k, im: fast.detect(im, 40.0, 512).xy, img):8.3f} ms", flush=True)

    print("--- essential pieces (512 hyp) ---", flush=True)
    E = jnp.asarray(rng.normal(size=(512, 3, 3)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    pt = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    p8 = jnp.asarray(rng.normal(size=(512, 8, 3)).astype(np.float32))
    pt8 = jnp.asarray(rng.normal(size=(512, 8, 3)).astype(np.float32))
    print(f"project_essential x512 {scan_ms(lambda k, e: essential.project_essential(e), E):8.3f} ms", flush=True)
    print(f"svd3 x512              {scan_ms(lambda k, e: jnp.linalg.svd(e)[1], E):8.3f} ms", flush=True)
    print(f"eight_point minimal    {scan_ms(lambda k, a, b: essential.eight_point(a, b, project=False), p8, pt8):8.3f} ms", flush=True)
    print(f"sampson 512x512        {scan_ms(lambda k, e: essential.sampson_error(e, p[None], pt[None]), E):8.3f} ms", flush=True)
    print(f"ransac full (512 hyp)  {scan_ms(lambda k, a, b: rm.ransac_essential(k, a, b, n_hyp=512, threshold=1e-4).E, p, pt):8.3f} ms", flush=True)
    print(f"refine_essential (8it) {scan_ms(lambda k, e, a, b: essential.refine_essential(e[0], a, b), E, p, pt):8.3f} ms", flush=True)
    print(f"recover_pose           {scan_ms(lambda k, e, a, b: essential.recover_pose(e[0], a, b)[0], E, p, pt):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
