"""Micro-profile of klt.track internals (scan methodology, see profile_vo).

Times one full-resolution level's sub-stages in isolation: window
extraction, lane transpose, gradients, template sampling, and the Pallas
iteration kernel — plus pyramid build and the whole track() call.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from epivo_tpu.frontend import image as imops, klt
from epivo_tpu.frontend.pallas_klt import lk_iterate_pallas

N_SCAN = 50
WIN, MARGIN, ITERS, LEVELS, K = 21, 12, 30, 4, 512
S = WIN + 2 * MARGIN + 1


def scan_time_ms(fn, *args):
    def many(*a):
        def body(carry, _):
            bumped = [
                x + carry * 1e-6 if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in a
            ]
            out = fn(*bumped)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                    for l in jax.tree.leaves(out))
            return s * 1e-9, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_SCAN)
        return s

    f = jax.jit(many)
    np.asarray(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_SCAN * 1e3


def main():
    H, W = 376, 1241
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    pts = jnp.asarray(
        rng.uniform([30, 30], [W - 30, H - 30], (K, 2)).astype(np.float32))

    wins, o = klt._extract_windows(img0, pts, S)
    wins_T = jnp.transpose(wins, (1, 2, 0))
    gx, gy = klt._grad_batch(wins)
    q0 = jnp.clip(pts - o - (WIN - 1) / 2.0, 0.0, S - WIN - 1 - 1e-3)
    T = klt._sample_lanes(wins_T, q0, WIN)
    Ix = klt._sample_lanes(jnp.transpose(gx, (1, 2, 0)), q0, WIN)
    Iy = klt._sample_lanes(jnp.transpose(gy, (1, 2, 0)), q0, WIN)
    (wins, wins_T, gx, gy, T, Ix, Iy) = jax.block_until_ready(
        (wins, wins_T, gx, gy, T, Ix, Iy))

    only = sys.argv[1:]
    stages = [
        ("pyramid(x2)", lambda a, b: (imops.build_pyramid(a, LEVELS),
                                      imops.build_pyramid(b, LEVELS)),
         (img0, img1)),
        ("extract_wins", lambda im, p: klt._extract_windows(im, p, S),
         (img0, pts)),
        ("to_lanes(T)", lambda w: jnp.transpose(w, (1, 2, 0)), (wins,)),
        ("grad_batch", lambda w: klt._grad_batch(w), (wins,)),
        ("sample_lanes", lambda w, q: klt._sample_lanes(w, q, WIN),
         (wins_T, q0)),
        ("pallas_iter30", lambda w, t, ix, iy, q: lk_iterate_pallas(
            w, t, ix, iy, q, WIN, ITERS, 0.01), (wins_T, T, Ix, Iy, q0)),
        ("FULL track", lambda a, b, p: klt.track(
            a, b, p, win=WIN, levels=LEVELS, iters=ITERS), (img0, img1, pts)),
    ]
    for name, f, args in stages:
        if only and not any(o.lower() in name.lower() for o in only):
            continue
        print(f"{name:16s} {scan_time_ms(f, *args):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
