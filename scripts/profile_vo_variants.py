"""A/B timing of the fused vo_step under config variants (real chip).

Isolates which stage knobs dominate the fused per-frame cost — the honest
way to target optimization work (per-stage programs overstate costs that
XLA fuses away in the real step).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bench import render_bench_frames, _config
from epivo_tpu.pipeline import vo

N_SCAN = 10


def scan_ms(cfg, img0, img1, key):
    def many(a, b, k):
        def body(carry, kk):
            out = vo.vo_step(a + carry * 1e-6, b, kk, cfg)
            return jnp.sum(out.T), None

        s, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_SCAN))
        return s

    f = jax.jit(many)
    np.asarray(f(img0, img1, key))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(img0, img1, key))
        best = min(best, time.perf_counter() - t0)
    return best / N_SCAN * 1e3


def main():
    base = _config()
    img0, img1, _ = render_bench_frames()
    img0, img1 = jnp.asarray(img0), jnp.asarray(img1)
    key = jax.random.PRNGKey(7)

    def variant(name, **changes):
        cfg = base
        for path, val in changes.items():
            part, _, field = path.partition(".")
            sub = dataclasses.replace(getattr(cfg, part), **{field: val})
            cfg = dataclasses.replace(cfg, **{part: sub})
        print(f"{name:34s} {scan_ms(cfg, img0, img1, key):8.3f} ms/frame",
              flush=True)

    variant("baseline (current config)")
    variant("no refine_e", **{"ransac.refine_e": False})
    variant("refine iters 4", **{"ransac.refine_iters": 4})
    variant("ransac 256 hyp", **{"ransac.n_hyp": 256})
    variant("ransac 128 hyp", **{"ransac.n_hyp": 128})
    variant("klt levels 3", **{"frontend.klt_levels": 3})
    variant("klt iters 8", **{"frontend.klt_iters": 8})
    variant("kp budget 256", **{"frontend.max_keypoints": 256})
    variant("lm iters 15", **{"lm.max_iters": 15})
    variant("lm iters 10", **{"lm.max_iters": 10})


if __name__ == "__main__":
    main()
