"""Pallas kernel correctness vs the XLA reference formulations.

Runs in interpreter mode on the CPU test mesh; the same kernels compile
natively on TPU (bit-identical — verified on hardware, see BENCH notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epivo_tpu.frontend import fast
from epivo_tpu.frontend.pallas_fast import fast_score_map_pallas


@pytest.mark.parametrize("shape", [(64, 96), (200, 300), (127, 255)])
def test_pallas_fast_matches_xla(shape):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    ref = fast.fast_score_map(img, 25.0)
    pal = fast_score_map_pallas(img, 25.0, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))


def test_pallas_fast_flat_image():
    img = jnp.full((100, 160), 77.0)
    pal = fast_score_map_pallas(img, 10.0, True)
    assert float(jnp.max(pal)) == 0.0


def test_detect_backend_selection():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    # On the CPU test platform, default must route to XLA (no interpret
    # slowdown) and explicit use_pallas=False must equal default.
    kp_default = fast.detect(img, 20.0, 64)
    kp_xla = fast.detect(img, 20.0, 64, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(kp_default.xy), np.asarray(kp_xla.xy))
