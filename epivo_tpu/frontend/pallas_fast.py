"""FAST-9/16 corner response as a Pallas TPU kernel.

The XLA formulation (``fast.fast_score_map``) materializes 16 rolled copies
of the image plus 16 arc-min/max intermediates — ~34 full-image HBM round
trips. This kernel keeps the image resident in VMEM (KITTI/EuRoC frames are
~2 MB, well under the ~16 MB budget), tiles the score computation over a
grid, and evaluates all 16 ring offsets and 16 arcs from statically shifted
in-VMEM views — one HBM read + one write per pixel.

Semantics are identical to ``fast.fast_score_map`` (exact FAST score =
largest threshold at which the segment test still passes); the dense score
map feeds the same NMS + top-k budget selection. ``fast.detect`` picks this
kernel automatically on TPU backends (override with use_pallas=...).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from epivo_tpu.frontend.fast import ARC, CIRCLE
from epivo_tpu.frontend.pallas_backend import resolve_interpret

_HALO = 3
_TILE_H = 64
_TILE_W = 256


def _fast_tile_kernel(threshold: float, H: int, W: int, nms: bool,
                      img_ref, out_ref):
    """Scores (optionally 3x3-NMS'd in-kernel) for one tile.

    img_ref: [Hp, Wp] full padded image in VMEM (halo _HALO + nms).
    out_ref: [TILE_H, TILE_W] block of the (NMS'd) score map.

    With ``nms`` the tile's scores are computed with a 1-pixel apron and
    suppressed against their 8 neighbours inside the kernel — the dense
    score map never round-trips HBM un-suppressed.
    """
    th, tw = _TILE_H, _TILE_W
    ap = 1 if nms else 0  # apron for in-kernel NMS
    eh, ew = th + 2 * ap, tw + 2 * ap
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = i * th  # top-left of the halo-extended tile in padded coords
    x0 = j * tw

    blk = img_ref[pl.ds(y0, eh + 2 * _HALO), pl.ds(x0, ew + 2 * _HALO)]
    c = blk[_HALO : _HALO + eh, _HALO : _HALO + ew]

    # Ring values from statically shifted views — no rolls, no copies.
    ring = [
        blk[_HALO + dy : _HALO + dy + eh, _HALO + dx : _HALO + dx + ew] - c
        for (dy, dx) in CIRCLE
    ]

    big = jnp.float32(3.4e38)
    bright = jnp.full((eh, ew), -big)
    dark = jnp.full((eh, ew), -big)
    for k in range(16):
        bmin = ring[k]
        dmax = ring[k]
        for a in range(1, ARC):
            v = ring[(k + a) % 16]
            bmin = jnp.minimum(bmin, v)
            dmax = jnp.maximum(dmax, v)
        bright = jnp.maximum(bright, bmin)
        dark = jnp.maximum(dark, -dmax)

    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)

    # Zero out-of-image lanes and the 3-pixel border (ring would wrap).
    # Coordinates of the extended block start at (y0 - ap, x0 - ap) in
    # image space (padded coords are offset by _HALO + ap).
    ys = y0 - ap + jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0)
    xs = x0 - ap + jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1)
    interior = (
        (ys >= _HALO) & (ys < H - _HALO) & (xs >= _HALO) & (xs < W - _HALO)
    )
    score = jnp.where(interior, score, 0.0)

    if nms:
        center = score[1 : 1 + th, 1 : 1 + tw]
        neigh = jnp.full((th, tw), -big)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh = jnp.maximum(
                    neigh, score[1 + dy : 1 + dy + th, 1 + dx : 1 + dx + tw]
                )
        out_ref[:, :] = jnp.where(center >= neigh, center, 0.0)
    else:
        out_ref[:, :] = score


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fast_score_map_pallas(img: jnp.ndarray, threshold: float,
                          interpret: bool | None = None,
                          nms: bool = False) -> jnp.ndarray:
    """Dense FAST-9/16 score map via the tiled Pallas kernel. img [H, W].

    With ``nms`` the 3x3 non-maximum suppression happens inside the kernel
    (identical output to ``fast.nms3(fast_score_map(...))``, one fewer
    dense HBM round trip). ``interpret=None`` auto-selects interpret mode
    on backends that cannot compile Mosaic (CPU)."""
    interpret = resolve_interpret(interpret)
    H, W = img.shape
    ap = 1 if nms else 0
    halo = _HALO + ap
    gh = pl.cdiv(H, _TILE_H)
    gw = pl.cdiv(W, _TILE_W)
    Hp = gh * _TILE_H + 2 * halo
    Wp = gw * _TILE_W + 2 * halo
    img_p = jnp.pad(
        img.astype(jnp.float32),
        ((halo, Hp - H - halo), (halo, Wp - W - halo)),
        mode="edge",
    )

    out = pl.pallas_call(
        functools.partial(_fast_tile_kernel, float(threshold), H, W, nms),
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # full padded image
        out_specs=pl.BlockSpec(
            (_TILE_H, _TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((gh * _TILE_H, gw * _TILE_W), jnp.float32),
        interpret=interpret,
    )(img_p)
    return out[:H, :W].astype(img.dtype)
