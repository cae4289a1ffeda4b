"""Fused FAST + NMS as a Pallas TPU image-tile kernel.

The jnp reference (ops/fast.py) materializes 16 shifted full-image
copies per threshold plus separate NMS passes — correct but
HBM-bandwidth heavy. This kernel computes both threshold score maps
(iniThFAST / minThFAST) AND their 3x3 non-maximum suppression in one
pass over (TILE, TILE) VMEM blocks with an 8-px halo; all 32 circle
comparisons happen on VMEM-resident data. Semantics match
ops.fast.fast_score_dual exactly away from the (zeroed) border —
golden-tested in tests/test_pallas_kernels.py.

Pallas blocks cannot overlap (block start = index * block_shape), so
the padded image is first re-tiled into an explicit overlapping-window
array — one extra HBM copy instead of 32 full-image materializations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS, ARC_LENGTH

HALO = 4   # circle radius 3 + 1 for the NMS ring


def _score_block(blk: jax.Array, threshold: float, h: int, w: int,
                 off: int) -> jax.Array:
    """FAST-9/16 score for the (h, w) region starting at `off` in blk.

    Packed-bitmask formulation: the 16 circle comparisons accumulate into
    one int32 mask per polarity and the contiguous-arc test is 8 shifted
    ANDs on the packed mask — a handful of live VMEM arrays instead of
    ~100, which is what keeps the kernel inside the scoped-VMEM budget.
    """
    I = blk[off:off + h, off:off + w]
    t = jnp.float32(threshold)
    hi_thr = I + t
    lo_thr = I - t
    bright_bits = jnp.zeros(I.shape, jnp.int32)
    dark_bits = jnp.zeros(I.shape, jnp.int32)
    margin_b = jnp.zeros_like(I)
    margin_d = jnp.zeros_like(I)
    for k, (dy, dx) in enumerate(CIRCLE_OFFSETS):
        c = blk[off + dy: off + dy + h, off + dx: off + dx + w]
        b = c > hi_thr
        d = c < lo_thr
        bit = jnp.int32(1 << k)
        bright_bits = bright_bits | jnp.where(b, bit, 0)
        dark_bits = dark_bits | jnp.where(d, bit, 0)
        margin_b = margin_b + jnp.where(b, c - hi_thr, 0.0)
        margin_d = margin_d + jnp.where(d, lo_thr - c, 0.0)

    def has_arc(bits):
        ext = bits | (bits << 16)          # circular extension in 32 bits
        run = ext
        for j in range(1, ARC_LENGTH):
            run = run & (ext >> j)
        return (run & jnp.int32(0xFFFF)) != 0

    zero = jnp.zeros_like(I)
    return jnp.maximum(
        jnp.where(has_arc(bright_bits), margin_b, zero),
        jnp.where(has_arc(dark_bits), margin_d, zero),
    )


def _nms_block(score_pad: jax.Array, h: int, w: int) -> jax.Array:
    """3x3 NMS on the interior of an (h+2, w+2) score block."""
    m = None
    for dy in range(3):
        for dx in range(3):
            s = score_pad[dy: dy + h, dx: dx + w]
            m = s if m is None else jnp.maximum(m, s)
    center = score_pad[1: 1 + h, 1: 1 + w]
    return jnp.where(center >= m, center, 0.0)


def _kernel(win_ref, hi_ref, lo_ref, *, th_hi, th_lo, tile_h, tile_w):
    blk = win_ref[0, 0]
    h1, w1 = tile_h + 2, tile_w + 2
    # score on tile + 1px NMS ring (the halo covers circle + ring)
    s_hi = _score_block(blk, th_hi, h1, w1, HALO - 1)
    s_lo = _score_block(blk, th_lo, h1, w1, HALO - 1)
    hi_ref[...] = _nms_block(s_hi, tile_h, tile_w)
    lo_ref[...] = _nms_block(s_lo, tile_h, tile_w)


def _overlapping_windows(img_p: jax.Array, tile_h: int, tile_w: int,
                         halo: int):
    """(Hp+2B, Wp+2B) -> (gy, gx, th+2B, tw+2B) overlapping tiles."""
    Hp = img_p.shape[0] - 2 * halo
    Wp = img_p.shape[1] - 2 * halo
    gy, gx = Hp // tile_h, Wp // tile_w
    sh, sw = tile_h + 2 * halo, tile_w + 2 * halo
    rows = []
    for i in range(gy):
        cols = []
        for j in range(gx):
            cols.append(
                jax.lax.dynamic_slice(
                    img_p, (i * tile_h, j * tile_w), (sh, sw))
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


@functools.partial(
    jax.jit,
    static_argnames=("th_hi", "th_lo", "tile_h", "tile_w", "interpret"),
)
def fast_score_dual_pallas(
    img: jax.Array, th_hi: float = 20.0, th_lo: float = 7.0,
    tile_h: int = 8, tile_w: int = 0, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused dual-threshold FAST + NMS; drop-in for fast_score_dual.

    Tiles are full-width row bands (tile_w=0 -> whole row): the last
    block dim then equals the array dim (lane constraint satisfied for
    any width) and the overlapping-window copy duplicates only
     2*HALO rows per band. 64-row bands keep the kernel's live
    intermediates well inside the 16 MB VMEM budget.
    """
    H, W = img.shape
    if tile_w <= 0:
        tile_w = W
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // tile_w) * tile_w
    img_p = jnp.pad(
        img, ((HALO, Hp - H + HALO), (HALO, Wp - W + HALO)), mode="edge"
    )
    windows = _overlapping_windows(img_p, tile_h, tile_w, HALO)
    grid = (Hp // tile_h, Wp // tile_w)
    sh, sw = tile_h + 2 * HALO, tile_w + 2 * HALO
    kern = functools.partial(
        _kernel, th_hi=th_hi, th_lo=th_lo, tile_h=tile_h, tile_w=tile_w
    )
    hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, sh, sw), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ),
        interpret=interpret,
    )(windows)
    hi = hi[:H, :W]
    lo = lo[:H, :W]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(inside, hi, 0.0), jnp.where(inside, lo, 0.0)
