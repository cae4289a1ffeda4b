"""Grid-cell keypoint selection: spatially balanced top-k.

TPU-native replacement for the reference's recursive quadtree
(`ORBextractor::DistributeOctTree`, SURVEY.md §8.3 item 3): a static
cell grid takes the best corner per cell (high-threshold map, falling
back to the low-threshold map for empty cells, like the reference's
per-cell threshold retry), then a global top-k over cells yields a
fixed-capacity, spatially spread keypoint set. Same balancing behavior,
XLA-friendly shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _cell_reduce(score: jax.Array, cell: int):
    """(H, W) -> per-cell (max, argmax flat index). H, W padded to cell."""
    H, W = score.shape
    Hp = (H + cell - 1) // cell * cell
    Wp = (W + cell - 1) // cell * cell
    s = jnp.pad(score, ((0, Hp - H), (0, Wp - W)), constant_values=0.0)
    ny, nx = Hp // cell, Wp // cell
    s = s.reshape(ny, cell, nx, cell).transpose(0, 2, 1, 3).reshape(ny * nx, cell * cell)
    best = jnp.max(s, axis=-1)
    arg = jnp.argmax(s, axis=-1).astype(jnp.int32)
    # convert to absolute (y, x)
    cy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0).reshape(-1)
    cx = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1).reshape(-1)
    y = cy * cell + arg // cell
    x = cx * cell + arg % cell
    return best, y, x


def select_keypoints(
    score_hi: jax.Array,
    score_lo: jax.Array,
    k: int,
    cell: int = 16,
    margin: int = 19,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick up to k spatially balanced keypoints from dual score maps.

    Returns (uv int32 [k, 2] as (x, y), score float32 [k], valid bool [k]).
    Invalid slots have score 0 and uv (0, 0).
    """
    H, W = score_hi.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (ys >= margin) & (ys < H - margin) & (xs >= margin) & (xs < W - margin)
    hi = jnp.where(inb, score_hi, 0.0)
    lo = jnp.where(inb, score_lo, 0.0)

    b_hi, y_hi, x_hi = _cell_reduce(hi, cell)
    b_lo, y_lo, x_lo = _cell_reduce(lo, cell)
    use_lo = b_hi <= 0.0
    best = jnp.where(use_lo, b_lo, b_hi)
    y = jnp.where(use_lo, y_lo, y_hi)
    x = jnp.where(use_lo, x_lo, x_hi)

    n_cells = best.shape[0]
    kk = min(k, n_cells)
    top, idx = jax.lax.top_k(best, kk)
    uv = jnp.stack([x[idx], y[idx]], axis=-1)
    valid = top > 0.0
    if kk < k:
        uv = jnp.pad(uv, ((0, k - kk), (0, 0)))
        top = jnp.pad(top, (0, k - kk))
        valid = jnp.pad(valid, (0, k - kk))
    uv = jnp.where(valid[:, None], uv, 0)
    return uv, jnp.where(valid, top, 0.0), valid
