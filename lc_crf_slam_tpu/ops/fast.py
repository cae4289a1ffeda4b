"""FAST-9/16 corner detection as dense vectorized score maps.

TPU-native replacement for the reference's per-pixel scalar FAST loop
(`ORBextractor::ComputeKeyPointsOctTree`, SURVEY.md §3.1): instead of
iterating pixels, the segment test runs as 16 shifted whole-image
comparisons on the VPU, producing a dense score map that downstream
grid top-k selection consumes (ops/select.py). Semantics follow the
classic FAST-9 segment test with the high/low threshold pair (20/7)
from the reference config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 16 Bresenham circle offsets (dy, dx), radius 3, clockwise from 12 o'clock.
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LENGTH = 9  # FAST-9


def _shifted(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """img value at (y+dy, x+dx), edges replicated (masked out later)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_score_map(img: jax.Array, threshold: float) -> jax.Array:
    """(H, W) grayscale -> (H, W) float32 corner score (0 = not corner).

    Score is the FAST 'V' measure: max over the brighter/darker arcs of
    the summed margins |C_k - I| - t over qualifying circle pixels.
    """
    I = img
    t = jnp.asarray(threshold, img.dtype)
    circ = jnp.stack(
        [_shifted(img, dy, dx) for dy, dx in CIRCLE_OFFSETS], axis=0
    )  # (16, H, W)
    brighter = circ > (I + t)[None]
    darker = circ < (I - t)[None]

    def has_arc(mask):
        # any circular run of ARC_LENGTH consecutive True
        ext = jnp.concatenate([mask, mask[: ARC_LENGTH - 1]], axis=0)  # (24,H,W)
        run = ext[:16]
        for j in range(1, ARC_LENGTH):
            run = run & ext[j : j + 16]
        return jnp.any(run, axis=0)

    is_b = has_arc(brighter)
    is_d = has_arc(darker)
    margin_b = jnp.sum(jnp.where(brighter, circ - I[None] - t, 0.0), axis=0)
    margin_d = jnp.sum(jnp.where(darker, I[None] - circ - t, 0.0), axis=0)
    score = jnp.maximum(
        jnp.where(is_b, margin_b, 0.0), jnp.where(is_d, margin_d, 0.0)
    )
    # kill the replicated border (circle radius 3)
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(inside, score, 0.0)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression on a score map."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def fast_score_dual(img: jax.Array, th_high: float, th_low: float):
    """Score maps at both thresholds (reference: iniThFAST=20, minThFAST=7).

    Returns (score_high, score_low), each NMS'd. Grid selection uses the
    high map per cell and falls back to the low map for empty cells,
    reproducing the reference's per-cell threshold fallback. The 16
    shifted circle images are computed once and shared by both
    thresholds (the dominant cost).
    """
    I = img
    circ = jnp.stack(
        [_shifted(img, dy, dx) for dy, dx in CIRCLE_OFFSETS], axis=0
    )

    def score(threshold):
        t = jnp.asarray(threshold, img.dtype)
        brighter = circ > (I + t)[None]
        darker = circ < (I - t)[None]

        def has_arc(mask):
            ext = jnp.concatenate([mask, mask[: ARC_LENGTH - 1]], axis=0)
            run = ext[:16]
            for j in range(1, ARC_LENGTH):
                run = run & ext[j: j + 16]
            return jnp.any(run, axis=0)

        margin_b = jnp.sum(jnp.where(brighter, circ - I[None] - t, 0.0), axis=0)
        margin_d = jnp.sum(jnp.where(darker, I[None] - circ - t, 0.0), axis=0)
        sc = jnp.maximum(
            jnp.where(has_arc(brighter), margin_b, 0.0),
            jnp.where(has_arc(darker), margin_d, 0.0),
        )
        H, W = img.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inside = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
        return jnp.where(inside, sc, 0.0)

    return nms3(score(th_high)), nms3(score(th_low))
