"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

The reference fork's short-term track-consistency evidence comes from
optical flow (SURVEY.md §3.1 'Optical-flow track consistency' row,
cv::calcOpticalFlowPyrLK). TPU-native shape: all keypoints tracked in
parallel — per level (coarse to fine), gather a gradient window from
the previous image once, then run fixed Gauss-Newton iterations against
bilinearly-sampled windows of the next image; a 2x2 normal-equation
solve per keypoint per iteration, vmapped.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FlowResult(NamedTuple):
    uv_next: jax.Array   # (K, 2) tracked positions in the next image
    err: jax.Array       # (K,) mean abs photometric residual
    ok: jax.Array        # (K,) bool converged & in-bounds


def _bilinear_window(img: jax.Array, center: jax.Array, offsets: jax.Array):
    """Sample img at center + offsets (W2, 2) with bilinear interpolation.

    Returns (W2,) values; out-of-bounds clamped.
    """
    H, W = img.shape
    pts = center[None, :] + offsets                      # (W2, 2) as (x, y)
    x = jnp.clip(pts[:, 0], 0.0, W - 1.001)
    y = jnp.clip(pts[:, 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _track_level(
    img_prev: jax.Array, img_next: jax.Array,
    uv_prev: jax.Array, uv_guess: jax.Array,
    half_win: int, iters: int,
):
    """One pyramid level of LK for all keypoints."""
    r = half_win
    ys, xs = jnp.mgrid[-r: r + 1, -r: r + 1]
    offsets = jnp.stack(
        [xs.reshape(-1), ys.reshape(-1)], axis=-1
    ).astype(jnp.float32)                                # (W2, 2)

    def one(kp_prev, kp_guess):
        tmpl = _bilinear_window(img_prev, kp_prev, offsets)
        gx = (
            _bilinear_window(img_prev, kp_prev + jnp.asarray([0.5, 0.0]), offsets)
            - _bilinear_window(img_prev, kp_prev - jnp.asarray([0.5, 0.0]), offsets)
        )
        gy = (
            _bilinear_window(img_prev, kp_prev + jnp.asarray([0.0, 0.5]), offsets)
            - _bilinear_window(img_prev, kp_prev - jnp.asarray([0.0, 0.5]), offsets)
        )
        G = jnp.asarray(
            [[jnp.sum(gx * gx), jnp.sum(gx * gy)],
             [jnp.sum(gx * gy), jnp.sum(gy * gy)]]
        ) + 1e-3 * jnp.eye(2)

        def body(_, p):
            cur = _bilinear_window(img_next, p, offsets)
            diff = cur - tmpl
            b = jnp.asarray([jnp.sum(diff * gx), jnp.sum(diff * gy)])
            return p - jnp.linalg.solve(G, b)

        p = jax.lax.fori_loop(0, iters, body, kp_guess)
        final = _bilinear_window(img_next, p, offsets)
        err = jnp.mean(jnp.abs(final - tmpl))
        return p, err

    return jax.vmap(one)(uv_prev, uv_guess)


def _pyramid2(img: jax.Array, n_levels: int) -> List[jax.Array]:
    """Factor-2 pyramid (LK convergence basin needs fast shrinkage; the
    ORB 1.2 pyramid is for scale-invariant detection, not flow)."""
    levels = [img]
    for _ in range(1, n_levels):
        prev = levels[-1]
        H, W = prev.shape
        levels.append(
            jax.image.resize(prev, (H // 2, W // 2), method="bilinear")
        )
    return levels


def lk_track(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,          # (K, 2) level-0 coordinates
    valid: jax.Array,            # (K,) bool
    n_levels: int = 3,
    half_win: int = 7,
    iters: int = 8,
    max_err: float = 20.0,
) -> FlowResult:
    """Track keypoints from img_prev to img_next (coarse->fine)."""
    pyr_prev = _pyramid2(img_prev, n_levels)
    pyr_next = _pyramid2(img_next, n_levels)
    top = n_levels - 1
    guess = uv_prev / (2.0 ** top)
    for lvl in range(top, -1, -1):
        uv_l = uv_prev / (2.0 ** lvl)
        guess, err = _track_level(
            pyr_prev[lvl], pyr_next[lvl], uv_l, guess, half_win, iters
        )
        if lvl > 0:
            guess = guess * 2.0
    uv_next = guess
    H, W = pyr_next[0].shape
    inb = (
        (uv_next[:, 0] >= half_win) & (uv_next[:, 0] < W - half_win)
        & (uv_next[:, 1] >= half_win) & (uv_next[:, 1] < H - half_win)
    )
    ok = valid & inb & (err < max_err)
    return FlowResult(uv_next=uv_next, err=err, ok=ok)
