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


def _bilinear_patch(img_pad: jax.Array, pt: jax.Array, r: int, pad: int):
    """(2r+1, 2r+1) bilinear window of the (edge-padded) image at `pt`.

    ONE vmapped `lax.dynamic_slice` + elementwise 4-tap blend per window
    instead of hundreds of random-index gathers — on TPU the flat-gather
    formulation was ~400 ms/frame; dense dynamic-slice patches are the
    fast path for square windows (measured on v5e; see also the BRIEF
    sampler where the opposite holds for sparse lookups).
    `pt` is (x, y) in ORIGINAL image coordinates; `pad >= r + 2`.
    """
    x0 = jnp.floor(pt[0]).astype(jnp.int32)
    y0 = jnp.floor(pt[1]).astype(jnp.int32)
    fx = pt[0] - x0.astype(pt.dtype)
    fy = pt[1] - y0.astype(pt.dtype)
    P = jax.lax.dynamic_slice(
        img_pad, (y0 - r + pad, x0 - r + pad), (2 * r + 2, 2 * r + 2)
    )
    return (
        P[:-1, :-1] * (1 - fy) * (1 - fx)
        + P[:-1, 1:] * (1 - fy) * fx
        + P[1:, :-1] * fy * (1 - fx)
        + P[1:, 1:] * fy * fx
    )


def _track_level(
    img_prev: jax.Array, img_next: jax.Array,
    uv_prev: jax.Array, uv_guess: jax.Array,
    half_win: int, iters: int,
):
    """One pyramid level of LK for all keypoints."""
    r = half_win
    pad = r + 3
    H, W = img_prev.shape
    prev_p = jnp.pad(img_prev, pad, mode="edge")
    next_p = jnp.pad(img_next, pad, mode="edge")

    def clampxy(pt):
        return jnp.stack([
            jnp.clip(pt[0], 0.0, W - 1.001),
            jnp.clip(pt[1], 0.0, H - 1.001),
        ])

    def one(kp_prev, kp_guess):
        # template + central-difference gradients from ONE (r+1)-patch
        T1 = _bilinear_patch(prev_p, clampxy(kp_prev), r + 1, pad)
        tmpl = T1[1:-1, 1:-1]
        gx = (T1[1:-1, 2:] - T1[1:-1, :-2]) * 0.5
        gy = (T1[2:, 1:-1] - T1[:-2, 1:-1]) * 0.5
        gxx = jnp.sum(gx * gx) + 1e-3
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy) + 1e-3
        # G is constant over the GN iterations (gradients come from the
        # template); invert the 2x2 once, closed form — batched LU
        # inside the loop costs ~10x on TPU for nothing
        det = jnp.maximum(gxx * gyy - gxy * gxy, 1e-9)
        Ginv = jnp.asarray([[gyy, -gxy], [-gxy, gxx]]) / det

        def body(_, p):
            cur = _bilinear_patch(next_p, clampxy(p), r, pad)
            diff = cur - tmpl
            b = jnp.asarray([jnp.sum(diff * gx), jnp.sum(diff * gy)])
            return p - Ginv @ b

        p = jax.lax.fori_loop(0, iters, body, kp_guess)
        final = _bilinear_patch(next_p, clampxy(p), r, pad)
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
