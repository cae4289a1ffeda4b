"""Oriented BRIEF-256 descriptors: intensity-centroid angle + steered BRIEF.

TPU-native equivalent of `ORBextractor::IC_Angle` + `computeOrbDescriptor`
(SURVEY.md §3.1). Differences by design, not accident:
  - the 256 sampling pairs come from a seeded Gaussian pattern (the
    original BRIEF recipe, sigma = patch/5) rather than upstream's learned
    `bit_pattern_31_` table — self-consistent matching needs a fixed
    pattern, not that specific one, and no reference code is copied;
  - all keypoints are processed as one batched gather + compare, packed
    to uint32[8] words for popcount matching.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

HALF_PATCH = 15       # orientation circle radius (patch 31)
PATCH_MARGIN = 19     # descriptor gather half-width (covers rotated pairs)


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 4) int8 sampling pairs (x1, y1, x2, y2), radius <= 13."""
    rng = np.random.default_rng(42)
    pts = np.clip(
        np.round(rng.normal(0.0, 31 / 5.0, size=(256, 4))), -13, 13
    ).astype(np.int8)
    return pts


@functools.lru_cache(maxsize=1)
def _ic_mask() -> np.ndarray:
    """(31, 31) circular mask and coordinate grids for the moment sums."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    return mask.astype(np.float32), xs.astype(np.float32), ys.astype(np.float32)


def _gather_patches(img: jax.Array, uv: jax.Array, half: int) -> jax.Array:
    """(H, W), (K, 2) int (x, y) -> (K, 2*half+1, 2*half+1) patches.

    Contiguous-row gather + one-hot column-selection matmul: the
    vmapped-dynamic_slice formulation issued one DMA per keypoint and
    showed up as the front-end's residual gather cost once the BRIEF
    samples moved onto the MXU; row gathers stream full rows and the
    column crop is a batched (size, W) x (W, size) matmul (same design
    as ops/lk_flow.py's patch extraction). Start indices clamp at
    borders, matching dynamic_slice semantics bit-for-bit.
    """
    size = 2 * half + 1
    H, W = img.shape
    y0 = jnp.clip(uv[:, 1] - half, 0, H - size).astype(jnp.int32)
    x0 = jnp.clip(uv[:, 0] - half, 0, W - size).astype(jnp.int32)
    rows = img[y0[:, None] + jnp.arange(size)[None, :], :]  # (K, size, W)
    off = jnp.arange(W, dtype=jnp.int32)[None, :, None] \
        - x0[:, None, None] - jnp.arange(size)[None, None, :]
    sel = (off == 0).astype(img.dtype)                      # (K, W, size)
    return jnp.einsum("ksw,kwj->ksj", rows, sel)


def ic_angles(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Intensity-centroid orientation per keypoint: (K,) radians.

    Computed on the (un-blurred) level image like the reference.
    """
    mask, xs, ys = _ic_mask()
    patches = _gather_patches(img, uv, HALF_PATCH)  # (K, 31, 31)
    m = jnp.asarray(mask)
    m10 = jnp.sum(patches * (m * jnp.asarray(xs)), axis=(-2, -1))
    m01 = jnp.sum(patches * (m * jnp.asarray(ys)), axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _blur_patches(patches: jax.Array, ksize: int = 7,
                  sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur on gathered patches (K, S, S).

    Blurring only the descriptor support instead of every full pyramid
    level removes the largest HBM pass of the front-end; edges replicate
    like the full-image blur (patches carry EXTRA margin so the interior
    used for sampling matches the full-image result).
    """
    from .pyramid import _gaussian_kernel

    k = jnp.asarray(_gaussian_kernel(ksize, sigma), patches.dtype)
    r = ksize // 2
    p = jnp.pad(patches, ((0, 0), (0, 0), (r, r)), mode="edge")
    out = sum(
        k[i] * p[:, :, i: i + patches.shape[2]] for i in range(ksize)
    )
    p = jnp.pad(out, ((0, 0), (r, r), (0, 0)), mode="edge")
    return sum(
        k[i] * p[:, i: i + patches.shape[1], :] for i in range(ksize)
    )


def brief_descriptors_direct(
    img_blur: jax.Array, uv: jax.Array, angles: jax.Array
) -> jax.Array:
    """Steered BRIEF-256 sampling the blurred image DIRECTLY: one flat
    (K, 512) gather at rotated absolute pixel positions — no (K, 39, 39)
    patch materialization. Fastest variant on TPU (6.1 vs 8.7 ms/frame
    whole-front-end); identical bits away from the border clamp."""
    pat = jnp.asarray(brief_pattern(), jnp.float32)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    px = jnp.stack([pat[:, 0], pat[:, 2]], axis=-1)
    py = jnp.stack([pat[:, 1], pat[:, 3]], axis=-1)
    rx = jnp.round(
        ca[:, None, None] * px - sa[:, None, None] * py).astype(jnp.int32)
    ry = jnp.round(
        sa[:, None, None] * px + ca[:, None, None] * py).astype(jnp.int32)
    H, W = img_blur.shape
    x = jnp.clip(uv[:, 0:1, None] + rx, 0, W - 1)
    y = jnp.clip(uv[:, 1:2, None] + ry, 0, H - 1)
    flat_idx = (y * W + x).reshape(uv.shape[0], -1)
    vals = jnp.take(img_blur.reshape(-1), flat_idx).reshape(
        uv.shape[0], 256, 2)
    return pack_bits(vals[..., 0] < vals[..., 1])


N_ANGLE_BINS = 30     # the original ORB paper's 2pi/30 steered-BRIEF
                      # lookup discretization


@functools.lru_cache(maxsize=1)
def _brief_bin_matrix() -> np.ndarray:
    """(39*39, 30*256) float32 difference-selection matrix with
    BILINEAR sample taps.

    Column (b, i) holds the 4 bilinear-weight taps of pattern pair i's
    SECOND sample position (+w) and FIRST sample position (-w), both
    rotated by bin b's exact angle: for a flattened 39x39 patch `p`,
    (p @ D)[b, i] = v2 - v1 with v* sampled bilinearly at the rotated
    sub-pixel position. The r3 matmul variant used nearest-pixel
    rounding here, which — combined with nearest-BIN steering — put
    samples up to ~1.4 px off the direct path's and broke loop closure
    (VERDICT r4 #2); bilinear taps plus the angular interpolation in
    brief_descriptors_matmul bound the effective sampling error to
    ~0.1 px (measured: median cross-variant Hamming 12.5 bits and
    rotated self-distance 15.5 vs the direct path's 21 on blurred
    noise — the matmul variant is now the BETTER sampler)."""
    pat = brief_pattern().astype(np.float64)         # (256, 4)
    size = 2 * PATCH_MARGIN + 1
    D = np.zeros((size * size, N_ANGLE_BINS, 256), np.float32)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        ca, sa = np.cos(th), np.sin(th)
        for pt, sign in ((0, -1.0), (2, +1.0)):      # (x1,y1) / (x2,y2)
            x = ca * pat[:, pt] - sa * pat[:, pt + 1]
            y = sa * pat[:, pt] + ca * pat[:, pt + 1]
            x0, y0 = np.floor(x), np.floor(y)
            fx, fy = x - x0, y - y0
            for dx, dy, w in ((0, 0, (1 - fx) * (1 - fy)),
                              (1, 0, fx * (1 - fy)),
                              (0, 1, (1 - fx) * fy),
                              (1, 1, fx * fy)):
                idx = ((y0 + dy + PATCH_MARGIN) * size
                       + (x0 + dx + PATCH_MARGIN)).astype(int)
                np.add.at(D, (idx, b, np.arange(256)),
                          (sign * w).astype(np.float32))
    return D.reshape(size * size, N_ANGLE_BINS * 256)


def brief_descriptors_matmul(
    patches: jax.Array, angles: jax.Array
) -> jax.Array:
    """Steered BRIEF-256 as ONE MXU matmul (K, 8) uint32.

    `patches`: (K, 45, 45) UNBLURRED patches centered on the keypoints
    (PATCH_MARGIN + blur radius margin). The per-sample random gathers
    of the direct formulation (512 per keypoint — measured 5.5 ms/frame
    on v5e, the front-end's dominant cost) become: in-patch separable
    Gaussian blur, then a dense (K, 39^2) x (39^2, 30*256) product
    against the precomputed rotation-bin difference matrix (bilinear
    sample taps, see _brief_bin_matrix), then LINEAR INTERPOLATION
    between the keypoint's two adjacent angle bins. The interpolation
    makes the sampled intensity a continuous function of the keypoint
    angle (error O(dtheta^2) instead of the nearest-bin O(dtheta) that
    cost r3 its loop closure), at the price of one extra bin gather +
    lerp — negligible next to the matmul."""
    K = patches.shape[0]
    blurred = _blur_patches(patches)[:, 3:-3, 3:-3]      # (K, 39, 39)
    flat = blurred.reshape(K, -1)
    D = jnp.asarray(_brief_bin_matrix())
    diffs = (flat @ D).reshape(K, N_ANGLE_BINS, 256)
    two_pi = 2.0 * jnp.pi
    pos = jnp.mod(angles, two_pi) / (two_pi / N_ANGLE_BINS)
    b0 = jnp.floor(pos).astype(jnp.int32) % N_ANGLE_BINS
    b1 = (b0 + 1) % N_ANGLE_BINS
    w = (pos - jnp.floor(pos))[:, None]
    d0 = jnp.take_along_axis(diffs, b0[:, None, None], axis=1)[:, 0]
    d1 = jnp.take_along_axis(diffs, b1[:, None, None], axis=1)[:, 0]
    d = (1.0 - w) * d0 + w * d1
    # strict positive threshold: the direct path's (v1 < v2) yields a
    # deterministic 0-bit on equal samples, but on FLAT image regions
    # this matmul's d is f32 roundoff (~1e-2 graylevels over a
    # 1521-term dot product) — without the epsilon those bits are
    # noise, inconsistent frame to frame (measured: interframe match
    # precision 0.51 vs direct's 0.61 on the flat-background dot
    # world; equal with the epsilon). 0.1 graylevel is far below any
    # real intensity edge.
    return pack_bits(d > 0.1)


def ic_angles_from_patches(patches: jax.Array) -> jax.Array:
    """Intensity-centroid orientation from pre-gathered (K, 45, 45)
    UNBLURRED patches (center 31x31 used) — shares the descriptor
    path's single patch gather instead of a second one."""
    mask, xs, ys = _ic_mask()
    m = patches.shape[1] // 2 - HALF_PATCH
    ctr = patches[:, m:m + 2 * HALF_PATCH + 1, m:m + 2 * HALF_PATCH + 1]
    w = jnp.asarray(mask)
    m10 = jnp.sum(ctr * (w * jnp.asarray(xs)), axis=(-2, -1))
    m01 = jnp.sum(ctr * (w * jnp.asarray(ys)), axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def pack_bits(bits: jax.Array) -> jax.Array:
    """(K, 256) bool -> (K, 8) uint32, bit j of word w = bits[:, 32w + j]."""
    K = bits.shape[0]
    b = bits.reshape(K, 8, 32).astype(jnp.uint32)
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(words: jax.Array) -> jax.Array:
    """(K, 8) uint32 -> (K, 256) bool."""
    K = words.shape[0]
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    bits = (words[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(K, 256).astype(bool)
