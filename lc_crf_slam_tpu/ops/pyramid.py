"""Image pyramid + Gaussian blur.

Covers `ORBextractor::ComputePyramid` and the pre-descriptor
`GaussianBlur(7x7, sigma=2)` of the reference front-end (SURVEY.md §3.1
ORB extractor row). Levels are separate static-shape arrays so the whole
front-end traces into one XLA program; all resampling is bilinear.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def pyramid_shapes(
    height: int, width: int, n_levels: int, scale_factor: float
) -> List[Tuple[int, int]]:
    """Static (H, W) per level."""
    return [
        (int(round(height / scale_factor**l)), int(round(width / scale_factor**l)))
        for l in range(n_levels)
    ]


def build_pyramid(
    img: jax.Array, n_levels: int, scale_factor: float
) -> List[jax.Array]:
    """Grayscale (H, W) float32 -> list of n_levels images, level 0 = input.

    Each level is resized from the previous (matching the reference's
    chained resize, which low-passes progressively) with bilinear
    interpolation.
    """
    H, W = img.shape
    shapes = pyramid_shapes(H, W, n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(
            jax.image.resize(levels[-1], shapes[l], method="bilinear")
        )
    return levels


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(ksize: int, sigma: float):
    import numpy as np

    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return tuple(float(v) for v in k)


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with edge replication, (H, W) -> (H, W)."""
    k = jnp.asarray(_gaussian_kernel(ksize, sigma), img.dtype)
    r = ksize // 2
    # horizontal then vertical, via padded shifts (small k: unrolled adds,
    # which XLA fuses into a single pass)
    p = jnp.pad(img, ((0, 0), (r, r)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[1], axis=1)
    p = jnp.pad(out, ((r, r), (0, 0)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(ksize):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[0], axis=0)
    return out2


def level_scales(n_levels: int, scale_factor: float) -> jnp.ndarray:
    return jnp.asarray(
        [scale_factor**l for l in range(n_levels)], dtype=jnp.float32
    )


def features_per_level(
    n_features: int, n_levels: int, scale_factor: float
) -> List[int]:
    """ORB-style per-level feature quota: N_l ∝ (1/s^2)^l, summing to
    n_features (reference: ORBextractor ctor's mnFeaturesPerLevel)."""
    q = 1.0 / (scale_factor * scale_factor)
    raw = [q**l for l in range(n_levels)]
    total = sum(raw)
    quota = [max(1, int(round(n_features * r / total))) for r in raw]
    # fix rounding drift on level 0
    quota[0] += n_features - sum(quota)
    return quota
