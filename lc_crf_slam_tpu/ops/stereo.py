"""Stereo matching: left-right feature association along epipolar rows.

Equivalent of `Frame::ComputeStereoMatches` (SURVEY.md §3.1 Frame row)
for true stereo input: each left keypoint searches right keypoints in
the same pyramid level within a row band and a disparity range by
Hamming distance, giving the virtual right coordinate uR and depth
z = bf / d. Batched as one masked (K, K) matching problem.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Pinhole
from .match import hamming_matrix, match_nn


def stereo_match(
    cam: Pinhole,
    uv_l: jax.Array, level_l: jax.Array, desc_l: jax.Array, valid_l: jax.Array,
    uv_r: jax.Array, level_r: jax.Array, desc_r: jax.Array, valid_r: jax.Array,
    max_dist: int = 100,
    row_tolerance: float = 2.0,
    min_disparity: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (u_right (K,), depth (K,)) per left feature; -1/0 where
    unmatched."""
    row_gate = jnp.abs(
        uv_l[:, 1][:, None] - uv_r[:, 1][None, :]
    ) <= row_tolerance * (1.0 + 0.5 * level_l[:, None].astype(jnp.float32))
    disparity = uv_l[:, 0][:, None] - uv_r[:, 0][None, :]
    max_disp = cam.bf / 0.3   # closest representable depth 0.3 m
    disp_gate = (disparity >= min_disparity) & (disparity <= max_disp)
    lvl_gate = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    gate = row_gate & disp_gate & lvl_gate
    gate &= valid_l[:, None] & valid_r[None, :]
    dist = hamming_matrix(desc_l, desc_r)
    r = match_nn(dist, mask=gate, max_dist=max_dist, ratio=0.9)
    disp = jnp.take_along_axis(disparity, r.idx[:, None], axis=1)[:, 0]
    ok = r.valid & (disp > min_disparity)
    u_right = jnp.where(ok, uv_r[r.idx, 0], -1.0)
    depth = jnp.where(ok, cam.bf / jnp.maximum(disp, min_disparity), 0.0)
    return u_right, depth
