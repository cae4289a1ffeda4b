"""Frame front-end: image -> fixed-capacity oriented-ORB feature set.

TPU-native counterpart of the reference's `Frame.cc` + `ORBextractor.cc`
hot path (SURVEY.md §4.2): pyramid -> dual-threshold FAST score maps ->
grid top-k selection -> intensity-centroid orientation -> steered
BRIEF-256 -> keypoint undistortion -> depth lookup -> virtual right
coordinate (ComputeStereoFromRGBD). The whole thing is one jittable
function over static shapes; the feature grid of the reference is
replaced by dense masked matching downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry.camera import Pinhole, undistort_pixels
from ..ops.fast import fast_score_dual
from ..ops.pallas_fast import fast_score_dual_pallas
from ..ops.orb import (
    PATCH_MARGIN,
    _gather_patches,
    brief_descriptors_direct,
    brief_descriptors_matmul,
    ic_angles,
    ic_angles_from_patches,
)
from ..ops.pyramid import build_pyramid, features_per_level, gaussian_blur
from ..ops.select import select_keypoints


class Frame(NamedTuple):
    """Fixed-capacity feature set of one RGB-D frame (all arrays length K)."""

    uv: jax.Array        # (K, 2) float32 undistorted level-0 pixel coords
    level: jax.Array     # (K,) int32 pyramid level
    angle: jax.Array     # (K,) float32 orientation (radians)
    score: jax.Array     # (K,) float32 FAST score
    desc: jax.Array      # (K, 8) uint32 ORB descriptors
    depth: jax.Array     # (K,) float32 measured depth, 0 where invalid
    u_right: jax.Array   # (K,) float32 virtual right u; -1 where no depth
    valid: jax.Array     # (K,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


def orient_and_describe(cfg: SLAMConfig, img_l: jax.Array, uv_l: jax.Array):
    """IC orientation + steered BRIEF-256 for one pyramid level's
    keypoints — THE production descriptor path (the exact code
    build_frame runs, factored out so the rotation-invariance golden in
    tests/test_frontend.py gates whatever variant the config selects).

    "matmul" (default): one 45x45 patch gather feeds both the IC angle
    and an angle-binned MXU difference matmul with bilinear sample taps
    + angular interpolation between adjacent bins — fastest, and the
    better sampler (rotated self-distance median 15.5 vs direct's 21;
    see ops/orb.py _brief_bin_matrix).
    "direct": exact-angle rotated gather on the blurred level image —
    the reference semantics (computeOrbDescriptor, SURVEY.md §3.1),
    kept as the validation sampler the agreement golden compares
    against."""
    if cfg.orb.descriptor_variant == "matmul":
        patches_l = _gather_patches(img_l, uv_l, PATCH_MARGIN + 3)
        ang_l = ic_angles_from_patches(patches_l)
        return ang_l, brief_descriptors_matmul(patches_l, ang_l)
    ang_l = ic_angles(img_l, uv_l)
    return ang_l, brief_descriptors_direct(
        gaussian_blur(img_l, 7, 2.0), uv_l, ang_l
    )


def build_frame(
    cam: Pinhole, cfg: SLAMConfig, gray: jax.Array, depth_img: jax.Array
) -> Frame:
    """(H, W) float32 grayscale + (H, W) float32 depth [m] -> Frame."""
    orb = cfg.orb
    levels = build_pyramid(gray, orb.n_levels, orb.scale_factor)
    quotas = features_per_level(orb.max_keypoints, orb.n_levels, orb.scale_factor)
    # The fused Pallas FAST+NMS kernel (ops/pallas_fast.py) is golden-
    # equivalent but measured SLOWER than XLA's own fusion of the jnp
    # formulation on v5e (0.79 vs 0.36 ms/frame device-side, scan-
    # amortized): the roll-compare pattern fuses into one HBM pass
    # already, and the kernel pays for its explicit halo-window copy.
    # Kept behind a flag for future DMA-halo iterations.
    use_pallas = cfg.orb.use_pallas_fast and jax.default_backend() == "tpu"

    uv_all, lvl_all, ang_all, sc_all, desc_all, val_all = [], [], [], [], [], []
    for l, img_l in enumerate(levels):
        if use_pallas:
            hi, lo = fast_score_dual_pallas(
                img_l, float(orb.ini_th_fast), float(orb.min_th_fast)
            )
        else:
            hi, lo = fast_score_dual(img_l, orb.ini_th_fast, orb.min_th_fast)
        uv_l, sc_l, val_l = select_keypoints(
            hi, lo, quotas[l], cell=orb.cell_size, margin=orb.edge_margin
        )
        ang_l, desc_l = orient_and_describe(cfg, img_l, uv_l)
        scale = orb.scale_factor**l
        uv_all.append(uv_l.astype(jnp.float32) * scale)
        lvl_all.append(jnp.full((quotas[l],), l, jnp.int32))
        ang_all.append(ang_l)
        sc_all.append(sc_l)
        desc_all.append(desc_l)
        val_all.append(val_l)

    uv = jnp.concatenate(uv_all)
    level = jnp.concatenate(lvl_all)
    angle = jnp.concatenate(ang_all)
    score = jnp.concatenate(sc_all)
    desc = jnp.concatenate(desc_all)
    valid = jnp.concatenate(val_all)

    # undistort (identity for distortion-free cameras)
    uv_und = undistort_pixels(cam, uv)

    # depth lookup at the raw (distorted) detection location
    xi = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, cam.height - 1)
    d = depth_img[yi, xi]
    has_d = (d > 0) & valid
    u_right = jnp.where(has_d, uv_und[:, 0] - cam.bf / jnp.where(has_d, d, 1.0), -1.0)

    return Frame(
        uv=jnp.where(valid[:, None], uv_und, 0.0),
        level=level,
        angle=angle,
        score=score,
        desc=desc,
        depth=jnp.where(has_d, d, 0.0),
        u_right=u_right,
        valid=valid,
    )


def frame_from_observations(
    uv: jax.Array, depth: jax.Array, desc: jax.Array, capacity: int,
    cam: Pinhole | None = None,
) -> Frame:
    """Build a Frame directly from (synthetic) observations, bypassing the
    image front-end — the pipeline-test path (SURVEY.md §5 integration
    tests). Pads/truncates to `capacity`."""
    n = min(uv.shape[0], capacity)
    K = capacity

    def pad(x, fill=0):
        x = x[:n]
        pad_width = [(0, K - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(jnp.asarray(x), pad_width, constant_values=fill)

    uvp = pad(jnp.asarray(uv, jnp.float32))
    dp = pad(jnp.asarray(depth, jnp.float32))
    descp = pad(jnp.asarray(desc).astype(jnp.uint32))
    valid = jnp.arange(K) < n
    bf = cam.bf if cam is not None else 40.0
    ur = jnp.where((dp > 0) & valid, uvp[:, 0] - bf / jnp.where(dp > 0, dp, 1.0), -1.0)
    return Frame(
        uv=uvp,
        level=jnp.zeros((K,), jnp.int32),
        angle=jnp.zeros((K,), jnp.float32),
        score=jnp.where(valid, 1.0, 0.0),
        desc=descp,
        depth=jnp.where(valid, dp, 0.0),
        u_right=ur,
        valid=valid,
    )
