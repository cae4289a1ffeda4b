"""Pinhole RGB-D camera model.

Covers the role of the intrinsics handling in the reference's Frame
(SURVEY.md §3.1: `Frame.cc` — `UndistortKeyPoints`, `UnprojectStereo`,
`ComputeStereoFromRGBD`): projection, unprojection from depth, radial-
tangential distortion/undistortion, and the RGB-D "virtual right
coordinate" uR = u - bf/z that turns depth into a stereo-style residual.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pinhole(NamedTuple):
    """Static camera parameters (held as concrete floats; hashable, so a
    Pinhole can be a jit static argument)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    bf: float = 40.0  # baseline * fx — TUM convention from Camera.bf
    # rad-tan distortion
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 1e-12 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))

    def intrinsic_matrix(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def project_points(cam: Pinhole, p_cam: jax.Array):
    """Camera-frame points (..., 3) -> pixel (..., 2), depth (...,).

    No distortion is applied: the pipeline operates on undistorted pixel
    coordinates throughout (keypoints are undistorted once at extraction,
    mirroring Frame::UndistortKeyPoints in the reference).
    """
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * p_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * p_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(cam: Pinhole, p_cam: jax.Array):
    """-> (u, v, uR) (..., 3) and depth; uR = u - bf/z (RGB-D virtual right)."""
    uv, z = project_points(cam, p_cam)
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf / z_safe
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def unproject_depth(cam: Pinhole, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def in_image(cam: Pinhole, uv: jax.Array, margin: float = 0.0) -> jax.Array:
    """Boolean mask (...,) for pixels inside the image bounds."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


def distort_normalized(cam: Pinhole, xy: jax.Array) -> jax.Array:
    """Apply rad-tan distortion to normalized coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort_pixels(cam: Pinhole, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Iteratively invert rad-tan distortion for pixels (..., 2).

    Fixed-point iteration (the classic cv::undistortPoints scheme), fixed
    trip count for jit. Identity when the camera has no distortion terms.
    """
    if not cam.has_distortion:
        return uv
    xd = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )

    def body(_, x):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * xx * yy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xx * yy
        num = jnp.stack([xd[..., 0] - dx, xd[..., 1] - dy], axis=-1)
        return num / radial[..., None]

    x = jax.lax.fori_loop(0, iters, body, xd)
    return jnp.stack(
        [x[..., 0] * cam.fx + cam.cx, x[..., 1] * cam.fy + cam.cy], axis=-1
    )


# TUM RGB-D presets (Examples/RGB-D/TUM{1,2,3}.yaml in the reference
# lineage; SURVEY.md §3.3). DepthMapFactor 5000 applies to the 16-bit PNGs.
TUM1 = Pinhole(fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
               width=640, height=480, bf=40.0,
               k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314)
TUM2 = Pinhole(fx=520.908620, fy=521.007327, cx=325.141442, cy=249.701764,
               width=640, height=480, bf=40.0,
               k1=0.231222, k2=-0.784899, p1=-0.003257, p2=-0.000105, k3=0.917205)
TUM3 = Pinhole(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
               width=640, height=480, bf=40.0)
# Bonn RGB-D Dynamic dataset (the reference's second evaluation set,
# SURVEY.md §1): Asus Xtion Pro Live, rectified 640x480 stream, same
# TUM file layout + 5000 depth factor. Intrinsics from the dataset's
# published calibration (approximate to the digits shown; override via
# --config for a specific recalibration).
BONN = Pinhole(fx=542.822841, fy=542.576870, cx=315.593520, cy=237.756098,
               width=640, height=480, bf=40.0)
DEPTH_MAP_FACTOR = 5000.0
