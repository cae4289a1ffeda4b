"""SE(3) / SO(3) Lie-group operations, batch-friendly and jit-safe.

Replaces the role of g2o's SE3Quat + Converter.cc in the reference
(SURVEY.md §3.1: `Converter.cc`, g2o `types_six_dof_expmap`) with pure
functional JAX. Poses are (4,4) row-major matrices T = [[R, t], [0, 1]]
mapping world→camera (Tcw) unless stated otherwise. Twists are 6-vectors
[upsilon (3, translation), omega (3, rotation)], matching the g2o ordering
so update conventions from the reference's optimizer transfer.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(w: jax.Array) -> jax.Array:
    """||w|| differentiable at 0 (gradient 0 instead of NaN), keepdims."""
    return jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True) + 1e-30)


def hat_so3(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee_so3(W: jax.Array) -> jax.Array:
    """(..., 3, 3) skew matrix -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


# Small-angle Taylor cutoffs sized for float32: the naive expressions
# ((1-cos t)/t^2, (t-sin t)/t^3, 1 - (t/2)cot(t/2), ...) cancel
# catastrophically for t below ~5e-2 in f32 — errors of order eps/t^2 that
# once corrupted every pose-update translation by millimeters and made
# tracking drift compound (found via zero-noise e2e divergence).
_SMALL_TH = 5e-2


def _sinc(x: jax.Array) -> jax.Array:
    """sin(x)/x with Taylor fallback near 0 (no cancellation, tight cut)."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)  # avoid 0/0 in the untaken branch
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def _cosc(x: jax.Array) -> jax.Array:
    """(1-cos(x))/x^2 with Taylor fallback near 0."""
    small = jnp.abs(x) < _SMALL_TH
    xs = jnp.where(small, 1.0, x)
    x2 = x * x
    return jnp.where(
        small, 0.5 - x2 / 24.0 + x2 * x2 / 720.0,
        (1.0 - jnp.cos(xs)) / (xs * xs),
    )


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = _safe_norm(w)
    th = theta[..., None]  # (..., 1, 1)
    W = hat_so3(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + _sinc(th) * W + _cosc(th) * (W @ W)


def log_so3(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) axis-angle.

    Via the quaternion (Shepperd extraction, numerically stable for all
    angles including near pi): w = 2 atan2(|q_v|, q_w) * q_v / |q_v|.
    """
    q = rotmat_to_quat(R)
    qv = q[..., :3]
    sin_half = jnp.linalg.norm(qv, axis=-1)
    cos_half = q[..., 3]
    theta = 2.0 * jnp.arctan2(sin_half, cos_half)
    # theta/sin_half -> 2 + theta^2/12 as theta -> 0
    small = sin_half < 1e-6
    scale = jnp.where(small, 2.0, theta / jnp.where(small, 1.0, sin_half))
    return scale[..., None] * qv


def _left_jacobian(w: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(w): V matrix of SE(3) exp."""
    theta = _safe_norm(w)
    th = theta[..., None]
    W = hat_so3(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = th < _SMALL_TH
    ths = jnp.where(small, 1.0, th)
    th2 = th * th
    A = jnp.where(
        small, 0.5 - th2 / 24.0 + th2 * th2 / 720.0,
        (1.0 - jnp.cos(ths)) / (ths * ths),
    )
    B = jnp.where(
        small, 1.0 / 6.0 - th2 / 120.0 + th2 * th2 / 5040.0,
        (ths - jnp.sin(ths)) / (ths * ths * ths),
    )
    return I + A * W + B * (W @ W)


def _left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta = _safe_norm(w)
    th = theta[..., None]
    W = hat_so3(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = th < _SMALL_TH
    ths = jnp.where(small, 1.0, th)
    half = 0.5 * ths
    th2 = th * th
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0 + th2 * th2 / 30240.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (ths * ths),
    )
    return I - 0.5 * W + cot_term * (W @ W)


def exp_se3(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) [upsilon, omega] -> (..., 4, 4) transform."""
    ups, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    V = _left_jacobian(w)
    t = (V @ ups[..., None])[..., 0]
    return make_se3(R, t)


def log_se3(T: jax.Array) -> jax.Array:
    """(..., 4, 4) transform -> (..., 6) twist [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    Vinv = _left_jacobian_inv(w)
    ups = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([ups, w], axis=-1)


def make_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def orthonormalize_se3(T: jax.Array) -> jax.Array:
    """Project the rotation block onto SO(3) (SVD polar projection).

    Repeated compose/inverse cycles amplify f32 non-orthogonality
    exponentially (se3_inverse uses the transpose as the inverse, which
    doubles any orthogonality defect per round trip); tracking applies
    this projection once per frame to kill the feedback loop.
    """
    R = T[..., :3, :3]
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.ones(T.shape[:-2] + (3,), T.dtype)
    S = S.at[..., 2].set(jnp.where(det < 0, -1.0, 1.0))
    R_o = U @ (S[..., :, None] * Vt)
    return make_se3(R_o, T[..., :3, 3])


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(Rt @ t[..., None])[..., 0])


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return A @ B


def se3_apply(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., 3)."""
    return (T[..., :3, :3] @ p[..., None])[..., 0] + T[..., :3, 3]


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) as (qx, qy, qz, qw) [TUM order] -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> quaternion (..., 4) as (qx, qy, qz, qw), w >= 0.

    Branch-free Shepperd-style: compute all four candidate quadruples and
    select by the largest diagonal combination (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _cand(s_sq, x, y, z, w):
        s = 2.0 * jnp.sqrt(jnp.maximum(s_sq, _EPS))
        return jnp.stack([x / s, y / s, z / s, w / s], axis=-1)

    s0 = 1.0 + tr
    c0 = _cand(s0, m21 - m12, m02 - m20, m10 - m01, s0)
    s1 = 1.0 + m00 - m11 - m22
    c1 = _cand(s1, s1, m01 + m10, m02 + m20, m21 - m12)
    s2 = 1.0 - m00 + m11 - m22
    c2 = _cand(s2, m01 + m10, s2, m12 + m21, m02 - m20)
    s3 = 1.0 - m00 - m11 + m22
    c3 = _cand(s3, m02 + m20, m12 + m21, s3, m10 - m01)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)
