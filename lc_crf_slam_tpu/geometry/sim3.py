"""Sim(3) operations for loop closing / essential-graph optimization.

Replaces g2o's `types_seven_dof_expmap` in the reference (SURVEY.md §3.1).
A Sim3 element is represented as a tuple of arrays (s, R, t) with
s: (...,) scale, R: (..., 3, 3), t: (..., 3); it maps p -> s * R @ p + t.
For RGB-D the reference fixes s = 1 (`Sim3Solver::mbFixScale`), which the
pose-graph solver honors by zeroing the scale tangent coordinate.

Tangent parameterization (7,): [upsilon (3), omega (3), sigma (1)] with
scale s = exp(sigma).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import hat_so3, exp_so3, log_so3

_EPS = 1e-8


def sim3_identity(dtype=jnp.float32):
    return (
        jnp.ones((), dtype),
        jnp.eye(3, dtype=dtype),
        jnp.zeros((3,), dtype),
    )


def sim3_apply(S, p: jax.Array) -> jax.Array:
    s, R, t = S
    return s[..., None] * (R @ p[..., None])[..., 0] + t


def sim3_compose(A, B):
    """(A ∘ B)(p) = A(B(p))."""
    sa, Ra, ta = A
    sb, Rb, tb = B
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta,
    )


def sim3_inverse(S):
    s, R, t = S
    s_inv = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    return (s_inv, Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0])


def _sim3_W(w: jax.Array, sigma: jax.Array) -> jax.Array:
    """The 'W' matrix of the Sim(3) exponential: t = W @ upsilon.

    Closed form (cf. Strasdat's ScaViSLAM derivation), with Taylor fallbacks
    for small sigma and/or small theta.
    """
    theta = jnp.linalg.norm(w, axis=-1)
    Wx = hat_so3(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Wx.shape)
    s = jnp.exp(sigma)

    # f32-sized cutoffs: the generic closed forms cancel catastrophically
    # for small sigma/theta (see se3._SMALL_TH note)
    small_sig = jnp.abs(sigma) < 2e-2
    small_th = theta < 5e-2
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)

    # A-coefficient for I term
    A = jnp.where(
        small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig_safe
    )

    # Coefficients for Wx and Wx^2 terms
    th2 = th_safe * th_safe
    sig2 = sig_safe * sig_safe
    denom = sig2 + th2
    a = s * jnp.sin(th_safe)
    b = s * jnp.cos(th_safe)
    # generic case (sigma != 0, theta != 0)
    C_gen = (a * sig_safe + (1.0 - b) * th_safe) / (th_safe * denom)
    D_gen = (
        A - ((b - 1.0) * sig_safe + a * th_safe) / denom
    ) / th2
    # sigma ~ 0, theta != 0
    C_sig0 = (1.0 - jnp.cos(th_safe)) / th2
    D_sig0 = (th_safe - jnp.sin(th_safe)) / (th2 * th_safe)
    # theta ~ 0, any sigma
    C_th0 = jnp.where(
        small_sig, 0.5 + sigma / 6.0 + sigma * sigma / 24.0,
        ((sig_safe - 1.0) * s + 1.0) / sig2,
    )
    D_th0 = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 24.0 + sigma * sigma / 120.0,
        (s * (0.5 * sig2 - sig_safe + 1.0) - 1.0) / (sig2 * sig_safe),
    )
    # theta-small corrections with sigma cross-terms are O(th^2) — the
    # Taylor branches above are exact enough inside the cutoffs
    C = jnp.where(small_th, C_th0, jnp.where(small_sig, C_sig0, C_gen))
    D = jnp.where(small_th, D_th0, jnp.where(small_sig, D_sig0, D_gen))
    return (
        A[..., None, None] * I
        + C[..., None, None] * Wx
        + D[..., None, None] * (Wx @ Wx)
    )


def exp_sim3(xi: jax.Array):
    """(..., 7) [upsilon, omega, sigma] -> Sim3 tuple."""
    ups, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = exp_so3(w)
    s = jnp.exp(sigma)
    W = _sim3_W(w, sigma)
    t = (W @ ups[..., None])[..., 0]
    return (s, R, t)


def log_sim3(S) -> jax.Array:
    """Sim3 tuple -> (..., 7) twist. Inverts exp_sim3 via solving W u = t."""
    s, R, t = S
    sigma = jnp.log(s)
    w = log_so3(R)
    W = _sim3_W(w, sigma)
    ups = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([ups, w, sigma[..., None]], axis=-1)


def sim3_from_se3(T: jax.Array):
    """(..., 4, 4) SE3 -> Sim3 with s = 1."""
    return (
        jnp.ones(T.shape[:-2], T.dtype),
        T[..., :3, :3],
        T[..., :3, 3],
    )


def se3_from_sim3(S) -> jax.Array:
    """Sim3 -> (..., 4, 4) SE3, folding scale into translation.

    Matches the reference's CorrectLoop convention: Tiw = [R/1, t/s]
    (scale divided out of the translation when converting a corrected
    Sim3 keyframe pose back to SE3).
    """
    from .se3 import make_se3

    s, R, t = S
    return make_se3(R, t / s[..., None])
