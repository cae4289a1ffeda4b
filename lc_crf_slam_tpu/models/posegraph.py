"""Pose-graph optimization over relative-pose constraints.

Replaces `Optimizer::OptimizeEssentialGraph` (SURVEY.md §3.1/§4.4):
Gauss-Newton over SE(3) keyframe poses (RGB-D fixes scale, so the
reference's Sim3 graph degenerates to SE3; sim3.py carries the general
parameterization for completeness) with residuals
    r_e = log( T_i * T_j^{-1} * T_ij_meas^{-1} )
for edges from the sequential chain (spanning-tree analog), strong
covisibility (weight >= 100), and loop closures. Jacobians come from
jax.jacfwd over the per-edge residual (edge count and state size are
small: <= 320 KFs -> 1920 parameters, dense normal equations on the
MXU).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import exp_se3, log_se3, se3_inverse


class PoseGraph(NamedTuple):
    Tcw: jax.Array        # (F, 4, 4) initial keyframe poses
    node_valid: jax.Array  # (F,) bool
    node_fixed: jax.Array  # (F,) bool (loop KF / KF0 anchored)
    e_i: jax.Array        # (E,) int32
    e_j: jax.Array        # (E,) int32
    e_rel: jax.Array      # (E, 4, 4) measured T_i * T_j^{-1}
    e_w: jax.Array        # (E,) weight
    e_valid: jax.Array    # (E,) bool


def edge_residuals(Tcw: jax.Array, g: PoseGraph) -> jax.Array:
    """(E, 6) residual twists."""
    Ti = Tcw[g.e_i]
    Tj = Tcw[g.e_j]
    return log_se3(Ti @ se3_inverse(Tj) @ se3_inverse(g.e_rel))


def optimize_pose_graph(
    g: PoseGraph, n_iters: int = 20, lam0: float = 1e-4
) -> jax.Array:
    """Returns optimized (F, 4, 4) poses. Left-multiplicative updates
    T_i <- exp(xi_i) T_i; fixed/invalid nodes pinned."""
    F = g.Tcw.shape[0]
    free = g.node_valid & ~g.node_fixed

    def residual_of_xi(xi, Tcw):
        return edge_residuals(exp_se3(xi) @ Tcw, g)

    def body(_, carry):
        Tcw, lam = carry
        xi0 = jnp.zeros((F, 6))
        r = residual_of_xi(xi0, Tcw)                     # (E, 6)
        J = jax.jacfwd(lambda xi: residual_of_xi(xi, Tcw))(xi0)  # (E,6,F,6)
        w = jnp.where(g.e_valid, g.e_w, 0.0)
        E = r.shape[0]
        Jm = J.reshape(E * 6, F * 6)
        wv = jnp.repeat(w, 6)
        H = Jm.T @ (wv[:, None] * Jm)
        gvec = Jm.T @ (wv * r.reshape(-1))
        # pin fixed nodes
        free_diag = jnp.repeat(free.astype(H.dtype), 6)
        H = H * (free_diag[:, None] * free_diag[None, :])
        H = H + jnp.diag((1.0 - free_diag) + 1e-6)
        H = H + lam * jnp.diag(jnp.diag(H))
        delta = -jnp.linalg.solve(H, gvec * free_diag).reshape(F, 6)
        delta = delta * free[:, None]
        T_new = exp_se3(delta) @ Tcw

        def cost(T):
            rr = edge_residuals(T, g)
            return jnp.sum(w[:, None] * rr * rr)

        accept = cost(T_new) < cost(Tcw)
        Tcw = jnp.where(accept, T_new, Tcw)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-8, 1e4)
        return Tcw, lam

    Tcw, _ = jax.lax.fori_loop(
        0, n_iters, body, (g.Tcw, jnp.asarray(lam0, jnp.float32))
    )
    return Tcw


def build_graph_edges(
    m_kf_Tcw: jax.Array,
    kf_alive: jax.Array,
    n_kfs: jax.Array,
    covis: jax.Array,
    covis_strong: float,
    loop_i: jax.Array,      # (L,) loop edge endpoints (-1 = unused)
    loop_j: jax.Array,
    loop_rel: jax.Array,    # (L, 4, 4) measured relative (corrected)
    max_covis_edges: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Assemble (e_i, e_j, e_rel, e_w, e_valid): sequential chain +
    strong covisibility + loop edges. Relative measurements are taken
    from the CURRENT poses (pre-correction), as in the reference."""
    F = m_kf_Tcw.shape[0]
    # sequential chain i -> i+1 (spanning-tree analog for a KF sequence)
    seq_i = jnp.arange(F - 1, dtype=jnp.int32)
    seq_j = seq_i + 1
    seq_valid = kf_alive[seq_i] & kf_alive[seq_j] & (seq_j < n_kfs)
    # strong covisibility pairs (upper triangle)
    cv = jnp.where(
        (jnp.triu(jnp.ones((F, F), bool), 2))
        & kf_alive[:, None] & kf_alive[None, :],
        covis, 0.0,
    )
    flat = cv.reshape(-1)
    topv, topidx = jax.lax.top_k(flat, max_covis_edges)
    cv_i = (topidx // F).astype(jnp.int32)
    cv_j = (topidx % F).astype(jnp.int32)
    cv_valid = topv >= covis_strong

    L = loop_i.shape[0]
    e_i = jnp.concatenate([seq_i, cv_i, jnp.maximum(loop_i, 0)])
    e_j = jnp.concatenate([seq_j, cv_j, jnp.maximum(loop_j, 0)])
    e_valid = jnp.concatenate(
        [seq_valid, cv_valid, (loop_i >= 0) & (loop_j >= 0)]
    )
    rel_from_poses = m_kf_Tcw[e_i[: F - 1 + max_covis_edges]] @ jax.vmap(
        se3_inverse
    )(m_kf_Tcw[e_j[: F - 1 + max_covis_edges]])
    e_rel = jnp.concatenate([rel_from_poses, loop_rel])
    e_w = jnp.concatenate([
        jnp.ones((F - 1,)),
        jnp.ones((max_covis_edges,)),
        jnp.full((L,), 5.0),   # loop edges weighted up
    ])
    return e_i, e_j, e_rel, e_w, e_valid
