"""CRF dynamic-point labeler — the fork's core addition (SURVEY.md §4.5).

Builds a two-label (static/dynamic) CRF over recently observed map
points and runs mean-field inference, fully batched:
  - unary energies from long-term track-consistency statistics the
    tracker accumulates per point (reprojection-residual EMA, projected
    vs measured depth consistency, short-term flow consistency) — the
    paper's "long-term consistency" evidence [P];
  - pairwise Potts smoothing over a fixed-degree kNN graph in 3D with a
    Gaussian spatial kernel (moving objects are spatially compact);
  - fixed-iteration mean-field updates (DenseCRF-style), jit-safe.
Labels are written back to MapState.p_dyn and consumed by: the tracking
pose-optimization edge set, local-BA window (via p_alive after culling),
and MapPointCulling (mapping.cull_points).

Energy weights are config-exposed (SURVEY.md §8.3#5: exact paper weights
unverifiable with the empty reference mount; calibrated on synthetic
dynamic scenes).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from .mapstate import MapState

CRF_TRACKS = 4096   # fixed capacity of the CRF graph
RECENCY_WINDOW = 30  # frames: tracks seen within this window participate


class CRFInfo(NamedTuple):
    n_tracks: jax.Array
    n_dynamic: jax.Array
    mean_q: jax.Array


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of x over mask (0 when mask is empty)."""
    s = jnp.sort(jnp.where(mask, x, jnp.inf))
    n = jnp.sum(mask.astype(jnp.int32))
    v = s[jnp.clip(n // 2, 0, x.shape[0] - 1)]
    return jnp.where(n > 0, v, 0.0)


def noise_floors(cfg: SLAMConfig, m: MapState):
    """Self-calibrating evidence noise floors (per-cue effective sigmas).

    The configured sigmas are calibrated on noise-free rendering; real
    sensors put a noise floor under every cue (keypoint localization,
    LK photometric noise, depth speckle), and with fixed sigmas the CRF
    labels the ENTIRE static map dynamic once the floor passes the
    z-score bar — measured on the sweep world with 2-graylevel image
    noise: inliers collapse 329 -> 70 within 15 frames and tracking
    dies, while the same world with the CRF off tracks perfectly. The
    robust fix is the classic one: scale each sigma to the median of
    its own evidence EMA over mature alive tracks (statics dominate, so
    the median IS the noise floor; movers sit in the upper tail).
    Noise-free behavior is unchanged — there the medians sit below the
    configured sigmas and the max() keeps the calibrated values."""
    c = cfg.crf
    mature = m.p_alive & (m.p_visible >= 4)
    reproj_s = jnp.maximum(
        c.reproj_sigma, 1.5 * masked_median(m.p_err_ema, mature))
    depth_s = jnp.maximum(
        c.depth_sigma, 1.5 * masked_median(m.p_depth_err_ema, mature))
    flow_s = jnp.maximum(
        c.flow_sigma, 1.5 * masked_median(m.p_flow_err, mature))
    return reproj_s, depth_s, flow_s


def unary_energies(cfg: SLAMConfig, m: MapState, ids: jax.Array):
    """Static-label energy per track (dynamic-label energy is the
    constant `bias` below): accumulated inconsistency, normalized per
    cue. High inconsistency -> high static energy -> dynamic wins."""
    c = cfg.crf
    err = m.p_err_ema[ids]
    derr = m.p_depth_err_ema[ids]
    ferr = m.p_flow_err[ids]
    reproj_s, depth_s, flow_s = noise_floors(cfg, m)
    e_static = (
        c.w_reproj * jnp.square(err / reproj_s)
        + c.w_depth * jnp.square(derr / depth_s)
        + c.w_flow * jnp.square(ferr / flow_s)
    )
    # clip: one catastrophic residual shouldn't saturate the energy
    e_static = jnp.minimum(e_static, 25.0)
    u_static = e_static - jnp.log(c.prior_static)
    u_dyn = c.dynamic_bias - jnp.log(1.0 - c.prior_static)
    return u_static, jnp.full_like(u_static, u_dyn)


def knn_graph(cfg: SLAMConfig, xyz: jax.Array, ok: jax.Array):
    """Fixed-degree kNN over 3D positions with Gaussian weights.

    Returns (nbr_idx (N, k), w (N, k)) with zero weight on invalid pairs.
    """
    c = cfg.crf
    N = xyz.shape[0]
    k = min(c.knn, N - 1)
    d2 = jnp.sum(
        jnp.square(xyz[:, None, :] - xyz[None, :, :]), axis=-1
    )
    d2 = jnp.where(ok[:, None] & ok[None, :], d2, jnp.inf)
    d2 = d2 + jnp.where(jnp.eye(N, dtype=bool), jnp.inf, 0.0)  # no self
    neg, nbr = jax.lax.top_k(-d2, k)
    d2k = -neg
    w = c.pairwise_weight * jnp.exp(-d2k / (2.0 * c.spatial_sigma**2))
    w = jnp.where(jnp.isfinite(d2k), w, 0.0)
    return nbr, w


def mean_field(
    cfg: SLAMConfig, u_static, u_dyn, nbr, w, ok
) -> jax.Array:
    """Fixed-iteration two-label mean-field; returns q_dyn (N,)."""

    def body(_, q_dyn):
        q_static = 1.0 - q_dyn
        # Potts message: cost of disagreeing with neighbors
        msg_dyn = jnp.sum(w * q_static[nbr], axis=-1)     # cost if I'm dyn
        msg_static = jnp.sum(w * q_dyn[nbr], axis=-1)
        ls = -(u_static + msg_static)
        ld = -(u_dyn + msg_dyn)
        mx = jnp.maximum(ls, ld)
        q = jnp.exp(ld - mx) / (jnp.exp(ls - mx) + jnp.exp(ld - mx))
        return jnp.where(ok, q, 0.0)

    q0 = jnp.where(ok, 1.0 - cfg.crf.prior_static, 0.0)
    return jax.lax.fori_loop(0, cfg.crf.mean_field_iters, body, q0)


def crf_step(
    cfg: SLAMConfig, m: MapState, frame_idx: jax.Array
) -> Tuple[MapState, CRFInfo]:
    """Label recently-seen tracks and write q(dynamic) back to the map."""
    recent = m.p_alive & (
        (frame_idx - m.p_last_seen) <= RECENCY_WINDOW
    )
    # participating tracks need at least some history
    recent &= m.p_visible >= 2
    sel_score = recent.astype(jnp.float32)
    _, ids = jax.lax.top_k(sel_score, CRF_TRACKS)
    ok = recent[ids]

    u_static, u_dyn = unary_energies(cfg, m, ids)
    nbr, w = knn_graph(cfg, m.p_xyz[ids], ok)
    q_dyn = mean_field(cfg, u_static, u_dyn, nbr, w, ok)

    tgt = jnp.where(ok, ids, m.capacity_points)
    m = m._replace(p_dyn=m.p_dyn.at[tgt].set(q_dyn, mode="drop"))
    info = CRFInfo(
        n_tracks=jnp.sum(ok.astype(jnp.int32)),
        n_dynamic=jnp.sum(
            (ok & (q_dyn > cfg.crf.dynamic_threshold)).astype(jnp.int32)
        ),
        mean_q=jnp.sum(jnp.where(ok, q_dyn, 0.0))
        / jnp.maximum(jnp.sum(ok.astype(jnp.int32)), 1),
    )
    return m, info
