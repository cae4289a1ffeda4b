"""Batched binary-descriptor matching: XOR + popcount on the VPU.

TPU-native replacement for `ORBmatcher` (SURVEY.md §3.1): instead of
per-feature candidate loops with grid lookups, matching is a dense
(masked) distance matrix over fixed-capacity descriptor sets — queries x
candidates popcount, gating masks folded in as +inf distance, mutual-best
/ ratio / rotation-histogram checks as batched reductions. Thresholds
follow the reference (TH_LOW=50, TH_HIGH=100, 30-bin rotation histogram,
top-3 bins kept).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

INVALID_DIST = 10_000


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """(N, 8) uint32 x (M, 8) uint32 -> (N, M) int32 Hamming distances."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


class MatchResult(NamedTuple):
    idx: jax.Array      # (N,) best candidate index in b (undefined if !valid)
    dist: jax.Array     # (N,) best distance
    valid: jax.Array    # (N,) bool


def match_nn(
    dist: jax.Array,
    mask: Optional[jax.Array] = None,
    max_dist: int = 50,
    ratio: float = 1.0,
    mutual: bool = False,
) -> MatchResult:
    """Row-wise nearest neighbor with optional gating mask / ratio / mutual
    checks.

    dist: (N, M) distances; mask: (N, M) bool of admissible pairs.
    ratio < 1 applies Lowe's test best < ratio * second-best
    (reference mfNNratio). mutual requires column-argmin agreement
    (the reference achieves uniqueness via its rotation/duplicate checks;
    mutual-best is the batched equivalent).
    """
    d = dist if mask is None else jnp.where(mask, dist, INVALID_DIST)
    neg = -d
    top2, top2_idx = jax.lax.top_k(neg, 2)  # most-negative = smallest dist
    best = -top2[:, 0]
    second = -top2[:, 1]
    idx = top2_idx[:, 0]
    valid = best <= max_dist
    if ratio < 1.0:
        valid &= best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    if mutual:
        col_best = jnp.argmin(d, axis=0)  # (M,)
        valid &= col_best[idx] == jnp.arange(d.shape[0])
    return MatchResult(idx=idx, dist=best, valid=valid)


def resolve_duplicates(idx: jax.Array, dist: jax.Array, valid: jax.Array,
                       n_candidates: int) -> jax.Array:
    """Keep only the lowest-distance row per candidate column.

    Batched replacement for the reference's 'if candidate already matched,
    keep the better' bookkeeping. Returns an updated valid mask.
    """
    d = jnp.where(valid, dist, INVALID_DIST)
    # per-column minimum distance over rows that chose that column
    col_min = jnp.full((n_candidates,), INVALID_DIST, d.dtype).at[idx].min(d)
    keep = d <= col_min[idx]
    # break exact-distance ties by row order: first row with that distance wins
    rows = jnp.arange(idx.shape[0])
    first_row = jnp.full((n_candidates,), idx.shape[0], rows.dtype).at[idx].min(
        jnp.where(keep & valid, rows, idx.shape[0])
    )
    return valid & keep & (rows == first_row[idx])


def rotation_consistency(
    angle_q: jax.Array,
    angle_c: jax.Array,
    valid: jax.Array,
    n_bins: int = 30,
    keep_top: int = 3,
) -> jax.Array:
    """Reference's rotation-histogram filter: histogram the per-match
    angle difference into n_bins, keep matches in the top-`keep_top` bins.

    angle_q/angle_c: (N,) radians of matched query/candidate keypoints.
    Returns updated valid mask.
    """
    two_pi = 2.0 * jnp.pi
    diff = jnp.mod(angle_q - angle_c, two_pi)  # [0, 2pi)
    bins = jnp.clip((diff * n_bins / two_pi).astype(jnp.int32), 0, n_bins - 1)
    counts = jnp.zeros((n_bins,), jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top_counts, top_bins = jax.lax.top_k(counts, keep_top)
    # reference rule (ComputeThreeMaxima): drop secondary bins with fewer
    # than 10% of the best bin's votes
    keep_bin = top_counts.astype(jnp.float32) >= 0.1 * top_counts[0].astype(
        jnp.float32
    )
    keep_bin &= top_counts > 0
    in_top = jnp.any(
        (bins[:, None] == top_bins[None, :]) & keep_bin[None, :], axis=-1
    )
    return valid & in_top


def projection_gate(
    uv_query: jax.Array,
    uv_proj: jax.Array,
    radius: jax.Array,
    level_q: Optional[jax.Array] = None,
    level_c: Optional[jax.Array] = None,
    level_tolerance: int = 1,
) -> jax.Array:
    """(N, 2) query pixels vs (M, 2) projected candidates -> (N, M) bool.

    radius may be scalar or per-candidate (M,) (the reference scales the
    search window by the candidate's pyramid level).
    """
    d2 = jnp.sum(
        (uv_query[:, None, :] - uv_proj[None, :, :]) ** 2, axis=-1
    )
    r = jnp.broadcast_to(jnp.asarray(radius, d2.dtype), (uv_proj.shape[0],))
    gate = d2 <= (r * r)[None, :]
    if level_q is not None and level_c is not None:
        dl = jnp.abs(level_q[:, None] - level_c[None, :])
        gate &= dl <= level_tolerance
    return gate
