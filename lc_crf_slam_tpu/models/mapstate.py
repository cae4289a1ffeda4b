"""The map as a functional pytree of fixed-capacity SoA arrays.

Replaces the reference's pointer graph + mutexes (Map / MapPoint /
KeyFrame classes, SURVEY.md §3.1, §8.1) wholesale: points and keyframes
live in preallocated arrays with alive masks; every mutation is a
functional `.at[].set`; covisibility is a single incidence-matrix matmul
on the MXU instead of per-KeyFrame weight maps. This is what makes
checkpointing (§6.4), sharding (§6.7/6.8) and testing trivial.

Fork-specific per-point state (SURVEY.md §3.1 MapPoint row): a dynamic
probability `p_dyn` plus long-term consistency statistics (reprojection /
depth / flow error EMAs) consumed by the CRF labeler.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from .frame import Frame


class MapState(NamedTuple):
    # --- points (capacity P) ---
    p_xyz: jax.Array        # (P, 3) world position
    p_desc: jax.Array       # (P, 8) uint32 representative descriptor
    p_normal: jax.Array     # (P, 3) mean viewing direction
    p_min_dist: jax.Array   # (P,) scale-invariance range
    p_max_dist: jax.Array   # (P,)
    p_visible: jax.Array    # (P,) int32 times predicted visible
    p_found: jax.Array      # (P,) int32 times actually matched
    p_first_kf: jax.Array   # (P,) int32 creating keyframe
    p_n_obs: jax.Array      # (P,) int32 keyframe observations
    p_dyn: jax.Array        # (P,) float32 P(dynamic) from the CRF
    p_err_ema: jax.Array    # (P,) float32 long-term reprojection error EMA
    p_depth_err_ema: jax.Array  # (P,) float32 depth-consistency EMA
    p_flow_err: jax.Array   # (P,) float32 short-term track error
    p_last_seen: jax.Array  # (P,) int32 frame index of last visibility
    p_alive: jax.Array      # (P,) bool
    # --- keyframes (capacity F, features K) ---
    kf_Tcw: jax.Array       # (F, 4, 4)
    kf_time: jax.Array      # (F,)
    kf_alive: jax.Array     # (F,) bool
    kf_uv: jax.Array        # (F, K, 2)
    kf_ur: jax.Array        # (F, K) virtual right coord (-1 = mono)
    kf_depth: jax.Array     # (F, K)
    kf_level: jax.Array     # (F, K) int32
    kf_angle: jax.Array     # (F, K)
    kf_desc: jax.Array      # (F, K, 8) uint32
    kf_valid: jax.Array     # (F, K) bool
    kf_obs: jax.Array       # (F, K) int32 point id per feature (-1 = none)
    kf_emb: jax.Array       # (F, 256) float32 retrieval embedding
    # --- counters ---
    n_points: jax.Array     # () int32 allocation cursor
    n_kfs: jax.Array        # () int32

    @property
    def capacity_points(self) -> int:
        return self.p_xyz.shape[0]

    @property
    def capacity_kfs(self) -> int:
        return self.kf_Tcw.shape[0]


def empty_map(cfg: SLAMConfig) -> MapState:
    P = cfg.map.max_points
    F = cfg.map.max_keyframes
    K = cfg.map.max_features
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        p_xyz=jnp.zeros((P, 3), f32),
        p_desc=jnp.zeros((P, 8), jnp.uint32),
        p_normal=jnp.zeros((P, 3), f32),
        p_min_dist=jnp.zeros((P,), f32),
        p_max_dist=jnp.full((P,), 1e9, f32),
        p_visible=jnp.ones((P,), i32),
        p_found=jnp.ones((P,), i32),
        p_first_kf=jnp.zeros((P,), i32),
        p_n_obs=jnp.zeros((P,), i32),
        p_dyn=jnp.zeros((P,), f32),
        p_err_ema=jnp.zeros((P,), f32),
        p_depth_err_ema=jnp.zeros((P,), f32),
        p_flow_err=jnp.zeros((P,), f32),
        p_last_seen=jnp.zeros((P,), i32),
        p_alive=jnp.zeros((P,), bool),
        kf_Tcw=jnp.tile(jnp.eye(4, dtype=f32), (F, 1, 1)),
        kf_time=jnp.zeros((F,), f32),
        kf_alive=jnp.zeros((F,), bool),
        kf_uv=jnp.zeros((F, K, 2), f32),
        kf_ur=jnp.full((F, K), -1.0, f32),
        kf_depth=jnp.zeros((F, K), f32),
        kf_level=jnp.zeros((F, K), i32),
        kf_angle=jnp.zeros((F, K), f32),
        kf_desc=jnp.zeros((F, K, 8), jnp.uint32),
        kf_valid=jnp.zeros((F, K), bool),
        kf_obs=jnp.full((F, K), -1, i32),
        kf_emb=jnp.zeros((F, 256), f32),
        n_points=jnp.asarray(0, i32),
        n_kfs=jnp.asarray(0, i32),
    )


def _descriptor_embedding(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(K, 8) uint32 -> (256,) mean-bit retrieval embedding, centered.

    The brute-force TPU replacement for the DBoW2 vocabulary
    (SURVEY.md §3.2): per-keyframe descriptor-set statistics compared by
    cosine similarity, followed by geometric verification. Centered at
    0.5 so cosine similarity is informative.
    """
    from ..ops.orb import unpack_bits

    bits = unpack_bits(desc).astype(jnp.float32)       # (K, 256)
    w = valid.astype(jnp.float32)[:, None]
    mean = jnp.sum(bits * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    emb = mean - 0.5
    return emb / jnp.maximum(jnp.linalg.norm(emb), 1e-6)


def add_keyframe(
    m: MapState, frame: Frame, Tcw: jax.Array, timestamp: jax.Array,
    obs_point: jax.Array,
) -> Tuple[MapState, jax.Array]:
    """Insert a keyframe at the allocation cursor (functional).

    obs_point: (K,) int32 map-point id matched to each frame feature
    (-1 none). Overflow beyond capacity drops the new KF silently
    (callers can check the returned index against capacity).
    """
    f = jnp.minimum(m.n_kfs, m.capacity_kfs - 1)
    in_cap = m.n_kfs < m.capacity_kfs
    upd = lambda arr, val: arr.at[f].set(jnp.where(in_cap, val, arr[f]))
    m = m._replace(
        kf_Tcw=upd(m.kf_Tcw, Tcw),
        kf_time=upd(m.kf_time, timestamp),
        kf_alive=upd(m.kf_alive, in_cap),
        kf_uv=upd(m.kf_uv, frame.uv),
        kf_ur=upd(m.kf_ur, frame.u_right),
        kf_depth=upd(m.kf_depth, frame.depth),
        kf_level=upd(m.kf_level, frame.level),
        kf_angle=upd(m.kf_angle, frame.angle),
        kf_desc=upd(m.kf_desc, frame.desc),
        kf_valid=upd(m.kf_valid, frame.valid),
        kf_obs=upd(m.kf_obs, jnp.where(frame.valid, obs_point, -1)),
        kf_emb=upd(m.kf_emb, _descriptor_embedding(frame.desc, frame.valid)),
        n_kfs=m.n_kfs + in_cap.astype(jnp.int32),
    )
    # bump n_obs for observed points (dump slot = capacity, NOT -1: JAX
    # wraps negative dynamic indices even in drop mode, which would
    # silently corrupt the last point's stats)
    obs = jnp.where(
        in_cap & frame.valid & (obs_point >= 0), obs_point, m.capacity_points
    )
    m = m._replace(
        p_n_obs=m.p_n_obs.at[obs].add(1, mode="drop"),
    )
    return m, f


def add_points(
    m: MapState,
    xyz: jax.Array,        # (M, 3)
    desc: jax.Array,       # (M, 8) uint32
    normal: jax.Array,     # (M, 3)
    min_dist: jax.Array,   # (M,)
    max_dist: jax.Array,   # (M,)
    create: jax.Array,     # (M,) bool — which rows actually allocate
    owner_kf: jax.Array,   # () int32
) -> Tuple[MapState, jax.Array]:
    """Allocate up to M new points; returns per-row new ids (-1 where not
    created or out of capacity). Allocation is compacted so invalid rows
    don't burn capacity."""
    M = xyz.shape[0]
    order = jnp.cumsum(create.astype(jnp.int32)) - 1  # slot within batch
    ids = jnp.where(create, m.n_points + order, -1)
    ids = jnp.where(ids < m.capacity_points, ids, -1)
    tgt = jnp.where(ids >= 0, ids, m.capacity_points)  # drop mode target
    m = m._replace(
        p_xyz=m.p_xyz.at[tgt].set(xyz, mode="drop"),
        p_desc=m.p_desc.at[tgt].set(desc, mode="drop"),
        p_normal=m.p_normal.at[tgt].set(normal, mode="drop"),
        p_min_dist=m.p_min_dist.at[tgt].set(min_dist, mode="drop"),
        p_max_dist=m.p_max_dist.at[tgt].set(max_dist, mode="drop"),
        p_first_kf=m.p_first_kf.at[tgt].set(owner_kf, mode="drop"),
        p_n_obs=m.p_n_obs.at[tgt].set(1, mode="drop"),
        p_visible=m.p_visible.at[tgt].set(1, mode="drop"),
        p_found=m.p_found.at[tgt].set(1, mode="drop"),
        p_dyn=m.p_dyn.at[tgt].set(0.0, mode="drop"),
        p_err_ema=m.p_err_ema.at[tgt].set(0.0, mode="drop"),
        p_depth_err_ema=m.p_depth_err_ema.at[tgt].set(0.0, mode="drop"),
        p_flow_err=m.p_flow_err.at[tgt].set(0.0, mode="drop"),
        p_last_seen=m.p_last_seen.at[tgt].set(
            jnp.asarray(0, jnp.int32), mode="drop"
        ),
        p_alive=m.p_alive.at[tgt].set(True, mode="drop"),
        n_points=jnp.minimum(
            m.n_points + jnp.sum(create.astype(jnp.int32)),
            m.capacity_points,
        ),
    )
    return m, ids


def incidence_matrix(m: MapState) -> jax.Array:
    """(F, P) float32 KF-point incidence from kf_obs (alive rows only)."""
    F, K = m.kf_obs.shape
    P = m.capacity_points
    rows = jnp.repeat(jnp.arange(F), K)
    cols = jnp.where(
        (m.kf_obs >= 0) & m.kf_valid & m.kf_alive[:, None], m.kf_obs, P
    ).reshape(-1)
    A = jnp.zeros((F, P + 1), jnp.float32).at[rows, cols].add(1.0)
    return jnp.minimum(A[:, :P], 1.0)


def covisibility(m: MapState) -> jax.Array:
    """(F, F) shared-point counts — one MXU matmul replaces
    KeyFrame::UpdateConnections bookkeeping. Diagonal zeroed."""
    A = incidence_matrix(m)
    W = A @ A.T
    return W * (1.0 - jnp.eye(A.shape[0], dtype=W.dtype))


def observed_mask(m: MapState, kf_ids: jax.Array) -> jax.Array:
    """(P,) bool: points observed by any of the given keyframes (padded
    with -1)."""
    obs = jnp.where(
        (kf_ids[:, None] >= 0), m.kf_obs[jnp.maximum(kf_ids, 0)], -1
    )  # (n, K)
    P = m.capacity_points
    flat = jnp.where(obs >= 0, obs, P).reshape(-1)
    mask = jnp.zeros((P + 1,), bool).at[flat].set(True)
    return mask[:P] & m.p_alive
