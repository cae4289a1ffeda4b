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


TOMB_CAP = 512            # dynamic-tombstone ring capacity


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
    # spanning-tree remnant for trajectory export (the reference's
    # SaveTrajectoryTUM walks pKF->GetParent() while the reference KF is
    # bad, SURVEY.md §6.4): when a KF is culled, its pose is frozen
    # RELATIVE to a live anchor so later pose-graph / global-BA
    # corrections still reach every frame that referenced it.
    kf_anchor: jax.Array    # (F,) int32 anchor KF set at cull time (-1 alive)
    kf_Tca: jax.Array       # (F, 4, 4) Tcw_culled @ inv(Tcw_anchor) at cull
    # --- dynamic tombstones (ring buffer, capacity D) ---
    # positions of recycled slots that were still serving the dynamic
    # spawn veto. The veto's envelope must outlive the points (a mover
    # is re-ingested every KF otherwise); culled slots keep serving it
    # in place until the allocator reuses them, at which moment
    # add_points snapshots them here. Ring overwrite is the aging
    # policy.
    tomb_xyz: jax.Array     # (D, 3) float32
    tomb_valid: jax.Array   # (D,) bool
    tomb_n: jax.Array       # () int32 ring cursor (total ever)
    # --- counters ---
    n_points: jax.Array     # () int32 high-water allocation mark
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
        kf_anchor=jnp.full((F,), -1, i32),
        kf_Tca=jnp.tile(jnp.eye(4, dtype=f32), (F, 1, 1)),
        tomb_xyz=jnp.zeros((TOMB_CAP, 3), f32),
        tomb_valid=jnp.zeros((TOMB_CAP,), bool),
        tomb_n=jnp.asarray(0, i32),
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
    # silently corrupt the last point's stats). Reference nObs
    # semantics (MapPoint::AddObservation): a stereo/depth-backed
    # observation counts 2, a monocular one counts 1 — every
    # observation-count threshold in the pipeline (TrackedMapPoints
    # minObs=3, culling bars, KF redundancy) assumes this weighting.
    obs = jnp.where(
        in_cap & frame.valid & (obs_point >= 0), obs_point, m.capacity_points
    )
    w = obs_weight(frame.u_right)
    m = m._replace(
        p_n_obs=m.p_n_obs.at[obs].add(w, mode="drop"),
    )
    return m, f


def obs_weight(u_right: jax.Array) -> jax.Array:
    """Reference MapPoint::AddObservation weight: 2 for stereo/depth
    observations (virtual right coordinate present), 1 for mono."""
    return jnp.where(u_right >= 0, 2, 1).astype(jnp.int32)


def add_points(
    m: MapState,
    xyz: jax.Array,        # (M, 3)
    desc: jax.Array,       # (M, 8) uint32
    normal: jax.Array,     # (M, 3)
    min_dist: jax.Array,   # (M,)
    max_dist: jax.Array,   # (M,)
    create: jax.Array,     # (M,) bool — which rows actually allocate
    owner_kf: jax.Array,   # () int32
    tomb_dyn_threshold: float = 0.5,
    n_obs_init: int = 0,
) -> Tuple[MapState, jax.Array]:
    """Allocate up to M new points; returns per-row new ids (-1 where not
    created or out of capacity). Allocation is compacted so invalid rows
    don't burn capacity, and it REUSES dead slots (lowest index first):
    culled and fused-away points return their slots to the allocator, so
    a long run is bounded by the LIVE map size, not by total points ever
    created (the reference's heap allocation has the same property;
    MapPoint.cc SetBadFlag frees the object). Safe because fusion
    remaps references and culling's stale references are condemned
    below at the moment their slot is reallocated, so no keyframe
    observation can alias a recycled slot."""
    M = xyz.shape[0]
    order = jnp.cumsum(create.astype(jnp.int32)) - 1  # slot within batch
    # allocation order: VIRGIN slots (beyond the high-water mark) in
    # index order first, then culled dead slots, then nothing. Culled
    # slots are only recycled under real capacity pressure: their stale
    # keyframe refs carry covisibility weight and block their features
    # (reference parity — a bad MapPoint's memory lives on until the
    # allocator actually needs it), so eager reuse measurably shrinks
    # and degrades the map (billboard world: 124 -> 88 alive points).
    idx = jnp.arange(m.capacity_points, dtype=jnp.int32)
    virgin = ~m.p_alive & (idx >= m.n_points)
    key = jnp.where(virgin, 0, jnp.where(m.p_alive, 2, 1))
    free = jnp.argsort(key, stable=True)
    n_free = m.capacity_points - jnp.sum(m.p_alive.astype(jnp.int32))
    ok = create & (order < n_free)
    ids = jnp.where(ok, free[jnp.where(ok, order, 0)], -1)
    tgt = jnp.where(ids >= 0, ids, m.capacity_points)  # drop mode target
    # LAZY reference scrub: keyframe observations referencing a culled
    # point stay in place until its slot is actually recycled (they
    # contribute covisibility weight and keep the feature blocked from
    # re-triangulation, exactly like the reference's not-yet-erased
    # bad-point observations). Here — the moment of reuse — any ref to
    # a slot being reallocated is condemned to -2 so it can never alias
    # the new point; -2 keeps the feature blocked (see create_new_points
    # free-feature test and fuse's attach path).
    recycled = jnp.zeros((m.capacity_points + 1,), bool).at[tgt].set(
        True, mode="drop"
    )[:-1]
    stale = (m.kf_obs >= 0) & recycled[jnp.maximum(m.kf_obs, 0)]
    m = m._replace(kf_obs=jnp.where(stale, -2, m.kf_obs))
    # tombstone the recycled slots that were still serving the dynamic
    # spawn veto — (p_dyn > th) & (p_n_obs > 0), the exact predicate
    # near_dynamic_envelope applies to live slots — so the veto's
    # coverage is unchanged by recycling. Recording at cull time
    # instead was measured to OVER-veto: BA pruning drives most mover
    # points to p_n_obs == 0 before culling, and keeping those in the
    # envelope blankets the mover's whole swept path, starving static
    # spawns nearby (billboard world: 124 -> 102 alive).
    was_veto = (
        recycled & (m.p_dyn > tomb_dyn_threshold) & (m.p_n_obs > 0)
    )
    D = m.tomb_xyz.shape[0]
    t_order = jnp.cumsum(was_veto.astype(jnp.int32)) - 1
    t_pos = jnp.where(was_veto, (m.tomb_n + t_order) % D, D)
    m = m._replace(
        tomb_xyz=m.tomb_xyz.at[t_pos].set(m.p_xyz, mode="drop"),
        tomb_valid=m.tomb_valid.at[t_pos].set(True, mode="drop"),
        tomb_n=m.tomb_n + jnp.sum(was_veto.astype(jnp.int32)),
    )
    m = m._replace(
        p_xyz=m.p_xyz.at[tgt].set(xyz, mode="drop"),
        p_desc=m.p_desc.at[tgt].set(desc, mode="drop"),
        p_normal=m.p_normal.at[tgt].set(normal, mode="drop"),
        p_min_dist=m.p_min_dist.at[tgt].set(min_dist, mode="drop"),
        p_max_dist=m.p_max_dist.at[tgt].set(max_dist, mode="drop"),
        p_first_kf=m.p_first_kf.at[tgt].set(owner_kf, mode="drop"),
        # n_obs seed: 0 — observations are counted where their
        # keyframe entries are recorded (add_keyframe's weighted bump,
        # create_new_points' explicit bumps). The r1-r4 code seeded 1
        # here AND bumped at add_keyframe, double counting fresh
        # points (found by the n_obs==recount invariant in
        # test_loop_throughput_e2e)
        p_n_obs=m.p_n_obs.at[tgt].set(n_obs_init, mode="drop"),
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
        # high-water allocation mark: max slot index ever used + 1
        # (kept monotone so `p_xyz[:n_points]` still covers every slot
        # that was ever written; live count = sum(p_alive))
        n_points=jnp.maximum(
            m.n_points, jnp.max(jnp.where(ids >= 0, ids + 1, 0))
        ),
    )
    return m, ids


def scrub_dead_obs(m: MapState) -> MapState:
    """Condemn (-2) every keyframe observation referencing a dead slot.

    NOT called in the live pipeline — there, stale refs to culled
    points intentionally persist (covisibility weight + feature
    blocking, reference parity) and are condemned lazily by
    `add_points` at slot-recycle time. This eager variant is a test /
    maintenance utility: after it, kf_obs never indexes a dead slot.

    The sentinel is -2, NOT -1: a culled point's features must stay
    BLOCKED from re-triangulation and re-attachment (`== -1` is the
    free-feature test). A rigid mover's features triangulate
    consistently between two keyframes — setting them free would
    re-ingest the mover every mapping pass (measured: defended ATE
    0.006 -> 0.033 on the billboard world)."""
    ref = m.kf_obs
    dead_ref = (ref >= 0) & ~m.p_alive[jnp.maximum(ref, 0)]
    return m._replace(kf_obs=jnp.where(dead_ref, -2, ref))


def near_dynamic_envelope(
    m: MapState, xyz: jax.Array, dyn_threshold: float, sigma: float,
) -> jax.Array:
    """(Q,) bool: query positions within `sigma` of the dynamic
    envelope — slots labeled dynamic that are still OBSERVED
    ((p_dyn > th) & (p_n_obs > 0); alive or culled-but-not-recycled),
    plus the tombstone ring of recycled ones. The n_obs > 0 filter is
    load-bearing: BA pruning drives most mover points to zero
    observations, and including them blankets the mover's swept path,
    vetoing true statics (measured 124 -> 102 alive points). The spawn
    path uses this so a moving object is not re-ingested every
    keyframe (SURVEY.md §4.5: labels gate map growth)."""
    dyn_sel = (m.p_dyn > dyn_threshold) & (m.p_n_obs > 0)
    k = min(512, m.capacity_points)
    _, dyn_ids = jax.lax.top_k(dyn_sel.astype(jnp.float32), k)
    dyn_ok = dyn_sel[dyn_ids]
    d2 = jnp.sum((xyz[:, None, :] - m.p_xyz[dyn_ids][None, :, :]) ** 2,
                 axis=-1)
    near = jnp.any((d2 <= sigma * sigma) & dyn_ok[None, :], axis=1)
    d2t = jnp.sum((xyz[:, None, :] - m.tomb_xyz[None, :, :]) ** 2, axis=-1)
    near |= jnp.any((d2t <= sigma * sigma) & m.tomb_valid[None, :], axis=1)
    return near


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
