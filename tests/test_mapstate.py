"""Map-state allocator: dead-slot recycling and reference scrubbing.

The reference's map points are heap objects — culling one
(MapPoint::SetBadFlag) erases it from every observing KeyFrame and frees
the memory, so a long run is bounded by the LIVE map size. The
fixed-capacity SoA map must match that: `add_points` reuses dead slots
(lowest index first) and `scrub_dead_obs` maintains the no-stale-
reference invariant that makes recycling safe.
"""

import numpy as np
import jax.numpy as jnp

from lc_crf_slam_tpu.config import MapConfig, SLAMConfig, TrackingConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.mapstate import (
    add_points, empty_map, scrub_dead_obs,
)
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld


def _mk(m, n, create=None):
    """Call add_points with n rows of distinct positions."""
    xyz = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    desc = jnp.full((n, 8), 7, jnp.uint32)
    normal = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    sc = jnp.ones((n,), jnp.float32)
    if create is None:
        create = jnp.ones((n,), bool)
    return add_points(m, xyz, desc, normal, sc, 10 * sc, create,
                      jnp.asarray(0))


class TestSlotReuse:
    def test_add_points_virgin_first_then_recycles(self):
        cfg = SLAMConfig(map=MapConfig(max_points=8, max_keyframes=4,
                                       max_features=16))
        m = empty_map(cfg)
        m, ids = _mk(m, 6)
        assert list(np.asarray(ids)) == [0, 1, 2, 3, 4, 5]
        assert int(m.n_points) == 6
        # cull three
        m = m._replace(p_alive=m.p_alive.at[jnp.asarray([1, 3, 4])]
                       .set(False))
        m, ids2 = _mk(m, 4)
        # virgin slots 6, 7 first (stale-ref preservation), then the
        # culled slots 1, 3 recycle under capacity pressure
        assert list(np.asarray(ids2)) == [6, 7, 1, 3]
        assert int(m.n_points) == 8          # high-water mark
        assert int(jnp.sum(m.p_alive)) == 7
        # recycled slot carries the NEW payload (row 2 of this batch)
        assert np.allclose(np.asarray(m.p_xyz[1]), [6.0, 7.0, 8.0])

    def test_capacity_respected_after_reuse(self):
        cfg = SLAMConfig(map=MapConfig(max_points=4, max_keyframes=4,
                                       max_features=16))
        m = empty_map(cfg)
        m, _ = _mk(m, 4)
        m = m._replace(p_alive=m.p_alive.at[2].set(False))
        m, ids = _mk(m, 3)
        # one free slot: first row lands in slot 2, rest dropped
        assert list(np.asarray(ids)) == [2, -1, -1]
        assert int(jnp.sum(m.p_alive)) == 4

    def test_scrub_condemns_stale_refs_only(self):
        cfg = SLAMConfig(map=MapConfig(max_points=8, max_keyframes=4,
                                       max_features=4))
        m = empty_map(cfg)
        m, _ = _mk(m, 4)
        m = m._replace(
            kf_obs=m.kf_obs.at[0].set(jnp.asarray([0, 2, 3, -1])),
            p_alive=m.p_alive.at[2].set(False),
        )
        m = scrub_dead_obs(m)
        # dead ref condemned to -2 (blocked), not freed to -1
        assert list(np.asarray(m.kf_obs[0])) == [0, -2, 3, -1]

    def test_recycle_condemns_old_refs_no_aliasing(self):
        """A keyframe observation of a culled point stays in place
        (covisibility weight, feature blocking) until the slot is
        recycled — at which point it must become -2, never an alias of
        the unrelated new point."""
        cfg = SLAMConfig(map=MapConfig(max_points=4, max_keyframes=4,
                                       max_features=4))
        m = empty_map(cfg)
        m, _ = _mk(m, 3)
        m = m._replace(
            kf_obs=m.kf_obs.at[0].set(jnp.asarray([0, 1, 2, -1])),
            p_alive=m.p_alive.at[1].set(False),
        )
        m, ids = _mk(m, 2)
        # virgin slot 3 first, then slot 1 recycled
        assert list(np.asarray(ids)) == [3, 1]
        # the old observation of dead point 1 is condemned, not aliased
        assert list(np.asarray(m.kf_obs[0])) == [0, -2, 2, -1]

    def test_recycle_tombstones_preserve_spawn_veto(self):
        """A culled dynamic point serves the spawn veto in place
        ((p_dyn>th)&(n_obs>0) reads dead slots); when its slot is
        recycled, the veto coverage must survive via the tombstone
        ring."""
        from lc_crf_slam_tpu.models.mapstate import near_dynamic_envelope

        cfg = SLAMConfig(map=MapConfig(max_points=2, max_keyframes=4,
                                       max_features=4))
        m = empty_map(cfg)
        m, _ = _mk(m, 2)
        mover_pos = jnp.asarray([[3.0, 4.0, 5.0]])   # slot 1's position
        # label slot 1 dynamic with a live observation, then cull it
        m = m._replace(
            p_dyn=m.p_dyn.at[1].set(0.9),
            p_n_obs=m.p_n_obs.at[1].set(1),
            p_alive=m.p_alive.at[1].set(False),
        )
        # dead slot still vetoes in place
        assert bool(near_dynamic_envelope(m, mover_pos, 0.5, 0.3)[0])
        # recycle slot 1 (capacity 2, no virgins left)
        m2, ids = _mk(m, 1)
        assert int(ids[0]) == 1
        # slot stats are overwritten (new point is NOT dynamic) ...
        assert float(m2.p_dyn[1]) == 0.0
        # ... but the envelope survives via the tombstone ring
        assert bool(m2.tomb_valid[0])
        assert bool(near_dynamic_envelope(m2, mover_pos, 0.5, 0.3)[0])


class TestLongRunChurn:
    def test_allocation_survives_saturation(self):
        """Under the old cursor allocator, hitting the point-capacity
        high-water mark stopped point creation FOREVER — culling freed
        nothing. Here the map is flooded to capacity mid-run with junk
        points (no observations, so the next mapping pass culls them,
        exactly like real churn); the recycling allocator must resume
        creating points in the freed slots."""
        cfg = SLAMConfig(
            tracking=TrackingConfig(max_frames_between_kf=2),
        )
        world = SyntheticWorld(cam=TUM3, n_frames=40, n_static=520,
                               n_dynamic=120, seed=3)
        slam = SLAMSystem(TUM3, cfg, enable_crf=True, enable_mapping=True)
        slam.enable_loop = False
        for k in range(10):
            f = world.frame(k)
            slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
        # flood: every free slot becomes an alive, observation-less
        # point (p_first_kf=0 makes them mature -> culled next pass)
        m = slam.map
        slam.map = m._replace(p_alive=jnp.ones_like(m.p_alive))
        assert int(jnp.sum(slam.map.p_alive)) == cfg.map.max_points
        for k in range(10, 40):
            f = world.frame(k)
            slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
        m = slam.map
        assert int(slam.ts.status) == 1, "tracking lost"
        # junk was culled and slots recycled: points were created near
        # the end of the run despite the map having been full
        alive = np.asarray(m.p_alive)
        assert alive.sum() < cfg.map.max_points // 4
        first = np.asarray(m.p_first_kf)
        n_kf = int(m.n_kfs)
        late = alive & (first >= n_kf - 3)
        assert late.sum() > 0, "no late allocations - recycling dead?"
        # (stale refs to DEAD slots are allowed by design — they carry
        # covisibility weight until the slot is recycled; per-recycle
        # aliasing protection is pinned by
        # test_recycle_condemns_old_refs_no_aliasing)
