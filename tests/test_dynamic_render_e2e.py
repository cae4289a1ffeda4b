"""Rendered dynamic-scene end-to-end gate (VERDICT r1 #1, SURVEY.md §4.2+§4.5).

The product's headline claim, exercised as ONE pipeline on IMAGES:
front-end (pyramid/FAST/BRIEF) -> LK flow evidence -> consensus-audited
pose solves -> CRF labeling -> dynamic culling + spawn gating -> mapping.

Scenario: the synthetic analog of TUM walking_* — a large textured rigid
billboard (1.8x2.2 m person-sized mover) ENTERS an already-anchored
static scene mid-sequence and sweeps across until it dominates the view
(~50%+ of detected features by the end). This is the realistic hard
case: statics anchor the map first, then the mover must be rejected by
flow evidence + CRF labels + spawn gating as it grows.

Envelope note (measured, round 2): a mover of that size already in view
AT BOOTSTRAP with a constant velocity is geometrically ILL-POSED for any
geometry-only defense — both the static-world and the mover-world
interpretations are self-consistent rigid scenes, and all consensus
hypotheses land in the same basin. The reference fork faces the same
physics; TUM walking sequences are the entering case, which is what this
gate pins. Small movers at bootstrap are covered by
tests/test_crf.py's capture-defense tests.
"""

import dataclasses

import numpy as np
import pytest

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N_FRAMES = 48


def _world():
    # Camera tracks x = k/59 - 0.5 (60-frame "line" normalization keeps
    # inter-frame image motion in the TUM-like 3-8 px band). The
    # billboard starts out of view at x=-3.5 and sweeps +x at 0.07
    # m/frame: it enters the frustum around k~12 and covers most of the
    # image by k~45.
    return SyntheticWorld(
        cam=TUM3, n_frames=60, n_static=1400, n_dynamic=0, seed=7,
        trajectory="line", billboard=True,
        bb_center0=(-3.5, 0.0, 2.4), bb_speed=0.07,
        bb_size=(1.8, 2.2), bb_n_dots=170,
    )


def _run(defended: bool):
    world = _world()
    cfg = SLAMConfig()
    if not defended:
        cfg = dataclasses.replace(
            cfg,
            pose_opt=dataclasses.replace(
                cfg.pose_opt, consensus_hypotheses=0),
        )
    slam = SLAMSystem(TUM3, cfg, enable_crf=defended)
    dyn_alive_mid = []
    for k in range(N_FRAMES):
        f = world.frame(k, render=True)
        slam.track_rgbd(f.image, f.depth_image, f.timestamp)
        if defended and k in (24, 32, 40):
            # while the mover is growing on screen, its points must be
            # kept out of (or neutralized in) the live map: spawn gating
            # blocks them at KF creation, CRF labels + culling mop up
            # any that slip through
            m = slam.map
            alive = np.asarray(m.p_alive)
            gtd = world.bb_gt_dynamic(np.asarray(m.p_xyz), n=k + 1) & alive
            trusted = gtd & ~(np.asarray(m.p_dyn) > 0.5)
            dyn_alive_mid.append(int(trusted.sum()))
    ts_est, poses = slam.get_trajectory()
    gt_t, gt = world.groundtruth()
    ate = evaluate_ate(ts_est, poses, gt_t, gt).rmse
    lost = sum(1 for s in slam.stats if s.get("status", 1) != 1)
    m = slam.map
    alive = np.asarray(m.p_alive)
    gtd = world.bb_gt_dynamic(np.asarray(m.p_xyz), n=N_FRAMES) & alive
    trusted = gtd & ~(np.asarray(m.p_dyn) > 0.5)
    return dict(
        ate=ate, lost=lost, alive=int(alive.sum()),
        dyn_alive=int(gtd.sum()),
        dyn_trusted=int(trusted.sum()),
        # mover points the CRF has had evidence to judge (>= 4
        # visibilities) yet still trusts — the strict failure signal;
        # end-of-run fresh spawns are inherently unjudged (the paper's
        # long-term-consistency premise needs observations)
        dyn_judged_trusted=int(
            (trusted & (np.asarray(m.p_visible) >= 4)).sum()),
        dyn_alive_mid=dyn_alive_mid,
        fp_rate=float(
            ((np.asarray(m.p_dyn) > 0.5) & alive & ~gtd).sum()
            / max((alive & ~gtd).sum(), 1)
        ),
    )


@pytest.mark.slow
class TestRenderedDynamicScene:
    def test_defended_beats_undefended_4x(self):
        d = _run(defended=True)
        u = _run(defended=False)
        # the entering mover must actually break the undefended tracker
        # (measured ~0.27 m RMSE: the solver follows the billboard) ...
        assert u["ate"] > 0.08, u
        # ... and the full defense chain must fix it, decisively
        # (measured ~0.006 m: ~48x better)
        assert d["ate"] < u["ate"] / 4.0, (d, u)
        assert d["ate"] < 0.03, d
        assert d["lost"] == 0, d
        # mid-run, the live map never trusts more than a handful of
        # mover points (spawn gate + CRF labels + culling)
        assert max(d["dyn_alive_mid"], default=0) <= 20, d
        # final map is essentially mover-free, without shredding statics:
        # JUDGED mover points (enough history for the CRF) must be rare;
        # end-of-run unjudged spawns are bounded looser (same structure
        # as the sweep-billboard reconciliation gate)
        assert d["dyn_judged_trusted"] <= max(5, 0.02 * d["alive"]), d
        assert d["dyn_trusted"] <= max(8, 0.08 * d["alive"]), d
        assert d["fp_rate"] < 0.30, d
        assert d["alive"] >= 120, d

    def test_throughput_mode_parity_on_dynamic_world(self):
        """track_sequence (fused-chunk scan; KFs inserted in-scan, LK
        flow evidence + spawn gating batched across the chunk) must hold
        the defended accuracy bar ON A DYNAMIC WORLD, not just the
        static one (VERDICT r1 item 10). CRF cadence differs (per chunk
        vs per frame), so the gate is the absolute defended bar, not
        bitwise pose equality."""
        world = _world()
        frames = [world.frame(k, render=True) for k in range(N_FRAMES)]
        grays = np.stack([f.image for f in frames]).astype(np.float32)
        depths = np.stack(
            [f.depth_image for f in frames]).astype(np.float32)
        ts = np.asarray([f.timestamp for f in frames])
        slam = SLAMSystem(TUM3, SLAMConfig(), enable_crf=True)
        poses = slam.track_sequence(grays, depths, ts, chunk=6)
        assert poses.shape == (N_FRAMES - 1, 4, 4)
        ts_est, pe = slam.get_trajectory()
        gt_t, gt = world.groundtruth()
        ate = evaluate_ate(ts_est, pe, gt_t, gt).rmse
        assert ate < 0.03, ate
        # keyframes were inserted mid-chunk (not only at chunk ends)
        assert len(slam.kf_log) >= 3
        # the in-scan spawn gate kept the entering mover out of the map
        m = slam.map
        alive = np.asarray(m.p_alive)
        gtd = world.bb_gt_dynamic(
            np.asarray(m.p_xyz), n=N_FRAMES) & alive
        trusted = gtd & ~(np.asarray(m.p_dyn) > 0.5)
        assert trusted.sum() <= max(5, 0.05 * alive.sum()), (
            int(trusted.sum()), int(alive.sum()))
