"""Loop closing through the THROUGHPUT path (track_sequence fused
chunks) at the per-keyframe detection cadence.

VERDICT r3 ask #6: the r3 chunk program ran detect_loop once per chunk
for the chunk's LAST keyframe, so the reference's 3-consecutive-
detection consistency requirement (mnCovisibilityConsistencyTh,
LoopClosing::DetectLoop — SURVEY.md §4.4) stretched from 3 keyframes to
~3 chunks (~45 frames at chunk=15). The chunk scan now emits detection
candidates/groups for EVERY in-scan keyframe and the host advances the
consistency streak per keyframe, restoring the reference cadence.

This gate replays the rendered sweep-revisit world through
track_sequence at the bench's own chunk=15 and requires the loop to
close — with per-chunk detection the revisit's streak cannot reach 3
before the sequence ends, so the gate pins the per-KF cadence.
"""

import dataclasses as _dc

import numpy as np
import pytest

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import Pinhole
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

QVGA = Pinhole(fx=268.0, fy=270.0, cx=160.0, cy=120.0,
               width=320, height=240, bf=20.0)
N = 96


def _pan_world(n):
    """The default-config loop world (see test_loopclosure_render_e2e.
    test_pan_revisit_closes_loop_default_config): 1.2-turn pan over the
    textured wall with realistic depth noise — genuine odometry drift,
    continuous revisit, no self-heal shortcut."""
    return SyntheticWorld(
        cam=QVGA, n_frames=n, n_static=900, n_dynamic=0, seed=5,
        trajectory="pan", wall=True, pan_leadin=0.1, pan_turns=1.2,
        pan_translation=0.25, render_depth_noise=0.015,
    )


@pytest.mark.slow
def test_pan_loop_closes_in_throughput_mode():
    n = 130
    world = _pan_world(n)
    slam = SLAMSystem(QVGA, SLAMConfig(), enable_crf=True,
                      enable_mapping=True)

    frames = [world.frame(k, render=True) for k in range(n)]
    grays = np.stack([f.image for f in frames]).astype(np.float32)
    depths = np.stack([f.depth_image for f in frames]).astype(np.float32)
    ts = np.asarray([f.timestamp for f in frames])

    poses = slam.track_sequence(grays, depths, ts, chunk=15)
    assert np.isfinite(poses).all()

    # the revisit closed through the loop ladder INSIDE throughput mode
    assert len(slam.loop_log) >= 1, slam.loop_log

    ts_est, pe = slam.get_trajectory()
    gt_t, gt = world.groundtruth()
    ate = evaluate_ate(ts_est, pe, gt_t, gt).rmse
    # throughput mode trades per-frame accuracy for fps (InterruptBA
    # schedule, in-scan keyframe backpressure: ~26 KFs vs the per-frame
    # API's ~41 on this world), so its bar is looser than the per-frame
    # gate's 0.10 (measured 0.23-0.30 across chunk/gba variants vs
    # 0.042 per-frame; this 360-degree pan at ~3 deg/frame is several
    # times faster than any real handheld motion)
    assert ate < 0.35, ate
    lost = sum(1 for s in slam.stats if s.get("status", 1) != 1)
    assert lost == 0, lost


@pytest.mark.slow
def test_gba_slices_interleave_with_chunk_mapping():
    """VERDICT r4 ask #10: after a loop closes in throughput mode the
    budgeted global-BA slices (reference's detached GBA thread) pump
    one per chunk, interleaved with subsequent chunks' in-scan mapping
    mutations (triangulation, fusion, culling). The map must come out
    consistent: observation counts must match a recount of the
    observation table, the budget must drain by export, and the
    trajectory must stay clean."""
    n = 130   # chunk=10 (not the bench's 15) leaves >=2 chunks AFTER
              # the loop fires (~frame 105 on this world) so slices
              # genuinely interleave with in-scan mapping
    world = _pan_world(n)
    cfg = SLAMConfig()
    assert cfg.loop.gba_slice_iters > 0   # budgeted-slice mode is default
    slam = SLAMSystem(QVGA, cfg, enable_crf=True, enable_mapping=True)

    frames = [world.frame(k, render=True) for k in range(n)]
    grays = np.stack([f.image for f in frames]).astype(np.float32)
    depths = np.stack([f.depth_image for f in frames]).astype(np.float32)
    ts = np.asarray([f.timestamp for f in frames])

    poses = slam.track_sequence(grays, depths, ts, chunk=10)
    assert np.isfinite(poses).all()
    assert len(slam.loop_log) >= 1, slam.loop_log
    # slices actually ran against the live map (>= 2: interleaved work,
    # not one final drain)
    assert slam._gba_slices_run >= 2, slam._gba_slices_run

    ts_est, pe = slam.get_trajectory()   # drains any remaining budget
    assert slam._gba_pending is None
    gt_t, gt = world.groundtruth()
    ate = evaluate_ate(ts_est, pe, gt_t, gt).rmse
    assert ate < 0.35, ate   # throughput-mode bar, see the gate above

    # map consistency after slices interleaved with mapping mutations:
    # p_n_obs of every alive point equals the recount of its entries in
    # alive keyframes' observation tables, each weighted by the
    # reference's AddObservation rule (stereo/depth entry = 2, mono = 1)
    m = slam.map
    kf_alive = np.asarray(m.kf_alive)
    obs = np.asarray(m.kf_obs)[kf_alive]
    valid = np.asarray(m.kf_valid)[kf_alive] & (obs >= 0)
    w = 1 + (np.asarray(m.kf_ur)[kf_alive] >= 0).astype(np.int64)
    P = int(m.capacity_points)
    recount = np.bincount(obs[valid].ravel(), weights=w[valid].ravel(),
                          minlength=P)[:P].astype(np.int64)
    p_alive = np.asarray(m.p_alive)
    stored = np.asarray(m.p_n_obs)
    mismatch = p_alive & (stored != recount)
    assert mismatch.sum() == 0, (
        f"{int(mismatch.sum())} alive points with stale n_obs "
        f"(e.g. slots {np.nonzero(mismatch)[0][:5]}: stored "
        f"{stored[mismatch][:5]} vs recount {recount[mismatch][:5]})"
    )
