"""System facade: the user-facing SLAM object.

TPU-native counterpart of the reference's `System.cc` (SURVEY.md §3.1):
constructs the map + tracking state, jit-compiles the pipeline stages,
exposes `track_rgbd` (TrackRGBD), trajectory export (SaveTrajectoryTUM /
SaveKeyFrameTrajectoryTUM), reset, and checkpointing. The reference's
four OS threads become jitted step functions dispatched asynchronously
from one Python driver — device dispatch overlap supplies the pipeline
parallelism (SURVEY.md §3.4).
"""

from __future__ import annotations

import json
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry.camera import Pinhole
from ..geometry.se3 import se3_inverse
from .frame import Frame, build_frame, frame_from_observations
from .mapstate import MapState, empty_map
from .crf import crf_step
from .loopclosing import (
    correct_loop,
    correct_loop_sim3,
    detect_loop,
    global_ba,
    relocalize,
    search_and_fuse,
    verify_loop,
)
from .mapping import mapping_step
from ..ops.lk_flow import lk_track
from ..utils.profiling import StageTimer
from .tracking import (
    TrackState,
    empty_track_state,
    initialize_map,
    insert_keyframe,
    track_step,
)


class SLAMSystem:
    """Single-session RGB-D SLAM. Not thread-safe by design: the map is a
    functional pytree, so there is nothing to lock (SURVEY.md §6.2)."""

    def __init__(self, cam: Pinhole, cfg: Optional[SLAMConfig] = None,
                 log_path: Optional[str] = None, enable_mapping: bool = True,
                 enable_crf: Optional[bool] = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a "frames" axis —
        track_sequence then shards the chunk's batched front-end and
        optical-flow stages (embarrassingly parallel across the chunk's
        frames) over the mesh's devices; the sequential tracking scan
        stays replicated and XLA gathers the per-frame products over ICI
        (SURVEY.md §3.4 DP analog for the pipeline itself). Chunk length
        should be a multiple of the mesh size."""
        self.cam = cam
        self.cfg = cfg or SLAMConfig()
        self.mesh = mesh
        self.map: MapState = empty_map(self.cfg)
        self.ts: TrackState = empty_track_state(self.cfg)
        self.enable_mapping = enable_mapping
        self.enable_crf = (
            self.cfg.crf.enabled if enable_crf is None else enable_crf
        )
        self.initialized = False
        # Per-frame trajectory stored RELATIVE to the frame's reference
        # keyframe — (t, Tcr 4x4, ref_kf) with Tcw_frame = Tcr @ Tcw_ref —
        # mirroring System::SaveTrajectoryTUM (reference src/System.cc):
        # composing with the CURRENT keyframe pose at save time means
        # loop-closure / global-BA corrections retroactively fix every
        # exported frame, not just keyframes. ref_kf = -1 ⇒ absolute
        # (pre-initialization frames). Entries may hold device arrays;
        # they resolve lazily in get_trajectory().
        self.trajectory: List[tuple] = []   # (t, Tcr 4x4, ref_kf)
        self.kf_log: List[tuple] = []       # (t, kf_idx)
        self.stats: List[dict] = []
        self.timer = StageTimer()
        self._log_fh = open(log_path, "w") if log_path else None
        self._n_logged = 0
        self._capacity_warned = False

        # jit-compiled stages (cfg/cam static)
        self._build_frame = jax.jit(build_frame, static_argnums=(0, 1))
        self._init_map = jax.jit(initialize_map, static_argnums=(0, 1))
        self._track = jax.jit(track_step, static_argnums=(0, 1))
        self._insert_kf = jax.jit(insert_keyframe, static_argnums=(0, 1))
        self._mapping = jax.jit(mapping_step, static_argnums=(0, 1))
        self._crf = jax.jit(crf_step, static_argnums=(0,))
        self._detect_loop = jax.jit(detect_loop, static_argnums=(0,))
        self._verify_loop = jax.jit(verify_loop, static_argnums=(0, 1))
        self._correct_loop = jax.jit(correct_loop, static_argnums=(0, 1))
        self._correct_loop_sim3 = jax.jit(
            correct_loop_sim3, static_argnums=(0, 1)
        )
        self._global_ba = jax.jit(
            global_ba, static_argnums=(0, 1, 3)
        )
        self._relocalize = jax.jit(relocalize, static_argnums=(0, 1))
        self.enable_loop = self.cfg.loop.enabled
        self._consistent_groups = []   # [(covis-group mask, streak)]
        self._last_loop_kf = -10**9
        from .mapping import fuse_duplicates

        self._fuse = jax.jit(fuse_duplicates, static_argnums=(0, 1))
        self._search_fuse = jax.jit(search_and_fuse, static_argnums=(0, 1, 4))
        self._reloc_key = jax.random.PRNGKey(7)
        self.loop_log = []
        self._last_gray = None
        # pending budgeted global BA (reference's detached GBA thread,
        # SURVEY.md §4.4): {"left": LM iters remaining, "kf": loop KF}
        self._gba_pending = None
        self._gba_slices_run = 0   # observability: slices dispatched

        def _flow_evidence(cfg, cam, m, gray_prev, gray_next,
                           last_uv, last_obs, last_valid, Tcw_new):
            """[CRF] short-term flow-consistency evidence: LK-track the
            previous frame's map-associated keypoints and compare with the
            rigid prediction from the anchored map position — dynamic
            points' actual flow departs from the egomotion prediction
            (SURVEY.md §4.5 optical-flow term)."""
            use = last_valid & (last_obs >= 0)
            res = lk_track(gray_prev, gray_next, last_uv, use,
                           n_levels=cfg.crf.flow_levels)
            pw = m.p_xyz[jnp.maximum(last_obs, 0)]
            pc = pw @ Tcw_new[:3, :3].T + Tcw_new[:3, 3]
            z = jnp.maximum(pc[:, 2], 1e-6)
            uv_pred = jnp.stack(
                [cam.fx * pc[:, 0] / z + cam.cx,
                 cam.fy * pc[:, 1] / z + cam.cy], axis=-1,
            )
            ferr = jnp.linalg.norm(res.uv_next - uv_pred, axis=-1)
            ok = use & res.ok & (pc[:, 2] > 0.05)
            tgt = jnp.where(ok, last_obs, m.capacity_points)
            decay = cfg.crf.flow_decay
            old = m.p_flow_err[jnp.maximum(last_obs, 0)]
            new = decay * old + (1 - decay) * jnp.minimum(ferr, 50.0)
            return m._replace(
                p_flow_err=m.p_flow_err.at[tgt].set(new, mode="drop")
            )

        self._flow_evidence = jax.jit(_flow_evidence, static_argnums=(0, 1))

        def _spawn_flow_dyn(cfg, cam, gray_cur, gray_prev, uv, depth,
                            valid, Tcw_cur, Tcw_prev):
            """[CRF] spawn gate: LK-track the CURRENT frame's keypoints
            backward into the previous image and compare with the rigid
            prediction; keypoints on a moving surface depart by the
            object's image motion and must not become map points
            (otherwise a large mover re-pollutes the map every keyframe
            and its fresh points capture the next pose solve)."""
            from ..geometry.se3 import se3_inverse as inv
            Twc = inv(Tcw_cur)
            x = (uv[:, 0] - cam.cx) / cam.fx * depth
            y = (uv[:, 1] - cam.cy) / cam.fy * depth
            pc = jnp.stack([x, y, depth], axis=-1)
            pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
            pprev = pw @ Tcw_prev[:3, :3].T + Tcw_prev[:3, 3]
            z = jnp.maximum(pprev[:, 2], 1e-6)
            uv_pred = jnp.stack(
                [cam.fx * pprev[:, 0] / z + cam.cx,
                 cam.fy * pprev[:, 1] / z + cam.cy], axis=-1,
            )
            use = valid & (depth > 0)
            res = lk_track(gray_cur, gray_prev, uv, use,
                           n_levels=cfg.crf.flow_levels)
            mism = jnp.linalg.norm(res.uv_next - uv_pred, axis=-1)
            return (use & res.ok & (pprev[:, 2] > 0.05)
                    & (mism > cfg.crf.spawn_flow_gate))

        self._spawn_flow_dyn = jax.jit(_spawn_flow_dyn, static_argnums=(0, 1))
        self._last_Tcw = None

    def _set_sensor(self, mode: str) -> None:
        """Pin the config's sensor mode to the entry point in use (the
        reference fixes eSensor at System construction). Must happen
        before the first frame — switching later would both retrace the
        jitted stages and change keyframe policy mid-run."""
        if self.cfg.sensor == mode:
            return
        if self.initialized:
            raise RuntimeError(
                f"sensor mode is {self.cfg.sensor!r}; cannot switch to "
                f"{mode!r} after initialization"
            )
        self.cfg = self.cfg.replace(sensor=mode)

    # ------------------------------------------------------------------ api
    def track_rgbd(self, gray, depth, timestamp: float) -> np.ndarray:
        """Process one RGB-D frame; returns Tcw (4, 4) numpy."""
        self._set_sensor("rgbd")
        gray = jnp.asarray(gray, jnp.float32)
        with self.timer.stage("frontend"):
            frame = self._build_frame(
                self.cam, self.cfg, gray, jnp.asarray(depth, jnp.float32),
            )
        return self._track_frame(frame, timestamp, gray=gray)

    def track_monocular(self, gray, timestamp: float) -> np.ndarray:
        """System::TrackMonocular — single image in, pose out.

        Bootstraps via two-view essential-matrix initialization
        (models/initializer.py); afterwards the standard pipeline runs
        with mono-only observations and triangulation-backed new points
        (mapping.create_new_points)."""
        self._set_sensor("monocular")
        gray = jnp.asarray(gray, jnp.float32)
        frame = self._build_frame(
            self.cam, self.cfg, gray, jnp.zeros_like(gray),
        )
        frame = frame._replace(
            depth=jnp.zeros_like(frame.depth),
            u_right=jnp.full_like(frame.u_right, -1.0),
        )
        if not self.initialized:
            return self._try_mono_init(frame, timestamp, gray)
        return self._track_frame(frame, timestamp, gray=gray)

    def _try_mono_init(self, frame, timestamp: float, gray) -> np.ndarray:
        from ..ops.match import hamming_matrix, match_nn, projection_gate
        from .initializer import initialize_mono
        from .mapstate import add_keyframe, add_points
        from .tracking import empty_track_state

        if getattr(self, "_mono_ref", None) is None:
            if int(frame.valid.sum()) > 100:
                self._mono_ref = (frame, timestamp)
            self.trajectory.append((timestamp, np.eye(4), -1))
            self.stats.append({"t": timestamp, "event": "mono_wait"})
            return np.eye(4)
        ref, t_ref = self._mono_ref
        dist = hamming_matrix(ref.desc, frame.desc)
        gate = ref.valid[:, None] & frame.valid[None, :]
        gate &= projection_gate(ref.uv, frame.uv, 100.0)
        mm = match_nn(dist, mask=gate, max_dist=self.cfg.matcher.th_low,
                      ratio=0.9, mutual=True)
        self._reloc_key, sub = jax.random.split(self._reloc_key)
        res = initialize_mono(
            self.cam, ref.uv, frame.uv[mm.idx], mm.valid, sub,
        )
        if not bool(res.accepted):
            # reference resets the reference frame if init keeps failing
            if int(mm.valid.sum()) < 100:
                self._mono_ref = (frame, timestamp)
            self.trajectory.append((timestamp, np.eye(4), -1))
            self.stats.append({"t": timestamp, "event": "mono_init_fail"})
            return np.eye(4)
        # build the initial map: KF(ref)=I, KF(cur)=Tcw2, triangulated pts
        K = self.cfg.map.max_features
        normal = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (K, 1))
        dist_c = jnp.linalg.norm(res.xyz, axis=-1)
        max_d = dist_c * self.cfg.orb.scale_factor ** ref.level.astype(
            jnp.float32)
        min_d = max_d / self.cfg.orb.scale_factor ** (
            self.cfg.orb.n_levels - 1)
        self.map, ids = add_points(
            self.map, res.xyz, ref.desc, normal, min_d, max_d, res.ok,
            jnp.asarray(0),
            tomb_dyn_threshold=self.cfg.crf.dynamic_threshold,
            n_obs_init=0,   # both add_keyframe bumps below count
        )
        self.map, kf0 = add_keyframe(
            self.map, ref, jnp.eye(4), jnp.asarray(t_ref), ids,
        )
        cur_obs = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(res.ok, mm.idx, K - 1)
        ].set(jnp.where(res.ok, ids, -1), mode="drop")
        self.map, kf1 = add_keyframe(
            self.map, frame, res.Tcw2, jnp.asarray(timestamp), cur_obs,
        )
        ts = empty_track_state(self.cfg)._replace(
            Tcw=res.Tcw2,
            last_uv=frame.uv, last_ur=frame.u_right,
            last_depth=frame.depth, last_level=frame.level,
            last_angle=frame.angle, last_desc=frame.desc,
            last_valid=frame.valid, last_obs=cur_obs,
            ref_kf=kf1,
            ref_matches=jnp.sum((cur_obs >= 0).astype(jnp.int32)),
            status=jnp.asarray(1, jnp.int32),
        )
        self.ts = ts
        self.initialized = True
        self._mono_ref = None
        # the init frame IS keyframe kf1 → identity relative pose
        self.trajectory.append((timestamp, np.eye(4), kf1))
        self.stats.append({
            "t": timestamp, "event": "mono_init",
            "n_points": int(self.map.n_points),
        })
        self._last_gray = gray
        return np.asarray(res.Tcw2)

    def _make_stereo_frame(self, gray_left, gray_right) -> Frame:
        """Both eyes' front-ends + epipolar row match -> depth-carrying
        left Frame (Frame::ComputeStereoMatches, SURVEY.md §3.1)."""
        from ..ops.stereo import stereo_match

        fl = self._build_frame(
            self.cam, self.cfg, jnp.asarray(gray_left, jnp.float32),
            jnp.zeros_like(jnp.asarray(gray_left, jnp.float32)),
        )
        fr = self._build_frame(
            self.cam, self.cfg, jnp.asarray(gray_right, jnp.float32),
            jnp.zeros_like(jnp.asarray(gray_right, jnp.float32)),
        )
        u_right, depth = stereo_match(
            self.cam, fl.uv, fl.level, fl.desc, fl.valid,
            fr.uv, fr.level, fr.desc, fr.valid,
        )
        return fl._replace(u_right=u_right, depth=depth)

    def track_stereo(self, gray_left, gray_right, timestamp: float) -> np.ndarray:
        """System::TrackStereo — stereo pair in, pose out. Features are
        extracted in both images; left features gain depth via epipolar
        row matching (ops/stereo.py), then the RGB-D pipeline applies."""
        self._set_sensor("stereo")
        frame = self._make_stereo_frame(gray_left, gray_right)
        return self._track_frame(frame, timestamp,
                                 gray=jnp.asarray(gray_left, jnp.float32))

    def track_sequence_stereo(self, grays_left, grays_right, timestamps,
                              chunk: int = 8) -> np.ndarray:
        """Throughput mode for STEREO input (TrackStereo semantics at
        track_sequence speed): both eyes' front-ends and the epipolar
        row match (ops/stereo.py) run inside the fused chunk program;
        everything downstream of the depth-carrying Frame is the RGB-D
        chunk machinery unchanged. Returns (N, 4, 4) poses Tcw."""
        return self.track_sequence(grays_left, grays_right, timestamps,
                                   chunk=chunk, stereo=True)

    def track_sequence(self, grays, depths, timestamps,
                       chunk: int = 8, stereo: bool = False) -> np.ndarray:
        """Throughput mode: track N frames as chunked lax.scan programs —
        zero host round-trips inside a chunk (this is how bench.py
        measures frames/s).

        Keyframe fidelity matches the per-frame API exactly: EVERY frame
        that requests a keyframe inserts it (and runs the mapping pass)
        right there inside the scan step, under a `lax.cond` — on TPU the
        conditional executes only the taken branch, so non-KF frames pay
        ~nothing and no frame is ever re-tracked. Padded tail steps
        freeze the carry, so they never pollute frame counters or CRF
        evidence EMAs. The full defense chain runs in-scan: LK flow
        evidence (pose-independent, hoisted out of the scan and batched
        across the chunk) updates the CRF unary every frame, and in-scan
        keyframes apply the backward-flow spawn gate. Deviations from
        the per-frame API: CRF relabeling runs once per chunk (not per
        frame), and loop-closure detection once per chunk when it
        contains a keyframe (the dynamic-world parity gate in
        tests/test_tracking_e2e.py bounds the effect).
        Returns (N, 4, 4) camera poses Tcw."""
        import jax

        grays = jnp.asarray(grays, jnp.float32)
        depths = jnp.asarray(depths, jnp.float32)   # stereo: right grays
        n = grays.shape[0]
        if not self.initialized:
            # pass the device slices directly — np.asarray here would
            # fetch the frames back to host (and block on the whole
            # stack's upload: ~2 s over a tunneled TPU link)
            if stereo:
                self.track_stereo(grays[0], depths[0],
                                  float(timestamps[0]))
            else:
                self.track_rgbd(grays[0], depths[0], float(timestamps[0]))
            grays, depths = grays[1:], depths[1:]
            timestamps = timestamps[1:]
            n -= 1

        if getattr(self, "_scan_chunk_fn", None) is None or \
                self._scan_chunk_len != chunk or \
                getattr(self, "_scan_chunk_caps", None) != (
                    self.enable_mapping, self.enable_crf,
                    self.enable_loop, stereo):
            cfg, cam = self.cfg, self.cam
            with_mapping = self.enable_mapping
            with_crf = self.enable_crf
            with_loop = self.enable_loop
            # InterruptBA analog: in-scan mapping always has the next
            # frame pending, so local BA runs the shortened schedule
            # (see LocalBAConfig.interrupt_iters_*)
            import dataclasses as _dc
            cfg_map = _dc.replace(
                cfg,
                local_ba=_dc.replace(
                    cfg.local_ba,
                    outer_iters_1=cfg.local_ba.interrupt_iters_1,
                    outer_iters_2=cfg.local_ba.interrupt_iters_2,
                ),
                mapping=_dc.replace(
                    cfg.mapping,
                    triang_neighbors=cfg.mapping.interrupt_triang_neighbors,
                    fuse_reverse_neighbors=(
                        cfg.mapping.interrupt_fuse_reverse_neighbors
                    ),
                ))
            # queue-backpressure analog (see TrackingConfig): the chunk's
            # track_step computes need_kf under the throttled minimum gap
            cfg = _dc.replace(
                cfg, tracking=_dc.replace(
                    cfg.tracking,
                    min_frames_between_kf=max(
                        cfg.tracking.min_frames_between_kf,
                        cfg.tracking.interrupt_min_kf_gap,
                    )))

            spawn_gate = with_crf and cfg.crf.spawn_flow_gate > 0
            mesh = self.mesh
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                def shard_frames(x):
                    return jax.lax.with_sharding_constraint(
                        x, NamedSharding(
                            mesh,
                            PartitionSpec(*(("frames",) + (None,) * (x.ndim - 1))),
                        )
                    )
            else:
                shard_frames = None

            @jax.jit
            def run_chunk(m, ts, grays, depths, valid, tstamps, allow_kf,
                          gray_prev0):
                # keyframe insertion + mapping + CRF run INSIDE the chunk
                # program: on a remote/tunneled TPU every extra dispatch
                # and fetch is a full round trip, and they made the
                # throughput API latency-bound (the reference's mapping
                # thread analog, fused into the same device program)

                # Chunk front-end: all frames' pyramids/FAST/BRIEF up
                # front. With a mesh the batch VMAPs and shards over the
                # "frames" device axis — each device extracts its slice
                # of the chunk and XLA all-gathers the (small) keypoint
                # products for the tracking scan. Single-device the
                # front-end SCANS instead: the per-keypoint dynamic ops
                # (patch slices, grid top-k) lower to markedly slower
                # batched gathers under vmap (measured on v5e,
                # benchmarks/fe_micro.py: 6.3 ms/frame scanned vs 10.4
                # vmapped for the identical 30-frame front-end).
                if stereo:
                    # both eyes' front-ends + the epipolar row match,
                    # folded into the same per-frame scan (depths IS
                    # the right-eye gray stack in stereo mode)
                    from ..ops.stereo import stereo_match

                    def fe_stereo(_, gg):
                        g_l, g_r = gg
                        zl = jnp.zeros_like(g_l)
                        fl = build_frame(cam, cfg, g_l, zl)
                        fr_ = build_frame(cam, cfg, g_r, zl)
                        ur, dep = stereo_match(
                            cam, fl.uv, fl.level, fl.desc, fl.valid,
                            fr_.uv, fr_.level, fr_.desc, fr_.valid,
                        )
                        return None, fl._replace(u_right=ur, depth=dep)

                    if shard_frames is not None:
                        grays = shard_frames(grays)
                        depths = shard_frames(depths)
                        frames = jax.vmap(
                            lambda g, d: fe_stereo(None, (g, d))[1]
                        )(grays, depths)
                        frames = jax.tree.map(shard_frames, frames)
                    else:
                        _, frames = jax.lax.scan(
                            fe_stereo, None, (grays, depths))
                elif shard_frames is not None:
                    grays = shard_frames(grays)
                    depths = shard_frames(depths)
                    frames = jax.vmap(
                        lambda g, d: build_frame(cam, cfg, g, d)
                    )(grays, depths)
                    frames = jax.tree.map(shard_frames, frames)
                else:
                    _, frames = jax.lax.scan(
                        lambda _, gd: (None, build_frame(cam, cfg, *gd)),
                        None, (grays, depths),
                    )

                prev_grays = jnp.concatenate(
                    [gray_prev0[None], grays[:-1]], axis=0)
                if with_crf:
                    # forward LK (frame k-1 kps -> image k): flow-vs-
                    # rigid evidence for the CRF unary (SURVEY.md §4.5).
                    # Pose-independent, so hoisted out of the scan and
                    # batched across the chunk. The BACKWARD pass (spawn
                    # gating) runs inside do_kf below: only keyframe
                    # steps pay it (the always-on doubled batch was ~25%
                    # of the whole pipeline's device time for the ~25%
                    # of frames that insert keyframes).
                    prev_uvs = jnp.concatenate(
                        [ts.last_uv[None], frames.uv[:-1]], axis=0)
                    ones = jnp.ones(prev_uvs.shape[:2], bool)
                    if shard_frames is not None:
                        # mesh path: vmap + shard over the frames axis
                        prev_grays_lk = shard_frames(prev_grays)
                        prev_uvs = shard_frames(prev_uvs)
                        flow = jax.vmap(
                            lambda a, b, c, d: lk_track(
                                a, b, c, d,
                                n_levels=cfg.crf.flow_levels)
                        )(prev_grays_lk, grays, prev_uvs, ones)
                        fwd_uv = shard_frames(flow.uv_next)
                        fwd_ok = shard_frames(flow.ok)
                    else:
                        # single device: scan — like the front-end, the
                        # per-keypoint window slices lower to slower
                        # batched gathers under vmap (measured 9.7
                        # ms/pair scanned vs 14.5 vmapped on v5e)
                        _, flow = jax.lax.scan(
                            lambda _, x: (None, lk_track(
                                *x, n_levels=cfg.crf.flow_levels)),
                            None, (prev_grays, grays, prev_uvs, ones),
                        )
                        fwd_uv, fwd_ok = flow.uv_next, flow.ok
                else:
                    K = frames.uv.shape[1]
                    fwd_uv = jnp.zeros_like(frames.uv)
                    fwd_ok = jnp.zeros((grays.shape[0], K), bool)

                def _project(cam, Tcw, pw):
                    pc = pw @ Tcw[:3, :3].T + Tcw[:3, 3]
                    z = jnp.maximum(pc[:, 2], 1e-6)
                    uv = jnp.stack(
                        [cam.fx * pc[:, 0] / z + cam.cx,
                         cam.fy * pc[:, 1] / z + cam.cy], axis=-1)
                    return uv, pc[:, 2]

                def step(carry, inp):
                    m, ts = carry
                    fr, v, tstamp, f_uv, f_ok, g_cur, g_prev = inp
                    prev_obs = ts.last_obs
                    prev_valid = ts.last_valid
                    Tcw_prev = ts.Tcw
                    ts2, m2, info = track_step(cfg, cam, m, ts, fr)
                    kf_here = v & info.need_kf & allow_kf

                    def do_kf(m2, ts2):
                        flow_dyn = None
                        if spawn_gate:
                            # backward LK (this frame's kps -> previous
                            # image) vs the rigid prediction (mirrors
                            # _spawn_flow_dyn). Runs INSIDE the taken
                            # branch: only keyframe steps pay the LK
                            # chain (the hoisted always-on batch doubled
                            # the chunk's LK cost for ~25% utilization)
                            res_b = lk_track(
                                g_cur, g_prev, fr.uv,
                                fr.valid & (fr.depth > 0),
                                n_levels=cfg.crf.flow_levels,
                            )
                            Twc = se3_inverse(ts2.Tcw)
                            x = (fr.uv[:, 0] - cam.cx) / cam.fx * fr.depth
                            y = (fr.uv[:, 1] - cam.cy) / cam.fy * fr.depth
                            pc = jnp.stack([x, y, fr.depth], axis=-1)
                            pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
                            uv_pred, zprev = _project(cam, Tcw_prev, pw)
                            mism = jnp.linalg.norm(
                                res_b.uv_next - uv_pred, axis=-1)
                            flow_dyn = (
                                fr.valid & (fr.depth > 0) & res_b.ok
                                & (zprev > 0.05)
                                & (mism > cfg.crf.spawn_flow_gate))
                        m3, ts3 = insert_keyframe(
                            cfg, cam, m2, ts2, fr, info.obs, tstamp,
                            info.near_map, flow_dyn,
                        )
                        if with_mapping:
                            m3 = mapping_step(cfg_map, cam, m3, ts3.ref_kf)
                        return m3, ts3

                    # on TPU only the taken branch executes: non-KF
                    # frames pay ~nothing for the fused mapping pass
                    m2, ts2 = jax.lax.cond(
                        kf_here, do_kf, lambda a, b: (a, b), m2, ts2)
                    # per-KEYFRAME loop detection (the reference's
                    # DetectLoop cadence — r3 detected once per chunk
                    # for the chunk's last KF only, which stretched the
                    # 3-consecutive-detection consistency requirement
                    # from 3 keyframes to ~3 chunks): each in-scan KF
                    # step emits its own candidates/groups; the host
                    # advances the consistency streak per KF from the
                    # chunk's one packed fetch.
                    if with_loop:
                        topk = cfg.loop.retrieval_topk
                        F = m2.capacity_kfs
                        lc_v, lc_c, lc_g = jax.lax.cond(
                            kf_here,
                            lambda: (lambda lc: (
                                lc.valid, lc.cands, lc.groups))(
                                detect_loop(cfg, m2, ts2.ref_kf)),
                            lambda: (jnp.asarray(False),
                                     jnp.full((topk,), -1, jnp.int32),
                                     jnp.zeros((topk, F), bool)),
                        )
                    else:
                        lc_v = jnp.asarray(False)
                        lc_c = jnp.zeros((0,), jnp.int32)
                        lc_g = jnp.zeros((0, 0), bool)
                    if with_crf:
                        # flow-consistency EMA update at the new pose
                        # (mirrors _flow_evidence, LK precomputed above)
                        use = prev_valid & (prev_obs >= 0)
                        pw = m2.p_xyz[jnp.maximum(prev_obs, 0)]
                        uv_pred, zcur = _project(cam, ts2.Tcw, pw)
                        ferr = jnp.linalg.norm(f_uv - uv_pred, axis=-1)
                        okf = use & f_ok & (zcur > 0.05)
                        tgt = jnp.where(okf, prev_obs, m2.capacity_points)
                        decay = cfg.crf.flow_decay
                        old = m2.p_flow_err[jnp.maximum(prev_obs, 0)]
                        new = decay * old + (1 - decay) * jnp.minimum(
                            ferr, 50.0)
                        m2 = m2._replace(
                            p_flow_err=m2.p_flow_err.at[tgt].set(
                                new, mode="drop"))
                    sel = lambda new, old: jax.tree.map(
                        lambda a, b: jnp.where(v, a, b), new, old)
                    # frame pose relative to its reference KF at track
                    # time (SaveTrajectoryTUM semantics — composed with
                    # the corrected KF pose at export)
                    Tcr = ts2.Tcw @ se3_inverse(m2.kf_Tcw[ts2.ref_kf])
                    out = (ts2.Tcw, Tcr, kf_here, ts2.ref_kf, ts2.status,
                           lc_v & v, lc_c, lc_g)
                    return (sel(m2, m), sel(ts2, ts)), out

                (m, ts), outs = jax.lax.scan(
                    step, (m, ts),
                    (frames, valid, tstamps, fwd_uv, fwd_ok,
                     grays, prev_grays),
                )
                (Tcw_seq, Tcr_seq, kf_flags, refkf_seq, status_seq,
                 lc_valid, lc_cands, lc_groups) = outs
                if with_crf:
                    m, _ = crf_step(cfg, m, ts.frame_idx)
                return m, ts, (Tcw_seq, Tcr_seq, kf_flags, refkf_seq,
                               status_seq, ts.ref_kf, m.n_kfs,
                               lc_valid, lc_cands, lc_groups)

            self._scan_chunk_fn = run_chunk
            self._scan_chunk_len = chunk
            self._scan_chunk_caps = (with_mapping, with_crf,
                                     self.enable_loop, stereo)

        loc_only = getattr(self, "_localization_only", False)
        allow_kf = jnp.asarray(not loc_only)
        poses = []
        phases = getattr(self, "seq_phases", None)  # optional profiling
        i = 0
        while i < n:
            j = min(i + chunk, n)
            take = j - i
            g = grays[i:j]
            d = depths[i:j]
            valid = np.zeros((chunk,), bool)
            valid[:take] = True
            tst = np.zeros((chunk,), np.float32)
            tst[:take] = timestamps[i:j]
            if take < chunk:    # pad the tail chunk to keep shapes static
                pad = chunk - take
                g = jnp.concatenate([g, jnp.repeat(g[-1:], pad, 0)])
                d = jnp.concatenate([d, jnp.repeat(d[-1:], pad, 0)])
            gray_prev0 = (
                self._last_gray if self._last_gray is not None else g[0]
            )
            t0 = time.perf_counter()
            m2, ts2, outs = self._scan_chunk_fn(
                self.map, self.ts, g, d, jnp.asarray(valid),
                jnp.asarray(tst), allow_kf, jnp.asarray(gray_prev0))
            self.map, self.ts = m2, ts2
            # keep the defense chain's cross-chunk context current (the
            # per-frame API shares these; mixed-mode callers rely on it)
            self._last_gray = g[take - 1]
            self._last_Tcw = ts2.Tcw
            if phases is not None:
                phases["dispatch"] += time.perf_counter() - t0
                t0 = time.perf_counter()
            # ONE packed device->host transfer per chunk
            (Tcw_np, Tcr_np, flags, refkf, statuses,
             last_kf, n_kfs, lc_valid, lc_cands, lc_groups) = \
                jax.device_get(outs)
            if phases is not None:
                phases["chunk_fetch"] += time.perf_counter() - t0
                t0 = time.perf_counter()
            poses.append(Tcw_np[:take])
            for k in range(take):
                self.trajectory.append(
                    (float(timestamps[i + k]), Tcr_np[k], int(refkf[k]))
                )
                if flags[k]:
                    self.kf_log.append(
                        (float(timestamps[i + k]), int(refkf[k])))
            if phases is not None:
                phases["host_misc"] += time.perf_counter() - t0
                t0 = time.perf_counter()
            n_lost = int((statuses[:take] == 2).sum())
            if n_lost:
                self.stats.append({
                    "event": "chunk_lost", "t": float(timestamps[j - 1]),
                    "lost_frames": n_lost,
                })
            # relocalization at the chunk boundary (Tracking::
            # Relocalization): if the chunk ends LOST, re-run the
            # front-end on its last frame and try the multi-candidate
            # PnP reloc — without this, throughput mode stays lost
            # forever (the in-scan step has no reloc branch; rare-path
            # work belongs on the host, not in the hot program)
            # persistent loss only: a 1-frame inlier dip at the chunk
            # boundary recovers by itself next chunk (motion model);
            # paying a host reloc round trip for it cost 260 ms/run in
            # the bench (reloc_host phase) for nothing
            persist_lost = bool(statuses[take - 1] == 2) and (
                take < 2 or bool(statuses[take - 2] == 2)
            )
            if persist_lost and int(n_kfs) >= 2:
                if stereo:
                    fr = self._make_stereo_frame(g[take - 1], d[take - 1])
                else:
                    fr = self._build_frame(
                        self.cam, self.cfg, g[take - 1], d[take - 1])
                self._reloc_key, sub = jax.random.split(self._reloc_key)
                rr = self._relocalize(self.cfg, self.cam, self.map, fr, sub)
                if bool(rr.accepted):
                    self.ts = self.ts._replace(
                        Tcw=rr.Tcw, vel=jnp.eye(4),
                        status=jnp.asarray(1, jnp.int32),
                    )
                    self.stats.append({
                        "event": "chunk_reloc",
                        "t": float(timestamps[j - 1]),
                        "inliers": int(rr.n_inliers),
                    })
            if phases is not None:
                phases.setdefault("reloc_host", 0.0)
                phases["reloc_host"] += time.perf_counter() - t0
                t0 = time.perf_counter()
            if self.enable_loop:
                # per-KEYFRAME consistency/verification cadence (the
                # reference processes every queued KF; r3 ran one
                # detection per chunk and needed ~3 chunks of persistent
                # revisit instead of 3 keyframes). Detections were
                # computed in-scan against the map as of that keyframe
                # and ride the chunk's one packed fetch.
                for k in range(take):
                    if flags[k]:
                        # valid=False still goes through: a keyframe
                        # with no detection CLEARS the consistency
                        # streak (reference mvConsistentGroups)
                        self._try_close_loop(
                            pre=(int(refkf[k]), bool(lc_valid[k]),
                                 np.asarray(lc_cands[k]),
                                 np.asarray(lc_groups[k])))
            # pending global BA advances ONE budgeted slice per chunk
            self._pump_gba()
            if phases is not None:
                phases["loop_host"] += time.perf_counter() - t0
            i += take
        return np.concatenate(poses)

    def track_observations(self, uv, depth, desc, timestamp: float) -> np.ndarray:
        """Pipeline-test entry: track a frame given direct observations."""
        frame = frame_from_observations(
            uv, depth, desc, self.cfg.map.max_features, self.cam
        )
        return self._track_frame(frame, timestamp)

    def track_observations_mono(self, uv, desc, timestamp: float) -> np.ndarray:
        """Observation-level MONOCULAR entry: like track_observations but
        depthless — two-view initialization, triangulation-only mapping,
        Sim3 loop closing (cfg.loop.fix_scale=False) all run exactly as
        in track_monocular; only the image front-end is bypassed."""
        self._set_sensor("monocular")
        K = self.cfg.map.max_features
        frame = frame_from_observations(
            uv, np.zeros((len(uv),), np.float32), desc, K, self.cam
        )
        frame = frame._replace(
            depth=jnp.zeros_like(frame.depth),
            u_right=jnp.full_like(frame.u_right, -1.0),
        )
        if not self.initialized:
            return self._try_mono_init(frame, timestamp, gray=None)
        return self._track_frame(frame, timestamp)

    # stat names packed into the deferred per-frame device vector
    _DEV_STAT_KEYS = (
        "n_mm", "n_inliers", "n_local", "rescued", "ref_fallback",
        "n_dynamic", "crf_tracks", "n_points", "n_kfs",
    )

    def _track_frame(self, frame: Frame, timestamp: float,
                     gray=None) -> np.ndarray:
        t0 = time.perf_counter()
        prev_gray = self._last_gray
        prev_uv = self.ts.last_uv
        prev_obs = self.ts.last_obs
        prev_valid = self.ts.last_valid
        if not self.initialized:
            self.map, self.ts = self._init_map(
                self.cfg, self.cam, self.map, frame, jnp.asarray(timestamp)
            )
            self.initialized = True
            info_host = {"event": "init"}
            need_kf = False
            dev_stats = None
        else:
            with self.timer.stage("track"):
                self.ts, self.map, info = self._track(
                    self.cfg, self.cam, self.map, self.ts, frame
                )
            # ---- the ONLY synchronous device->host fetch of the frame:
            # the two control scalars, packed into one transfer. All other
            # stats stay on device and are flushed lazily, so mapping /
            # CRF / flow dispatch below overlaps the next frame's tracking
            # (the reference's thread pipelining, SURVEY.md §3.4).
            decision = np.asarray(jnp.stack(
                [info.need_kf.astype(jnp.int32), self.ts.status]
            ))
            need_kf = bool(decision[0]) and not getattr(
                self, "_localization_only", False
            )
            status = int(decision[1])
            # relocalization path (Tracking::Relocalization) when lost
            if status == 2 and int(self.map.n_kfs) >= 2:
                self._reloc_key, sub = jax.random.split(self._reloc_key)
                rr = self._relocalize(self.cfg, self.cam, self.map, frame, sub)
                if bool(rr.accepted):
                    self.ts = self.ts._replace(
                        Tcw=rr.Tcw,
                        vel=jnp.eye(4),
                        status=jnp.asarray(1, jnp.int32),
                    )
                    status = 1
                    need_kf = False
            if need_kf:
                flow_dyn = None
                if (
                    self.enable_crf and gray is not None
                    and prev_gray is not None
                    and self._last_Tcw is not None
                    and self.cfg.crf.spawn_flow_gate > 0
                ):
                    flow_dyn = self._spawn_flow_dyn(
                        self.cfg, self.cam, gray, prev_gray,
                        frame.uv, frame.depth, frame.valid,
                        self.ts.Tcw, self._last_Tcw,
                    )
                with self.timer.stage("insert_kf"):
                    self.map, self.ts = self._insert_kf(
                        self.cfg, self.cam, self.map, self.ts, frame,
                        info.obs, jnp.asarray(timestamp), info.near_map,
                        flow_dyn,
                    )
                if self.enable_mapping and self._mapping is not None:
                    with self.timer.stage("mapping"):
                        self.map = self._mapping(
                            self.cfg, self.cam, self.map, self.ts.ref_kf
                        )
                self.kf_log.append((timestamp, self.ts.ref_kf))
                self._warn_if_at_capacity()
                if self.enable_loop:
                    self._try_close_loop()
            # pending global BA advances ONE budgeted slice per frame
            # (the reference's detached GBA thread steals background
            # cycles; here the analog is a bounded per-frame stall)
            self._pump_gba()
            if (
                self.enable_crf and gray is not None
                and prev_gray is not None
            ):
                self.map = self._flow_evidence(
                    self.cfg, self.cam, self.map, prev_gray, gray,
                    prev_uv, prev_obs, prev_valid, self.ts.Tcw,
                )
            if self.enable_crf and self._crf is not None:
                self.map, crf_info = self._crf(
                    self.cfg, self.map, self.ts.frame_idx
                )
                crf_dyn = crf_info.n_dynamic
                crf_tracks = crf_info.n_tracks
            else:
                crf_dyn = jnp.asarray(0, jnp.int32)
                crf_tracks = jnp.asarray(0, jnp.int32)
            dev_stats = jnp.stack([
                info.n_mm_matches, info.n_inliers, info.n_local_matches,
                info.rescued.astype(jnp.int32),
                info.ref_fallback.astype(jnp.int32), crf_dyn, crf_tracks,
                self.map.n_points, self.map.n_kfs,
            ])
            info_host = {"need_kf": need_kf, "status": status}

        self._last_gray = gray
        self._last_Tcw = self.ts.Tcw
        # keep the pose ON DEVICE: the trajectory entry resolves lazily at
        # get_trajectory/flush time, so returning from a frame never
        # fences the flow/CRF/mapping programs dispatched above — they
        # overlap the host's next-frame preparation (SURVEY.md §3.4's
        # pipeline parallelism as dispatch overlap)
        Tcw = self.ts.Tcw
        self.trajectory.append((
            timestamp,
            Tcw @ se3_inverse(self.map.kf_Tcw[self.ts.ref_kf]),
            self.ts.ref_kf,
        ))
        rec = {
            "t": timestamp,
            "ms": (time.perf_counter() - t0) * 1e3,
            **info_host,
        }
        if dev_stats is not None:
            rec["_dev"] = dev_stats
        self.stats.append(rec)
        return Tcw

    def flush_stats(self) -> None:
        """Resolve deferred device stats into the records and write any
        pending JSONL lines. Called at shutdown / before reading stats —
        per-frame tracking never blocks on observability scalars."""
        if any(hasattr(k, "dtype") for _, k in self.kf_log):
            resolved = jax.device_get([k for _, k in self.kf_log])
            self.kf_log = [
                (t, int(k)) for (t, _), k in zip(self.kf_log, resolved)
            ]
        pending = [r for r in self.stats if "_dev" in r]
        if pending:
            vals = np.asarray(jnp.stack([r.pop("_dev") for r in pending]))
            for r, row in zip(pending, vals):
                for key, v in zip(self._DEV_STAT_KEYS, row):
                    r[key] = (
                        bool(v) if key in ("rescued", "ref_fallback")
                        else int(v)
                    )
        if self._log_fh:
            for r in self.stats[self._n_logged:]:
                self._log_fh.write(json.dumps(r) + "\n")
            self._n_logged = len(self.stats)

    def _warn_if_at_capacity(self) -> None:
        """Loud degrade at the fixed-capacity ceilings: once the KF or
        point arrays fill, further insertions drop silently — surface it
        (VERDICT r1 weak #8)."""
        if self._capacity_warned:
            return
        n_kf, n_pt = int(self.map.n_kfs), int(self.map.n_points)
        full_kf = n_kf >= self.cfg.map.max_keyframes
        # n_points is a high-water mark; point slots are recycled after
        # culling (mapstate.add_points), so only check the live count —
        # and only once the high-water mark says saturation is possible
        full_pt = False
        if n_pt >= self.cfg.map.max_points:
            n_alive = int(jnp.sum(self.map.p_alive))
            full_pt = n_alive >= self.cfg.map.max_points
        if full_kf or full_pt:
            import sys

            what = "keyframe" if full_kf else "point"
            msg = (
                f"lc_crf_slam_tpu: {what} capacity reached "
                f"(kfs={n_kf}/{self.cfg.map.max_keyframes}, "
                f"live points {'saturated' if full_pt else 'ok'}/"
                f"{self.cfg.map.max_points}); new "
                f"insertions will be dropped — raise MapConfig capacities"
            )
            print(msg, file=sys.stderr)
            self.stats.append({"event": "capacity_full", "detail": msg})
            self._capacity_warned = True

    def _try_close_loop(self, pre=None) -> None:
        """LoopClosing::Run body for the newly inserted keyframe.

        Detection returns the 0.75*best-filtered top-k candidates with
        their covisibility groups; the host runs the reference's
        consecutive-detection GROUP consistency (a candidate only
        qualifies once its covisibility group has intersected a group
        from the previous detections enough times — mvConsistentGroups),
        then verifies candidates geometrically in score order.

        `pre`: (kf, valid, cands, groups) detection already fetched by
        the chunk program (track_sequence folds per-keyframe detect_loop
        outputs into the chunk's one packed transfer); None dispatches
        detection here for the current reference keyframe."""
        if pre is not None:
            kf, valid, cands, groups = pre
            kf = int(kf)
        else:
            # dispatch detection, then ONE packed device->host fetch —
            # separate scalar fetches are full round trips on a
            # tunneled TPU
            lc = self._detect_loop(self.cfg, self.map, self.ts.ref_kf)
            kf, valid, cands, groups = map(np.asarray, jax.device_get(
                (self.ts.ref_kf, lc.valid, lc.cands, lc.groups)))
            kf = int(kf)
        if kf - self._last_loop_kf < self.cfg.loop.min_kfs_since_last:
            return
        if not bool(valid):
            self._consistent_groups = []
            return
        prev = self._consistent_groups
        new_groups: list = []
        ready: list = []
        for c, gmask in zip(cands, groups):
            if c < 0:
                continue
            streak = 1
            for pmask, pstreak in prev:
                if (gmask & pmask).any():
                    streak = max(streak, pstreak + 1)
            new_groups.append((gmask, streak))
            if streak >= self.cfg.loop.consistency_needed:
                ready.append(int(c))
        self._consistent_groups = new_groups
        kf_dev = jnp.asarray(kf, jnp.int32)
        for cand in ready[:3]:
            self._reloc_key, sub = jax.random.split(self._reloc_key)
            cand_dev = jnp.asarray(cand, jnp.int32)
            ver = self._verify_loop(
                self.cfg, self.cam, self.map, kf_dev, cand_dev, sub
            )
            if not bool(ver.accepted):
                continue
            if self.cfg.loop.fix_scale:
                self.map = self._correct_loop(
                    self.cfg, self.cam, self.map, kf_dev, cand_dev,
                    ver.T_corr,
                )
            else:
                # mono: Sim3 essential graph — the free scale coordinate
                # absorbs accumulated scale drift (SURVEY.md §4.4)
                self.map = self._correct_loop_sim3(
                    self.cfg, self.cam, self.map, kf_dev, cand_dev,
                    ver.T_corr, ver.s_corr,
                )
            # current pose moved with its keyframe: re-sync tracking state
            self.ts = self.ts._replace(
                Tcw=self.map.kf_Tcw[self.ts.ref_kf], vel=jnp.eye(4)
            )
            # correct_loop ran the immediate current-KF SearchAndFuse;
            # global BA runs OFF the hot path as budgeted slices pumped
            # by subsequent frames (reference's detached abortable GBA
            # thread, SURVEY.md §4.4) — a new verified loop overwrites
            # any remaining budget (mbStopGBA abort). The group-wide
            # SearchAndFuse waits until the budget drains (it needs the
            # BA-refined alignment, see loopclosing.search_and_fuse).
            self._gba_pending = {
                "left": self.cfg.loop.gba_total_iters, "kf": kf,
            }
            if self.cfg.loop.gba_slice_iters <= 0:
                self._pump_gba(drain=True)      # synchronous fallback
            self._last_loop_kf = kf
            self._consistent_groups = []
            self.loop_log.append({
                "kf": kf, "cand": cand, "inliers": int(ver.n_inliers),
                # refined world-correction scale (1.0 when fix_scale):
                # rare path, so the scalar fetch is fine — and it pins
                # the Sim3 scale SENSE in tests (ADVICE r3 #2)
                "s_corr": float(ver.s_corr),
            })
            return

    def _pump_gba(self, drain: bool = False) -> None:
        """Run pending global-BA slices (RunGlobalBundleAdjustment off
        the hot path): one `gba_slice_iters`-LM-iteration slice per call
        — a frame never stalls on more than one slice — until the loop's
        `gba_total_iters` budget drains, then the group-wide
        SearchAndFuse fires. `drain=True` (trajectory export, shutdown,
        synchronous fallback) finishes the whole budget now, mirroring
        the reference joining its GBA thread at Shutdown."""
        while self._gba_pending is not None:
            slice_iters = self.cfg.loop.gba_slice_iters
            if slice_iters <= 0 or drain:
                slice_iters = max(self.cfg.loop.gba_total_iters, 1)
            kf = self._gba_pending["kf"]
            with self.timer.stage("global_ba_slice"):
                self.map = self._global_ba(
                    self.cfg, self.cam, self.map, slice_iters
                )
            self._gba_slices_run += 1
            self._gba_pending["left"] -= slice_iters
            if self._gba_pending["left"] <= 0:
                self.map = self._search_fuse(
                    self.cfg, self.cam, self.map,
                    jnp.asarray(kf, jnp.int32),
                    self.cfg.mapping.fuse_neighbors,
                )
                self._gba_pending = None
            if not drain:
                break

    # ----------------------------------------------------------- trajectory
    def get_trajectory(self):
        """Per-frame (timestamps, Twc) with loop corrections applied.

        Composes each stored relative pose with its reference keyframe's
        CURRENT pose (System::SaveTrajectoryTUM in the reference): frames
        tracked before a loop closure / global BA inherit the corrected
        keyframe poses rather than their drifted track-time estimates."""
        # finish any pending budgeted global BA first (the reference
        # joins its GBA thread before SaveTrajectoryTUM at Shutdown)
        self._pump_gba(drain=True)
        if not self.trajectory:
            return np.zeros((0,)), np.zeros((0, 4, 4))
        ts = np.array([t for t, _, _ in self.trajectory])
        resolved = jax.device_get(
            [(T, r) for _, T, r in self.trajectory])
        kf_Tcw_now, kf_alive, kf_anchor, kf_Tca = jax.device_get(
            (self.map.kf_Tcw, self.map.kf_alive,
             self.map.kf_anchor, self.map.kf_Tca))
        kf_Tcw_now = np.asarray(kf_Tcw_now)
        poses = np.empty((len(resolved), 4, 4))
        for k, (Tcr, r) in enumerate(resolved):
            r = int(r)
            Tcr = np.asarray(Tcr)
            # spanning-tree walk (System::SaveTrajectoryTUM): a culled
            # reference KF never receives loop / global-BA corrections,
            # so fold its frozen cull-time relative pose into the chain
            # and re-anchor on the first LIVE ancestor, which does.
            hops = 0
            while r >= 0 and not bool(kf_alive[r]) and kf_anchor[r] >= 0 \
                    and hops < len(kf_Tcw_now):
                Tcr = Tcr @ np.asarray(kf_Tca[r])
                r = int(kf_anchor[r])
                hops += 1
            Tcw = Tcr @ (kf_Tcw_now[r] if r >= 0 else np.eye(4))
            R, t = Tcw[:3, :3], Tcw[:3, 3]
            poses[k, :3, :3] = R.T
            poses[k, :3, 3] = -R.T @ t
            poses[k, 3] = (0.0, 0.0, 0.0, 1.0)
        return ts, poses

    def save_trajectory_tum(self, path: str) -> None:
        from ..utils.io_tum import write_trajectory_tum

        ts, poses = self.get_trajectory()
        write_trajectory_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        from ..utils.io_tum import write_trajectory_tum

        self._pump_gba(drain=True)
        n = int(self.map.n_kfs)
        # reference SaveKeyFrameTrajectoryTUM skips bad (culled) KFs
        alive = np.asarray(self.map.kf_alive[:n])
        Twc = np.asarray(
            jax.vmap(se3_inverse)(self.map.kf_Tcw[:n])
        )[alive]
        times = np.asarray(self.map.kf_time[:n])[alive]
        write_trajectory_tum(path, times, Twc)

    def set_localization_mode(self, enabled: bool) -> None:
        """System::ActivateLocalizationMode / DeactivateLocalizationMode:
        when enabled, tracking continues against the frozen map — no
        keyframe insertion, no mapping pass, no loop closing, so the
        map's structure (keyframes / alive points) cannot change.
        Per-point tracking statistics and CRF labels still update, as
        the reference's Tracking thread also keeps updating MapPoint
        found/visible statistics in this mode."""
        self._localization_only = enabled

    def reset(self) -> None:
        """System::Reset — clear the map and tracking state."""
        self.map = empty_map(self.cfg)
        self.ts = empty_track_state(self.cfg)
        self.initialized = False
        self.trajectory.clear()
        self.kf_log.clear()
        self._capacity_warned = False
        self._last_gray = None
        self._last_Tcw = None
        self._gba_pending = None
        self._consistent_groups = []
        self._last_loop_kf = -10**9

    def shutdown(self) -> None:
        self._pump_gba(drain=True)
        self.flush_stats()
        if self._log_fh:
            self._log_fh.close()
            self._log_fh = None
