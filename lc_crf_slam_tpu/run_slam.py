"""CLI entry point — the `rgbd_tum` equivalent (SURVEY.md §3.1 L7).

Usage:
  # TUM RGB-D sequence (reference CLI shape: settings seq assoc):
  python -m lc_crf_slam_tpu.run_slam --seq DIR [--assoc FILE]
      [--camera tum1|tum2|tum3|bonn] [--config cfg.yaml] [--out traj.txt]

  # Synthetic sequence (no dataset required):
  python -m lc_crf_slam_tpu.run_slam --synthetic [--frames N]
      [--dynamic N] [--render] [--out traj.txt]

Writes the TUM-format trajectory (+ keyframe trajectory), per-frame
JSONL log, optional map visualization and checkpoint, and prints ATE
when ground truth is available. No vocabulary file is needed (retrieval
is vocabulary-free, SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--seq", help="TUM RGB-D sequence directory")
    src.add_argument("--synthetic", action="store_true",
                     help="run on a synthetic sequence")
    ap.add_argument("--assoc", help="association file (else associates "
                    "rgb.txt/depth.txt)")
    ap.add_argument("--camera", default="tum3",
                    choices=["tum1", "tum2", "tum3", "bonn"])
    ap.add_argument("--config", help="config file (section.key: value)")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--kf-out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--log", default=None, help="per-frame JSONL log path")
    ap.add_argument("--viz", default=None, help="write map plot PNG here")
    ap.add_argument("--checkpoint", default=None, help="save map state here")
    ap.add_argument("--resume", default=None, help="resume from checkpoint")
    ap.add_argument("--frames", type=int, default=120,
                    help="synthetic sequence length")
    ap.add_argument("--dynamic", type=int, default=120,
                    help="synthetic dynamic point count")
    ap.add_argument("--render", action="store_true",
                    help="synthetic: run the full image front-end instead "
                    "of direct observations")
    ap.add_argument("--mono", action="store_true",
                    help="monocular mode (mono_tum equivalent): ignore "
                    "depth, bootstrap via two-view initialization")
    ap.add_argument("--no-crf", action="store_true")
    ap.add_argument("--no-mapping", action="store_true")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--timing", action="store_true",
                    help="print the per-stage timing table at the end")
    ap.add_argument("--throughput", action="store_true",
                    help="batch frames through track_sequence (fused "
                    "chunked lax.scan; keyframes+mapping inside the "
                    "device program) instead of per-frame calls")
    ap.add_argument("--chunk", type=int, default=8,
                    help="frames per device program in --throughput mode")
    ap.add_argument("--distributed", action="store_true",
                    help="join the jax.distributed runtime before any "
                    "backend use (multi-host pods: coordinator/process "
                    "info from the cluster env; see parallel.mesh."
                    "init_distributed)")
    return ap


def _run_throughput_stream(slam, frames_iter, n, chunk, window=64):
    """Feed a (t, gray, depth) stream through track_sequence in windows
    of `window` frames: bounds host memory on long datasets while each
    window still amortizes dispatch over fused chunks."""
    import numpy as np

    buf = []
    done = 0
    for item in frames_iter:
        buf.append(item)
        if len(buf) == window:
            slam.track_sequence(
                np.stack([g for _, g, _ in buf]).astype(np.float32),
                np.stack([d for _, _, d in buf]).astype(np.float32),
                np.asarray([t for t, _, _ in buf]), chunk=chunk)
            done += len(buf)
            print(f"frame {done}/{n}", file=sys.stderr)
            buf = []
    if buf:
        slam.track_sequence(
            np.stack([g for _, g, _ in buf]).astype(np.float32),
            np.stack([d for _, _, d in buf]).astype(np.float32),
            np.asarray([t for t, _, _ in buf]), chunk=chunk)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.distributed:
        from .parallel.mesh import init_distributed

        init_distributed()   # env-driven (pod metadata / JAX_COORDINATOR_*)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from . import enable_compilation_cache
    from .config import SLAMConfig, load_yaml
    from .geometry.camera import BONN, TUM1, TUM2, TUM3
    from .models.system import SLAMSystem
    from .utils.evaluate import evaluate_ate

    enable_compilation_cache()   # minutes -> seconds on warm starts

    cam = {"tum1": TUM1, "tum2": TUM2, "tum3": TUM3,
           "bonn": BONN}[args.camera]
    cfg = load_yaml(args.config) if args.config else SLAMConfig()
    if args.mono and cfg.loop.fix_scale:
        # mono scale is unobservable: loop closing must run the Sim3
        # essential graph (reference bFixScale=false for MONOCULAR)
        import dataclasses

        cfg = cfg.replace(
            loop=dataclasses.replace(cfg.loop, fix_scale=False))

    slam = SLAMSystem(
        cam, cfg, log_path=args.log,
        enable_mapping=not args.no_mapping,
        enable_crf=not args.no_crf,
    )
    slam.enable_loop = not args.no_loop
    if args.resume:
        from .utils.checkpoint import load_checkpoint

        slam.map, slam.ts, meta = load_checkpoint(args.resume)
        slam.initialized = True
        slam.trajectory = meta.get("trajectory", [])
        slam.kf_log = meta.get("kf_log", [])
        print(f"resumed from {args.resume} "
              f"({len(slam.trajectory)} prior frames)", file=sys.stderr)

    gt = None
    profile_cm = None
    if args.profile:
        from .utils.profiling import trace

        profile_cm = trace(args.profile)
        profile_cm.__enter__()
    t_start = time.perf_counter()
    if args.synthetic:
        from .utils.synthetic import SyntheticWorld

        world = SyntheticWorld(
            cam=cam, n_frames=args.frames, n_static=900,
            n_dynamic=args.dynamic,
        )
        n = min(args.max_frames or args.frames, args.frames)
        if args.mono:
            for k in range(n):
                f = world.frame(k, render=True)
                slam.track_monocular(f.image, f.timestamp)
        elif args.throughput and args.render:
            import numpy as np

            fs = [world.frame(k, render=True) for k in range(n)]
            slam.track_sequence(
                np.stack([f.image for f in fs]).astype(np.float32),
                np.stack([f.depth_image for f in fs]).astype(np.float32),
                np.asarray([f.timestamp for f in fs]),
                chunk=args.chunk,
            )
        else:
            for k in range(n):
                f = world.frame(k, render=args.render)
                if args.render:
                    slam.track_rgbd(f.image, f.depth_image, f.timestamp)
                else:
                    slam.track_observations(
                        f.uv, f.depth, f.desc, f.timestamp)
        gt = world.groundtruth()
    else:
        from .utils.io_tum import TUMSequence, load_groundtruth
        import os

        seq = TUMSequence(args.seq, args.assoc,
                          cfg.tracking.depth_map_factor)
        n = min(len(seq), args.max_frames or len(seq))
        # native C++ prefetching decoder when built; Python/OpenCV otherwise
        from .utils.native_loader import build_native_runtime, NativeTUMLoader

        if build_native_runtime():
            entries = [
                (t_rgb, os.path.join(args.seq, rp),
                 t_d, os.path.join(args.seq, dp))
                for t_rgb, rp, t_d, dp in seq.entries[:n]
            ]
            loader = NativeTUMLoader(
                entries, cam.width, cam.height,
                cfg.tracking.depth_map_factor,
            )
            print("using native prefetching loader", file=sys.stderr)
            if args.mono:
                for k, (t, gray, _depth) in enumerate(loader):
                    slam.track_monocular(gray, t)
                    if k % 50 == 0:
                        print(f"frame {k}/{n}", file=sys.stderr)
            elif args.throughput:
                _run_throughput_stream(slam, loader, n, args.chunk)
            else:
                for k, (t, gray, depth) in enumerate(loader):
                    slam.track_rgbd(gray, depth, t)
                    if k % 50 == 0:
                        print(f"frame {k}/{n}", file=sys.stderr)
            loader.close()
        else:
            if args.mono:
                for k in range(n):
                    t, gray, _depth = seq[k]
                    slam.track_monocular(gray, t)
                    if k % 50 == 0:
                        print(f"frame {k}/{n}", file=sys.stderr)
            elif args.throughput:
                _run_throughput_stream(
                    slam, (seq[k] for k in range(n)), n, args.chunk)
            else:
                for k in range(n):
                    t, gray, depth = seq[k]
                    slam.track_rgbd(gray, depth, t)
                    if k % 50 == 0:
                        print(f"frame {k}/{n}", file=sys.stderr)
        gt_path = os.path.join(args.seq, "groundtruth.txt")
        if os.path.exists(gt_path):
            from .geometry.se3 import quat_to_rotmat
            import numpy as np
            import jax.numpy as jnp

            ts_g, vals = load_groundtruth(gt_path)
            R = np.asarray(quat_to_rotmat(jnp.asarray(vals[:, 3:7])))
            T = np.tile(np.eye(4), (len(ts_g), 1, 1))
            T[:, :3, :3] = R
            T[:, :3, 3] = vals[:, :3]
            gt = (ts_g, T)

    wall = time.perf_counter() - t_start
    slam.flush_stats()
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)
    if args.timing:
        print(slam.timer.report(), file=sys.stderr)
    slam.save_trajectory_tum(args.out)
    slam.save_keyframe_trajectory_tum(args.kf_out)
    ts_est, poses_est = slam.get_trajectory()
    n_frames = len(ts_est)
    summary = {
        "frames": n_frames,
        "fps": round(n_frames / wall, 2),
        "keyframes": int(slam.map.n_kfs),
        "points": int(slam.map.n_points),
        "loops_closed": len(slam.loop_log),
        "lost_frames": sum(
            1 for s in slam.stats[1:] if s.get("status") != 1
        ),
    }
    if gt is not None:
        # monocular estimates are up-to-scale: align with Umeyama scale
        # (the TUM protocol's mono convention)
        ate = evaluate_ate(ts_est, poses_est, gt[0], gt[1],
                           with_scale=args.mono)
        summary["ate_rmse_m"] = round(ate.rmse, 4)
        summary["ate_median_m"] = round(ate.median, 4)
    if args.viz:
        from .utils.viewer import plot_map

        plot_map(slam.map, args.viz, trajectory=poses_est,
                 groundtruth=gt[1] if gt is not None else None)
    if args.checkpoint:
        from .utils.checkpoint import save_checkpoint

        slam.flush_stats()   # resolve device-held kf_log indices
        save_checkpoint(args.checkpoint, slam.map, slam.ts,
                        trajectory=slam.trajectory, kf_log=slam.kf_log)
    print(json.dumps(summary))
    slam.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
