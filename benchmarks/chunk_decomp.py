"""Decompose the fused-chunk throughput program's device time.

Run on the real TPU (no flags) or CPU (JAX_PLATFORMS=cpu). Prints a
component table: full pipeline and each stage toggled off, plus
isolated kernels (front-end vmap, forward LK, crf_step). The numbers
drive the bench.py optimization work (BASELINE.md round-3 notes).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lc_crf_slam_tpu import enable_compilation_cache

enable_compilation_cache()

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.frame import build_frame
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.ops.lk_flow import lk_track
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N = 30
cam = TUM3
cfg = SLAMConfig()


def timed(fn, *args, label="", reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:8.1f} ms ({N/dt:6.1f} fps-equiv)",
          flush=True)
    return dt


def main():
    world = SyntheticWorld(cam=cam, n_frames=60, n_static=1400,
                           n_dynamic=0, seed=7, trajectory="line",
                           billboard=True, bb_speed=0.04)
    frames = [world.frame(k, render=True) for k in range(N + 1)]
    grays = jax.device_put(jnp.asarray(
        np.stack([f.image for f in frames]), jnp.float32))
    depths = jax.device_put(jnp.asarray(
        np.stack([f.depth_image for f in frames]), jnp.float32))
    _ = np.asarray(jnp.ravel(grays)[0] + jnp.ravel(depths)[0])
    dts = np.arange(N + 1, dtype=np.float64) / 30.0

    # isolated kernels
    fe = jax.jit(jax.vmap(lambda g, d: build_frame(cam, cfg, g, d)))
    timed(fe, grays[1:], depths[1:], label="front-end vmap x30")
    vlk = jax.jit(jax.vmap(lk_track))
    uvs = jnp.tile(
        jnp.asarray(np.random.default_rng(0).uniform(
            20, 600, (1024, 2)).astype(np.float32))[None], (N, 1, 1))
    timed(vlk, grays[:-1], grays[1:], uvs, jnp.ones((N, 1024), bool),
          label="forward LK x30")

    # pipeline ablations via track_sequence
    def run(mapping, crf, loop, label, chunk=15):
        slam = SLAMSystem(cam, cfg, enable_crf=crf, enable_mapping=mapping)
        slam.enable_loop = loop

        def go():
            slam.reset()
            t0 = time.perf_counter()
            poses = slam.track_sequence(grays[1:], depths[1:], dts[1:],
                                        chunk=chunk)
            _ = np.asarray(poses[-1])
            return time.perf_counter() - t0

        go()
        best = min(go() for _ in range(2))
        print(f"{label:34s} {best*1e3:8.1f} ms ({N/best:6.1f} fps) "
              f"kfs={len(slam.kf_log)}", flush=True)
        return best

    run(False, False, False, "tracking only")
    run(True, False, False, "tracking+mapping")
    run(False, True, False, "tracking+crf/flow")
    run(True, True, False, "tracking+mapping+crf")
    run(True, True, True, "full (loop detect)")
    run(True, True, True, "full, chunk=30", chunk=30)
    run(True, True, True, "full, chunk=10", chunk=10)


if __name__ == "__main__":
    main()
