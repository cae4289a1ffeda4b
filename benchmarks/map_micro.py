"""Decompose mapping_step device time per stage on a realistic map.

Builds a mid-run map by tracking 30 billboard-world frames, then times
each mapping stage (and the in-scan InterruptBA config) separately.
Drives the in-scan keyframe budget work (VERDICT r5 ask #1).
"""

import sys
import time
import dataclasses as dc

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lc_crf_slam_tpu import enable_compilation_cache

enable_compilation_cache()

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.models import mapping as M
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N = 30
cam = TUM3
cfg = SLAMConfig()

world = SyntheticWorld(cam=cam, n_frames=N + 1, n_static=1400,
                       n_dynamic=0, seed=7, trajectory="line",
                       billboard=True, bb_speed=0.04)
frames = [world.frame(k, render=True) for k in range(N + 1)]
grays = jax.device_put(jnp.asarray(
    np.stack([f.image for f in frames]), jnp.float32))
depths = jax.device_put(jnp.asarray(
    np.stack([f.depth_image for f in frames]), jnp.float32))
_ = np.asarray(jnp.ravel(grays)[0] + jnp.ravel(depths)[0])
dts = np.arange(N + 1, dtype=np.float64) / 30.0

slam = SLAMSystem(cam, cfg, enable_crf=True, enable_mapping=True)
slam.track_sequence(grays, depths, dts, chunk=15)
m = slam.map
kf = slam.ts.ref_kf
print(f"map: n_kfs={int(m.n_kfs)} n_pts={int(m.n_points)} "
      f"alive={int(jnp.sum(m.p_alive))}", flush=True)

# in-scan (InterruptBA) config, as track_sequence builds it
cfg_map = dc.replace(
    cfg,
    local_ba=dc.replace(cfg.local_ba,
                        outer_iters_1=cfg.local_ba.interrupt_iters_1,
                        outer_iters_2=cfg.local_ba.interrupt_iters_2),
    mapping=dc.replace(cfg.mapping,
                       triang_neighbors=cfg.mapping.interrupt_triang_neighbors,
                       fuse_reverse_neighbors=(
                           cfg.mapping.interrupt_fuse_reverse_neighbors)),
)


def timed(label, fn, *args, reps=5):
    f = jax.jit(fn, static_argnums=(0, 1))
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt*1e3:7.1f} ms", flush=True)


timed("create_new_points", M.create_new_points, cfg_map, cam, m, kf)
timed("fuse_duplicates", M.fuse_duplicates, cfg_map, cam, m, kf)
timed("refresh_point_stats", M.refresh_point_stats, cfg_map, cam, m, kf)
timed("local_BA (interrupt 3+5)", M.local_bundle_adjustment, cfg_map, cam,
      m, kf)
timed("cull_points",
      lambda c, cm, mm: M.cull_points(c, mm), cfg_map, cam, m)
timed("cull_keyframes", lambda c, cm, mm, k: M.cull_keyframes(c, mm, k), cfg_map, cam, m, kf)
timed("mapping_step (full)", M.mapping_step, cfg_map, cam, m, kf)
