"""Front-end device-time decomposition: vmap-batched vs scan-sequential
build_frame over a chunk, plus sub-stage ablations.

chunk_decomp measured 10.4 ms/frame for the vmapped 30-frame front-end
while PERF.md's r2 table recorded ~4 ms/call single-frame — if vmap
lowers the per-keypoint dynamic ops to slower batched gathers, the
chunk program should scan the front-end instead.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.frame import build_frame
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N = 30
cam = TUM3
cfg = SLAMConfig()

world = SyntheticWorld(cam=cam, n_frames=N + 1, n_static=1400,
                       n_dynamic=0, seed=7, trajectory="line",
                       billboard=True, bb_speed=0.04)
frames = [world.frame(k, render=True) for k in range(N)]
grays = jax.device_put(jnp.asarray(
    np.stack([f.image for f in frames]), jnp.float32))
depths = jax.device_put(jnp.asarray(
    np.stack([f.depth_image for f in frames]), jnp.float32))
_ = np.asarray(jnp.ravel(grays)[0] + jnp.ravel(depths)[0])


def timed(fn, label, reps=3):
    out = fn(grays, depths)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(grays, depths)
    _ = np.asarray(jax.tree.leaves(out)[0])[..., :1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:30s} {dt*1e3:7.1f} ms/30f = {dt/N*1e3:5.2f} ms/frame",
          flush=True)


@jax.jit
def fe_vmap(g, d):
    return jax.vmap(lambda a, b: build_frame(cam, cfg, a, b))(g, d)


@jax.jit
def fe_scan(g, d):
    def step(_, inp):
        a, b = inp
        return None, build_frame(cam, cfg, a, b)

    _, out = jax.lax.scan(step, None, (g, d))
    return out


timed(fe_vmap, "vmap x30")
timed(fe_scan, "scan x30")
