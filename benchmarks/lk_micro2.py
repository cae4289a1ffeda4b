"""Decompose lk_track device time by ablating its knobs.

vmap over 30 real frame pairs, fence once — pure device time per pair,
no per-call dispatch noise. Drives the LK budget decisions in PERF.md.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.ops.lk_flow import lk_track
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N = 30
world = SyntheticWorld(cam=TUM3, n_frames=N + 1, n_static=1400,
                       n_dynamic=0, seed=7, trajectory="line",
                       billboard=True, bb_speed=0.04)
frames = [world.frame(k, render=True) for k in range(N + 1)]
grays = jax.device_put(jnp.asarray(
    np.stack([f.image for f in frames]), jnp.float32))
_ = np.asarray(jnp.ravel(grays)[0])
uvs = jnp.tile(jnp.asarray(np.random.default_rng(0).uniform(
    20, 460, (1024, 2)).astype(np.float32))[None], (N, 1, 1))
ok = jnp.ones((N, 1024), bool)


def timed(label, **kw):
    fn = jax.jit(jax.vmap(partial(lk_track, **kw)))
    out = fn(grays[:-1], grays[1:], uvs, ok)
    _ = np.asarray(out.uv_next)[:1, :1]
    t0 = time.perf_counter()
    for _i in range(3):
        out = fn(grays[:-1], grays[1:], uvs, ok)
    _ = np.asarray(out.uv_next)[:1, :1]
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:36s} {dt*1e3:7.1f} ms/30pairs = {dt/N*1e3:5.2f} ms/pair",
          flush=True)


timed("baseline (L3 w7 it8)")
timed("levels=2", n_levels=2)
timed("levels=1", n_levels=1)
timed("iters=4", iters=4)
timed("iters=1", iters=1)
timed("half_win=5", half_win=5)
timed("levels=2 iters=4", n_levels=2, iters=4)
timed("levels=2 iters=4 win=5", n_levels=2, iters=4, half_win=5)


def timed_scan(label, **kw):
    @jax.jit
    def fn(gp, gn, u, o):
        def step(_, inp):
            a, b, c, d = inp
            return None, lk_track(a, b, c, d, **kw)
        _, out = jax.lax.scan(step, None, (gp, gn, u, o))
        return out
    out = fn(grays[:-1], grays[1:], uvs, ok)
    _ = np.asarray(out.uv_next)[:1, :1]
    t0 = time.perf_counter()
    for _i in range(3):
        out = fn(grays[:-1], grays[1:], uvs, ok)
    _ = np.asarray(out.uv_next)[:1, :1]
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:36s} {dt*1e3:7.1f} ms/30pairs = {dt/N*1e3:5.2f} ms/pair",
          flush=True)


if __name__ == "__main__":
    timed_scan("SCAN baseline (L3 w7 it8)")
    timed_scan("SCAN levels=2", n_levels=2)
