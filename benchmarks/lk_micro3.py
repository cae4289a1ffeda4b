"""Scan-amortized lk_track cost per frame pair (the chunk program's
actual formulation) across knobs. Supersedes lk_micro2's vmapped
variants, which OOM-compile with 30 concurrent K-last windows."""

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
    return out


if __name__ == "__main__":
    out = timed_scan("SCAN baseline (L3 w7 it8)")
    timed_scan("SCAN levels=2", n_levels=2)
    timed_scan("SCAN iters=4", iters=4)
    timed_scan("SCAN levels=2 iters=4", n_levels=2, iters=4)
    # track-quality sanity: forward flow of static world points should
    # be recovered (finite + mostly ok)
    print("ok fraction:", float(jnp.mean(out.ok.astype(jnp.float32))))
