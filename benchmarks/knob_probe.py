"""Probe throughput-mode load-shedding knobs on the bench world.

Full pipeline (mapping+CRF+loop), chunk=30, real TPU — the driver
bench's exact scenario. Accuracy impact of any adopted knob is gated
separately by the e2e suite; this only ranks device time.
"""

import dataclasses as _dc
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
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N = 30
cam = TUM3
world = SyntheticWorld(cam=cam, n_frames=60, n_static=1400,
                       n_dynamic=0, seed=7, trajectory="line",
                       billboard=True, bb_speed=0.04)
frames = [world.frame(k, render=True) for k in range(N + 1)]
grays = jax.device_put(jnp.asarray(
    np.stack([f.image for f in frames[1:]]), jnp.float32))
depths = jax.device_put(jnp.asarray(
    np.stack([f.depth_image for f in frames[1:]]), jnp.float32))
_ = np.asarray(jnp.ravel(grays)[0] + jnp.ravel(depths)[0])
dts = np.arange(N, dtype=np.float64) / 30.0


def probe(label, cfg, chunk=30):
    slam = SLAMSystem(cam, cfg, enable_crf=True, enable_mapping=True)

    def go():
        slam.reset()
        t0 = time.perf_counter()
        poses = slam.track_sequence(grays, depths, dts, chunk=chunk)
        _ = np.asarray(poses[-1])
        return time.perf_counter() - t0

    go()
    best = min(go() for _ in range(2))
    print(f"{label:34s} {best*1e3:7.1f} ms ({N/best:5.1f} fps) "
          f"kfs={len(slam.kf_log)}", flush=True)


base = SLAMConfig()


def mod(crf=None, mapping=None, tracking=None):
    cfg = base
    if crf:
        cfg = cfg.replace(crf=_dc.replace(cfg.crf, **crf))
    if mapping:
        cfg = cfg.replace(mapping=_dc.replace(cfg.mapping, **mapping))
    if tracking:
        cfg = cfg.replace(tracking=_dc.replace(cfg.tracking, **tracking))
    return cfg


probe("baseline chunk=30", base)
probe("flow_levels=2", mod(crf={"flow_levels": 2}))
probe("iba 2+3", mod(mapping={"interrupt_iters_1": 2,
                              "interrupt_iters_2": 3}))
probe("triang_nb=1", mod(mapping={"interrupt_triang_neighbors": 1}))
probe("kf_gap=3", mod(tracking={"interrupt_min_kf_gap": 3}))
probe("combo fl2+iba+tri", mod(
    crf={"flow_levels": 2},
    mapping={"interrupt_iters_1": 2, "interrupt_iters_2": 3,
             "interrupt_triang_neighbors": 1}))
probe("combo all", mod(
    crf={"flow_levels": 2},
    mapping={"interrupt_iters_1": 2, "interrupt_iters_2": 3,
             "interrupt_triang_neighbors": 1},
    tracking={"interrupt_min_kf_gap": 3}))
