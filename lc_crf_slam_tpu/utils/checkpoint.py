"""Map checkpoint / resume.

SURVEY.md §6.4: the reference can only export trajectories; the
functional map makes full state snapshots trivial. Saves the MapState
pytree + tracking state + frame cursor as one .npz; resume restores a
SLAMSystem mid-sequence.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..models.mapstate import MapState
from ..models.tracking import TrackState


def save_checkpoint(path: str, m: MapState, ts: TrackState,
                    meta: dict | None = None,
                    trajectory: list | None = None,
                    kf_log: list | None = None) -> None:
    """Snapshot map + tracking state (+ the per-frame trajectory log).

    `trajectory` is SLAMSystem.trajectory — (t, Tcr, ref_kf) relative
    entries — so a resumed run exports a COMPLETE CameraTrajectory.txt,
    with pre-checkpoint frames still receiving post-resume loop
    corrections through their reference keyframes."""
    arrays = {}
    for name, val in m._asdict().items():
        arrays[f"map.{name}"] = np.asarray(val)
    for name, val in ts._asdict().items():
        arrays[f"ts.{name}"] = np.asarray(val)
    if meta:
        for k, v in meta.items():
            arrays[f"meta.{k}"] = np.asarray(v)
    if trajectory:
        arrays["traj.t"] = np.asarray([t for t, _, _ in trajectory])
        arrays["traj.Tcr"] = np.stack(
            [np.asarray(T) for _, T, _ in trajectory])
        arrays["traj.ref"] = np.asarray(
            [int(r) for _, _, r in trajectory], np.int32)
    if kf_log:
        arrays["kflog.t"] = np.asarray([t for t, _ in kf_log])
        arrays["kflog.idx"] = np.asarray(
            [int(k) for _, k in kf_log], np.int32)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str) -> Tuple[MapState, TrackState, dict]:
    data = np.load(path)
    m_kwargs = {
        k[len("map."):]: jnp.asarray(data[k])
        for k in data.files if k.startswith("map.")
    }
    ts_kwargs = {
        k[len("ts."):]: jnp.asarray(data[k])
        for k in data.files if k.startswith("ts.")
    }
    meta = {
        k[len("meta."):]: data[k]
        for k in data.files if k.startswith("meta.")
    }
    if "traj.t" in data.files:
        meta["trajectory"] = [
            (float(t), T, int(r)) for t, T, r in
            zip(data["traj.t"], data["traj.Tcr"], data["traj.ref"])
        ]
    if "kflog.t" in data.files:
        meta["kf_log"] = [
            (float(t), int(k))
            for t, k in zip(data["kflog.t"], data["kflog.idx"])
        ]
    return MapState(**m_kwargs), TrackState(**ts_kwargs), meta
