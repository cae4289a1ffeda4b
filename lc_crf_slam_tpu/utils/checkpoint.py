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
                    meta: dict | None = None) -> None:
    arrays = {}
    for name, val in m._asdict().items():
        arrays[f"map.{name}"] = np.asarray(val)
    for name, val in ts._asdict().items():
        arrays[f"ts.{name}"] = np.asarray(val)
    if meta:
        for k, v in meta.items():
            arrays[f"meta.{k}"] = np.asarray(v)
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
    return MapState(**m_kwargs), TrackState(**ts_kwargs), meta
