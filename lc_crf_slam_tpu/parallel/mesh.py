"""Device mesh construction and shardings.

The reference has no distributed backend at all (SURVEY.md §3.4: four
threads + mutexes); this package is the TPU-native scaling layer the
north star demands: a `jax.sharding.Mesh` over the slice with named
axes, `shard_map`ped kernels, and XLA collectives over ICI. Axes:
  - 'edge': BA observations / CRF tracks (data parallel over the
    dominant fan-out dimension)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "edge") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("edge"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
