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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host entry point (SURVEY.md §6.8): join the jax.distributed
    runtime so `jax.devices()` spans every host's chips and collectives
    ride ICI within a slice / DCN across slices.

    With no arguments JAX reads the cluster env (TPU metadata /
    JAX_COORDINATOR_ADDRESS et al.) — the normal pod path. Arguments are
    for explicit CPU/GPU multi-process bring-up. Safe to call once per
    process before any backend use; no-op if already initialized.
    """
    global _DIST_UP
    if _DIST_UP:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    _DIST_UP = True


_DIST_UP = False


def make_mesh(n_devices: int | None = None, axis: str = "edge") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("edge"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
