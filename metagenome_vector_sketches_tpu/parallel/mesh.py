"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def local_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over THIS PROCESS's addressable devices — the engine mesh
    for one shard job (outputs stay host-addressable so the per-process
    finalize/writer contract holds on multi-host runs too)."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def serving_mesh(mesh_devices: int, axis: str = DATA_AXIS) -> Mesh | None:
    """The CLIs' --mesh_devices convention over LOCAL devices: 1 = single
    device (None mesh); 0 = all of THIS process's addressable devices
    (multi-process runs serve from their own chips); n > 1 = first n local
    devices. THE canonical implementation — ann.search and the pairwise
    CLI both use it (a copy sized from local_devices but built over global
    jax.devices() once handed process 1 a mesh of process 0's chips)."""
    if mesh_devices == 1:
        return None
    if mesh_devices < 0:
        raise ValueError(f"--mesh_devices must be >= 0, got {mesh_devices}")
    locals_ = jax.local_devices()
    n = mesh_devices or len(locals_)
    if n > len(locals_):
        raise ValueError(f"need {n} local devices, have {len(locals_)}")
    return Mesh(np.array(locals_[:n]), (axis,)) if n > 1 else None


def row_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (row) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
