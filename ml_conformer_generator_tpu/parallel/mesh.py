"""Device mesh construction for multi-chip execution.

The framework's parallel axes (SURVEY.md §2.5, §7):

* ``data`` — batch (samples) sharding: the primary scaling axis for
  generation workloads (the reference's only parallel dimension was the
  batch, single-device);
* ``edge`` — edge partitioning of the dense (B, N, N) message set: the
  context-parallel analog for mega-batch regimes, exchanging aggregations via
  ``psum`` over ICI.

On multi-host systems the data axis should map to the DCN-connected dimension
and the edge axis to ICI (edge exchanges run every layer; batch exchanges only
at optimiser boundaries).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = ("data", "edge"),
              devices=None) -> Mesh:
    """Build a 2D (data, edge) mesh over the available devices.

    ``shape=None`` puts every device on the data axis (pure DP) — the right
    default for generation, where batch >> devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def make_two_level_mesh(axis_names: Sequence[str] = ("data", "edge"),
                        devices=None) -> Mesh:
    """Two-level (DCN hosts x ICI chips) mesh for multi-host runs.

    Maps the ``data`` axis across hosts (batch exchanges only touch DCN at
    optimiser boundaries) and the ``edge`` axis across the chips of each host
    (the per-layer aggregation ``psum`` of the edge-sharded EGNN rides ICI) —
    the layout SURVEY.md §7.7 calls for. On a single host this degenerates to
    ``(1, n_chips)``.
    """
    if devices is None:
        devices = jax.devices()
    n_hosts = max(d.process_index for d in devices) + 1
    per_host = len(devices) // n_hosts
    arr = np.empty((n_hosts, per_host), dtype=object)
    counts = [0] * n_hosts
    for d in devices:
        p = d.process_index
        arr[p, counts[p]] = d
        counts[p] += 1
    return Mesh(arr, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, *batch_axes: Optional[str]) -> NamedSharding:
    """NamedSharding with the leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *batch_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
