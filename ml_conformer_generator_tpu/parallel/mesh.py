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


def data_sharding(mesh: Mesh, *batch_axes: Optional[str]) -> NamedSharding:
    """NamedSharding with the leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *batch_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
