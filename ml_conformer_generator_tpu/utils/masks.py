"""Mask construction and EDM input preparation.

Behavioural reference: ``/root/reference/src/mlconfgen/utils/mol_utils.py``
(``prepare_masks`` :226-252, ``prepare_edm_input`` :255-295).

TPU-first departure: edge masks stay dense ``(B, N, N, 1)`` (the reference
flattens to ``(B*N*N, 1)`` for its COO edge stream); node-count draws use
``jax.random`` keys instead of global torch RNG state.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def prepare_masks(n_nodes: jnp.ndarray, max_n_nodes: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Node mask (B, N, 1) and diagonal-free dense edge mask (B, N, N, 1).

    n_nodes: (B,) int per-sample graph sizes.
    """
    n_nodes = jnp.asarray(n_nodes).reshape(-1)
    B = n_nodes.shape[0]
    idx = jnp.arange(max_n_nodes)
    node_mask = (idx[None, :] < n_nodes[:, None]).astype(jnp.float32)
    edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
    edge_mask = edge_mask * (1.0 - jnp.eye(max_n_nodes))[None]
    return node_mask[..., None], edge_mask[..., None]


def normalize_context(reference_context: jnp.ndarray,
                      context_norms: Dict[str, Tuple[float, ...]]) -> jnp.ndarray:
    mean = jnp.asarray(context_norms["mean"], dtype=jnp.float32)
    mad = jnp.asarray(context_norms["mad"], dtype=jnp.float32)
    return (reference_context - mean) / mad


@partial(jax.jit,
         static_argnames=("n_samples", "min_n_nodes", "max_n_nodes", "N"))
def _edm_input_device(key, reference_context, mean, mad, *, n_samples,
                      min_n_nodes, max_n_nodes, N):
    """One compiled program for the whole input prep: through this machine's
    TPU tunnel every eager op is a ~1.4 ms round trip, so the ~15 ops of
    mask/context construction are fused into a single dispatch."""
    n_nodes = jax.random.randint(key, (n_samples,), min_n_nodes,
                                 max_n_nodes + 1)
    node_mask, edge_mask = prepare_masks(n_nodes, N)
    normed = (jnp.asarray(reference_context, jnp.float32) - mean) / mad
    batch_context = jnp.broadcast_to(
        normed.reshape(1, 1, 3), (n_samples, N, 3)) * node_mask
    return node_mask, edge_mask, batch_context, n_nodes


def prepare_edm_input(key, n_samples: int, reference_context: jnp.ndarray,
                      context_norms: Dict[str, Tuple[float, ...]],
                      min_n_nodes: int, max_n_nodes: int,
                      n_nodes_pad: int = 0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random sizes in [min, max], masks, and the normalised broadcast context.

    ``n_nodes_pad`` (>= max_n_nodes) pads the node axis beyond the largest
    drawn size — used to bucket shapes and bound jit recompiles.
    Returns (node_mask, edge_mask, batch_context, n_nodes).
    """
    N = max(max_n_nodes, n_nodes_pad)
    mean = jnp.asarray(context_norms["mean"], dtype=jnp.float32)
    mad = jnp.asarray(context_norms["mad"], dtype=jnp.float32)
    return _edm_input_device(key, reference_context, mean, mad,
                             n_samples=n_samples, min_n_nodes=min_n_nodes,
                             max_n_nodes=max_n_nodes, N=N)


def pad_to_bucket(n: int, bucket: int = 8) -> int:
    """Round a graph size up to a bucket boundary to bound jit recompiles."""
    return int(np.ceil(n / bucket) * bucket)
