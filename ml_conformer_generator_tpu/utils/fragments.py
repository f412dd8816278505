"""Fragment preparation for inpainting and inertial fragment matching (IFM).

Behavioural reference: ``/root/reference/src/mlconfgen/utils/mol_utils.py``
(``prepare_fragment`` :298-342, ``ifm_prepare_gen_fragment_context`` :373-457,
``ifm_prepare_fragments_for_merge`` :460-505).

These functions are array-in/array-out (coords + one-hot types); conversion
from molecules happens in :mod:`..chem`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..ops.moi import moment_of_inertia_tensor, shift_moi_to_com_batch
from .masks import normalize_context, prepare_masks


def check_fragment_size(n_atoms: int, min_n_nodes: int, max_n_nodes: int) -> None:
    if n_atoms >= min_n_nodes:
        raise ValueError(
            "Fragment must contain fewer atoms than minimum generation size.")
    if n_atoms >= max_n_nodes:
        raise ValueError(
            "Fragment has more atoms than the maximum number of atoms requested.")


def prepare_fragment(n_samples: int, frag_x: jnp.ndarray, frag_h: jnp.ndarray,
                     max_n_nodes: int, min_n_nodes: int = 15
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad + batch a fixed fragment into (z_known, fixed_mask) for inpainting.

    frag_x: (n, 3) coords; frag_h: (n, F) one-hot atom types. Dtype-
    preserving (callers pass float32 in production).
    """
    n_atoms = frag_x.shape[0]
    check_fragment_size(n_atoms, min_n_nodes, max_n_nodes)
    pad = max_n_nodes - n_atoms
    x = jnp.pad(frag_x, ((0, pad), (0, 0)))
    h = jnp.pad(frag_h, ((0, pad), (0, 0)))
    z = jnp.concatenate([x, h], axis=-1)
    z_known = jnp.broadcast_to(z[None], (n_samples,) + z.shape)
    fixed_mask = (jnp.arange(max_n_nodes) < n_atoms).astype(jnp.float32)
    fixed_mask = jnp.broadcast_to(fixed_mask[None, :, None],
                                  (n_samples, max_n_nodes, 1))
    return z_known, fixed_mask


def ifm_prepare_gen_fragment_context(
        frag_x: jnp.ndarray, reference_context: jnp.ndarray,
        context_norms: Dict, n_nodes: jnp.ndarray, max_n_nodes: int,
        min_n_nodes: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Contexts for generating the *complement* fragments of a fixed fragment.

    The generated fragment's MOI is the reference MOI minus the fixed
    fragment's MOI (both about the reference origin), moved to the generated
    fragment's guessed CoM via the inverse parallel-axis theorem, then
    diagonalised per sample.

    Returns (frag_node_mask, frag_edge_mask, batched_normed_context,
    shift (B,3), rotation (B,3,3)).
    """
    B = n_nodes.shape[0]
    ff_n_atoms = frag_x.shape[0]
    check_fragment_size(ff_n_atoms, min_n_nodes, max_n_nodes)

    masses_ff = jnp.ones(ff_n_atoms, dtype=jnp.float32)
    moi_ff = moment_of_inertia_tensor(frag_x, masses_ff)
    moi_ref = jnp.diag(reference_context)
    moi_gen_origin = jnp.broadcast_to((moi_ref - moi_ff)[None], (B, 3, 3))

    com_ff = jnp.mean(frag_x, axis=0)
    gen_n_atoms = n_nodes.reshape(B, 1).astype(jnp.float32) - ff_n_atoms
    shift = (ff_n_atoms * com_ff.reshape(1, 3)) / gen_n_atoms      # (B, 3)

    moi_gen_com = shift_moi_to_com_batch(moi_gen_origin, shift,
                                         gen_n_atoms.reshape(B))
    frag_context, rotation = jnp.linalg.eigh(moi_gen_com)          # (B,3),(B,3,3)
    normed = normalize_context(frag_context, context_norms)

    max_frag = max_n_nodes - ff_n_atoms
    frag_node_mask, frag_edge_mask = prepare_masks(
        gen_n_atoms.astype(jnp.int32).reshape(B), max_frag)
    batched = (jnp.broadcast_to(normed[:, None, :], (B, max_frag, 3))
               * frag_node_mask)
    return frag_node_mask, frag_edge_mask, batched, shift, rotation


def ifm_prepare_fragments_for_merge(
        frag_x: jnp.ndarray, frag_h: jnp.ndarray, gen_x: jnp.ndarray,
        gen_h: jnp.ndarray, max_n_nodes: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate [fixed | generated] fragments into (z_known, fixed_mask).

    frag_x: (n, 3); frag_h: (n, F); gen_x: (B, m, 3); gen_h: (B, m, F)
    with n + m == max_n_nodes.
    """
    B = gen_x.shape[0]
    n = frag_x.shape[0]
    ff_x = jnp.broadcast_to(frag_x[None], (B,) + frag_x.shape)
    ff_h = jnp.broadcast_to(frag_h[None], (B,) + frag_h.shape)
    x = jnp.concatenate([ff_x, gen_x], axis=1)
    h = jnp.concatenate([ff_h, gen_h], axis=1)
    z_known = jnp.concatenate([x, h], axis=-1)
    fixed_mask = (jnp.arange(max_n_nodes) < n).astype(jnp.float32)
    fixed_mask = jnp.broadcast_to(fixed_mask[None, :, None],
                                  (B, max_n_nodes, 1))
    return z_known, fixed_mask
