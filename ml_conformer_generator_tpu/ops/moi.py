"""Moment-of-inertia ops: the shape-conditioning context of the EDM.

Behavioural reference: ``/root/reference/src/mlconfgen/utils/mol_utils.py``
(``get_moment_of_inertia_tensor`` :60-85, ``get_context_shape`` :88-107,
``shift_moi_to_com_batch`` :527-550, ``inverse_coord_transform`` :508-524).

Parity note: the reference's off-diagonal MOI elements omit the weight factor
(``mol_utils.py:74-77``); with the unit masses used everywhere for shape
conditioning this is identical, and we keep the same formulation so arbitrary
``weights`` reproduce reference behaviour bit-for-bit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def moment_of_inertia_tensor(coord: jnp.ndarray,
                             weights: jnp.ndarray) -> jnp.ndarray:
    """MOI tensor (3, 3) of points (N, 3) about the origin."""
    x, y, z = coord[:, 0], coord[:, 1], coord[:, 2]
    i_xx = jnp.sum(weights * (y ** 2 + z ** 2))
    i_yy = jnp.sum(weights * (x ** 2 + z ** 2))
    i_zz = jnp.sum(weights * (x ** 2 + y ** 2))
    i_xy = -jnp.sum(x * y)
    i_xz = -jnp.sum(x * z)
    i_yz = -jnp.sum(y * z)
    return jnp.array([[i_xx, i_xy, i_xz],
                      [i_xy, i_yy, i_yz],
                      [i_xz, i_yz, i_zz]], dtype=jnp.float32)


def _np_moi(coord: np.ndarray, weights: np.ndarray) -> np.ndarray:
    x, y, z = coord[:, 0], coord[:, 1], coord[:, 2]
    return np.array(
        [[np.sum(weights * (y ** 2 + z ** 2)), -np.sum(x * y), -np.sum(x * z)],
         [-np.sum(x * y), np.sum(weights * (x ** 2 + z ** 2)), -np.sum(y * z)],
         [-np.sum(x * z), -np.sum(y * z), np.sum(weights * (x ** 2 + y ** 2))]],
        dtype=np.float32)


def get_context_shape(coord) -> Tuple[np.ndarray, np.ndarray]:
    """Principal MOI components (the EDM context) + coords in the principal frame.

    Unit masses: the context captures *shape* only. Computed host-side in
    numpy (as the reference does on CPU torch, ``mol_utils.py:88-107``): a
    3x3 eigh on <=42 points is microseconds on the host, and keeping it off
    the device saves ~10 dispatch round trips per request through this
    machine's TPU tunnel (~1.4 ms each).
    """
    c = np.asarray(coord, dtype=np.float32)
    masses = np.ones(c.shape[0], dtype=np.float32)
    moi = _np_moi(c, masses)
    _, eigenvectors = np.linalg.eigh(moi)
    rotated = c @ eigenvectors.astype(np.float32)
    context = np.diag(_np_moi(rotated, masses)).copy()
    return context, rotated


def shift_moi_to_com_batch(moi_origin: jnp.ndarray, r_coms: jnp.ndarray,
                           masses: jnp.ndarray) -> jnp.ndarray:
    """Inverse parallel-axis theorem, batched.

    moi_origin: (B, 3, 3) inertia about the origin;
    r_coms: (B, 3) origin->CoM vectors; masses: (B,) or (B, 1) total masses.
    Returns inertia tensors about the CoMs, (B, 3, 3).
    """
    B = r_coms.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    r = r_coms.reshape(B, 3, 1)
    r_outer = r @ jnp.swapaxes(r, 1, 2)
    r_norm_sq = jnp.sum(r_coms ** 2, axis=1).reshape(B, 1, 1)
    m = masses.reshape(B, 1, 1)
    return moi_origin - m * (r_norm_sq * eye - r_outer)


def inverse_coord_transform(coord: jnp.ndarray, shift: jnp.ndarray,
                            rotation: jnp.ndarray) -> jnp.ndarray:
    """Undo the per-sample principal-frame transform: rotate back then shift.

    coord: (B, N, 3); shift: (B, 3); rotation: (B, 3, 3).
    """
    B = coord.shape[0]
    x_rot = jnp.einsum("bnj,bkj->bnk", coord, rotation)
    return x_rot - shift.reshape(B, 1, 3)
