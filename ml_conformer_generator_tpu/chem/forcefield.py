"""Batched, jitted geometry relaxation on device.

The reference runs constrained MMFF94 minimisation per molecule on the CPU
through RDKit (``utils/standardizer.py:62-80``: position constraint 0.2 A /
k=800 on every heavy atom, <=1000 iterations). Here the equivalent capability
is a *batched* restrained force field evaluated as one jitted program over the
padded batch — hundreds of molecules relax in parallel on the TPU instead of
one-by-one on the host.

Energy terms (heavy-atom model, units arbitrary/consistent):
* harmonic bond stretch toward covalent-radius equilibrium lengths scaled by
  bond order;
* harmonic 1-3 distance terms encoding ideal angles via the law of cosines;
* soft-core repulsion between non-bonded pairs closer than a contact distance;
* flat-bottomed harmonic position restraints (0.2 A / k=800) to the input
  geometry — the same constraint scheme the reference applies.

Minimisation: FIRE-flavoured damped gradient descent with per-sample adaptive
step size, fixed iteration count (static shape, scan-compiled).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import periodic
from .mol import Molecule

#: Bond-length scale factors per bond order (single/double/triple/aromatic).
_ORDER_SCALE = {1: 1.0, 2: 0.87, 3: 0.78, 4: 0.92}

_IDEAL_ANGLE = {1: 180.0, 2: 120.0, 3: 109.47, 4: 109.47}


@dataclasses.dataclass
class FFBatch:
    """Padded per-batch force-field topology (host-built, device-consumed)."""

    bonds: np.ndarray        # (B, MB, 2) int
    bond_r0: np.ndarray      # (B, MB)
    bond_mask: np.ndarray    # (B, MB)
    angles: np.ndarray       # (B, MA, 2) int  (1-3 atom pairs)
    angle_r0: np.ndarray     # (B, MA)
    angle_mask: np.ndarray   # (B, MA)
    excl: np.ndarray         # (B, N, N) 1 where pair is bonded/1-3/self/padded
    contact: np.ndarray      # (B, N, N) nonbonded contact distance
    node_mask: np.ndarray    # (B, N)


def build_ff_batch(mols: List[Molecule], n_pad: int) -> FFBatch:
    """Build the padded topology arrays for a list of (kekulised) molecules."""
    B = len(mols)
    all_bonds, all_angles = [], []
    for mol in mols:
        radii = [periodic.covalent_radius(int(z)) for z in mol.atomic_nums]
        bonds = []
        for i, j, o in mol.bonds:
            r0 = (radii[i] + radii[j]) * _ORDER_SCALE.get(o, 1.0)
            bonds.append((i, j, r0))
        # 1-3 pairs through each central atom
        neigh = mol.neighbors()
        orders = {}
        for i, j, o in mol.bonds:
            orders[(i, j)] = o
            orders[(j, i)] = o
        angles = []
        for c in range(mol.num_atoms):
            ns = neigh[c]
            max_o = max((orders[(c, n)] for n in ns), default=1)
            theta = np.deg2rad(_IDEAL_ANGLE.get(max_o, 109.47))
            if len(ns) >= 4:
                theta = np.deg2rad(109.47)
            elif len(ns) == 3 and max_o == 1:
                theta = np.deg2rad(109.47)
            elif len(ns) == 3:
                theta = np.deg2rad(120.0)
            for a_i in range(len(ns)):
                for a_j in range(a_i + 1, len(ns)):
                    i, j = ns[a_i], ns[a_j]
                    r1 = (radii[c] + radii[i]) * _ORDER_SCALE.get(
                        orders[(c, i)], 1.0)
                    r2 = (radii[c] + radii[j]) * _ORDER_SCALE.get(
                        orders[(c, j)], 1.0)
                    r13 = np.sqrt(r1 * r1 + r2 * r2
                                  - 2 * r1 * r2 * np.cos(theta))
                    angles.append((i, j, r13))
        all_bonds.append(bonds)
        all_angles.append(angles)

    MB = max((len(b) for b in all_bonds), default=1) or 1
    MA = max((len(a) for a in all_angles), default=1) or 1

    bonds = np.zeros((B, MB, 2), dtype=np.int32)
    bond_r0 = np.zeros((B, MB), dtype=np.float32)
    bond_mask = np.zeros((B, MB), dtype=np.float32)
    angles = np.zeros((B, MA, 2), dtype=np.int32)
    angle_r0 = np.zeros((B, MA), dtype=np.float32)
    angle_mask = np.zeros((B, MA), dtype=np.float32)
    excl = np.zeros((B, n_pad, n_pad), dtype=np.float32)
    contact = np.zeros((B, n_pad, n_pad), dtype=np.float32)
    node_mask = np.zeros((B, n_pad), dtype=np.float32)

    for b, mol in enumerate(mols):
        n = mol.num_atoms
        node_mask[b, :n] = 1.0
        for k, (i, j, r0) in enumerate(all_bonds[b]):
            bonds[b, k] = (i, j)
            bond_r0[b, k] = r0
            bond_mask[b, k] = 1.0
            excl[b, i, j] = excl[b, j, i] = 1.0
        for k, (i, j, r13) in enumerate(all_angles[b]):
            angles[b, k] = (i, j)
            angle_r0[b, k] = r13
            angle_mask[b, k] = 1.0
            excl[b, i, j] = excl[b, j, i] = 1.0
        excl[b] += np.eye(n_pad, dtype=np.float32)
        pad_mask = node_mask[b][:, None] * node_mask[b][None, :]
        excl[b] = np.clip(excl[b] + (1 - pad_mask), 0, 1)
        radii = np.full(n_pad, 1.5, dtype=np.float32)
        for a in range(n):
            radii[a] = periodic.covalent_radius(int(mol.atomic_nums[a]))
        contact[b] = 0.9 * (radii[:, None] + radii[None, :])

    return FFBatch(bonds, bond_r0, bond_mask, angles, angle_r0, angle_mask,
                   excl, contact, node_mask)


def _energy(x, x0, ff: FFBatch, k_bond=300.0, k_angle=80.0, k_rep=60.0,
            k_restraint=800.0, restraint_flat=0.2):
    """Total restrained energy, batched over the leading axis."""
    # bonds
    bi = jnp.take_along_axis(x, ff.bonds[..., 0][..., None], axis=1)
    bj = jnp.take_along_axis(x, ff.bonds[..., 1][..., None], axis=1)
    d = jnp.sqrt(jnp.sum((bi - bj) ** 2, -1) + 1e-12)
    e_bond = jnp.sum(ff.bond_mask * k_bond * (d - ff.bond_r0) ** 2, axis=1)

    # 1-3 angles (as distances)
    ai = jnp.take_along_axis(x, ff.angles[..., 0][..., None], axis=1)
    aj = jnp.take_along_axis(x, ff.angles[..., 1][..., None], axis=1)
    d13 = jnp.sqrt(jnp.sum((ai - aj) ** 2, -1) + 1e-12)
    e_angle = jnp.sum(ff.angle_mask * k_angle * (d13 - ff.angle_r0) ** 2,
                      axis=1)

    # nonbonded soft repulsion
    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12)
    viol = jnp.maximum(ff.contact - dist, 0.0)
    e_rep = 0.5 * jnp.sum((1.0 - ff.excl) * k_rep * viol ** 2, axis=(1, 2))

    # flat-bottom position restraints
    dr = jnp.sqrt(jnp.sum((x - x0) ** 2, -1) + 1e-12)
    over = jnp.maximum(dr - restraint_flat, 0.0)
    e_res = jnp.sum(ff.node_mask * k_restraint * over ** 2, axis=1)

    return e_bond + e_angle + e_rep + e_res


@partial(jax.jit, static_argnames=("n_steps",))
def relax(x0: jnp.ndarray, ff: FFBatch, n_steps: int = 200,
          lr: float = 5e-4, max_step: float = 0.02) -> jnp.ndarray:
    """Damped gradient-descent relaxation; returns optimised coords (B, N, 3).

    Per-atom displacements are trust-region-capped at ``max_step`` Angstrom per
    iteration, which keeps the stiff restrained system stable without line
    search (total reachable drift = n_steps * max_step).
    """
    grad_fn = jax.grad(lambda x: jnp.sum(_energy(x, x0, ff)))

    def step(carry, _):
        x, v = carry
        g = grad_fn(x)
        v = 0.7 * v - lr * g
        # cap per-atom step length
        vnorm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
        scale = jnp.minimum(1.0, max_step / vnorm)
        x = x + v * scale * ff.node_mask[..., None]
        return (x, v), None

    (x, _), _ = jax.lax.scan(step, (x0, jnp.zeros_like(x0)), None,
                             length=n_steps)
    return x


# register FFBatch as a pytree so it can cross the jit boundary
jax.tree_util.register_pytree_node(
    FFBatch,
    lambda ff: ((ff.bonds, ff.bond_r0, ff.bond_mask, ff.angles, ff.angle_r0,
                 ff.angle_mask, ff.excl, ff.contact, ff.node_mask), None),
    lambda _, leaves: FFBatch(*leaves),
)


def optimize_geometry(mols: List[Molecule], n_steps: int = 200
                      ) -> List[Molecule]:
    """Relax a batch of molecules on device; returns updated copies."""
    if not mols:
        return []
    n_pad = max(m.num_atoms for m in mols)
    ff = build_ff_batch(mols, n_pad)
    x0 = np.zeros((len(mols), n_pad, 3), dtype=np.float32)
    for b, m in enumerate(mols):
        x0[b, : m.num_atoms] = m.coords
    x = np.asarray(relax(jnp.asarray(x0), ff, n_steps=n_steps))
    out = []
    for b, m in enumerate(mols):
        c = m.copy()
        c.coords = x[b, : m.num_atoms].astype(np.float64)
        out.append(c)
    return out
