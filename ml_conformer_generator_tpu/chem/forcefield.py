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
* harmonic **cosine angle bends** over (i, c, j) triplets with hybridisation-
  dependent ideal angles (sp 180, sp2 120, sp3 109.47);
* 2-fold **torsions** about double/aromatic bonds (sin^2 phi — minima at 0
  and 180 deg), keeping conjugated substituents planar;
* **improper (out-of-plane) terms** at every sp2 centre with three
  neighbours, which is what holds aromatic rings flat;
* soft-core repulsion between non-bonded pairs closer than a contact
  distance;
* flat-bottomed harmonic position restraints (0.2 A / k=800) to the input
  geometry — the same constraint scheme the reference applies.

This is deliberately not a parameterised MMFF94 (no atom-type tables, no
electrostatics, no 6-12 vdW attraction): under the reference's tight 0.2 A
restraints the role of the minimiser is local cleanup — bond lengths, angles
and planarity — which these terms cover.

Minimisation: batched FIRE (Bitzek et al. 2006) — per-sample adaptive
timestep and velocity mixing with uphill reset — scan-compiled at a fixed
iteration count, per-atom steps trust-region capped.
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


def _pad8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


@dataclasses.dataclass
class FFBatch:
    """Padded per-batch force-field topology (host-built, device-consumed)."""

    bonds: np.ndarray        # (B, MB, 2) int
    bond_r0: np.ndarray      # (B, MB)
    bond_mask: np.ndarray    # (B, MB)
    angles: np.ndarray       # (B, MA, 3) int  (i, c, j) triplets
    angle_cos0: np.ndarray   # (B, MA)
    angle_mask: np.ndarray   # (B, MA)
    torsions: np.ndarray     # (B, MT, 4) int  (i, b, c, j) about order-2/4 b-c
    torsion_mask: np.ndarray  # (B, MT)
    impropers: np.ndarray    # (B, MI, 4) int  (c, i, j, k) sp2 centres
    improper_mask: np.ndarray  # (B, MI)
    excl: np.ndarray         # (B, N, N) 1 where pair is bonded/1-3/self/padded
    contact: np.ndarray      # (B, N, N) nonbonded contact distance
    node_mask: np.ndarray    # (B, N)


def _hybridisation(mol: Molecule, neigh, orders) -> List[int]:
    """2 = sp, 3 = sp2, 4 = sp3 (by bond orders / neighbour count).

    Hypervalent centres are NOT inferred from multiple bonds: S and P keep
    pyramidal/tetrahedral geometry (sulfoxides, sulfones, phosphates), and
    any >=4-coordinate centre is tetrahedral regardless of its bond orders.
    """
    hyb = []
    for a in range(mol.num_atoms):
        ns = neigh[a]
        os_ = [orders[(a, n)] for n in ns]
        z = int(mol.atomic_nums[a])
        if len(ns) >= 4 or z in (15, 16):
            hyb.append(4)
        elif (3 in os_ or os_.count(2) >= 2) and len(ns) <= 2:
            hyb.append(2)
        elif 2 in os_ or 4 in os_:
            hyb.append(3)
        else:
            hyb.append(4)
    return hyb


_IDEAL_COS = {2: -1.0, 3: -0.5, 4: -1.0 / 3.0}  # cos(180), cos(120), cos(109.47)


def build_ff_batch(mols: List[Molecule], n_pad: int) -> FFBatch:
    """Build the padded topology arrays for a list of (kekulised) molecules."""
    B = len(mols)
    all_bonds, all_angles, all_tors, all_imps = [], [], [], []
    for mol in mols:
        radii = [periodic.covalent_radius(int(z)) for z in mol.atomic_nums]
        neigh = mol.neighbors()
        orders = {}
        for i, j, o in mol.bonds:
            orders[(i, j)] = o
            orders[(j, i)] = o
        bonded = set(orders)

        bonds = [(i, j, (radii[i] + radii[j]) * _ORDER_SCALE.get(o, 1.0))
                 for i, j, o in mol.bonds]

        hyb = _hybridisation(mol, neigh, orders)

        angles = []
        for c in range(mol.num_atoms):
            ns = neigh[c]
            cos0 = _IDEAL_COS[hyb[c]]
            for a_i in range(len(ns)):
                for a_j in range(a_i + 1, len(ns)):
                    i, j = ns[a_i], ns[a_j]
                    if (i, j) in bonded:
                        continue  # 3-ring: the bond itself sets the angle
                    angles.append((i, c, j, cos0))

        torsions = []
        for b, c, o in mol.bonds:
            if o not in (2, 4):
                continue
            for i in neigh[b]:
                if i == c:
                    continue
                for j in neigh[c]:
                    if j == b or j == i:
                        continue
                    torsions.append((i, b, c, j))

        imps = []
        for c in range(mol.num_atoms):
            if hyb[c] == 3 and len(neigh[c]) == 3:
                i, j, k = neigh[c]
                imps.append((c, i, j, k))

        all_bonds.append(bonds)
        all_angles.append(angles)
        all_tors.append(torsions)
        all_imps.append(imps)

    # Pad term counts to multiples of 8: bounds jit recompiles across batches
    # whose exact topology sizes differ only slightly.
    MB = _pad8(max((len(b) for b in all_bonds), default=1))
    MA = _pad8(max((len(a) for a in all_angles), default=1))
    MT = _pad8(max((len(t) for t in all_tors), default=1))
    MI = _pad8(max((len(m) for m in all_imps), default=1))

    bonds = np.zeros((B, MB, 2), dtype=np.int32)
    bond_r0 = np.zeros((B, MB), dtype=np.float32)
    bond_mask = np.zeros((B, MB), dtype=np.float32)
    angles = np.zeros((B, MA, 3), dtype=np.int32)
    angle_cos0 = np.zeros((B, MA), dtype=np.float32)
    angle_mask = np.zeros((B, MA), dtype=np.float32)
    torsions = np.zeros((B, MT, 4), dtype=np.int32)
    torsion_mask = np.zeros((B, MT), dtype=np.float32)
    impropers = np.zeros((B, MI, 4), dtype=np.int32)
    improper_mask = np.zeros((B, MI), dtype=np.float32)
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
        for k, (i, c, j, cos0) in enumerate(all_angles[b]):
            angles[b, k] = (i, c, j)
            angle_cos0[b, k] = cos0
            angle_mask[b, k] = 1.0
            excl[b, i, j] = excl[b, j, i] = 1.0
        for k, quad in enumerate(all_tors[b]):
            torsions[b, k] = quad
            torsion_mask[b, k] = 1.0
        for k, quad in enumerate(all_imps[b]):
            impropers[b, k] = quad
            improper_mask[b, k] = 1.0
        excl[b] += np.eye(n_pad, dtype=np.float32)
        pad_mask = node_mask[b][:, None] * node_mask[b][None, :]
        excl[b] = np.clip(excl[b] + (1 - pad_mask), 0, 1)
        radii = np.full(n_pad, 1.5, dtype=np.float32)
        for a in range(n):
            radii[a] = periodic.covalent_radius(int(mol.atomic_nums[a]))
        contact[b] = 0.9 * (radii[:, None] + radii[None, :])

    return FFBatch(bonds, bond_r0, bond_mask, angles, angle_cos0, angle_mask,
                   torsions, torsion_mask, impropers, improper_mask,
                   excl, contact, node_mask)


def _take(x, idx):
    """Gather coordinates: x (B, N, 3), idx (B, M) -> (B, M, 3)."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _energy(x, x0, ff: FFBatch, k_bond=300.0, k_angle=120.0, k_tor=40.0,
            k_imp=60.0, k_rep=60.0, k_restraint=800.0, restraint_flat=0.2):
    """Total restrained energy, batched over the leading axis."""
    eps = 1e-12
    # bonds
    bi = _take(x, ff.bonds[..., 0])
    bj = _take(x, ff.bonds[..., 1])
    d = jnp.sqrt(jnp.sum((bi - bj) ** 2, -1) + eps)
    e_bond = jnp.sum(ff.bond_mask * k_bond * (d - ff.bond_r0) ** 2, axis=1)

    # cosine angle bends over (i, c, j)
    ai = _take(x, ff.angles[..., 0])
    ac = _take(x, ff.angles[..., 1])
    aj = _take(x, ff.angles[..., 2])
    u = ai - ac
    v = aj - ac
    cos = jnp.sum(u * v, -1) / jnp.sqrt(
        jnp.sum(u * u, -1) * jnp.sum(v * v, -1) + eps)
    e_angle = jnp.sum(ff.angle_mask * k_angle * (cos - ff.angle_cos0) ** 2,
                      axis=1)

    # 2-fold torsions about double/aromatic bonds: E ~ sin^2(phi)
    ti = _take(x, ff.torsions[..., 0])
    tb = _take(x, ff.torsions[..., 1])
    tc = _take(x, ff.torsions[..., 2])
    tj = _take(x, ff.torsions[..., 3])
    b1 = ti - tb
    ax = tc - tb
    b2 = tj - tc
    n1 = jnp.cross(b1, ax)
    n2 = jnp.cross(ax, b2)
    cos_phi2 = jnp.sum(n1 * n2, -1) ** 2 / (
        jnp.sum(n1 * n1, -1) * jnp.sum(n2 * n2, -1) + eps)
    e_tor = jnp.sum(ff.torsion_mask * k_tor * (1.0 - cos_phi2), axis=1)

    # improper out-of-plane at sp2 centres: normalised triple product
    pc = _take(x, ff.impropers[..., 0])
    pi_ = _take(x, ff.impropers[..., 1])
    pj = _take(x, ff.impropers[..., 2])
    pk = _take(x, ff.impropers[..., 3])
    w1 = pi_ - pc
    w2 = pj - pc
    w3 = pk - pc
    trip = jnp.sum(jnp.cross(w1, w2) * w3, -1)
    norm = jnp.sqrt(jnp.sum(w1 * w1, -1) * jnp.sum(w2 * w2, -1)
                    * jnp.sum(w3 * w3, -1) + eps)
    e_imp = jnp.sum(ff.improper_mask * k_imp * (trip / norm) ** 2, axis=1)

    # nonbonded soft repulsion
    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + eps)
    viol = jnp.maximum(ff.contact - dist, 0.0)
    e_rep = 0.5 * jnp.sum((1.0 - ff.excl) * k_rep * viol ** 2, axis=(1, 2))

    # flat-bottom position restraints
    dr = jnp.sqrt(jnp.sum((x - x0) ** 2, -1) + eps)
    over = jnp.maximum(dr - restraint_flat, 0.0)
    e_res = jnp.sum(ff.node_mask * k_restraint * over ** 2, axis=1)

    return e_bond + e_angle + e_tor + e_imp + e_rep + e_res


@partial(jax.jit, static_argnames=("n_steps",))
def relax(x0: jnp.ndarray, ff: FFBatch, n_steps: int = 200,
          dt0: float = 2e-3, dt_max: float = 1e-2,
          max_step: float = 0.02) -> jnp.ndarray:
    """Batched FIRE relaxation; returns optimised coords (B, N, 3).

    FIRE (Bitzek et al., PRL 97, 170201): velocity mixed toward the downhill
    direction while the power F.v stays positive (growing the per-sample
    timestep), reset to zero on uphill steps. All adaptive state (dt, alpha,
    positive-step count) is per-sample. Per-atom displacements are
    trust-region capped at ``max_step`` Angstrom per iteration.
    """
    B = x0.shape[0]
    grad_fn = jax.grad(lambda x: jnp.sum(_energy(x, x0, ff)))
    alpha0, f_alpha, f_inc, f_dec, n_min = 0.1, 0.99, 1.1, 0.5, 5
    nm = ff.node_mask[..., None]

    def step(carry, _):
        x, v, dt, alpha, n_pos = carry
        f = -grad_fn(x) * nm
        p = jnp.sum(f * v, axis=(1, 2))                       # (B,)
        vnorm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2)) + 1e-12)
        fnorm = jnp.sqrt(jnp.sum(f * f, axis=(1, 2)) + 1e-12)
        v_mix = ((1 - alpha)[:, None, None] * v
                 + (alpha * vnorm / fnorm)[:, None, None] * f)
        uphill = p < 0.0
        v = jnp.where(uphill[:, None, None], 0.0, v_mix)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                       jnp.where(uphill, dt * f_dec, dt))
        alpha = jnp.where(grow, alpha * f_alpha,
                          jnp.where(uphill, alpha0, alpha))
        v = v + dt[:, None, None] * f
        dx = dt[:, None, None] * v
        step_len = jnp.sqrt(jnp.sum(dx * dx, -1, keepdims=True) + 1e-12)
        dx = dx * jnp.minimum(1.0, max_step / step_len)
        x = x + dx * nm
        return (x, v, dt, alpha, n_pos), None

    init = (x0, jnp.zeros_like(x0), jnp.full((B,), dt0),
            jnp.full((B,), alpha0), jnp.zeros((B,), dtype=jnp.int32))
    (x, *_), _ = jax.lax.scan(step, init, None, length=n_steps)
    return x


# register FFBatch as a pytree so it can cross the jit boundary
jax.tree_util.register_pytree_node(
    FFBatch,
    lambda ff: ((ff.bonds, ff.bond_r0, ff.bond_mask, ff.angles, ff.angle_cos0,
                 ff.angle_mask, ff.torsions, ff.torsion_mask, ff.impropers,
                 ff.improper_mask, ff.excl, ff.contact, ff.node_mask), None),
    lambda _, leaves: FFBatch(*leaves),
)


def optimize_geometry(mols: List[Molecule], n_steps: int = 200
                      ) -> List[Molecule]:
    """Relax a batch of molecules on device; returns updated copies."""
    if not mols:
        return []
    n_pad = _pad8(max(m.num_atoms for m in mols))
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
