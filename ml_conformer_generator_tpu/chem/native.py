"""ctypes bindings for the native host-chemistry worker (libchemhost.so).

The TPU-native analog of the reference's reliance on RDKit's C++ core
(SURVEY.md §2.4): the per-molecule graph algorithms that feed/drain the
device pipeline run in compiled C++ with a thread worker pool
(``native/chemhost.cpp``). Pure-Python implementations of the same
algorithms remain the reference semantics and the fallback
(``chem/perception.py``, ``chem/canonical.py``); outputs are bit-identical
and cross-checked in tests/test_native.py.

Set ``MLCG_TPU_NO_NATIVE=1`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libchemhost.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "chemhost.cpp")
#: must match chemhost_abi_version() in chemhost.cpp (v3: kekulization-
#: forced aromatic N-H in the attached-H invariant); a mismatching .so is
#: rebuilt, never silently used.
_ABI_VERSION = 3

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        # Build to a temp file and rename: _LIB_PATH may be dlopen'ed by
        # this or a concurrently running process, and having the linker
        # truncate a mapped .so in place SIGBUSes those processes. rename
        # is atomic and leaves the old inode mapped until they exit.
        tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o",
             tmp, _SRC_PATH, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MLCG_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.chemhost_abi_version.restype = ctypes.c_int
        if lib.chemhost_abi_version() != _ABI_VERSION:
            # Stale build from an older source revision: rebuild once (a
            # version mismatch must never silently fall back — the Python
            # and native rank algorithms are required to be bit-identical).
            # dlopen caches by pathname, so load the rebuilt library under a
            # version-suffixed copy to bypass the stale handle.
            if not _build():
                return None
            import shutil
            alt = f"{_LIB_PATH}.abi{_ABI_VERSION}"
            # copy-to-temp + atomic replace: a concurrent process may have
            # the .abi file dlopen'ed already, and truncating a mapped .so
            # in place SIGBUSes it (same hazard _build() avoids above)
            alt_tmp = f"{alt}.tmp.{os.getpid()}"
            shutil.copy2(_LIB_PATH, alt_tmp)
            os.replace(alt_tmp, alt)
            lib = ctypes.CDLL(alt)
            lib.chemhost_abi_version.restype = ctypes.c_int
            if lib.chemhost_abi_version() != _ABI_VERSION:
                return None
        lib.chemhost_connectivity.restype = ctypes.c_int
        lib.chemhost_connectivity.argtypes = [
            ctypes.c_int, _i32p, _f64p, ctypes.c_double, _i32p, ctypes.c_int]
        lib.chemhost_canonical_ranks.restype = None
        lib.chemhost_canonical_ranks.argtypes = [
            ctypes.c_int, _i32p, _i32p, ctypes.c_int, _i32p, _i64p]
        lib.chemhost_canonical_ranks_batch.restype = None
        lib.chemhost_canonical_ranks_batch.argtypes = [
            ctypes.c_int, _i32p, _i32p, _i32p, _i32p, _i32p, _i64p,
            ctypes.c_int]
        lib.chemhost_find_rings.restype = ctypes.c_int
        lib.chemhost_find_rings.argtypes = [
            ctypes.c_int, ctypes.c_int, _i32p, ctypes.c_int, _i32p, _i32p,
            ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def connectivity_from_distance(atomic_nums: np.ndarray, coords: np.ndarray,
                               tolerance: float
                               ) -> Optional[List[Tuple[int, int, int]]]:
    """Native connectivity perception; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(len(atomic_nums))
    z = np.ascontiguousarray(atomic_nums, dtype=np.int32)
    xyz = np.ascontiguousarray(coords, dtype=np.float64)
    max_bonds = max(n * (n - 1) // 2, 1)
    out = np.empty((max_bonds, 2), dtype=np.int32)
    nb = lib.chemhost_connectivity(n, z, xyz, float(tolerance),
                                   out.reshape(-1), max_bonds)
    if nb < 0:
        return None
    return [(int(i), int(j), 1) for i, j in out[:nb]]


def _bonds_array(bonds: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    if len(bonds) == 0:
        return np.zeros((0, 3), dtype=np.int32)
    return np.ascontiguousarray(np.asarray(bonds, dtype=np.int32
                                           ).reshape(-1, 3))


def canonical_ranks(atomic_nums: np.ndarray, charges: np.ndarray,
                    bonds: Sequence[Tuple[int, int, int]]
                    ) -> Optional[np.ndarray]:
    """Native canonical ranks; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(len(atomic_nums))
    z = np.ascontiguousarray(atomic_nums, dtype=np.int32)
    chg = np.ascontiguousarray(charges, dtype=np.int32)
    b = _bonds_array(bonds)
    out = np.zeros(n, dtype=np.int64)
    lib.chemhost_canonical_ranks(n, z, chg, b.shape[0], b.reshape(-1), out)
    return out


def canonical_ranks_batch(mols, n_threads: int = 0
                          ) -> Optional[List[np.ndarray]]:
    """Worker-pool canonical ranks for a batch of Molecules; None if no lib."""
    lib = _load()
    if lib is None or not mols:
        return None if lib is None else []
    atom_off = np.zeros(len(mols) + 1, dtype=np.int32)
    bond_off = np.zeros(len(mols) + 1, dtype=np.int32)
    for m_i, m in enumerate(mols):
        atom_off[m_i + 1] = atom_off[m_i] + m.num_atoms
        bond_off[m_i + 1] = bond_off[m_i] + len(m.bonds)
    z = np.concatenate([np.asarray(m.atomic_nums, np.int32) for m in mols])
    chg = np.concatenate([np.asarray(m.charges, np.int32) for m in mols])
    bonds = np.concatenate([_bonds_array(m.bonds) for m in mols]) \
        if bond_off[-1] else np.zeros((0, 3), np.int32)
    out = np.zeros(int(atom_off[-1]), dtype=np.int64)
    lib.chemhost_canonical_ranks_batch(
        len(mols), atom_off, bond_off, np.ascontiguousarray(z),
        np.ascontiguousarray(chg),
        np.ascontiguousarray(bonds.reshape(-1)), out, int(n_threads))
    return [out[atom_off[i]: atom_off[i + 1]] for i in range(len(mols))]


def find_rings(n_atoms: int, bonds: Sequence[Tuple[int, int, int]],
               max_size: int = 8) -> Optional[List[List[int]]]:
    """Native bounded smallest-ring perception; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    b = _bonds_array(bonds)
    max_rings = max(len(bonds), 1)
    out_atoms = np.zeros(max_rings * max_size, dtype=np.int32)
    out_sizes = np.zeros(max_rings, dtype=np.int32)
    nr = lib.chemhost_find_rings(n_atoms, b.shape[0], b.reshape(-1),
                                 max_size, out_atoms, out_sizes, max_rings)
    if nr < 0:
        return None
    rings: List[List[int]] = []
    pos = 0
    for r in range(nr):
        size = int(out_sizes[r])
        rings.append([int(a) for a in out_atoms[pos: pos + size]])
        pos += size
    return rings
