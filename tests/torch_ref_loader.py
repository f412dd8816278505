"""Load the PyTorch reference implementation for activation-parity tests.

The reference package (``/root/reference/src/mlconfgen``) imports RDKit at the
package level, which is not installed here. The torch model files themselves
(``egnn.py``, ``equivariant_diffusion.py``, ``adj_mat_seer.py``) only need
torch (plus two integer constants), so we load them as submodules of a
synthetic package without executing ``mlconfgen/__init__``.

This module imports reference *code* for test-time comparison only; nothing
from it is shipped in the framework.
"""

import importlib.util
import sys
import types

REF_DIR = "/root/reference/src/mlconfgen"
PKG = "_mlconfgen_ref"


def _ensure_pkg():
    if PKG in sys.modules:
        return
    pkg = types.ModuleType(PKG)
    pkg.__path__ = [REF_DIR]
    sys.modules[PKG] = pkg
    # Stub the utils subpackage: the torch model files only use two constants.
    utils = types.ModuleType(f"{PKG}.utils")
    utils.DIMENSION = 42
    utils.NUM_BOND_TYPES = 5
    sys.modules[f"{PKG}.utils"] = utils


def _load(name: str):
    _ensure_pkg()
    full = f"{PKG}.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(full, f"{REF_DIR}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


class _AnyAttr:
    """Inert attribute sink standing in for RDKit objects at import time."""

    def __getattr__(self, name):
        return _AnyAttr()

    def __call__(self, *args, **kwargs):
        return _AnyAttr()


def _stub_rdkit():
    """Install an import-time-only rdkit stub (PEP 562 module __getattr__).

    ``utils/mol_utils.py`` / ``utils/molgraph.py`` only *reference* RDKit
    attributes at import (bond-type tables, annotations); the functions under
    parity test here are pure torch and never touch them at call time.
    """
    if "rdkit" in sys.modules:
        return
    def module_getattr(name):
        # dunder lookups (__file__, __path__, ...) must fail normally or
        # inspect/import machinery walking sys.modules trips over the stub
        if name.startswith("__"):
            raise AttributeError(name)
        return _AnyAttr()

    rdkit = types.ModuleType("rdkit")
    chem = types.ModuleType("rdkit.Chem")
    chem.__getattr__ = module_getattr
    rdkit.Chem = chem
    sys.modules["rdkit"] = rdkit
    sys.modules["rdkit.Chem"] = chem


def _load_utils_mod(name: str):
    """Load ``mlconfgen.utils.<name>`` with the real config constants."""
    _ensure_pkg()
    _stub_rdkit()
    utils = sys.modules[f"{PKG}.utils"]
    utils.__path__ = [f"{REF_DIR}/utils"]
    for dep in ("config", "molgraph", name):
        full = f"{PKG}.utils.{dep}"
        if full in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            full, f"{REF_DIR}/utils/{dep}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    return sys.modules[f"{PKG}.utils.{name}"]


def load_mol_utils():
    """The torch-side featurisation/IFM module (``utils/mol_utils.py``)."""
    return _load_utils_mod("mol_utils")


def load_egnn():
    return _load("egnn")


def load_diffusion():
    _load("egnn")
    return _load("equivariant_diffusion")


def load_adj_mat_seer():
    return _load("adj_mat_seer")
