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


def load_egnn():
    return _load("egnn")


def load_diffusion():
    _load("egnn")
    return _load("equivariant_diffusion")


def load_adj_mat_seer():
    return _load("adj_mat_seer")
