"""Debug mode: NaN surfacing + kernel interpret mode (SURVEY.md §5 plan).

The functional JAX design is deterministic by construction (no in-place
races to detect); the debug surface that matters is numerical: NaN/Inf
appearing inside the 100-step jitted sampler. ``debug_mode()`` turns on
jax's NaN checker (which re-runs offending computations op-by-op and points
at the source op) and forces Pallas kernels through the interpreter so they
participate in the checks.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

__all__ = ["debug_mode", "assert_finite"]


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = True):
    """Context manager: ``with debug_mode(): generator.generate_conformers(...)``."""
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
        if infs:
            ctx.enter_context(jax.debug_infs(True))
        yield


def assert_finite(tree, name: str = "value") -> None:
    """Host-side finiteness check over a pytree (post-hoc validation)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keystr = jax.tree_util.keystr(path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{keystr}: {bad}/{arr.size} non-finite values")
