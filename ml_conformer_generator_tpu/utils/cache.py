"""Persistent XLA compilation cache for production screening.

The full-size 100-step sampler compiles in ~10 s-2 min per distinct padded
shape (one program per node-size bucket, see PERF.md "Node-axis bucketing").
With the persistent cache enabled, repeat processes deserialize the compiled
executable in ~1-5 s instead, which makes fine-grained padding
(``MLConformerGenerator(node_bucket=1)`` — exact request sizes, +17%
throughput on the mixed-size screen protocol) economical.

The reference has no analog: its torch pipeline re-traces nothing but also
compiles nothing (``/root/reference/src/mlconfgen/conformer_generator.py``
dispatches per step from Python).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str,
                         min_compile_secs: float = 5.0) -> None:
    """Enable JAX's persistent compilation cache at ``cache_dir``.

    Safe to call at any point (before or after backend initialisation) and
    harmless on backends whose PJRT plugin cannot serialize executables —
    cache writes are then skipped. ``min_compile_secs`` skips caching trivial
    programs; pass 0 to cache everything (useful in tests).
    """
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
