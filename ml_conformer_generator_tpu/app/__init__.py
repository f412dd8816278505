"""Serving app: browser UI + JSON API for shape-constrained generation.

The TPU-native counterpart of the reference's Streamlit app
(``/root/reference/streamlit_app/app.py`` + the vendored Speck WebGL viewer):
a dependency-free ``http.server`` application exposing the same workflow —
upload a reference conformer, choose sample count / diffusion steps /
size variance (the reference's sliders, ``app.py:131-158``), generate,
inspect scored results in a 3D viewer, download an SDF.

Run: ``python -m ml_conformer_generator_tpu.app [--port 8080]``.
"""

from .server import ConformerServer, main

__all__ = ["ConformerServer", "main"]
