"""AOT-artifact pipeline: generation from serialized StableHLO, no model code.

The analog of the reference's torch-free ONNX runtime path
(``/root/reference/src/mlconfgen/conformer_generator_onnx.py:18-335``): the
reference ships ONNX files and drives them through onnxruntime with a numpy
re-implementation of the sampler. Here the *entire* T-step sampler and the
bond predictor are single self-contained StableHLO artifacts (weights baked
as constants — ``export.export_generator_artifacts``), so the deployment
path needs neither the model definitions nor a second sampler
implementation; the host side only does featurisation and standardisation.

Structural contrast worth noting: the reference's ONNX path makes T
Python<->C++ round trips per request (one ``session.run`` per denoise step,
``equivariant_diffusion_onnx.py:169-179``); this path makes exactly one.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .chem.bonds import redefine_bonds
from .chem.featurize import prepare_adj_mat_seer_input, samples_to_molecules
from .chem.mol import Molecule
from .chem.standardize import standardize_batch
from .config import ATOM_DECODER, CONTEXT_NORMS
from .export import load_exported
from .ops.moi import get_context_shape
from .utils.masks import prepare_edm_input

__all__ = ["MLConformerGeneratorAOT"]


class MLConformerGeneratorAOT:
    """Drives generation from an exported artifact directory.

    Limitations inherent to AOT shapes (same as any serialized-graph runtime):
    fixed sample batch and node padding per artifact set; ``n_samples`` above
    the exported batch are generated in multiple calls.
    """

    def __init__(self, artifact_dir: str, context_norms=CONTEXT_NORMS,
                 atom_decoder=ATOM_DECODER, seed: int = 0):
        with open(os.path.join(artifact_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        arts = self.manifest["artifacts"]
        self._sampler = load_exported(
            os.path.join(artifact_dir, arts["sampler"]))
        self._adj = load_exported(
            os.path.join(artifact_dir, arts["adj_mat_seer"]))
        self.batch = int(self.manifest["batch"])
        self.n_nodes = int(self.manifest["n_nodes"])
        self.min_n_nodes = int(self.manifest.get("min_n_nodes", 15))
        self.max_n_nodes = int(self.manifest.get("max_n_nodes",
                                                 self.n_nodes - 1))
        self.context_norms = context_norms
        self.atom_decoder = atom_decoder
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return jax.random.key_data(sub).astype(jnp.uint32)

    def generate_conformers(self, reference_conformer: Optional[Molecule] = None,
                            n_samples: int = 10, variance: int = 2,
                            reference_context=None,
                            n_atoms: Optional[int] = None,
                            optimise_geometry: bool = True) -> List[Molecule]:
        """Reference-compatible core signature (fragment workflows require the
        full generator — the reference's ONNX path has the same split)."""
        if reference_conformer is not None:
            ref = reference_conformer.remove_hs()
            coords = np.asarray(ref.coords, dtype=np.float32)
            coords = coords - coords.mean(axis=0)
            ref_context, _ = get_context_shape(coords)
            ref_n = ref.num_atoms
        elif reference_context is not None:
            if not n_atoms:
                raise ValueError("n_atoms required with reference_context")
            ref_context = jnp.asarray(reference_context)
            ref_n = n_atoms
        else:
            raise ValueError("reference conformer or context required")

        lo = max(ref_n - variance, self.min_n_nodes)
        hi = min(ref_n + variance, min(self.max_n_nodes, self.n_nodes - 1))

        raw: List[Molecule] = []
        while len(raw) < n_samples:
            self._key, sub = jax.random.split(self._key)
            node_mask, edge_mask, context, _ = prepare_edm_input(
                sub, self.batch, ref_context, self.context_norms, lo, hi,
                n_nodes_pad=self.n_nodes)
            x, h = self._sampler.call(self._next_key(), node_mask, edge_mask,
                                      context)
            raw.extend(samples_to_molecules(
                np.asarray(x), np.asarray(h), np.asarray(node_mask),
                self.atom_decoder))
        raw = raw[:n_samples]

        # Bond prediction in exported-batch chunks.
        elements, dist, adj, canon = prepare_adj_mat_seer_input(raw)
        bonded: List[Molecule] = []
        for s in range(0, len(canon), self.batch):
            e = min(s + self.batch, len(canon))
            pad = self.batch - (e - s)
            el = np.pad(elements[s:e], ((0, pad), (0, 0)))
            dm = np.pad(dist[s:e], ((0, pad), (0, 0), (0, 0)))
            am = np.pad(adj[s:e], ((0, pad), (0, 0), (0, 0)))
            logits = np.asarray(self._adj.call(
                jnp.asarray(el, jnp.int32), jnp.asarray(dm),
                jnp.asarray(am)))
            bonded.extend(redefine_bonds(canon[s + i], logits[i])
                          for i in range(e - s))
        standardized = standardize_batch(bonded, optimise_geometry)
        return [m for m in standardized if m is not None]

    __call__ = generate_conformers
