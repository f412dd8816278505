"""Public pipeline API: shape-conditioned molecule generation.

Behavioural reference: ``/root/reference/src/mlconfgen/conformer_generator.py``
(``MLConformerGenerator`` :19-399). The public signature of
``generate_conformers`` matches the reference exactly
(``conformer_generator.py:268-282``); molecules are this framework's
:class:`~.chem.mol.Molecule` instead of RDKit Mols.

TPU-first structure:
* the whole T-step sampler (plus inpaint/merge variants) is one jitted program
  per (batch, nodes) shape — no per-step host dispatch;
* jitted executables are cached per shape bucket;
* the bond predictor runs as a second jitted program;
* chemistry (perception, canonicalisation, sanitisation) runs host-side, and
  geometry optimisation runs as a third batched device program.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import (load_params, load_torch_adj_mat_seer, load_torch_edm,
                         save_params)
from .chem.bonds import redefine_bonds
from .chem.featurize import (fragment_to_xh, prepare_adj_mat_seer_input,
                             samples_to_molecules)
from .chem.mol import Molecule
from .chem.standardize import standardize_batch
from .config import (ATOM_DECODER, CONTEXT_NORMS, DIMENSION, MAX_N_NODES,
                     MIN_N_NODES, NUM_BOND_TYPES, AdjMatSeerConfig,
                     DiffusionConfig, EGNNConfig)
from .diffusion.edm import EDMSampler
from .diffusion.schedule import gamma_schedule
from .models.adj_mat_seer import (adj_mat_seer_forward,
                                  init_adj_mat_seer_params)
from .models.egnn import init_egnn_params
from .ops.moi import get_context_shape, inverse_coord_transform
from .utils.fragments import (ifm_prepare_fragments_for_merge,
                              ifm_prepare_gen_fragment_context,
                              prepare_fragment)
from .utils.masks import pad_to_bucket, prepare_edm_input
from .utils.metrics import StageTimer


class MLConformerGenerator:
    """Generates novel molecules matching the 3D shape of a reference.

    Weights: pass ``edm_weights`` / ``adj_mat_seer_weights`` as either native
    ``.npz`` checkpoints or the reference's torch ``.pt`` files (converted on
    load). Without weight files the models are randomly initialised (useful
    only for pipeline testing — EDM sampling needs trained weights to produce
    chemistry).
    """

    def __init__(
        self,
        diffusion_steps: int = 100,
        dimension: int = DIMENSION,
        num_bond_types: int = NUM_BOND_TYPES,
        min_n_nodes: int = MIN_N_NODES,
        max_n_nodes: int = MAX_N_NODES,
        context_norms: Dict = CONTEXT_NORMS,
        atom_decoder: Dict[int, str] = ATOM_DECODER,
        edm_weights: Optional[str] = None,
        adj_mat_seer_weights: Optional[str] = None,
        seed: int = 0,
        dtype=jnp.float32,
        compute_dtype: str = "bfloat16",
        use_pallas: str = "off",
        node_bucket: int = 8,
        compile_cache_dir: Optional[str] = None,
    ):
        if compile_cache_dir:
            # Persistent executable cache: makes fine node_bucket settings
            # (more compiled programs, less N^2 padding waste) economical
            # across processes — see utils/cache.py and PERF.md.
            from .utils.cache import enable_compile_cache
            enable_compile_cache(compile_cache_dir)
        self.dimension = dimension
        self.context_norms = context_norms
        self.atom_decoder = atom_decoder
        self.min_n_nodes = min_n_nodes
        self.max_n_nodes = max_n_nodes
        self.diffusion_steps = diffusion_steps
        #: node-axis padding granularity: smaller buckets waste less N^2 edge
        #: work per request but compile more sampler programs (one per
        #: distinct padded size) — see PERF.md
        self.node_bucket = node_bucket

        # bf16 feature path on the MXU (f32 geometry); the XLA dense edge
        # path beats the fused Pallas kernel at this model size on v5e
        # (43.6 vs 26.7 samples/s at B=128/N=42 — see ops/gcl_kernel.py),
        # so use_pallas defaults to "off".
        self.egnn_cfg = EGNNConfig(in_node_nf=9, context_node_nf=3,
                                   hidden_nf=420, compute_dtype=compute_dtype,
                                   use_pallas=use_pallas)
        self.diff_cfg = DiffusionConfig(timesteps=diffusion_steps,
                                        noise_precision=1e-5)
        self.adj_cfg = AdjMatSeerConfig(dimension=dimension, n_hidden=2048,
                                        embedding_dim=64, num_embeddings=36,
                                        num_bond_types=num_bond_types)

        key = jax.random.PRNGKey(seed)
        k_edm, k_adj, self._key = jax.random.split(key, 3)

        if edm_weights is None:
            self.edm_params = init_egnn_params(k_edm, self.egnn_cfg, dtype)
        elif edm_weights.endswith(".npz"):
            self.edm_params = load_params(edm_weights)
        elif edm_weights.endswith(".onnx"):
            from .checkpoint import load_onnx_edm
            self.edm_params = load_onnx_edm(edm_weights, self.egnn_cfg)
        else:
            self.edm_params = load_torch_edm(edm_weights, self.egnn_cfg)

        if adj_mat_seer_weights is None:
            self.adj_params = init_adj_mat_seer_params(k_adj, self.adj_cfg,
                                                       dtype)
        elif adj_mat_seer_weights.endswith(".npz"):
            self.adj_params = load_params(adj_mat_seer_weights)
        elif adj_mat_seer_weights.endswith(".onnx"):
            from .checkpoint import load_onnx_adj_mat_seer
            self.adj_params = load_onnx_adj_mat_seer(adj_mat_seer_weights)
        else:
            self.adj_params = load_torch_adj_mat_seer(adj_mat_seer_weights)

        # Rebuilt schedule for the requested step count (reference :104-113).
        self.gamma = jnp.asarray(gamma_schedule(diffusion_steps,
                                                precision=1e-5))
        self.sampler = EDMSampler(self.egnn_cfg, self.diff_cfg)

        # jit caches -----------------------------------------------------
        self._generate_fn = {}
        self._inpaint_fn = {}
        self._merge_fn = {}
        # Bond-type argmax runs ON DEVICE: only a (B, D, D) int8 matrix
        # crosses the host boundary, not (B, D, D, 5) float32 logits — a
        # 20x transfer cut that matters through this machine's TPU relay.
        self._adj_fn = jax.jit(
            lambda p, e, d, a: jnp.argmax(
                adj_mat_seer_forward(p, e, d, a, self.adj_cfg),
                axis=-1).astype(jnp.int8))

    # ------------------------------------------------------------------
    # RNG
    # ------------------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    # Compiled samplers (cached per static config)
    # ------------------------------------------------------------------

    def _get_generate(self, resample_steps: int):
        fn = self._generate_fn.get(resample_steps)
        if fn is None:
            fn = jax.jit(partial(self.sampler.generate,
                                 resample_steps=resample_steps))
            self._generate_fn[resample_steps] = fn
        return fn

    def _get_inpaint(self, resample_steps: int, blend_power: int):
        k = (resample_steps, blend_power)
        fn = self._inpaint_fn.get(k)
        if fn is None:
            fn = jax.jit(partial(self.sampler.inpaint,
                                 resample_steps=resample_steps,
                                 blend_power=blend_power))
            self._inpaint_fn[k] = fn
        return fn

    def _get_merge(self, diffusion_level: int, resample_steps: int,
                   blend_power: int):
        k = (diffusion_level, resample_steps, blend_power)
        fn = self._merge_fn.get(k)
        if fn is None:
            fn = jax.jit(partial(self.sampler.merge_fragments,
                                 diffusion_level=diffusion_level,
                                 resample_steps=resample_steps,
                                 blend_power=blend_power))
            self._merge_fn[k] = fn
        return fn

    # ------------------------------------------------------------------
    # Sampling stage (reference edm_samples :125-266)
    # ------------------------------------------------------------------

    def edm_samples(
        self,
        reference_context: jnp.ndarray,
        n_samples: int = 100,
        max_n_nodes: int = 32,
        min_n_nodes: int = 25,
        resample_steps: int = 0,
        fixed_fragment: Optional[Molecule] = None,
        inertial_fragment_matching: bool = True,
        blend_power: int = 3,
        ifm_diffusion_level: int = 50,
    ) -> List[Molecule]:
        """Run the diffusion stage; returns bond-less molecules."""
        min_n_nodes = max(min_n_nodes, self.min_n_nodes)
        max_n_nodes = min(max_n_nodes, self.max_n_nodes)
        # Pad the node axis to a bucket boundary: sizes are drawn in
        # [min, max] as before, but the compiled sampler shape only changes
        # per bucket, bounding 100-step-program recompiles across requests
        # of nearby sizes (SURVEY.md §7 hard part 5).
        n_pad = pad_to_bucket(max_n_nodes, self.node_bucket)

        node_mask, edge_mask, batch_context, n_nodes = prepare_edm_input(
            self._next_key(), n_samples, jnp.asarray(reference_context),
            self.context_norms, min_n_nodes, max_n_nodes, n_nodes_pad=n_pad)

        if fixed_fragment is None:
            x, h = self._get_generate(resample_steps)(
                self.edm_params, self._next_key(), self.gamma, node_mask,
                edge_mask, batch_context)
        elif inertial_fragment_matching:
            x, h = self._ifm_samples(
                reference_context, node_mask, edge_mask, batch_context,
                n_nodes, fixed_fragment, n_pad, min_n_nodes,
                resample_steps, blend_power, ifm_diffusion_level)
        else:
            frag_x, frag_h = fragment_to_xh(fixed_fragment)
            z_known, fixed_mask = prepare_fragment(
                n_samples, jnp.asarray(frag_x), jnp.asarray(frag_h),
                n_pad, min_n_nodes)
            x, h = self._get_inpaint(resample_steps, blend_power)(
                self.edm_params, self._next_key(), self.gamma, node_mask,
                edge_mask, batch_context, z_known, fixed_mask)

        return samples_to_molecules(np.asarray(x), np.asarray(h),
                                    np.asarray(node_mask), self.atom_decoder)

    def _ifm_samples(self, reference_context, node_mask, edge_mask,
                     batch_context, n_nodes, fixed_fragment, max_n_nodes,
                     min_n_nodes, resample_steps, blend_power,
                     ifm_diffusion_level):
        """Inertial fragment matching (reference :179-241).

        Generate the complement fragments in their own principal frames, rotate
        them back, then merge with the fixed fragment by partial re-diffusion.
        """
        frag_x, frag_h = fragment_to_xh(fixed_fragment)
        frag_x = jnp.asarray(frag_x)
        frag_h = jnp.asarray(frag_h)

        (frag_node_mask, frag_edge_mask, frag_context, shift,
         rotation) = ifm_prepare_gen_fragment_context(
            frag_x, jnp.asarray(reference_context), self.context_norms,
            np.asarray(n_nodes), max_n_nodes, min_n_nodes)

        x_gen, h_gen = self._get_generate(resample_steps)(
            self.edm_params, self._next_key(), self.gamma, frag_node_mask,
            frag_edge_mask, frag_context)

        x_gen = inverse_coord_transform(x_gen, shift, rotation)

        z_known, fixed_mask = ifm_prepare_fragments_for_merge(
            frag_x, frag_h, x_gen, h_gen, max_n_nodes)

        return self._get_merge(ifm_diffusion_level, resample_steps,
                               blend_power)(
            self.edm_params, self._next_key(), self.gamma, node_mask,
            edge_mask, fixed_mask, batch_context, z_known)

    # ------------------------------------------------------------------
    # Full pipeline (reference generate_conformers :268-368)
    # ------------------------------------------------------------------

    def generate_conformers(
        self,
        reference_conformer: Optional[Molecule] = None,
        n_samples: int = 10,
        variance: int = 2,
        reference_context=None,
        n_atoms: Optional[int] = None,
        optimise_geometry: bool = True,
        resample_steps: int = 0,
        fixed_fragment: Optional[Molecule] = None,
        inertial_fragment_matching: bool = True,
        blend_power: int = 3,
        ifm_diffusion_level: int = 50,
    ) -> List[Molecule]:
        """Generate valid, standardised molecules matching a reference shape.

        Same signature and routing as the reference
        (``conformer_generator.py:268-368``).
        """
        if reference_conformer is not None:
            ref = reference_conformer.remove_hs()
            ref_n_atoms = ref.num_atoms
            coords = np.asarray(ref.coords, dtype=np.float32)
            coords = coords - coords.mean(axis=0)
            ref_context, _ = get_context_shape(coords)
        elif reference_context is not None:
            if not n_atoms:
                raise ValueError(
                    "Reference Number of Atoms should be provided, when "
                    "generating samples using context.")
            ref_n_atoms = n_atoms
            ref_context = jnp.asarray(reference_context)
        else:
            raise ValueError(
                "Either a reference Molecule or context should be provided "
                "for generation.")

        timer = StageTimer()
        with timer.stage("edm_sampling"):
            raw = self.edm_samples(
                reference_context=ref_context,
                n_samples=n_samples,
                min_n_nodes=ref_n_atoms - variance,
                max_n_nodes=ref_n_atoms + variance,
                resample_steps=resample_steps,
                fixed_fragment=fixed_fragment,
                inertial_fragment_matching=inertial_fragment_matching,
                blend_power=blend_power,
                ifm_diffusion_level=ifm_diffusion_level,
            )

        with timer.stage("featurize"):
            elements, dist, adj, canon = prepare_adj_mat_seer_input(
                raw, self.dimension)

        with timer.stage("bond_prediction"):
            # (B, D, D) int8 bond types, argmax-decoded on device
            adj_types = np.asarray(self._adj_fn(
                self.adj_params, jnp.asarray(elements), jnp.asarray(dist),
                jnp.asarray(adj)))

        with timer.stage("standardize"):
            bonded = [redefine_bonds(canon[i], adj_types[i])
                      for i in range(len(canon))]
            standardized = standardize_batch(bonded, optimise_geometry)
        valid = [m for m in standardized if m is not None]
        timer.count("requested", n_samples)
        timer.count("valid", len(valid))
        #: per-stage latency + yield of the most recent request (SURVEY.md §5)
        self.last_metrics = timer.summary()
        return valid

    #: reference parity: ``forward`` aliases the full pipeline
    #: (``conformer_generator.py:370-399``), as does calling the instance.
    forward = generate_conformers
    __call__ = generate_conformers

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------

    def save_weights(self, edm_path: str, adj_path: str) -> None:
        save_params(edm_path, self.edm_params)
        save_params(adj_path, self.adj_params)


class MLConformerGeneratorONNX(MLConformerGenerator):
    """Drop-in analog of the reference's torch-free ONNX runtime class.

    The reference ships a second, numpy+onnxruntime implementation of the
    whole pipeline (``conformer_generator_onnx.py:18-73``) so users without
    torch can run inference from the ``.onnx`` weight artifacts. This
    framework needs no second engine — the JAX pipeline is already
    torch-free — so this class only preserves the reference's constructor
    shape: it takes the same ``egnn_onnx`` / ``adj_mat_seer_onnx`` paths,
    pulls the initializer tensors straight out of the ONNX protobufs
    (``onnx_weights.py``, no onnx/onnxruntime dependency), and runs the
    identical TPU pipeline. The reference numpy port's uniform-vs-gaussian
    position-noise bug (``equivariant_diffusion_onnx.py:52``) is deliberately
    not replicated.
    """

    def __init__(
        self,
        diffusion_steps: int = 100,
        dimension: int = DIMENSION,
        min_n_nodes: int = MIN_N_NODES,
        max_n_nodes: int = MAX_N_NODES,
        context_norms: Dict = CONTEXT_NORMS,
        atom_decoder: Dict[int, str] = ATOM_DECODER,
        egnn_onnx: str = "./egnn_chembl_15_39.onnx",
        adj_mat_seer_onnx: str = "./adj_mat_seer_chembl_15_39.onnx",
        **kwargs,
    ):
        # The parent dispatches loaders on the path suffix; a non-.onnx path
        # here would silently fall through to the torch .pt loader with a
        # confusing error, so fail fast with a clear message.
        for name, path in (("egnn_onnx", egnn_onnx),
                           ("adj_mat_seer_onnx", adj_mat_seer_onnx)):
            if not str(path).endswith(".onnx"):
                raise ValueError(
                    f"MLConformerGeneratorONNX expects {name} to be a .onnx "
                    f"file, got {path!r}")
        super().__init__(
            diffusion_steps=diffusion_steps,
            dimension=dimension,
            min_n_nodes=min_n_nodes,
            max_n_nodes=max_n_nodes,
            context_norms=context_norms,
            atom_decoder=atom_decoder,
            edm_weights=egnn_onnx,
            adj_mat_seer_weights=adj_mat_seer_onnx,
            **kwargs,
        )
