"""Ahead-of-time export of the two compilation units (StableHLO).

TPU-native equivalent of the reference's ONNX export tooling
(``/root/reference/onnx_export/onnx_export.py:10-43``,
``onnx_export_utils.py:13-153``): the reference exports exactly two graph
units — the EGNN denoiser (``EGNNDynamics``) and the bond predictor
(``AdjMatSeer``) — to opset-18 ONNX for the torch-free runtime. Here the same
two units are exported as serialized StableHLO via ``jax.export``; artifacts
are portable across JAX versions/processes and can be AOT-loaded without the
model code (the analog of ``MLConformerGeneratorONNX``'s ORT sessions,
``conformer_generator_onnx.py:66-73``).

Unlike the reference (which dispatches ONE denoiser step per ONNX call, i.e.
T host round-trips per sample — ``equivariant_diffusion_onnx.py:169-179``),
the exported denoiser unit here is available in two granularities:

* ``export_denoiser``     — a single eps-prediction step (reference parity);
* ``export_sampler``      — the ENTIRE T-step reverse diffusion as one
  program (the deployment-shaped unit; no host round-trips).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .config import AdjMatSeerConfig, DiffusionConfig, EGNNConfig
from .diffusion.edm import EDMSampler
from .diffusion.schedule import gamma_schedule
from .models.adj_mat_seer import adj_mat_seer_forward
from .models.egnn import dynamics_forward

__all__ = [
    "export_denoiser", "export_sampler", "export_adj_mat_seer",
    "save_exported", "load_exported", "export_generator_artifacts",
]

_MANIFEST = "manifest.json"


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _params_sds(params):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)


def export_denoiser(params, cfg: EGNNConfig, batch: int, n_nodes: int
                    ) -> jax_export.Exported:
    """Export one eps-prediction step: (t, xh, node_mask, edge_mask, context).

    Mirrors the reference EGNN ONNX unit's named I/O
    (``onnx_export_utils.py:13-61``: t, xh, node_mask, edge_mask, context -> out).
    """
    B, N = batch, n_nodes
    nf = cfg.n_dims + cfg.in_node_nf - 1

    def fn(params, t, xh, node_mask, edge_mask, context):
        return dynamics_forward(params, t, xh, node_mask, edge_mask, context,
                                cfg)

    return jax_export.export(jax.jit(fn))(
        _params_sds(params), _sds((B,)), _sds((B, N, nf)), _sds((B, N, 1)),
        _sds((B, N, N, 1)), _sds((B, N, cfg.context_node_nf)))


def export_sampler(params, egnn_cfg: EGNNConfig, diff_cfg: DiffusionConfig,
                   batch: int, n_nodes: int, bake_params: bool = False
                   ) -> jax_export.Exported:
    """Export the full T-step reverse-diffusion sampler as one program.

    ``bake_params=True`` embeds the weights as program constants — the
    artifact is then self-contained like the reference's ONNX files and is
    what :class:`~ml_conformer_generator_tpu.generator_aot.MLConformerGeneratorAOT`
    consumes.
    """
    B, N = batch, n_nodes
    sampler = EDMSampler(egnn_cfg, diff_cfg)
    gamma = jnp.asarray(gamma_schedule(diff_cfg.timesteps,
                                       diff_cfg.noise_precision,
                                       diff_cfg.schedule_power))

    key_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    arg_sds = (key_sds, _sds((B, N, 1)), _sds((B, N, N, 1)),
               _sds((B, N, egnn_cfg.context_node_nf)))

    if bake_params:
        def fn(key, node_mask, edge_mask, context):
            return sampler.generate(params, key, gamma, node_mask, edge_mask,
                                    context)

        return jax_export.export(jax.jit(fn))(*arg_sds)

    def fn(params, key, node_mask, edge_mask, context):
        return sampler.generate(params, key, gamma, node_mask, edge_mask,
                                context)

    return jax_export.export(jax.jit(fn))(_params_sds(params), *arg_sds)


def export_adj_mat_seer(params, cfg: AdjMatSeerConfig, batch: int,
                        bake_params: bool = False) -> jax_export.Exported:
    """Export the bond predictor (elements, dist_mat, adj_mat -> logits);
    reference unit: ``onnx_export_utils.py:114-153``."""
    B, D = batch, cfg.dimension
    arg_sds = (_sds((B, D), jnp.int32), _sds((B, D, D)), _sds((B, D, D)))

    if bake_params:
        def fn(elements, dist_mat, adj_mat):
            return adj_mat_seer_forward(params, elements, dist_mat, adj_mat,
                                        cfg)

        return jax_export.export(jax.jit(fn))(*arg_sds)

    def fn(params, elements, dist_mat, adj_mat):
        return adj_mat_seer_forward(params, elements, dist_mat, adj_mat, cfg)

    return jax_export.export(jax.jit(fn))(_params_sds(params), *arg_sds)


def save_exported(exp: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(bytes(exp.serialize()))


def load_exported(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def export_generator_artifacts(generator, out_dir: str, batch: int = 32,
                               n_nodes: Optional[int] = None) -> Dict[str, str]:
    """Export both compilation units of a generator to ``out_dir``.

    The pipeline-level analog of the reference's ``export_to_onnx(model)``
    (``onnx_export/onnx_export.py:10-43``); writes a manifest with configs so
    the AOT artifacts are self-describing.
    """
    os.makedirs(out_dir, exist_ok=True)
    egnn_cfg: EGNNConfig = generator.egnn_cfg
    N = n_nodes or generator.dimension

    paths = {
        "sampler": os.path.join(out_dir, "edm_sampler.stablehlo"),
        "denoiser": os.path.join(out_dir, "egnn_denoiser.stablehlo"),
        "adj_mat_seer": os.path.join(out_dir, "adj_mat_seer.stablehlo"),
    }
    save_exported(
        export_sampler(generator.edm_params, egnn_cfg, generator.diff_cfg,
                       batch, N, bake_params=True), paths["sampler"])
    save_exported(
        export_denoiser(generator.edm_params, egnn_cfg, batch, N),
        paths["denoiser"])
    save_exported(
        export_adj_mat_seer(generator.adj_params, generator.adj_cfg, batch,
                            bake_params=True),
        paths["adj_mat_seer"])

    manifest = {
        "batch": batch,
        "n_nodes": N,
        "baked_params": ["sampler", "adj_mat_seer"],
        "min_n_nodes": generator.min_n_nodes,
        "max_n_nodes": generator.max_n_nodes,
        "diffusion_steps": generator.diffusion_steps,
        "egnn": {"hidden_nf": egnn_cfg.hidden_nf,
                 "n_blocks": egnn_cfg.n_blocks,
                 "compute_dtype": egnn_cfg.compute_dtype},
        "artifacts": {k: os.path.basename(v) for k, v in paths.items()},
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return paths
