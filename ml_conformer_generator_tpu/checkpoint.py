"""Checkpoint I/O: reference torch state-dict conversion + native npz format.

The reference ships weights as torch files with a ``{"state_dict": ...}``
envelope (``conformer_generator.py:90-102``); weight names follow its module
tree (e.g. ``dynamics.egnn.e_block_3.gcl_1.edge_mlp.0.weight``). This module
defines the bidirectional mapping between those names and this framework's
parameter pytrees, so:

* real reference checkpoints can be imported (``load_torch_edm`` /
  ``load_torch_adj_mat_seer`` — torch is only imported when used);
* parity tests can export randomly-initialised JAX params into torch modules.

Native persistence is a plain ``.npz`` of flattened ``path -> array`` entries
(no framework lock-in, no pickle).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from .config import EGNNConfig

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Name mapping
# ---------------------------------------------------------------------------

# Per-block leaf spec: (our path inside a block, torch submodule name, transpose)
_BLOCK_LEAVES: List[Tuple[Tuple[str, ...], str]] = [
    (("gcl_0", "edge_0"), "gcl_0.edge_mlp.0"),
    (("gcl_0", "edge_1"), "gcl_0.edge_mlp.2"),
    (("gcl_0", "node_0"), "gcl_0.node_mlp.0"),
    (("gcl_0", "node_1"), "gcl_0.node_mlp.2"),
    (("gcl_0", "att"), "gcl_0.att_mlp.0"),
    (("gcl_1", "edge_0"), "gcl_1.edge_mlp.0"),
    (("gcl_1", "edge_1"), "gcl_1.edge_mlp.2"),
    (("gcl_1", "node_0"), "gcl_1.node_mlp.0"),
    (("gcl_1", "node_1"), "gcl_1.node_mlp.2"),
    (("gcl_1", "att"), "gcl_1.att_mlp.0"),
    (("coord", "coord_0"), "gcl_equiv.coord_mlp.0"),
    (("coord", "coord_1"), "gcl_equiv.coord_mlp.2"),
    (("coord", "coord_out"), "gcl_equiv.coord_mlp.4"),
]


def egnn_params_to_torch_names(params: Params, cfg: EGNNConfig,
                               prefix: str = "egnn.") -> Dict[str, np.ndarray]:
    """Export our EGNN pytree as a torch-layout name->array dict."""
    out: Dict[str, np.ndarray] = {}

    def put_linear(name: str, p: Params):
        out[name + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            out[name + ".bias"] = np.asarray(p["b"])

    put_linear(prefix + "embedding", params["embedding"])
    put_linear(prefix + "embedding_out", params["embedding_out"])
    for b in range(cfg.n_blocks):
        for path, torch_name in _BLOCK_LEAVES:
            node = params["blocks"]
            for k in path:
                node = node[k]
            p = {"w": np.asarray(node["w"])[b]}
            if "b" in node:
                p["b"] = np.asarray(node["b"])[b]
            put_linear(f"{prefix}e_block_{b}.{torch_name}", p)
    return out


def torch_names_to_egnn_params(state: Dict[str, np.ndarray], cfg: EGNNConfig,
                               prefix: str = "egnn.") -> Params:
    """Build our EGNN pytree from a torch-layout name->array dict."""
    def get_linear(name: str, bias: bool = True) -> Params:
        p: Params = {"w": np.asarray(state[name + ".weight"]).T.copy()}
        if bias:
            p["b"] = np.asarray(state[name + ".bias"]).copy()
        return p

    blocks: Params = {}
    for path, torch_name in _BLOCK_LEAVES:
        has_bias = path[-1] != "coord_out"
        ws, bs = [], []
        for b in range(cfg.n_blocks):
            lin = get_linear(f"{prefix}e_block_{b}.{torch_name}", has_bias)
            ws.append(lin["w"])
            if has_bias:
                bs.append(lin["b"])
        node = blocks
        for k in path[:-1]:
            node = node.setdefault(k, {})
        entry = {"w": np.stack(ws)}
        if has_bias:
            entry["b"] = np.stack(bs)
        node[path[-1]] = entry

    return {
        "embedding": get_linear(prefix + "embedding"),
        "embedding_out": get_linear(prefix + "embedding_out"),
        "blocks": blocks,
    }


_ADJ_LINEARS = ["gcn1.linear", "gcn2.linear", "gcn3.linear", "gcn4.linear",
                "resize", "nodes_coord_fc", "gcn1_dm.linear", "gcn2_dm.linear",
                "gcn3_dm.linear", "dm_resize"]
_ADJ_OURS = ["gcn1", "gcn2", "gcn3", "gcn4", "resize", "nodes_coord_fc",
             "gcn1_dm", "gcn2_dm", "gcn3_dm", "dm_resize"]


def adj_mat_seer_params_to_torch_names(params: Params) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for ours, torch_name in zip(_ADJ_OURS, _ADJ_LINEARS):
        out[torch_name + ".weight"] = np.asarray(params[ours]["w"]).T
        out[torch_name + ".bias"] = np.asarray(params[ours]["b"])
    out["nodes_embedding.weight"] = np.asarray(params["nodes_embedding"])
    out["dm_nodes_embedding.weight"] = np.asarray(params["dm_nodes_embedding"])
    return out


def torch_names_to_adj_mat_seer_params(state: Dict[str, np.ndarray]) -> Params:
    params: Params = {}
    for ours, torch_name in zip(_ADJ_OURS, _ADJ_LINEARS):
        params[ours] = {
            "w": np.asarray(state[torch_name + ".weight"]).T.copy(),
            "b": np.asarray(state[torch_name + ".bias"]).copy(),
        }
    params["nodes_embedding"] = np.asarray(state["nodes_embedding.weight"]).copy()
    params["dm_nodes_embedding"] = np.asarray(
        state["dm_nodes_embedding.weight"]).copy()
    return params


# ---------------------------------------------------------------------------
# Torch checkpoint import (reference weight files)
# ---------------------------------------------------------------------------


def _torch_load_state(path: str) -> Dict[str, np.ndarray]:
    import torch  # local import: torch is optional at runtime

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = payload.get("state_dict", payload)
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def load_torch_edm(path: str, cfg: EGNNConfig) -> Params:
    """Import the reference EDM checkpoint (``edm_moi_chembl_15_39.pt``).

    The EDM state dict nests the denoiser under ``dynamics.`` and carries the
    (non-learned) ``gamma.gamma`` schedule buffer, which we recompute instead.
    """
    state = _torch_load_state(path)
    return torch_names_to_egnn_params(state, cfg, prefix="dynamics.egnn.")


def load_torch_adj_mat_seer(path: str) -> Params:
    state = _torch_load_state(path)
    return torch_names_to_adj_mat_seer_params(state)


def load_onnx_edm(path: str, cfg: EGNNConfig) -> Params:
    """Import the reference's ONNX EDM artifact (``egnn_chembl_15_39.onnx``).

    Initializer names of dynamo-based torch exports keep parameter FQNs, so
    the tensors map through the same name table as the torch state dicts.
    """
    from .onnx_weights import read_onnx_initializers

    state = read_onnx_initializers(path)
    prefix = ("dynamics.egnn."
              if any(k.startswith("dynamics.egnn.") for k in state)
              else "egnn.")
    return torch_names_to_egnn_params(state, cfg, prefix=prefix)


def load_onnx_adj_mat_seer(path: str) -> Params:
    from .onnx_weights import read_onnx_initializers

    return torch_names_to_adj_mat_seer_params(read_onnx_initializers(path))


# ---------------------------------------------------------------------------
# Native npz persistence
# ---------------------------------------------------------------------------


def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params: Params) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Params:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
