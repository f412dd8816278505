"""ONNX weight-extraction tests (onnx_weights.py + checkpoint.load_onnx_*).

The test encodes ONNX files with its own independent protobuf wire-format
writer, so the reader is validated against the spec rather than itself.
"""

import struct

import jax
import numpy as np

from ml_conformer_generator_tpu.checkpoint import (egnn_params_to_torch_names,
                                                   load_onnx_edm)
from ml_conformer_generator_tpu.config import EGNNConfig
from ml_conformer_generator_tpu.models.egnn import init_egnn_params
from ml_conformer_generator_tpu.onnx_weights import read_onnx_initializers


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor_proto(name: str, arr: np.ndarray, use_raw=True) -> bytes:
    dtype_code = {np.dtype(np.float32): 1, np.dtype(np.int64): 7}[arr.dtype]
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(dtype_code))
    msg += _len_field(8, name.encode())
    if use_raw:
        msg += _len_field(9, arr.tobytes())
    else:
        packed = struct.pack(f"<{arr.size}f", *arr.ravel().tolist())
        msg += _len_field(4, packed)
    return msg


def _onnx_model(tensors) -> bytes:
    graph = b"".join(_len_field(5, _tensor_proto(n, a, use_raw))
                     for n, a, use_raw in tensors)
    return _len_field(7, graph)


def test_reader_extracts_initializers(tmp_path, rng):
    w = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    idx = np.arange(6, dtype=np.int64).reshape(2, 3)
    path = str(tmp_path / "m.onnx")
    with open(path, "wb") as f:
        f.write(_onnx_model([("layer.weight", w, True),
                             ("p_layer.bias", b, False),
                             ("emb", idx, True)]))
    out = read_onnx_initializers(path)
    np.testing.assert_array_equal(out["layer.weight"], w)
    np.testing.assert_allclose(out["layer.bias"], b)   # p_ prefix stripped
    np.testing.assert_array_equal(out["emb"], idx)


def test_load_onnx_edm_roundtrip(tmp_path):
    cfg = EGNNConfig(hidden_nf=16, n_blocks=2)
    params = init_egnn_params(jax.random.PRNGKey(0), cfg)
    named = egnn_params_to_torch_names(params, cfg, prefix="dynamics.egnn.")
    path = str(tmp_path / "edm.onnx")
    with open(path, "wb") as f:
        f.write(_onnx_model([(k, np.asarray(v, np.float32), True)
                             for k, v in named.items()]))
    loaded = load_onnx_edm(path, cfg)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_onnx_generator_class(tmp_path):
    """MLConformerGeneratorONNX (reference conformer_generator_onnx.py:18-35)
    builds the full pipeline straight from .onnx weight artifacts."""
    from ml_conformer_generator_tpu import MLConformerGeneratorONNX
    from ml_conformer_generator_tpu.checkpoint import (
        adj_mat_seer_params_to_torch_names)
    from ml_conformer_generator_tpu.config import AdjMatSeerConfig
    from ml_conformer_generator_tpu.models.adj_mat_seer import (
        init_adj_mat_seer_params)

    egnn_cfg = EGNNConfig()          # production 420x9 — weights only, no jit
    edm_params = init_egnn_params(jax.random.PRNGKey(0), egnn_cfg)
    named = egnn_params_to_torch_names(edm_params, egnn_cfg,
                                       prefix="dynamics.egnn.")
    egnn_path = str(tmp_path / "egnn.onnx")
    with open(egnn_path, "wb") as f:
        f.write(_onnx_model([(k, np.asarray(v, np.float32), True)
                             for k, v in named.items()]))

    adj_params = init_adj_mat_seer_params(jax.random.PRNGKey(1),
                                          AdjMatSeerConfig())
    adj_named = adj_mat_seer_params_to_torch_names(adj_params)
    adj_path = str(tmp_path / "adj.onnx")
    with open(adj_path, "wb") as f:
        f.write(_onnx_model([(k, np.asarray(v, np.float32), True)
                             for k, v in adj_named.items()]))

    gen = MLConformerGeneratorONNX(diffusion_steps=10, egnn_onnx=egnn_path,
                                   adj_mat_seer_onnx=adj_path)
    for a, b in zip(jax.tree_util.tree_leaves(edm_params),
                    jax.tree_util.tree_leaves(gen.edm_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(adj_params),
                    jax.tree_util.tree_leaves(gen.adj_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_onnx_generator_rejects_non_onnx_paths():
    import pytest as _pytest

    from ml_conformer_generator_tpu.generator import MLConformerGeneratorONNX

    with _pytest.raises(ValueError, match="egnn_onnx"):
        MLConformerGeneratorONNX(egnn_onnx="weights.pt",
                                 adj_mat_seer_onnx="adj.onnx")
