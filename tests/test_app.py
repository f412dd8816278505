"""Serving app tests (app/server.py; reference analog: streamlit_app/)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import pytest

from ml_conformer_generator_tpu.app.server import (ConformerServer,
                                                   _make_handler)
from ml_conformer_generator_tpu.config import EGNNConfig

CEYYAG = "/root/reference/assets/demo_files/ceyyag.mol"


@pytest.fixture(scope="module")
def app_server():
    """Server whose generator is shrunk for CPU test speed."""
    from ml_conformer_generator_tpu.diffusion.edm import EDMSampler
    from ml_conformer_generator_tpu.generator import MLConformerGenerator
    from ml_conformer_generator_tpu.models.egnn import init_egnn_params

    srv = ConformerServer(default_steps=4)
    gen = MLConformerGenerator(diffusion_steps=4, seed=0)
    small = EGNNConfig(hidden_nf=32, n_blocks=2)
    gen.egnn_cfg = small
    gen.edm_params = init_egnn_params(jax.random.PRNGKey(0), small)
    gen.sampler = EDMSampler(small, gen.diff_cfg)
    srv._generators[4] = gen
    return srv


def _mol_block():
    with open(CEYYAG) as f:
        return f.read()


def test_generate_endpoint_logic(app_server):
    out = app_server.generate({"mol_block": _mol_block(), "n_samples": 3,
                               "diffusion_steps": 4, "variance": 2})
    assert out["metrics"]["requested"] == 3
    assert 0 <= out["metrics"]["valid"] <= 3
    assert "reference_mol_block" in out
    # samples sorted by shape tanimoto descending
    scores = [s["shape_tanimoto"] for s in out["samples"]]
    assert scores == sorted(scores, reverse=True)


def test_generate_validates_input(app_server):
    with pytest.raises(ValueError):
        app_server.generate({"n_samples": 3})
    with pytest.raises(ValueError):
        app_server.generate({"mol_block": _mol_block(), "n_samples": 10000})


def test_http_roundtrip(app_server):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(app_server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/health") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "ML Conformer Generator" in page

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/generate",
            data=json.dumps({"mol_block": _mol_block(), "n_samples": 2,
                             "diffusion_steps": 4}).encode(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["metrics"]["requested"] == 2

        # bad request -> 400 with error payload
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/generate", data=b"{}",
            method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_generate_accepts_pdb_reference(app_server):
    """PDB upload path (reference streamlit_app/app.py:100-115)."""
    from ml_conformer_generator_tpu.chem import read_mol_file, to_xyz_block
    from ml_conformer_generator_tpu.chem.io import from_xyz_block

    # build a PDB block from the demo reference's heavy atoms
    ref = read_mol_file(CEYYAG).remove_hs()
    lines = ["HEADER    DEMO"]
    for k, (sym, (x, y, z)) in enumerate(zip(ref.symbols(), ref.coords), 1):
        lines.append(f"HETATM{k:5d} {sym:<4}LIG A   1    "
                     f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          "
                     f"{sym.upper():>2}")
    lines.append("END")
    out = app_server.generate({"mol_block": "\n".join(lines),
                               "n_samples": 2, "diffusion_steps": 4})
    assert "reference_mol_block" in out
    assert out["metrics"]["requested"] == 2
