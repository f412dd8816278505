"""HTTP serving layer (stdlib-only) for the conformer generator.

Endpoints (behavioural parity with the reference Streamlit flow,
``streamlit_app/app.py`` + ``streamlit_app/utils/streamlit_utils.py``):

* ``GET  /``              — single-page UI (upload, sliders, 3D viewer);
* ``POST /api/generate``  — body ``{"mol_block": str, "n_samples": int,
  "diffusion_steps": int, "variance": int}``; runs the pipeline, scores with
  ``evaluate_samples``, returns samples sorted by shape Tanimoto (the
  reference sorts identically, ``streamlit_utils.py:119-142``) plus per-stage
  timing metrics;
* ``GET  /api/health``    — liveness + device info.

Unlike the reference app (which builds a fresh MLConformerGenerator — and
re-jits — per request, ``streamlit_utils.py:108-112``), the server holds ONE
generator per diffusion-step setting; compiled programs are reused across
requests. Generation runs under a lock (one TPU program at a time);
the HTTP layer itself is threaded.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

from ..chem.io import from_mol_block, from_pdb_block, write_sdf
from ..eval.pipeline import evaluate_samples
from .ui import INDEX_HTML

__all__ = ["ConformerServer", "main"]


def _parse_reference(text: str):
    """Accept a molblock OR a PDB block (reference app.py:100-115 accepts
    .mol and .pdb uploads): sniff by ATOM/HETATM coordinate records."""
    for line in text.split("\n"):
        if line[:6].strip() in ("ATOM", "HETATM"):
            return from_pdb_block(text)
        if "V2000" in line:
            break
    return from_mol_block(text)


class ConformerServer:
    """Holds generators (one per diffusion-step count) and serves requests."""

    def __init__(self, default_steps: int = 100, seed: int = 0,
                 edm_weights=None, adj_mat_seer_weights=None):
        self._generators: Dict[int, object] = {}
        self._lock = threading.Lock()
        self._seed = seed
        self._weights = (edm_weights, adj_mat_seer_weights)
        self.default_steps = default_steps

    def _generator(self, steps: int):
        from ..generator import MLConformerGenerator

        if steps not in self._generators:
            edm_w, adj_w = self._weights
            self._generators[steps] = MLConformerGenerator(
                diffusion_steps=steps, seed=self._seed, edm_weights=edm_w,
                adj_mat_seer_weights=adj_w)
        return self._generators[steps]

    def generate(self, payload: dict) -> dict:
        mol_block = payload.get("mol_block")
        if not mol_block:
            raise ValueError("mol_block is required")
        n_samples = int(payload.get("n_samples", 20))
        steps = int(payload.get("diffusion_steps", self.default_steps))
        variance = int(payload.get("variance", 2))
        if not (1 <= n_samples <= 200):
            raise ValueError("n_samples must be in [1, 200]")
        if not (2 <= steps <= 1000):
            raise ValueError("diffusion_steps must be in [2, 1000]")
        if not (0 <= variance <= 5):
            raise ValueError("variance must be in [0, 5]")

        reference = _parse_reference(mol_block)
        with self._lock:
            gen = self._generator(steps)
            t0 = time.perf_counter()
            samples = gen.generate_conformers(
                reference_conformer=reference, n_samples=n_samples,
                variance=variance)
            t_gen = time.perf_counter() - t0

        t0 = time.perf_counter()
        ref_block, scored = evaluate_samples(reference, samples)
        t_eval = time.perf_counter() - t0
        scored.sort(key=lambda s: s["shape_tanimoto"], reverse=True)
        hits = [from_mol_block(s["mol_block"]) for s in scored]
        for s, mol in zip(scored, hits):
            # canonical SMILES of each hit (first-party writer,
            # chem/smiles.py); never fail the request over one bad graph
            try:
                s["smiles"] = mol.to_smiles()
            except Exception:
                s["smiles"] = ""

        sdf = write_sdf(
            hits,
            props=[{"shape_tanimoto": f"{s['shape_tanimoto']:.4f}",
                    "chemical_tanimoto": f"{s['chemical_tanimoto']:.4f}"}
                   for s in scored]) if scored else ""
        return {
            "reference_mol_block": ref_block,
            "samples": scored,
            "sdf": sdf,
            "metrics": {
                "requested": n_samples,
                "valid": len(scored),
                "validity": len(scored) / n_samples,
                "generation_s": round(t_gen, 3),
                "evaluation_s": round(t_eval, 3),
            },
        }

    def health(self) -> dict:
        import jax

        dev = jax.devices()[0]
        return {"status": "ok", "device": dev.device_kind,
                "platform": dev.platform,
                "compiled_step_counts": sorted(self._generators)}


def _make_handler(server: ConformerServer):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj: dict):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, INDEX_HTML.encode(), "text/html")
            elif self.path == "/api/health":
                self._json(200, server.health())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/api/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                self._json(200, server.generate(payload))
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # surface as a banner like the reference
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            print(f"[app] {self.address_string()} {fmt % args}")

    return Handler


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Shape-constrained molecule generation server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--edm-weights", default=None)
    ap.add_argument("--adj-mat-seer-weights", default=None)
    args = ap.parse_args(argv)

    server = ConformerServer(default_steps=args.steps,
                             edm_weights=args.edm_weights,
                             adj_mat_seer_weights=args.adj_mat_seer_weights)
    httpd = ThreadingHTTPServer((args.host, args.port), _make_handler(server))
    print(f"[app] serving on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
