"""End-to-end statistical evaluation harness.

Re-implements the reference's de-facto acceptance suite
(``/root/reference/research_scripts/evaluation.py:45-268``): drive the full
generation pipeline over a set of reference conformers, score every valid
sample (shape + chemical Tanimoto), and aggregate validity, uniqueness,
per-reference-size and per-size-variance statistics plus wall-clock timing —
the numbers behind the reference README's headline table
(``README.md:104-121``).

The harness is pure orchestration: all device work happens inside the
generator (one jitted sampler program per request) and the batched shape
scorer (``eval/pipeline.evaluate_samples``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterable, List, Optional, Sequence

from ..chem.io import from_mol_block, write_sdf
from ..chem.mol import Molecule
from .frechet import inchi_analog_key
from .pipeline import evaluate_samples

__all__ = ["EvaluationReport", "run_evaluation", "format_report"]


@dataclasses.dataclass
class EvaluationReport:
    """Aggregated statistics of one evaluation run."""

    n_references: int = 0
    n_samples_per_reference: int = 0
    n_requested: int = 0
    n_valid: int = 0
    #: valid AND heavy-atom count within ±variance of the reference size —
    #: the size-conditioned success criterion (requests draw sample sizes in
    #: [n_ref - v, n_ref + v], reference ``conformer_generator.py:317-319``);
    #: plain ``n_valid`` also counts salvaged fragments (the standardizer
    #: keeps the largest fragment of a disconnected sample)
    n_size_matched: int = 0
    total_gen_time_s: float = 0.0
    total_eval_time_s: float = 0.0
    avg_shape_tanimoto: float = 0.0
    avg_chemical_tanimoto: float = 0.0
    max_shape_tanimoto: float = 0.0
    unique_within_batch: int = 0
    unique_vs_corpus: Optional[int] = None
    #: reference size -> mean shape / chem Tanimoto, validity fraction
    by_ref_size: Dict[int, Dict[str, float]] = dataclasses.field(
        default_factory=dict)
    #: (ref size - sample size) -> mean shape / chem Tanimoto, count
    by_variance: Dict[int, Dict[str, float]] = dataclasses.field(
        default_factory=dict)
    samples: List[Molecule] = dataclasses.field(default_factory=list)

    @property
    def validity(self) -> float:
        return self.n_valid / self.n_requested if self.n_requested else 0.0

    @property
    def size_matched_validity(self) -> float:
        return (self.n_size_matched / self.n_requested
                if self.n_requested else 0.0)

    @property
    def valid_mol_per_s(self) -> float:
        t = self.total_gen_time_s
        return self.n_valid / t if t > 0 else 0.0


def _acc(d: Dict[int, Dict[str, float]], k: int, shape_t: float,
         chem_t: float) -> None:
    e = d.setdefault(k, {"n": 0, "shape_tanimoto": 0.0,
                         "chemical_tanimoto": 0.0})
    e["n"] += 1
    e["shape_tanimoto"] += shape_t
    e["chemical_tanimoto"] += chem_t


def run_evaluation(generator, references: Sequence[Molecule],
                   n_samples: int = 100, variance: int = 2,
                   corpus_keys: Iterable[str] = (),
                   sdf_path: Optional[str] = None,
                   progress: bool = False,
                   **generate_kwargs) -> EvaluationReport:
    """Run the full pipeline over ``references`` and aggregate statistics.

    ``generator`` is an ``MLConformerGenerator`` (or API-compatible callable
    object); ``corpus_keys`` an optional set of InChI-analog identity keys
    (``eval.frechet.inchi_analog_key``) for novelty-vs-training-set counting —
    the analog of the reference's ChEMBL InChI list (``evaluation.py:44-46``);
    uniqueness-within-batch uses the same keys (the reference counts both by
    InChI, ``evaluation.py:12-42``).
    """
    rep = EvaluationReport(n_references=len(references),
                           n_samples_per_reference=n_samples,
                           n_requested=len(references) * n_samples)
    shape_sum = 0.0
    chem_sum = 0.0

    for i, reference in enumerate(references):
        ref = reference.remove_hs()
        ref_n = ref.num_atoms

        t0 = time.perf_counter()
        samples = generator.generate_conformers(
            reference_conformer=ref, n_samples=n_samples, variance=variance,
            **generate_kwargs)
        rep.total_gen_time_s += time.perf_counter() - t0

        t0 = time.perf_counter()
        _, scored = evaluate_samples(ref, samples)
        rep.total_eval_time_s += time.perf_counter() - t0

        rep.n_valid += len(scored)
        size_e = rep.by_ref_size.setdefault(
            ref_n, {"n": 0, "shape_tanimoto": 0.0, "chemical_tanimoto": 0.0,
                    "validity": 0.0, "n_requests": 0})
        size_e["validity"] += len(scored) / n_samples
        size_e["n_requests"] += 1

        for s, mol in zip(scored, samples):
            st, ct = s["shape_tanimoto"], s["chemical_tanimoto"]
            shape_sum += st
            chem_sum += ct
            rep.max_shape_tanimoto = max(rep.max_shape_tanimoto, st)
            _acc(rep.by_ref_size, ref_n, st, ct)
            sample_n = mol.remove_hs().num_atoms
            if abs(ref_n - sample_n) <= variance:
                rep.n_size_matched += 1
            _acc(rep.by_variance, ref_n - sample_n, st, ct)
            aligned = from_mol_block(s["mol_block"])
            aligned.name = f"ref{i}_sample{len(rep.samples)}"
            rep.samples.append(aligned)

        if progress:
            print(f"[eval] reference {i + 1}/{len(references)}: "
                  f"{len(scored)}/{n_samples} valid")

    if rep.n_valid:
        rep.avg_shape_tanimoto = shape_sum / rep.n_valid
        rep.avg_chemical_tanimoto = chem_sum / rep.n_valid

    # normalise per-bucket sums to means
    for d in (rep.by_ref_size, rep.by_variance):
        for e in d.values():
            if e["n"]:
                e["shape_tanimoto"] /= e["n"]
                e["chemical_tanimoto"] /= e["n"]
            if "validity" in e and e["n_requests"]:
                e["validity"] /= e["n_requests"]

    keys = [inchi_analog_key(m) for m in rep.samples]
    rep.unique_within_batch = len(set(keys))
    corpus = set(corpus_keys)
    if corpus:
        rep.unique_vs_corpus = sum(1 for k in keys if k not in corpus)

    if sdf_path and rep.samples:
        with open(sdf_path, "w") as f:
            f.write(write_sdf(rep.samples))
    return rep


def format_report(rep: EvaluationReport) -> str:
    """Text report matching the reference's layout (``evaluation.py:198-268``)."""
    lines = [
        f"Number of Contexts used for generation - {rep.n_references}",
        f"Number of Samples per Context - {rep.n_samples_per_reference}",
        "",
        f"Total time for generation - {rep.total_gen_time_s:.2f} sec",
        (f"Averaged time for generation (per reference) - "
         f"{rep.total_gen_time_s / max(rep.n_references, 1):.2f} sec per request"),
        f"Valid molecules generated - {100.0 * rep.validity:.2f}%",
        (f"Size-matched valid molecules (within ±variance of reference) - "
         f"{100.0 * rep.size_matched_validity:.2f}%"),
        f"Valid molecules per second - {rep.valid_mol_per_s:.2f}",
        (f"Unique molecules within generated set - "
         f"{rep.unique_within_batch} of {rep.n_valid}"),
    ]
    if rep.unique_vs_corpus is not None:
        lines.append(
            f"Chemically novel vs corpus - {rep.unique_vs_corpus} of "
            f"{rep.n_valid}")
    lines += [
        f"Average Shape Tanimoto - {100.0 * rep.avg_shape_tanimoto:.2f}%",
        f"Max Shape Tanimoto - {100.0 * rep.max_shape_tanimoto:.2f}%",
        f"Average Chemical Tanimoto - {100.0 * rep.avg_chemical_tanimoto:.2f}%",
        "",
        "Per reference size (n_atoms: n, shape_t, chem_t, validity):",
    ]
    for k in sorted(rep.by_ref_size):
        e = rep.by_ref_size[k]
        lines.append(f"  {k}: n={e['n']} shape={e['shape_tanimoto']:.4f} "
                     f"chem={e['chemical_tanimoto']:.4f} "
                     f"valid={e.get('validity', 0.0):.3f}")
    lines.append("Per size variance (ref_n - sample_n: n, shape_t, chem_t):")
    for k in sorted(rep.by_variance):
        e = rep.by_variance[k]
        lines.append(f"  {k:+d}: n={e['n']} shape={e['shape_tanimoto']:.4f} "
                     f"chem={e['chemical_tanimoto']:.4f}")
    return "\n".join(lines)
