"""Pod-scale virtual-screening driver: DP-sharded sampling + overlapped chem.

The reference's evaluation workload (``research_scripts/evaluation.py``:
100 samples x 1000 CCDC references on one GPU, strictly serial
device-then-host per reference) recast for a device mesh (SURVEY.md §7.7):

* the sample batch of every request is sharded across the mesh's ``data``
  axis with ``jax.sharding`` — XLA partitions the jitted 100-step sampler
  program, so N chips run N-th of the batch each with zero code change to
  the model;
* JAX dispatch is asynchronous: the driver enqueues the *next* reference's
  device program before standardising/scoring the previous one on the host,
  so the RDKit-analog chemistry stage (the ~50%-rejection standardiser,
  reference ``standardizer.py:83-111``) overlaps device compute instead of
  stalling it;
* per-request results aggregate through ``eval.harness.EvaluationReport``.

Single-chip meshes degrade gracefully (sharding over one device), so the
driver is also the recommended batch API on one TPU.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chem.featurize import prepare_adj_mat_seer_input, samples_to_molecules
from ..chem.io import from_mol_block
from ..chem.mol import Molecule
from ..chem.standardize import standardize_batch
from ..chem.bonds import redefine_bonds
from ..eval.harness import EvaluationReport, _acc
from ..eval.frechet import inchi_analog_key
from ..eval.pipeline import evaluate_samples
from ..ops.moi import get_context_shape
from ..utils.masks import pad_to_bucket, prepare_edm_input
from ..utils.metrics import StageTimer
from .mesh import make_mesh

__all__ = ["ScreeningDriver"]


class ScreeningDriver:
    """Drives many generation requests through a data-sharded sampler."""

    def __init__(self, generator, mesh: Optional[Mesh] = None):
        self.generator = generator
        #: per-stage latency/yield of the most recent screen() (empty before)
        self.last_metrics = {}
        self.mesh = mesh if mesh is not None else make_mesh(
            (len(jax.devices()), 1))
        n_data = self.mesh.shape["data"]

        gen = generator
        sampler = gen.sampler

        batched = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        self._shard_batched = batched
        self._n_data = n_data

        def sample_fn(params, key, gamma, node_mask, edge_mask, context):
            return sampler.generate(params, key, gamma, node_mask, edge_mask,
                                    context)

        self._sample = jax.jit(
            sample_fn,
            in_shardings=(rep, rep, rep, batched, batched, batched),
            out_shardings=(batched, batched))
        self._adj = jax.jit(
            gen._adj_fn,
            in_shardings=(rep, batched, batched, batched),
            out_shardings=batched)

    def _round_batch(self, n: int) -> int:
        """Round the per-request batch up to a multiple of the data axis."""
        d = self._n_data
        return ((n + d - 1) // d) * d

    def _dispatch(self, reference: Molecule, n_samples: int, variance: int):
        """Enqueue one reference's device sampling; returns device futures."""
        gen = self.generator
        ref = reference.remove_hs()
        coords = np.asarray(ref.coords, dtype=np.float32)
        coords = coords - coords.mean(axis=0)
        ref_context, _ = get_context_shape(coords)
        B = self._round_batch(n_samples)
        mx = min(ref.num_atoms + variance, gen.max_n_nodes)
        # Bucket the node axis (gen.node_bucket): references of nearby sizes
        # share one compiled 100-step program instead of re-tracing per
        # distinct ref size (~30 s/compile on TPU; smaller buckets waste
        # less N^2 edge work per request — see PERF.md).
        node_mask, edge_mask, context, _ = prepare_edm_input(
            gen._next_key(), B, ref_context, gen.context_norms,
            max(ref.num_atoms - variance, gen.min_n_nodes), mx,
            n_nodes_pad=pad_to_bucket(mx, gen.node_bucket))
        dev = lambda a, s: jax.device_put(a, s)
        x, h = self._sample(gen.edm_params, gen._next_key(), gen.gamma,
                            dev(node_mask, self._shard_batched),
                            dev(edge_mask, self._shard_batched),
                            dev(context, self._shard_batched))
        return ref, (x, h, node_mask), n_samples

    def _finish(self, dispatched, timer=None) -> List[Molecule]:
        """Host chem for one dispatched request (blocks on its arrays)."""
        gen = self.generator
        ref, (x, h, node_mask), n_samples = dispatched
        if timer is None:
            timer = StageTimer()  # throwaway: keeps one code path below
        # Time spent actually waiting on the device: with the depth-1
        # pipeline this should be (nearly) the full device time of the
        # FIRST request only — later requests were computed while the
        # host chewed on their predecessors (SURVEY.md §7 hard part 3).
        with timer.stage("device_wait"):
            jax.block_until_ready((x, h))
        # host featurisation/standardisation (plus the small bond-predictor
        # device program it synchronises on); sub-stages recorded under
        # host_chem/* for overlap diagnostics
        with timer.stage("host_chem"):
            # keep the padded batch through the sharded bond predictor (its
            # batch axis must stay divisible by the data axis), trim after
            with timer.stage("host_chem/featurize"):
                mols = samples_to_molecules(np.asarray(x), np.asarray(h),
                                            np.asarray(node_mask),
                                            gen.atom_decoder)
                elements, dist, adj, canon = prepare_adj_mat_seer_input(
                    mols, gen.dimension)
            # (B, D, D) int8 bond types — argmax-decoded on device (_adj_fn)
            with timer.stage("host_chem/adj_device"):
                bond_types = np.asarray(self._adj(
                    gen.adj_params, jnp.asarray(elements), jnp.asarray(dist),
                    jnp.asarray(adj)))
            with timer.stage("host_chem/bonds"):
                bonded = [redefine_bonds(canon[i], bond_types[i])
                          for i in range(min(n_samples, len(canon)))]
            with timer.stage("host_chem/standardize"):
                return [m for m in standardize_batch(bonded, True)
                        if m is not None]

    def screen(self, references: Sequence[Molecule], n_samples: int = 100,
               variance: int = 2, score: bool = True,
               progress: bool = False,
               queue_depth: int = 1) -> EvaluationReport:
        """Screen all references; the device queue stays up to ``queue_depth``
        requests ahead of the host chemistry/scoring pipeline (depth 1 —
        double buffering — already hides host chem behind device compute on
        one chip; deeper queues help when many chips drain requests faster
        than one host standardises them)."""
        from collections import deque

        rep = EvaluationReport(
            n_references=len(references), n_samples_per_reference=n_samples,
            n_requested=len(references) * n_samples)
        shape_sum = chem_sum = 0.0
        timer = StageTimer()
        t_start = time.perf_counter()
        done_count = 0

        def consume(pending):
            nonlocal shape_sum, chem_sum, done_count
            ref = pending[0]
            valid = self._finish(pending, timer=timer)
            rep.n_valid += len(valid)
            if score:
                with timer.stage("score"):
                    _, scored = evaluate_samples(ref, valid)
                for s, mol in zip(scored, valid):
                    st, ct = s["shape_tanimoto"], s["chemical_tanimoto"]
                    shape_sum += st
                    chem_sum += ct
                    rep.max_shape_tanimoto = max(rep.max_shape_tanimoto, st)
                    _acc(rep.by_ref_size, ref.num_atoms, st, ct)
                    _acc(rep.by_variance, ref.num_atoms - mol.num_atoms,
                         st, ct)
                    rep.samples.append(from_mol_block(s["mol_block"]))
            else:
                rep.samples.extend(valid)
            done_count += 1
            if progress:
                print(f"[screen] {done_count}/{len(references)}: "
                      f"{len(valid)}/{n_samples} valid")

        pending = deque()
        for reference in references:
            with timer.stage("dispatch"):
                pending.append(self._dispatch(reference.remove_hs(),
                                              n_samples, variance))
            while len(pending) > max(queue_depth, 1):
                consume(pending.popleft())
        while pending:
            consume(pending.popleft())

        return self._finalize_report(rep, timer, score, shape_sum, chem_sum,
                                     t_start)

    def screen_iter(self, references: Sequence[Molecule],
                    n_samples: int = 100, variance: int = 2,
                    queue_depth: int = 1):
        """Streaming variant of :meth:`screen`: yields
        ``(reference, [valid Molecule, ...])`` per reference AS each one
        finishes, with the same depth-``queue_depth`` device pipeline. For
        long screens this lets callers write results to disk incrementally
        instead of holding the whole campaign in memory (the reference's
        protocol only reports after the full run,
        ``research_scripts/evaluation.py:198-268``).

        ``reference`` is the caller's own object (hydrogens and all);
        screening itself runs on ``reference.remove_hs()``, so size/variance
        stats comparable to :meth:`screen`'s by-ref-size buckets should use
        the heavy-atom count ``reference.remove_hs().num_atoms``."""
        from collections import deque

        timer = StageTimer()
        pending = deque()
        try:
            for reference in references:
                with timer.stage("dispatch"):
                    pending.append((reference,
                                    self._dispatch(reference.remove_hs(),
                                                   n_samples, variance)))
                while len(pending) > max(queue_depth, 1):
                    ref, d = pending.popleft()
                    yield ref, self._finish(d, timer=timer)
            while pending:
                ref, d = pending.popleft()
                yield ref, self._finish(d, timer=timer)
        finally:
            # Runs on GeneratorExit too, so a caller that breaks out of the
            # stream early still sees this run's (partial) stage metrics
            # rather than a stale summary from a previous run.
            self.last_metrics = timer.summary()

    def _finalize_report(self, rep, timer, score, shape_sum, chem_sum,
                         t_start):
        rep.total_gen_time_s = time.perf_counter() - t_start
        if rep.n_valid and score:
            rep.avg_shape_tanimoto = shape_sum / rep.n_valid
            rep.avg_chemical_tanimoto = chem_sum / rep.n_valid
        for d in (rep.by_ref_size, rep.by_variance):
            for e in d.values():
                if e["n"]:
                    e["shape_tanimoto"] /= e["n"]
                    e["chemical_tanimoto"] /= e["n"]
        rep.unique_within_batch = len(
            {inchi_analog_key(m) for m in rep.samples})
        timer.count("requested", rep.n_requested)
        timer.count("valid", rep.n_valid)
        #: per-stage evidence of host/device overlap: with the depth-1
        #: pipeline, ``device_wait_s`` collapses toward one request's device
        #: time while ``host_chem_s`` runs concurrently with device compute.
        self.last_metrics = timer.summary()
        return rep
