"""ScreeningDriver tests on the 8-device virtual CPU mesh
(parallel/screening.py; reference workload: research_scripts/evaluation.py)."""

import jax
import pytest

from ml_conformer_generator_tpu.chem import read_mol_file
from ml_conformer_generator_tpu.config import EGNNConfig
from ml_conformer_generator_tpu.parallel.mesh import make_mesh
from ml_conformer_generator_tpu.parallel.screening import ScreeningDriver

CEYYAG = "/root/reference/assets/demo_files/ceyyag.mol"
PABA = "/root/reference/assets/demo_files/paba.mol"


@pytest.fixture(scope="module")
def driver():
    from ml_conformer_generator_tpu.diffusion.edm import EDMSampler
    from ml_conformer_generator_tpu.generator import MLConformerGenerator
    from ml_conformer_generator_tpu.models.egnn import init_egnn_params

    gen = MLConformerGenerator(diffusion_steps=4, seed=0)
    small = EGNNConfig(hidden_nf=32, n_blocks=2)
    gen.egnn_cfg = small
    gen.edm_params = init_egnn_params(jax.random.PRNGKey(0), small)
    gen.sampler = EDMSampler(small, gen.diff_cfg)
    mesh = make_mesh((8, 1))
    return ScreeningDriver(gen, mesh)


def test_screen_two_references(driver):
    refs = [read_mol_file(CEYYAG), read_mol_file(CEYYAG)]
    rep = driver.screen(refs, n_samples=6, variance=2, score=False)
    assert rep.n_references == 2
    assert rep.n_requested == 12
    assert 0 <= rep.n_valid <= 12
    assert rep.total_gen_time_s > 0
    # overlap evidence contract: per-stage split recorded on every screen
    m = driver.last_metrics
    assert {"dispatch_s", "device_wait_s", "host_chem_s"} <= set(m)
    assert m["requested"] == 12 and m["valid"] == rep.n_valid


def test_batch_rounds_to_mesh_multiple(driver):
    # 6 requested on an 8-device data axis -> padded batch of 8, trimmed back
    assert driver._round_batch(6) == 8
    assert driver._round_batch(8) == 8
    assert driver._round_batch(9) == 16


def test_dispatch_buckets_node_axis(driver):
    # references of nearby sizes must land on the same 8-bucketed node
    # padding so the 100-step program compiles once per bucket, not per
    # distinct reference size
    ref = read_mol_file(CEYYAG).remove_hs()
    _, (x, _, node_mask), _ = driver._dispatch(ref, n_samples=4, variance=2)
    assert node_mask.shape[1] % 8 == 0
    assert x.shape[1] == node_mask.shape[1]


def test_screen_with_scoring(driver):
    # paba is an 10-heavy-atom molecule below MIN_N_NODES; generator clamps
    rep = driver.screen([read_mol_file(CEYYAG)], n_samples=4, variance=2,
                        score=True)
    assert rep.n_valid == len(rep.samples)
    if rep.n_valid:
        assert 0.0 <= rep.avg_shape_tanimoto <= 1.0


def test_screen_queue_depth_two(driver):
    refs = [read_mol_file(CEYYAG)] * 3
    rep = driver.screen(refs, n_samples=6, variance=2, score=False,
                        queue_depth=2)
    assert rep.n_references == 3
    assert rep.n_requested == 18
    assert driver.last_metrics["requested"] == 18


def test_screen_iter_streams_per_reference(driver):
    from ml_conformer_generator_tpu.chem import read_mol_file

    refs = [read_mol_file(CEYYAG).remove_hs(),
            read_mol_file(CEYYAG).remove_hs()]
    seen = []
    for ref, valid in driver.screen_iter(refs, n_samples=8, variance=1):
        # advisor r3: the stream yields the caller's own reference object
        assert any(ref is r for r in refs)
        assert isinstance(valid, list)
        seen.append(ref)
    assert len(seen) == 2
    assert "dispatch_s" in driver.last_metrics


def test_screen_iter_early_break_updates_metrics(driver):
    """advisor r3: a caller that breaks out of the stream early must still
    see THIS run's partial stage metrics, not a stale summary."""
    refs = [read_mol_file(CEYYAG)] * 3
    driver.last_metrics = {"stale": True}
    for ref, valid in driver.screen_iter(refs, n_samples=4, variance=1):
        break
    assert "stale" not in driver.last_metrics
    assert "dispatch_s" in driver.last_metrics


def test_bench_protocol_refs_span_protocol_sizes():
    """bench.py's synthetic e2e references must replay the screen protocol's
    size distribution (15-39 heavy atoms, same seed as the device-only
    phase) and be consumable by the screening driver's featurisation."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import make_protocol_refs

    from ml_conformer_generator_tpu.ops.moi import get_context_shape

    refs = make_protocol_refs(25)
    sizes = [r.num_atoms for r in refs]
    assert min(sizes) >= 15 and max(sizes) <= 39
    assert len(set(sizes)) > 5            # spread, not one size
    for r in refs[:3]:
        ctx, _ = get_context_shape(r.coords - r.coords.mean(axis=0))
        import numpy as np
        assert np.isfinite(np.asarray(ctx)).all()
