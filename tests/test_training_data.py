"""Training data pipeline + train loop tests (training/data.py, loop.py)."""

import numpy as np

from ml_conformer_generator_tpu.chem.mol import Molecule
from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
from ml_conformer_generator_tpu.parallel.mesh import make_mesh
from ml_conformer_generator_tpu.training import (MoleculeDataset, batches,
                                                 prefetch, train)


def _mols(rng, n_mols=20):
    out = []
    for _ in range(n_mols):
        n = int(rng.integers(15, 25))
        z = rng.choice([6, 7, 8], size=n)
        coords = rng.standard_normal((n, 3)) * 2
        bonds = [(i, i + 1, 1) for i in range(n - 1)]
        out.append(Molecule(z, coords, bonds))
    return out


def test_dataset_filters_and_featurizes(rng):
    mols = _mols(rng)
    # add molecules that must be filtered: too small, unsupported element
    mols.append(Molecule(np.full(3, 6), np.zeros((3, 3)), [(0, 1, 1)]))
    mols.append(Molecule(np.array([6] * 15 + [14]),
                         np.zeros((16, 3)), [(0, 1, 1)]))
    ds = MoleculeDataset(mols, min_n_nodes=15, max_n_nodes=39)
    assert len(ds) == 20

    batch = ds.featurize([0, 1, 2], n_pad=30)
    assert batch["x"].shape == (3, 30, 3)
    assert batch["h"].shape == (3, 30, 8)
    assert batch["edge_mask"].shape == (3, 30, 30, 1)
    # zero CoM over real atoms
    com = (batch["x"] * batch["node_mask"]).sum(axis=1)
    np.testing.assert_allclose(com, 0.0, atol=1e-5)
    # one-hot rows only where masked
    np.testing.assert_allclose(batch["h"].sum(-1),
                               batch["node_mask"][..., 0])
    # diagonal of edge_mask is zero
    assert batch["edge_mask"][:, np.arange(30), np.arange(30)].sum() == 0


def test_batches_shapes_and_shuffling(rng):
    ds = MoleculeDataset(_mols(rng))
    bs = list(batches(ds, 8, rng=np.random.default_rng(1)))
    assert len(bs) == 2          # 20 // 8, remainder dropped
    for b in bs:
        assert b["x"].shape[0] == 8


def test_prefetch_preserves_order():
    items = list(prefetch(iter(range(100)), depth=4))
    assert items == list(range(100))


def test_train_loop_runs_and_checkpoints(tmp_path, rng):
    ds = MoleculeDataset(_mols(rng))
    ckpt = str(tmp_path / "params.npz")
    out = train(ds, egnn_cfg=EGNNConfig(hidden_nf=16, n_blocks=1),
                diff_cfg=DiffusionConfig(timesteps=10), batch_size=8,
                epochs=1, mesh=make_mesh((8, 1)), checkpoint_path=ckpt,
                log_every=1, log_fn=lambda s: None)
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["loss"])
    import os
    assert os.path.exists(ckpt)


def test_train_loop_learns(rng):
    """The EDM loss must actually DECREASE under training — catches detached
    gradients, wrong noise targets, and optimizer wiring bugs that a
    finite-loss check (above) would miss. On this tiny config the loss
    reliably halves within 200 steps; assert a conservative 30% drop."""
    ds = MoleculeDataset(_mols(rng, n_mols=64))
    out = train(ds, egnn_cfg=EGNNConfig(hidden_nf=16, n_blocks=1),
                diff_cfg=DiffusionConfig(timesteps=10), batch_size=8,
                epochs=25, lr=1e-3, mesh=make_mesh((8, 1)),
                log_every=5, log_fn=lambda s: None, seed=0)
    hist = [h["loss"] for h in out["history"]]
    assert len(hist) >= 20
    early, late = np.mean(hist[:5]), np.mean(hist[-5:])
    assert np.isfinite(late)
    assert late < 0.7 * early, f"no learning: {early:.3f} -> {late:.3f}"
