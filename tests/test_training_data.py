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


def test_adj_mat_seer_training_overfits_bonds():
    """training/bonds.py: cross-entropy drops and the trained predictor
    reproduces the true bond orders of a tiny molecule set (the stack used
    by scripts/train_overfit_validity.py -> VALIDITY.json)."""
    import numpy as np

    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.config import AdjMatSeerConfig
    from ml_conformer_generator_tpu.training.bonds import (
        bond_training_batch, train_adj_mat_seer)

    mols = []
    for smi in ["CC(=O)O", "C1CCCCC1", "N#CC=C"]:
        m = from_smiles(smi).remove_hs()
        # bond training featurises from geometry; give atoms distinct coords
        rng = np.random.default_rng(len(mols))
        m.coords = rng.normal(scale=2.0, size=(m.num_atoms, 3))
        mols.append(m)
    cfg = AdjMatSeerConfig(n_hidden=64)
    out = train_adj_mat_seer(mols, steps=150, lr=3e-3, cfg=cfg, seed=0,
                             log_every=150, log_fn=lambda s: None)
    assert out["history"][-1]["loss"] < 0.1

    import jax.numpy as jnp

    from ml_conformer_generator_tpu.models.adj_mat_seer import \
        adj_mat_seer_forward

    batch = bond_training_batch(mols, cfg)
    logits = adj_mat_seer_forward(out["params"],
                                  jnp.asarray(batch["elements"]),
                                  jnp.asarray(batch["dist"]),
                                  jnp.asarray(batch["adj"]), cfg)
    pred = np.argmax(np.asarray(logits), axis=-1)
    true = np.argmax(batch["target"], axis=-1)
    m = batch["pair_mask"] > 0
    acc = (pred[m] == true[m]).mean()
    assert acc > 0.97, acc


def test_perturb_and_relax_augmentation():
    """training/augment.py: copies are distinct conformers of the SAME
    molecules (identical graphs), with physical geometry restored by the
    restrained relaxation (bond lengths near the originals)."""
    from ml_conformer_generator_tpu.chem.io import read_mol_file
    from ml_conformer_generator_tpu.training import perturb_and_relax

    base = read_mol_file(
        "/root/reference/assets/demo_files/ceyyag.mol").remove_hs()
    out = perturb_and_relax([base], n_copies=3, sigma=0.15, seed=0,
                            relax_steps=40, rotate=True)
    assert len(out) == 4
    assert out[0] is base

    def bond_lengths(m):
        return np.array([np.linalg.norm(m.coords[i] - m.coords[j])
                         for i, j, _ in m.bonds])

    ref_bl = bond_lengths(base)
    seen = []
    for copy in out[1:]:
        assert np.array_equal(copy.atomic_nums, base.atomic_nums)
        assert copy.bonds == base.bonds
        assert np.isfinite(copy.coords).all()
        # distinct conformer: coordinates moved...
        assert not np.allclose(copy.coords, base.coords, atol=1e-3)
        # ...but bond lengths stay chemically sane (within the restraint's
        # local-cleanup regime)
        np.testing.assert_allclose(bond_lengths(copy), ref_bl, atol=0.35)
        seen.append(copy.coords.copy())
    # copies differ from each other too
    assert not np.allclose(seen[0], seen[1], atol=1e-3)


def test_train_loop_ema_and_cosine_lr(tmp_path, rng):
    """EMA + cosine-LR options: the EMA pytree tracks (but lags) the raw
    parameters, checkpoints save the EMA weights when enabled, and the
    scheduled optimizer steps without error."""
    import jax

    from ml_conformer_generator_tpu.checkpoint import load_params

    ds = MoleculeDataset(_mols(rng))
    ckpt = str(tmp_path / "params.npz")
    cfg = EGNNConfig(hidden_nf=16, n_blocks=1)
    out = train(ds, egnn_cfg=cfg, diff_cfg=DiffusionConfig(timesteps=10),
                batch_size=8, epochs=2, mesh=make_mesh((8, 1)),
                checkpoint_path=ckpt, ema_decay=0.9, cosine_lr=True,
                warmup_steps=1, log_every=1, log_fn=lambda s: None)
    assert out["ema_params"] is not None
    leaves_p = jax.tree.leaves(out["params"])
    leaves_e = jax.tree.leaves(out["ema_params"])
    assert len(leaves_p) == len(leaves_e)
    # EMA lags the raw params (4 steps at decay 0.9 cannot converge), but
    # is finite and structurally identical
    assert all(np.isfinite(np.asarray(e)).all() for e in leaves_e)
    assert any(not np.allclose(np.asarray(p), np.asarray(e))
               for p, e in zip(leaves_p, leaves_e))
    # the checkpoint holds the EMA weights, not the raw ones
    saved = load_params(ckpt)
    for a, b in zip(jax.tree.leaves(saved), leaves_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
