#!/usr/bin/env python
"""Train the EDM denoiser + bond predictor on a conformer corpus.

The reference is inference-only (its weights were trained on ~229M
conformers elsewhere, README.md:153-159); this framework ships the full
training stack — data pipeline, mesh-sharded remat'd train step, bond-
predictor cross-entropy — and this example is its user-facing entry point:

    python examples/10_train.py --sdf corpus.sdf --out weights/ \
        --epochs 10 --batch 64

Scales to a pod by launching one process per host with jax.distributed
initialised (tests/test_distributed.py shows the 2-process wiring); the
train step shards the batch over the mesh's data axis automatically.

The produced .npz files load straight into MLConformerGenerator
(edm_weights= / adj_mat_seer_weights=) and examples/09_acceptance.py is the
quality gate to run afterwards. For a quick end-to-end proof on the demo
conformers, see scripts/train_overfit_validity.py (-> VALIDITY.json).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sdf", required=True,
                    help="training conformers (SDF with 3D coordinates)")
    ap.add_argument("--out", required=True, help="output weights directory")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--bond-steps", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    args = ap.parse_args()

    from ml_conformer_generator_tpu.checkpoint import save_params
    from ml_conformer_generator_tpu.config import EGNNConfig
    from ml_conformer_generator_tpu.training import (MoleculeDataset, train,
                                                     train_adj_mat_seer)

    os.makedirs(args.out, exist_ok=True)
    ds = MoleculeDataset.from_sdf(args.sdf)
    if not len(ds):
        print("no trainable molecules in corpus (15-39 heavy atoms, "
              "permitted elements)", file=sys.stderr)
        return 1
    print(f"[train] {len(ds)} conformers")

    # train() saves the EMA (inference) weights to checkpoint_path itself
    train(ds, egnn_cfg=EGNNConfig(), batch_size=args.batch,
          epochs=args.epochs, lr=args.lr, seed=args.seed,
          ema_decay=0.999, cosine_lr=True, warmup_steps=100,
          checkpoint_path=os.path.join(args.out, "edm.npz"),
          checkpoint_every=args.checkpoint_every)

    bonds = train_adj_mat_seer(ds.mols, steps=args.bond_steps, lr=args.lr,
                               batch_size=min(args.batch, len(ds)),
                               seed=args.seed)
    save_params(os.path.join(args.out, "adj_mat_seer.npz"), bonds["params"])
    print(f"[train] weights written to {args.out}/edm.npz and "
          f"{args.out}/adj_mat_seer.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
