#!/usr/bin/env python
"""Overfit the full stack on the demo conformers -> nonzero e2e validity.

Round-3 verdict, item 2: the framework had never produced a single valid
molecule end-to-end (no trained weights exist in this environment; random
weights give validity 0 by construction). This script closes that gap with
the framework's OWN training stack, proving training + sampler + bond
predictor + chemistry layer compose into actual chemistry:

1. train the production EDM denoiser (``training/loop.py::train``) to
   overfit the reference demo conformers (the only real 3D molecules
   shipped with the reference, ``assets/demo_files/*.mol``);
2. train AdjMatSeer (``training/bonds.py``) to reproduce their true bond
   orders from the same canonical-order featurisation the inference path
   uses;
3. run the PUBLIC pipeline (``MLConformerGenerator.generate_conformers``
   with the saved ``.npz`` weights) on each demo conformer as its own shape
   reference and count molecules that survive the full standardizer;
4. write ``VALIDITY.json`` with the training config, loss trajectories and
   per-reference validity.

The reference's published working point is 48% validity at full scale
(``README.md:115``, 229M-conformer training set); this is an overfit
existence proof, not a quality claim — see VALIDITY.json's caveats field.

Usage (TPU ~5 min, CPU works too):
  timeout 1200 python scripts/train_overfit_validity.py \
      [--edm-steps 1500] [--bond-steps 600] [--samples 64] [--out DIR]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edm-steps", type=int, default=1500,
                    help="EDM optimisation steps (overfit regime)")
    ap.add_argument("--bond-steps", type=int, default=600)
    ap.add_argument("--samples", type=int, default=64,
                    help="samples per reference at evaluation")
    ap.add_argument("--diffusion-steps", type=int, default=100,
                    help="reverse-diffusion steps at evaluation (reference "
                         "protocol: 100)")
    ap.add_argument("--batch", type=int, default=32, help="training batch")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--augment", type=int, default=16,
                    help="perturb-and-relax conformer copies per training "
                         "molecule (training/augment.py); 0 disables")
    ap.add_argument("--augment-sigma", type=float, default=0.15)
    ap.add_argument("--ema", type=float, default=0.999,
                    help="EMA decay for the EDM inference weights "
                         "(0 disables)")
    ap.add_argument("--variance", type=int, default=0,
                    help="size variance of evaluation requests (reference "
                         "protocol: 2; default 0 = exact-size requests for "
                         "the overfit regime)")
    ap.add_argument("--out", default="/root/repo/.weights_overfit")
    ap.add_argument("--json", default="/root/repo/VALIDITY.json")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse weights already in --out")
    args = ap.parse_args()

    import jax

    from ml_conformer_generator_tpu.checkpoint import save_params
    from ml_conformer_generator_tpu.chem.io import read_mol_file
    from ml_conformer_generator_tpu.config import DiffusionConfig, EGNNConfig
    from ml_conformer_generator_tpu.training import (MoleculeDataset, train,
                                                     train_adj_mat_seer)

    t_start = time.time()
    os.makedirs(args.out, exist_ok=True)
    edm_path = os.path.join(args.out, "edm_overfit.npz")
    adj_path = os.path.join(args.out, "adj_mat_seer_overfit.npz")

    demo = [read_mol_file(f).remove_hs()
            for f in sorted(glob.glob(
                "/root/reference/assets/demo_files/*.mol"))]
    ds = MoleculeDataset(demo)        # filters to [15, 39] heavy atoms
    mols = list(ds.mols)
    print(f"[overfit] {len(mols)} training conformers: "
          f"{[m.num_atoms for m in mols]} heavy atoms", flush=True)

    egnn_cfg = EGNNConfig()           # production 420 x 9
    history = {}
    train_mols = mols
    if args.augment:
        from ml_conformer_generator_tpu.training import perturb_and_relax
        t0 = time.time()
        train_mols = perturb_and_relax(mols, n_copies=args.augment,
                                       sigma=args.augment_sigma,
                                       seed=args.seed)
        print(f"[overfit] augmented {len(mols)} -> {len(train_mols)} "
              f"conformers (perturb sigma {args.augment_sigma} A + "
              f"restrained relax, {time.time() - t0:.1f}s)", flush=True)
    if not (args.skip_train and os.path.exists(edm_path)):
        # replicate the set so the epoch loop yields full batches (cap the
        # replica count — featurisation cost, not data volume — and run
        # multiple epochs to reach the step budget)
        target_epoch_steps = min(args.edm_steps, 200)
        reps = max(1, (args.batch * target_epoch_steps)
                   // max(len(train_mols), 1) + 1)
        big = MoleculeDataset(train_mols * reps)
        steps_per_epoch = len(big) // args.batch
        epochs = max(1, -(-args.edm_steps // max(steps_per_epoch, 1)))
        out = train(big, egnn_cfg=egnn_cfg,
                    diff_cfg=DiffusionConfig(),   # T=1000 training schedule
                    batch_size=args.batch, epochs=epochs, lr=args.lr,
                    seed=args.seed, checkpoint_path=edm_path,
                    ema_decay=args.ema, cosine_lr=True, warmup_steps=100,
                    log_every=min(50, max(1, args.edm_steps // 10)))
        history["edm"] = out["history"]
        # EMA parameters are the inference weights when enabled
        save_params(edm_path, out["ema_params"] if out["ema_params"]
                    is not None else out["params"])
        if out["history"]:
            print(f"[overfit] EDM trained: loss "
                  f"{out['history'][0]['loss']:.4f} -> "
                  f"{out['history'][-1]['loss']:.4f}", flush=True)

    if not (args.skip_train and os.path.exists(adj_path)):
        out = train_adj_mat_seer(mols, steps=args.bond_steps, lr=args.lr,
                                 seed=args.seed, log_every=100)
        history["adj_mat_seer"] = out["history"]
        save_params(adj_path, out["params"])
        print(f"[overfit] AdjMatSeer trained: loss "
              f"{out['history'][-1]['loss']:.5f}", flush=True)

    # -- evaluate through the PUBLIC pipeline ------------------------------
    from ml_conformer_generator_tpu.eval.frechet import inchi_analog_key
    from ml_conformer_generator_tpu.generator import MLConformerGenerator

    gen = MLConformerGenerator(diffusion_steps=args.diffusion_steps,
                               edm_weights=edm_path,
                               adj_mat_seer_weights=adj_path,
                               seed=args.seed + 1)
    from ml_conformer_generator_tpu.eval.pipeline import evaluate_samples

    per_ref = []
    all_keys = []
    train_keys = {inchi_analog_key(m) for m in mols}
    for ref in mols:
        t0 = time.time()
        # variance=0 default: every sample at the reference's own size (the
        # overfit EDM memorised exact-size conformers)
        valid = gen.generate_conformers(reference_conformer=ref,
                                        n_samples=args.samples,
                                        variance=args.variance)
        keys = [inchi_analog_key(m) for m in valid]
        all_keys.extend(keys)
        sizes = sorted(m.num_atoms for m in valid)
        # size-matched success: valid AND heavy atoms within ±variance of
        # the request — a salvaged largest-fragment of a disconnected
        # sample does NOT count (round-4 verdict: fragment-permissive
        # validity flattered 5-atom fragments of 23-atom requests)
        n_matched = sum(1 for n in sizes
                        if abs(n - ref.num_atoms) <= args.variance)
        shape = []
        if valid:
            _, scored = evaluate_samples(ref, valid)
            shape = [round(s["shape_tanimoto"], 4) for s in scored]
        per_ref.append({
            "reference_heavy_atoms": ref.num_atoms,
            "n_samples": args.samples,
            "n_valid": len(valid),
            "validity": round(len(valid) / args.samples, 4),
            "n_size_matched": n_matched,
            "size_matched_validity": round(n_matched / args.samples, 4),
            "unique_within_valid": len(set(keys)),
            "n_matching_training_molecule":
                sum(1 for k in keys if k in train_keys),
            # size distribution of the survivors: guards against counting
            # tiny largest-fragments as successes
            "valid_heavy_atoms_min_med_max": (
                [sizes[0], sizes[len(sizes) // 2], sizes[-1]]
                if sizes else []),
            "avg_shape_tanimoto": (round(float(np.mean(shape)), 4)
                                   if shape else None),
            "max_shape_tanimoto": (round(float(np.max(shape)), 4)
                                   if shape else None),
            "gen_time_s": round(time.time() - t0, 2),
        })
        print(f"[overfit] ref n={ref.num_atoms}: {len(valid)}/{args.samples}"
              f" valid ({per_ref[-1]['n_matching_training_molecule']} match "
              f"a training molecule; sizes "
              f"{per_ref[-1]['valid_heavy_atoms_min_med_max']}; shape "
              f"{per_ref[-1]['avg_shape_tanimoto']})", flush=True)

    n_total = sum(r["n_samples"] for r in per_ref)
    n_valid = sum(r["n_valid"] for r in per_ref)
    n_matched = sum(r["n_size_matched"] for r in per_ref)
    shapes = [r["avg_shape_tanimoto"] for r in per_ref
              if r["avg_shape_tanimoto"] is not None]
    report = {
        "validity_definition": {
            "validity": "FRAGMENT-PERMISSIVE: any sample whose largest "
                        "fragment survives the full standardizer counts, "
                        "regardless of size (the reference's own criterion, "
                        "standardizer.py:83-111 via FragmentParent)",
            "size_matched_validity": "valid AND heavy-atom count within "
                                     "±variance of the request — fragment "
                                     "salvage cannot flatter this number",
        },
        "validity": round(n_valid / n_total, 4),
        "size_matched_validity": round(n_matched / n_total, 4),
        "n_valid": n_valid,
        "n_size_matched": n_matched,
        "n_samples": n_total,
        "n_matching_training_molecule":
            sum(r["n_matching_training_molecule"] for r in per_ref),
        # uniqueness/novelty across ALL valid samples (InChI-analog keys,
        # the harness's identity criterion — reference counts both by
        # InChI, evaluation.py:12-42)
        "unique_within_all_valid": len(set(all_keys)),
        "novel_vs_training_set":
            sum(1 for k in all_keys if k not in train_keys),
        "avg_shape_tanimoto": (round(float(np.mean(shapes)), 4)
                               if shapes else None),
        "per_reference": per_ref,
        "weights": {"edm": edm_path, "adj_mat_seer": adj_path,
                    "config": "EGNNConfig() 420x9, AdjMatSeerConfig() 2048"},
        "training": {
            "dataset": "reference demo conformers (assets/demo_files), "
                       f"{len(mols)} molecules in [15, 39] heavy atoms"
                       + (f", augmented to {len(train_mols)} conformers "
                          f"(perturb sigma {args.augment_sigma} A + "
                          "restrained relax, training/augment.py)"
                          if args.augment else ""),
            "edm_steps": args.edm_steps, "bond_steps": args.bond_steps,
            "batch": args.batch, "lr": args.lr,
            "lr_schedule": "warmup 100 + cosine decay to 0.1x",
            "ema_decay": args.ema,
            "history_tail": {k: v[-3:] for k, v in history.items()},
        },
        "command": "python scripts/train_overfit_validity.py "
                   f"--edm-steps {args.edm_steps} "
                   f"--bond-steps {args.bond_steps} "
                   f"--samples {args.samples} --augment {args.augment} "
                   f"--variance {args.variance}",
        "caveats": "Overfit existence proof on the 3 in-range demo "
                   "conformers — demonstrates the training stack, sampler, "
                   "bond predictor and chemistry layer compose into valid "
                   "molecules end-to-end. NOT comparable to the reference's "
                   "48% validity at full scale (229M-conformer training "
                   "set, README.md:108-115).",
        "platform": jax.devices()[0].platform,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"validity": report["validity"],
                      "n_valid": n_valid, "n_samples": n_total,
                      "wall_s": report["wall_s"]}))


if __name__ == "__main__":
    main()
