#!/usr/bin/env python
"""Chirality end-to-end proof: overfit a tiny model on chiral molecules.

VERDICT r3 item 4's done-criterion is ``valid_chiral > 0`` on an overfit
run. The round-3 overfit checkpoint predates the ed36cee wedge-frame fix
(scripts/diagnose_chirality.py shows it memorized inverted wedges), so this
re-proves the chain with current labels: train on K chiral molecules until
the eval (on the SAME molecules, deterministic renders) gets chirality
right. Small enough to run on the single host CPU core when the TPU relay
is down.

Usage:
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= nice -n 19 python \
        scripts/overfit_chiral.py --k 4 --epochs 400 --save-path output/chiral_proof
"""

from __future__ import annotations

import argparse
import os
import sys

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    os.execve(
        sys.executable,
        [sys.executable, "-u"] + sys.argv,
        dict(
            os.environ,
            MALLOC_MMAP_THRESHOLD_="1073741824",
            MALLOC_TRIM_THRESHOLD_="1073741824",
            PYTHONUNBUFFERED="1",
        ),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4, help="number of chiral molecules")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--embed-dim", type=int, default=16)
    p.add_argument("--save-path", default="output/chiral_proof")
    p.add_argument("--resume", default=None)
    args = p.parse_args()

    from molnextr_tpu.config import (
        Config, DataConfig, DecoderConfig, EncoderConfig, TrainConfig,
    )
    from molnextr_tpu.data import Sample
    from molnextr_tpu.data.corpus import generate_corpus
    from molnextr_tpu.train.loop import train_loop
    from molnextr_tpu.utils import print_rank_0

    pool = generate_corpus(4000, seed=42, max_atoms=28)
    chiral = [s for s in pool if "@" in s][: args.k]
    assert len(chiral) == args.k, f"only {len(chiral)} chiral molecules found"
    print_rank_0(f"chiral overfit set: {chiral}")

    cfg = Config()
    cfg.encoder = EncoderConfig(
        name="swin_tiny_cpu", patch_size=4, window_size=12,
        embed_dim=args.embed_dim, depths=(2, 2, 6, 2), num_heads=(2, 4, 8, 16),
        drop_path_rate=0.0, use_remat=False,
    )
    cfg.decoder = DecoderConfig(num_layers=4, hidden_size=256, attn_heads=8, max_len=256)
    cfg.data = DataConfig(
        input_size=192,
        formats=("chartok_coords", "edges"),
        max_atoms=64,
        render_cache=True,
        mol_augment=False,
        augment=False,
        include_condensed=False,
        default_style=True,
    )
    cfg.train = TrainConfig(
        epochs=args.epochs,
        batch_size=args.k,
        encoder_lr=4e-4,
        decoder_lr=4e-4,
        warmup_ratio=0.02,
        label_smoothing=0.1,
        save_mode="best",
        save_path=args.save_path,
        num_workers=0,
        dispatch_steps=1,
    )
    cfg.decode.batch_size = args.k
    os.makedirs(args.save_path, exist_ok=True)
    with open(os.path.join(args.save_path, "corpus_valid.txt"), "w") as f:
        f.write("\n".join(chiral))

    samples = [Sample(smiles=s) for s in chiral]
    state = train_loop(
        cfg,
        samples,
        valid_samples=samples,  # eval-train: deterministic renders
        num_workers=0,
        print_freq=25,
        do_eval=True,
        eval_every=args.eval_every,
        resume=args.resume,
    )
    print_rank_0(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
