#!/usr/bin/env python
"""Prebuild the persistent item cache for a train_druglike run.

An epoch of ``train_steps_per_epoch * batch_size`` touches slightly fewer
samples than the corpus holds (shuffled, drop_last), so the in-run cache
never reaches ``item_cache_complete()`` and is never persisted.  This script
builds every item on the host (no device needed) with the exact fingerprint
config of the training run and writes ``<save-path>/item_cache.pkl`` —
resumed runs then skip all render/transform/tokenize host work from step 0.

Usage (must mirror the training run's data args):
    python scripts/prebuild_item_cache.py --corpus 20000 --valid 256 \
        --batch-size 128 --no-augment --save-path output/druglike3
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_druglike import build_config, make_parser  # noqa: E402


def main():
    args = make_parser().parse_args()
    cfg = build_config(args)

    from molnextr_tpu.data.corpus import generate_corpus
    from molnextr_tpu.data.dataset import Sample, TrainDataset
    from molnextr_tpu.tokenization import get_tokenizer

    train_smiles = generate_corpus(args.corpus, seed=42, max_atoms=args.max_mol_atoms)
    ds = TrainDataset(
        cfg, [Sample(smiles=s) for s in train_smiles], get_tokenizer(cfg.data)
    )
    if not ds._item_cacheable:
        raise SystemExit("config is not item-cacheable (augment/mask_ratio on?)")

    path = os.path.join(args.save_path, "item_cache.pkl")
    if ds.load_item_cache(path):
        print(f"cache already complete: {len(ds._item_cache)} items")
        return

    t0 = time.time()
    for i in range(len(ds)):
        ds[i]
        if (i + 1) % 2000 == 0:
            dt = time.time() - t0
            print(f"{i + 1}/{len(ds)} items ({(i + 1) / dt:.0f} items/s)", flush=True)
    os.makedirs(args.save_path, exist_ok=True)
    if not ds.save_item_cache(path):
        missing = len(ds) - len(ds._item_cache)
        raise SystemExit(f"cache incomplete: {missing} items failed to build")
    print(f"saved {len(ds._item_cache)} items -> {path} "
          f"({time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
