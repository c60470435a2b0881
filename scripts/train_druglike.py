#!/usr/bin/env python
"""Train a mid-size model on a generated drug-like corpus (single chip).

The reference's production recipe renders PubChem SMILES on the fly
(`/root/reference/exps/train.sh`); offline here, the corpus comes from
``molnextr_tpu.data.corpus`` (fragment-assembled drug-like molecules).
Produces a checkpoint bundle usable by the API / benchmark suites.

Usage:
    python scripts/train_druglike.py --steps 6000 --save-path output/druglike
"""

from __future__ import annotations

import argparse
import os
import sys

# first touch of newly-mapped pages on this Firecracker host runs ~7MB/s,
# and glibc munmaps every freed block >=128KB — so the 56MB batch collates
# and ~700MB dispatch groups would pay a ~100s page-fault bill per training
# dispatch.  Raising the malloc thresholds keeps big buffers on the heap for
# recycling (measured: 8s -> 0.2s per 56MB stack).  Must be set before the
# allocator starts, hence the re-exec.
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


def build_config(args):
    from molnextr_tpu.config import (
        Config,
        DataConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )

    cfg = Config()
    if args.flagship:
        # the production configuration (Config() defaults = swin_base 384²,
        # 6x256x8 decoder — `model.py:50-81`), global batch 256 via 4x64
        # grad accumulation exactly like the reference's recipe
        # (`exps/train.sh:3-42` trains global 64 = 2x32; we keep 256 to
        # match the README's "default batch 256").  HBM fits only with
        # decoder remat + the factored edge head (both default).
        # The loader feeds MICRO-batches of 64; optax.MultiSteps accumulates
        # args.batch_size//64 of them per optimizer update, and the LR
        # schedule counts updates (train/loop.py divides by grad_accum).
        micro = min(args.batch_size, 64)
        # accum = batch//micro floors: a non-multiple of 64 would silently
        # shrink the global batch (e.g. 96 -> 64), so reject it up front
        assert args.batch_size % micro == 0, (
            f"--flagship batch-size must be a multiple of {micro} "
            f"(got {args.batch_size}; accumulation would drop the remainder)"
        )
        cfg.data = DataConfig(
            input_size=384,
            formats=("chartok_coords", "edges"),
            max_atoms=64,
            render_cache=True,
        )
        cfg.train = TrainConfig(
            epochs=args.epochs,
            batch_size=micro,
            grad_accum_steps=max(args.batch_size // micro, 1),
            encoder_lr=4e-4,
            decoder_lr=4e-4,
            warmup_ratio=0.02,
            label_smoothing=0.1,
            save_mode="best",
            save_path=args.save_path,
            num_workers=args.workers,
            train_steps_per_epoch=args.steps_per_epoch,
            dispatch_steps=args.dispatch,
        )
        cfg.decode.batch_size = 32
        if args.no_augment:
            cfg.data.mol_augment = False
            cfg.data.augment = False
            cfg.data.include_condensed = False
            cfg.data.default_style = True
        return cfg
    cfg.encoder = EncoderConfig(
        name="swin_medium",
        patch_size=4,
        window_size=12,
        embed_dim=args.embed_dim,
        depths=(2, 2, 6, 2),
        num_heads=(2, 4, 8, 16),
        drop_path_rate=0.1,
        use_remat=True,
    )
    cfg.decoder = DecoderConfig(
        num_layers=4, hidden_size=256, attn_heads=8, max_len=256,
    )
    cfg.data = DataConfig(
        input_size=args.input_size,
        formats=("chartok_coords", "edges"),
        max_atoms=64,
        # this host has ONE core: cache base renders so epochs are
        # transform-bound (~220 img/s) instead of render-bound (~51 img/s)
        render_cache=True,
    )
    cfg.train = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        encoder_lr=4e-4,
        decoder_lr=4e-4,
        warmup_ratio=0.02,
        label_smoothing=0.1,
        save_mode="best",
        save_path=args.save_path,
        num_workers=args.workers,
        train_steps_per_epoch=args.steps_per_epoch,
        dispatch_steps=args.dispatch,
    )
    cfg.decode.batch_size = 64
    if args.no_augment:
        # pipeline sanity mode: deterministic renders, no image noise —
        # a correct pipeline must be able to memorize a small corpus fast.
        # default_style makes train renders pixel-identical to eval renders
        # (eval always draws with the jitter-free default RenderOptions).
        cfg.data.mol_augment = False
        cfg.data.augment = False
        cfg.data.include_condensed = False
        cfg.data.default_style = True
    elif args.image_augment_only:
        # robustness fine-tune (VERDICT r3 item 6 / r4 item 7): keep the
        # LABEL distribution AND the render distribution of the clean run
        # (no molecular augmentation, default render style, no photometric
        # noise) and add ONLY the clutter-noise family the perturbed suite
        # applies.  The round-5 druglike3 fine-tune proved the earlier
        # recipe (style jitter + photometric noise) destructive at 192px:
        # held-out clean fell 0.281 -> 0.133 in 5 epochs while perturbed
        # did not improve (BENCH_SUITES_r5 0.0195 vs _finetuned 0.0117) —
        # because Downscale's scale_min=0.2 is a 384px constant (38px
        # effective at 192px) and clutter was never in the train stream.
        cfg.data.mol_augment = False
        cfg.data.include_condensed = False
        cfg.data.augment = False
        cfg.data.default_style = True
        cfg.data.clutter_augment = True
    return cfg


def make_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=60000)
    p.add_argument("--valid", type=int, default=384)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--steps-per-epoch", type=int, default=-1)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--input-size", type=int, default=192)
    p.add_argument("--embed-dim", type=int, default=64)
    # workers default 0: this host exposes a single core, where pool IPC
    # only adds overhead (measured 37 -> 17 img/s with 8 workers)
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--save-path", default="output/druglike")
    p.add_argument("--resume", default=None)
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument(
        "--image-augment-only", action="store_true",
        help="image noise + style jitter but clean molecular labels "
             "(robustness fine-tune after a --no-augment run)",
    )
    p.add_argument(
        "--eval-train", action="store_true",
        help="evaluate on the first --valid TRAIN samples (overfit check)",
    )
    p.add_argument("--max-mol-atoms", type=int, default=40)
    p.add_argument(
        "--flagship", action="store_true",
        help="train the production swin_base 384² config (grad-accum to batch 256)",
    )
    p.add_argument(
        "--dispatch", type=int, default=12,
        help="optimizer updates per device dispatch (amortizes tunnel latency)",
    )
    return p


def main():
    args = make_parser().parse_args()

    from molnextr_tpu.data import Sample
    from molnextr_tpu.data.corpus import generate_corpus
    from molnextr_tpu.train.loop import train_loop
    from molnextr_tpu.utils import print_rank_0

    # NOTE: do NOT gc.disable() here — jax Array objects participate in
    # reference cycles, so without the collector dead device batch buffers
    # (113MB each) accumulate in HBM and the remote allocator degrades as
    # steps pass.  The render cache stores numpy/tuples (few gc-tracked
    # objects), so periodic collection (train_loop does it explicitly at
    # print intervals) stays cheap.

    cfg = build_config(args)
    os.makedirs(args.save_path, exist_ok=True)

    print_rank_0(f"generating corpus: {args.corpus} train + {args.valid} valid")
    train_smiles = generate_corpus(args.corpus, seed=42, max_atoms=args.max_mol_atoms)
    if args.eval_train:
        valid_smiles = train_smiles[: args.valid]
    else:
        valid_smiles = generate_corpus(
            args.valid, seed=20260816, existing=set(train_smiles),
            max_atoms=args.max_mol_atoms,
        )
    with open(os.path.join(args.save_path, "corpus_valid.txt"), "w") as f:
        f.write("\n".join(valid_smiles))
    print_rank_0(f"corpus ready: {len(train_smiles)} train / {len(valid_smiles)} valid")

    state = train_loop(
        cfg,
        [Sample(smiles=s) for s in train_smiles],
        valid_samples=[Sample(smiles=s) for s in valid_smiles],
        num_workers=args.workers,
        print_freq=25,
        do_eval=not args.no_eval,
        eval_every=args.eval_every,
        resume=args.resume,
    )
    print_rank_0(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
