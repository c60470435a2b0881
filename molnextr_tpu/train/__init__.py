from molnextr_tpu.train.losses import (
    Criterion,
    graph_loss,
    label_smoothing_ce,
    sequence_loss,
)
from molnextr_tpu.train.state import TrainState, create_train_state, make_schedules
from molnextr_tpu.train.step import eval_step_fn, train_step_fn

__all__ = [
    "Criterion",
    "graph_loss",
    "label_smoothing_ce",
    "sequence_loss",
    "TrainState",
    "create_train_state",
    "make_schedules",
    "train_step_fn",
    "eval_step_fn",
    "main",
]


def main(argv=None):
    """``molnextr-train`` console entry point: the `main.py --do_train`
    analogue (`/root/reference/main.py:568-604`)."""
    import argparse
    import os

    from molnextr_tpu.config import Config
    from molnextr_tpu.data import Sample

    p = argparse.ArgumentParser(description="Train MolNexTR-TPU")
    p.add_argument("--train_file", type=str, required=True,
                   help="CSV with a SMILES column (synthetic rendering) and "
                        "optionally file_path for real images")
    p.add_argument("--valid_file", type=str, default=None)
    p.add_argument("--aux_file", type=str, default=None,
                   help="extra real-image CSV concatenated with the synthetic "
                        "set (the AuxTrainDataset pattern)")
    p.add_argument("--data_path", type=str, default="",
                   help="prefix for relative file_path entries")
    p.add_argument("--config", type=str, default=None, help="config JSON")
    p.add_argument("--save_path", type=str, default="output/")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--encoder_lr", type=float, default=None)
    p.add_argument("--decoder_lr", type=float, default=None)
    p.add_argument("--encoder", type=str, default=None)
    p.add_argument("--formats", type=str, default=None,
                   help="comma-separated, e.g. chartok_coords,edges")
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="snapshot tag to restore (best/last/ep<N>) from "
                        "save_path before training")
    p.add_argument("--save_image", type=int, default=0,
                   help="dump the first N synthetic renders to save_path/images")
    args = p.parse_args(argv)

    if args.config and os.path.exists(args.config):
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    cfg.train.save_path = args.save_path
    for name in ("epochs", "batch_size", "encoder_lr", "decoder_lr", "seed"):
        v = getattr(args, name)
        if v is not None:
            setattr(cfg.train, name, v)
    if args.encoder:
        cfg.encoder.name = args.encoder
    if args.formats:
        cfg.data.formats = tuple(args.formats.split(","))
    if args.steps_per_epoch is not None:
        cfg.train.train_steps_per_epoch = args.steps_per_epoch

    def load_samples(path):
        import pandas as pd

        df = pd.read_csv(path)
        out = []
        for _, row in df.iterrows():
            fp = row.get("file_path")
            fp = os.path.join(args.data_path, fp) if isinstance(fp, str) else None
            out.append(Sample(smiles=row["SMILES"], image_path=fp))
        return out

    train_samples = load_samples(args.train_file)
    if args.aux_file:
        train_samples = train_samples + load_samples(args.aux_file)
    if args.max_samples:
        train_samples = train_samples[: args.max_samples]
    valid_samples = load_samples(args.valid_file) if args.valid_file else None

    from molnextr_tpu.train.loop import train_loop

    train_loop(
        cfg, train_samples, valid_samples,
        num_workers=args.num_workers, do_eval=not args.no_eval,
        save_images=args.save_image, resume=args.resume,
    )
