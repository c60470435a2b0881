"""``molnextr-evaluate`` console entry point.

The gold-vs-pred CSV scorer (`/root/reference/evaluate.py:198-218`):
aligns prediction rows to gold rows by image_id (missing predictions become
empty), optionally keeps only the main molecule, and prints the metric
JSON.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Score predicted SMILES against gold")
    p.add_argument("--gold_file", type=str, required=True)
    p.add_argument("--pred_file", type=str, required=True)
    p.add_argument("--pred_field", type=str, default="SMILES")
    p.add_argument("--gold_field", type=str, default="SMILES")
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--tanimoto", action="store_true")
    p.add_argument("--keep_main", action="store_true")
    args = p.parse_args(argv)

    import pandas as pd

    from molnextr_tpu.chem.graph import keep_main_molecule
    from molnextr_tpu.evaluation import SmilesEvaluator

    gold_df = pd.read_csv(args.gold_file)
    pred_df = pd.read_csv(args.pred_file)
    if len(pred_df) != len(gold_df):
        print(f"Pred ({len(pred_df)}) and Gold ({len(gold_df)}) have different lengths!")

    if "image_id" in gold_df.columns and "image_id" in pred_df.columns:
        pred_map = dict(zip(pred_df["image_id"], pred_df[args.pred_field]))
        preds = [pred_map.get(i, "") for i in gold_df["image_id"]]
    else:
        preds = list(pred_df[args.pred_field])[: len(gold_df)]
        preds += [""] * (len(gold_df) - len(preds))
    preds = ["" if not isinstance(s, str) else s for s in preds]
    if args.keep_main:
        preds = keep_main_molecule(preds, num_workers=args.num_workers)

    evaluator = SmilesEvaluator(
        list(gold_df[args.gold_field]), num_workers=args.num_workers,
        tanimoto=args.tanimoto,
    )
    scores = evaluator.evaluate(preds)
    print(json.dumps(scores, indent=4))


if __name__ == "__main__":
    main()
