#!/usr/bin/env python
"""A/B the int8 KV-cache decode against bf16 on a trained checkpoint.

Runs the held-out accuracy suite (benchmarks.suite_batch_inference) twice on
the same checkpoint — once with the default bf16 caches, once with
``DecoderConfig.kv_int8`` — and reports both score dicts plus the per-sample
SMILES agreement rate.  Used to validate flipping the kv_int8 default
(round-5: bench.py measured 219 -> 261 img/s/chip with int8; the flip is
gated on suite-level accuracy parity).

Usage:
    python scripts/ab_int8_suites.py --model_path output/druglike3/ckpt_last \
        [--n 256] [--output AB_INT8.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    from molnextr_tpu.api import MolNexTR
    from molnextr_tpu.benchmarks import suite_batch_inference
    from molnextr_tpu.checkpoint import load_model

    cfg, params = load_model(args.model_path)
    report = {}
    smiles = {}
    for tag, int8 in (("bf16", False), ("int8", True)):
        c = dataclasses.replace(cfg)
        c.decoder = dataclasses.replace(cfg.decoder, kv_int8=int8)
        model = MolNexTR(cfg=c, params=params, num_workers=0)
        suite = suite_batch_inference(c, model, n=args.n)
        report[tag] = suite
        smiles[tag] = suite.pop("_smiles", None)
        print(tag, json.dumps(suite, default=float), flush=True)
    if smiles["bf16"] is not None and smiles["int8"] is not None:
        agree = sum(a == b for a, b in zip(smiles["bf16"], smiles["int8"]))
        report["smiles_agreement"] = agree / max(len(smiles["bf16"]), 1)
        print(f"per-sample SMILES agreement: {report['smiles_agreement']:.4f}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2, default=float)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
