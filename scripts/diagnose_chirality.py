#!/usr/bin/env python
"""Chirality end-to-end diagnosis (VERDICT r3 item 4).

chiral exact-match has been 0.0 in every eval ever recorded, including the
81%-exact overfit run. This script locates where the stereo signal drops:

  stage A  oracle: gold labels -> graph -> SMILES (chiral should be ~1.0,
           tests/test_oracle_roundtrip.py says it is at n=256)
  stage B  model tokens: does the trained model reproduce the gold token
           sequence (atoms + coords) on its own TRAINING molecules?
  stage C  model edges: does the edge head reproduce gold wedge (5) / dash
           (6) classes?
  stage D  full pipeline: predicted graph -> SMILES -> chiral match?

Usage:
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/diagnose_chirality.py \
        --bundle output/overfit3/ckpt_best
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", default="output/overfit3/ckpt_best")
    ap.add_argument("--corpus", default="output/overfit3/corpus_valid.txt")
    ap.add_argument("--only-chiral", action="store_true", default=False)
    args = ap.parse_args()

    from molnextr_tpu.api import MolNexTR
    from molnextr_tpu.chem.graph import convert_graph_to_smiles
    from molnextr_tpu.data.synthetic import generate_synthetic_image
    from molnextr_tpu.evaluation import SmilesEvaluator
    from molnextr_tpu.tokenization import get_tokenizer

    smiles_all = [s.strip() for s in open(args.corpus) if s.strip()]
    m = MolNexTR(args.bundle)
    cfg = m.cfg
    tok = get_tokenizer(cfg.data)["chartok_coords"]
    size = cfg.data.input_size

    rows = []
    for s in smiles_all:
        img, gold, graph, ok = generate_synthetic_image(
            s, mol_augment=False, default_option=True, size=size
        )
        if not ok or not graph:
            print(f"RENDER FAIL: {s}")
            continue
        chiral = "@" in gold
        if args.only_chiral and not chiral:
            continue
        c = np.asarray(graph["coords"], np.float64)
        h, w = img.shape[:2]
        c[:, 0] = np.clip(c[:, 0] / w, 0, 1)
        c[:, 1] = np.clip(c[:, 1] / h, 0, 1)
        labels, _ = tok.smiles_to_sequence(gold, c, mask_ratio=0.0)
        rows.append(dict(smiles=s, gold=gold, img=img, graph=graph,
                         labels=list(labels), chiral=chiral))

    # ---- stage A: oracle ------------------------------------------------
    coords, symbols, edges, golds = [], [], [], []
    for r in rows:
        parsed = tok.sequence_to_smiles(r["labels"])
        k = len(parsed["indices"])
        coords.append(parsed["coords"])
        symbols.append(parsed["symbols"])
        edges.append(np.asarray(r["graph"]["edges"], np.int32)[:k, :k].tolist())
        golds.append(r["gold"])
    oracle_smiles, _, _ = convert_graph_to_smiles(coords, symbols, edges, num_workers=1)
    ev = SmilesEvaluator(golds, num_workers=1)
    print("stage A (oracle):", {k: round(v, 3) for k, v in
          ev.evaluate(oracle_smiles).items() if not k.startswith("_")})
    for r, osm in zip(rows, oracle_smiles):
        if r["chiral"]:
            print(f"  A chiral: gold={r['gold']}\n            orac={osm}")

    # ---- stage B/C: model raw prediction on its training set ------------
    batch = np.stack([m.transform(image=r["img"])["image"] for r in rows])
    if batch.dtype == np.uint8 and batch.shape[-1] == 3:
        batch = np.ascontiguousarray(batch[..., :1])
    raw = m.engine.predict_images_raw(batch)
    seq_np, edge_np = raw["seq"], raw["edges"]

    pc, ps, pe = [], [], []
    for i, r in enumerate(rows):
        parsed = tok.sequence_to_smiles(seq_np[i].tolist())
        k = len(parsed["indices"])
        pc.append(parsed["coords"])
        ps.append(parsed["symbols"])
        pe.append(edge_np[i][:k, :k].tolist())

        gold_parsed = tok.sequence_to_smiles(r["labels"])
        tok_match = parsed["smiles"] == gold_parsed["smiles"]
        gk = len(gold_parsed["indices"])
        ge = np.asarray(r["graph"]["edges"], np.int32)[:gk, :gk]
        if k == gk:
            edge_match = int((np.asarray(pe[-1]) == ge).all())
            gold_wedge = set(zip(*np.where((ge == 5) | (ge == 6))))
            pred_arr = np.asarray(pe[-1])
            pred_wedge = set(zip(*np.where((pred_arr == 5) | (pred_arr == 6))))
            wedge_note = (f"gold_wedges={sorted(gold_wedge)} "
                          f"pred_wedges={sorted(pred_wedge)}")
            # per-wedge-cell classes
            details = {t: (int(ge[t]), int(pred_arr[t]))
                       for t in sorted(gold_wedge | pred_wedge)}
        else:
            edge_match, wedge_note, details = 0, f"atom count {k} vs {gk}", {}
        tag = "CHIRAL" if r["chiral"] else "      "
        print(f"{tag} tokens={'OK ' if tok_match else 'DIFF'} edges="
              f"{'OK ' if edge_match else 'DIFF'} {r['gold'][:46]}")
        if r["chiral"] or not edge_match:
            print(f"       {wedge_note}")
            if details:
                print(f"       wedge cells (gold,pred): {details}")
        if r["chiral"] and not tok_match:
            print(f"       gold toks: {gold_parsed['smiles']}")
            print(f"       pred toks: {parsed['smiles']}")

    # ---- stage D: full pipeline -----------------------------------------
    pred_smiles, _, _ = convert_graph_to_smiles(pc, ps, pe, num_workers=1)
    print("stage D (model):", {k: round(v, 3) for k, v in
          ev.evaluate(pred_smiles).items() if not k.startswith("_")})
    for r, psm in zip(rows, pred_smiles):
        if r["chiral"]:
            print(f"  D chiral: gold={r['gold']}\n            pred={psm}")


if __name__ == "__main__":
    main()
