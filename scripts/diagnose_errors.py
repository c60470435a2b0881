#!/usr/bin/env python
"""Error-mode diagnostic for a trained checkpoint (CPU-friendly).

Quantifies where held-out exact match is lost, to target post-processing:
  - graph-assembled SMILES (the reported prediction,
    `api.py::predict_images` -> `chem/graph.py::convert_graph_to_smiles`)
    vs the token-level SMILES (the decoded character string itself,
    `inference.py` parsed["smiles"]) — two views of the same molecule;
  - how often exactly one of the two is right (fusion headroom);
  - how often the prediction is chemically invalid (validity-filter headroom);
  - beam oracle-at-k on token SMILES (reranker headroom).

The reference's released model reports only graph SMILES
(`/root/reference/MolNexTR/model.py:97-146`); this diagnostic is repo-only
tooling.

Usage:
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/diagnose_errors.py \
        --model_path output/druglike60k/ckpt_best --n 64 [--beam 4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--beam", type=int, default=0,
                   help="if >0, also run beam at this width with n_best=beam")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    from molnextr_tpu.api import MolNexTR
    from molnextr_tpu.benchmarks import _synthetic_eval_set
    from molnextr_tpu.chem.graph import convert_graph_to_smiles
    from molnextr_tpu.checkpoint import load_model
    from molnextr_tpu.evaluation import convert_smiles_to_canonsmiles

    cfg, params = load_model(args.model_path)
    model = MolNexTR(cfg=cfg, params=params, num_workers=0)
    images, golds = _synthetic_eval_set(args.n, seed=args.seed,
                                        size=cfg.data.input_size)
    gold_canon, _ = convert_smiles_to_canonsmiles(golds, ignore_chiral=False)

    def canon1(s):
        out, _ = convert_smiles_to_canonsmiles([s], ignore_chiral=False)
        return out[0]

    # -- greedy pass, capturing both SMILES views -------------------------
    fmt = model.engine.fmt
    preds = []
    t0 = time.perf_counter()
    bs = cfg.decode.batch_size
    for start in range(0, len(images), bs):
        chunk = images[start:start + bs]
        batch = np.stack(
            [model.transform(image=im)["image"] for im in chunk], axis=0
        )
        if batch.dtype == np.uint8 and batch.shape[-1] == 3:
            batch = np.ascontiguousarray(batch[..., :1])
        preds += model.engine.predict_images(batch)
    dt = time.perf_counter() - t0

    graph_smiles, _, _ = convert_graph_to_smiles(
        [p[fmt]["coords"] for p in preds],
        [p[fmt]["symbols"] for p in preds],
        [p["edges"] for p in preds],
        images=images, num_workers=0,
    )
    token_smiles = [p[fmt]["smiles"] for p in preds]

    n = len(golds)
    g_ok = t_ok = either = both = invalid_g = invalid_t = 0
    disagree_examples = []
    for i in range(n):
        gc = canon1(graph_smiles[i])
        tc = canon1(token_smiles[i])
        g = gc == gold_canon[i] and gc != ""
        t = tc == gold_canon[i] and tc != ""
        g_ok += g
        t_ok += t
        either += g or t
        both += g and t
        invalid_g += gc == ""
        invalid_t += tc == ""
        if g != t and len(disagree_examples) < 8:
            disagree_examples.append(
                {"gold": gold_canon[i], "graph": gc, "token": tc,
                 "graph_right": bool(g)}
            )

    report = {
        "n": n,
        "img_per_s_greedy": round(n / dt, 2),
        "graph_exact": round(g_ok / n, 4),
        "token_exact": round(t_ok / n, 4),
        "either_exact": round(either / n, 4),
        "both_exact": round(both / n, 4),
        "graph_invalid": round(invalid_g / n, 4),
        "token_invalid": round(invalid_t / n, 4),
        "disagree_examples": disagree_examples,
    }

    # -- beam oracle-at-k --------------------------------------------------
    if args.beam > 1:
        import copy

        cfg_b = copy.deepcopy(cfg)
        cfg_b.decode.beam_size = args.beam
        cfg_b.decode.n_best = args.beam
        model_b = MolNexTR(cfg=cfg_b, params=params, num_workers=0)
        preds_b = []
        for start in range(0, len(images), bs):
            chunk = images[start:start + bs]
            batch = np.stack(
                [model_b.transform(image=im)["image"] for im in chunk], axis=0
            )
            if batch.dtype == np.uint8 and batch.shape[-1] == 3:
                batch = np.ascontiguousarray(batch[..., :1])
            preds_b += model_b.engine.predict_images(batch)
        top1 = 0
        oracle = 0
        rank_hist = [0] * args.beam
        for i in range(n):
            beams = preds_b[i].get("beams", [])
            hits = [
                k for k, b in enumerate(beams)
                if canon1(b["smiles"]) == gold_canon[i]
            ]
            if hits and hits[0] == 0:
                top1 += 1
            if hits:
                oracle += 1
                rank_hist[hits[0]] += 1
        report["beam"] = args.beam
        report["beam_token_top1"] = round(top1 / n, 4)
        report["beam_token_oracle"] = round(oracle / n, 4)
        report["beam_first_hit_rank_hist"] = rank_hist

    text = json.dumps(report, indent=2)
    print(text)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
