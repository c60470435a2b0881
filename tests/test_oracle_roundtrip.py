"""Oracle-ceiling regression: gold labels must round-trip to exact match.

Simulates a PERFECT model on freshly rendered drug-like molecules: tokenize
the rendered molecule exactly as training labels do (including coordinate
quantization), decode the token sequence back, assemble the graph with gold
edges, and score.  If this ceiling drops below ~100%, training accuracy is
capped by a pipeline bug, not the model — catch it here, not after a
20-epoch TPU run.  (Validated at n=256 on the druglike3 valid corpus:
canon_smiles 1.0, graph 1.0, chiral 1.0 — round 3.)

Mirrors the exact scoring path of `train/loop.py:evaluate_model`
(`main.py:430-529` in the reference).
"""

import random

import numpy as np
import pytest

from molnextr_tpu.chem.graph import convert_graph_to_smiles
from molnextr_tpu.config import Config
from molnextr_tpu.data.corpus import random_druglike_smiles
from molnextr_tpu.data.synthetic import generate_synthetic_image
from molnextr_tpu.evaluation import SmilesEvaluator
from molnextr_tpu.tokenization import get_tokenizer


@pytest.mark.parametrize("seed", [7])
def test_oracle_roundtrip_druglike(seed):
    cfg = Config()
    cfg.data.input_size = 192
    tok = get_tokenizer(cfg.data)["chartok_coords"]
    rng = random.Random(seed)
    pool = [s for s in (random_druglike_smiles(rng) for _ in range(80)) if s][:32]
    assert len(pool) == 32

    golds, coords, symbols, edges = [], [], [], []
    for s in pool:
        img, gold, graph, ok = generate_synthetic_image(
            s, mol_augment=False, default_option=True, size=192
        )
        if not ok or not graph:
            continue
        c = np.asarray(graph["coords"], np.float64)
        h, w = img.shape[:2]
        c[:, 0] = np.clip(c[:, 0] / w, 0, 1)
        c[:, 1] = np.clip(c[:, 1] / h, 0, 1)
        labels, _ = tok.smiles_to_sequence(gold, c, mask_ratio=0.0)
        parsed = tok.sequence_to_smiles(list(labels))
        k = len(parsed["indices"])
        golds.append(gold)
        coords.append(parsed["coords"])
        symbols.append(parsed["symbols"])
        edges.append(np.asarray(graph["edges"], np.int32)[:k, :k].tolist())

    assert len(golds) >= 30  # render failures must stay rare
    smiles_list, _, _ = convert_graph_to_smiles(
        coords, symbols, edges, num_workers=1
    )
    scores = SmilesEvaluator(golds, num_workers=1).evaluate(smiles_list)
    assert scores["canon_smiles"] >= 0.96, scores
    assert scores["graph"] >= 0.96, scores
