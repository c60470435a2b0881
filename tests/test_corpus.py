"""Drug-like corpus generator: stereo distribution + oracle round-trip.

Round-4 VERDICT item 5: every held-out eval ever recorded had chiral = 0.0.
One root cause was distributional — only ~6% of the generated corpus carried
a stereocenter (and 0% carried E/Z geometry), so the edge head's optimal
policy was "never predict a wedge".  The generator now targets ~30% chiral /
~10% E/Z (the druglike slice of PubChem the reference trains on is
stereo-rich, `/root/reference/README.md:79-80`); these tests pin that
distribution and prove the label pipeline round-trips it losslessly.
"""

import random

import numpy as np

from molnextr_tpu.data.corpus import generate_corpus, random_druglike_smiles


def test_corpus_stereo_fractions():
    smis = generate_corpus(1000, seed=7)
    assert len(smis) == 1000
    chiral = sum(1 for s in smis if "@" in s) / len(smis)
    ez = sum(1 for s in smis if "/" in s or "\\" in s) / len(smis)
    assert 0.20 <= chiral <= 0.40, chiral
    assert 0.05 <= ez <= 0.18, ez
    # determinism per seed (reproducible train/valid splits)
    assert smis[:50] == generate_corpus(50, seed=7)


def test_corpus_all_parse_strict():
    from molnextr_tpu.chem import mol_from_smiles

    rng = random.Random(3)
    for _ in range(60):
        s = random_druglike_smiles(rng)
        if s is None:
            continue
        mol = mol_from_smiles(s, strict=True)
        assert 5 <= mol.num_atoms() <= 48


def test_oracle_roundtrip_stereo_subset():
    """Gold labels on the chiral/EZ slice must round-trip to exact match,
    including the chirality flag (`evaluate.py:176-195` scoring)."""
    from molnextr_tpu.chem.graph import convert_graph_to_smiles
    from molnextr_tpu.config import Config
    from molnextr_tpu.data.synthetic import generate_synthetic_image
    from molnextr_tpu.evaluation import SmilesEvaluator
    from molnextr_tpu.tokenization import get_tokenizer

    cfg = Config()
    cfg.data.input_size = 192
    tok = get_tokenizer(cfg.data)["chartok_coords"]
    smis = generate_corpus(400, seed=11)
    pool = [s for s in smis if "@" in s][:20]
    pool += [s for s in smis if "/" in s or "\\" in s][:8]
    assert len(pool) >= 20

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

    assert len(golds) >= 18  # render failures must stay rare
    smiles_list, _, _ = convert_graph_to_smiles(coords, symbols, edges, num_workers=1)
    scores = SmilesEvaluator(golds, num_workers=1).evaluate(smiles_list)
    assert scores["canon_smiles"] >= 0.95, scores
    assert scores["chiral"] >= 0.95, scores
    assert scores["chiral_ratio"] >= 0.5, scores
