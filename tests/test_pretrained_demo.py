"""End-to-end accuracy test with the committed demo checkpoint.

The bundle in examples/demo_model was trained in-repo (TPU, ~1300 steps on
small molecules) and scores ~90% exact match on clean renders; this test
requires a conservative majority so it stays robust to rendering randomness
and CPU/TPU numerics.
"""

import os
import random

import numpy as np
import pytest

BUNDLE = os.path.join(os.path.dirname(__file__), "..", "examples", "demo_model")


@pytest.mark.skipif(not os.path.exists(BUNDLE), reason="demo bundle missing")
def test_demo_model_end_to_end():
    random.seed(5)
    from molnextr_tpu.api import MolNexTR
    from molnextr_tpu.chem import canonicalize_smiles
    from molnextr_tpu.data.synthetic import generate_synthetic_image

    model = MolNexTR(model_path=BUNDLE, num_workers=1)
    tests = ["CC(C)O", "c1ccccc1", "CC(=O)O", "C1CCCCC1", "CCOC", "CC=O"]
    imgs, golds = [], []
    for smi in tests:
        img, out, _, ok = generate_synthetic_image(
            smi, mol_augment=False, default_option=True, size=128
        )
        assert ok
        imgs.append(img)
        golds.append(out)
    preds = model.predict_images(imgs, batch_size=8)
    hits = sum(
        canonicalize_smiles(p["predicted_smiles"])[0] == canonicalize_smiles(g)[0]
        for g, p in zip(golds, preds)
    )
    assert hits >= 4, [p["predicted_smiles"] for p in preds]
