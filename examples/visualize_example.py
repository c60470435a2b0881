"""Gold-vs-predicted side-by-side rendering (replaces visualization.ipynb).

Renders a molecule with the in-repo rasterizer, predicts it back, and saves
both drawings for visual comparison.

Run:  python examples/visualize_example.py "CC(=O)Oc1ccccc1C(=O)O" out.png
"""

import sys

import cv2
import numpy as np

from molnextr_tpu import MolNexTR
from molnextr_tpu.chem import mol_from_smiles
from molnextr_tpu.chem.layout import layout
from molnextr_tpu.chem.render import render

smiles = sys.argv[1] if len(sys.argv) > 1 else "CC(=O)Oc1ccccc1C(=O)O"
out_path = sys.argv[2] if len(sys.argv) > 2 else "side_by_side.png"

mol = mol_from_smiles(smiles)
layout(mol)
gold_img, _ = render(mol, 384)

model = MolNexTR()  # random weights unless MOLNEXTR_MODEL_PATH is set
pred = model.predict_image(cv2.cvtColor(gold_img, cv2.COLOR_BGR2RGB))
print("gold:", smiles)
print("pred:", pred["predicted_smiles"])

try:
    pmol = mol_from_smiles(pred["predicted_smiles"], strict=False)
    layout(pmol)
    pred_img, _ = render(pmol, 384)
except Exception:
    pred_img = np.full_like(gold_img, 255)
cv2.imwrite(out_path, np.concatenate([gold_img, pred_img], axis=1))
print("wrote", out_path)
