"""Single-image prediction walkthrough (replaces prediction.ipynb).

Run:  python examples/predict_example.py [image.png]
Uses a random-weight model unless MOLNEXTR_MODEL_PATH points at a bundle.
"""

import json
import sys

from molnextr_tpu import get_predictions

image = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/1.png"
result = get_predictions(image, atoms_bonds=True, predicted_molfile=True)
print("SMILES:", result["predicted_smiles"])
print("atoms:", json.dumps(result["atom_sets"][:5], indent=2))
print("bonds:", json.dumps(result["bond_sets"][:5], indent=2))
print("molfile (head):")
print("\n".join(result["predicted_molfile"].splitlines()[:8]))
print("device:", result["device_info"], "| took", round(result["prediction_time_seconds"], 2), "s")
