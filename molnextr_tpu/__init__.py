"""MolNexTR-TPU: a TPU-native molecular image recognition framework.

A ground-up JAX/Flax/Pallas re-design of the MolNexTR OCSR system
(image -> molecular graph -> SMILES).  The device path (encoder, decoder,
edge head, constrained greedy/beam decoding) runs inside ``jit`` on TPU;
the chemistry layer (SMILES parsing/canonicalization, graph assembly,
abbreviation expansion, rendering) is a self-contained host-side package
replacing the reference's RDKit/Indigo dependencies.

Public API mirrors the reference (`/root/reference/MolNexTR/__init__.py`):

    from molnextr_tpu import get_predictions
    result = get_predictions("mol.png", atoms_bonds=True)
"""

__version__ = "0.1.0"

from molnextr_tpu.config import Config  # noqa: F401


def get_predictions(*args, **kwargs):
    from molnextr_tpu.api import get_predictions as _gp

    return _gp(*args, **kwargs)


def MolNexTR(*args, **kwargs):
    from molnextr_tpu.api import MolNexTR as _M

    return _M(*args, **kwargs)
