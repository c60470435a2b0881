"""Canonical atom ranking (Morgan-style invariant refinement).

Replaces RDKit's canonical ranking for our canonical SMILES writer.  The
algorithm: initial invariants -> iterative neighborhood refinement until the
partition stabilizes -> deterministic tie-breaking by splitting the lowest
remaining class and re-refining.  Atoms left tied after refinement are (in
ordinary organic chemistry) automorphic, so any in-class choice yields the
same canonical string.
"""

from __future__ import annotations

from typing import Dict, List

from molnextr_tpu.chem.mol import Mol


def _refine(mol: Mol, ranks: List[int]) -> List[int]:
    n = mol.num_atoms()
    while True:
        keys = []
        for i in range(n):
            nb = sorted(
                (b.order, ranks[b.other(i)]) for b in mol.bonds_of(i)
            )
            keys.append((ranks[i], tuple(nb)))
        order = sorted(range(n), key=lambda i: keys[i])
        new_ranks = [0] * n
        r = 0
        for j, i in enumerate(order):
            if j > 0 and keys[i] != keys[order[j - 1]]:
                r = j
            new_ranks[i] = r
        if new_ranks == ranks:
            return ranks
        ranks = new_ranks


def canonical_ranks(mol: Mol) -> List[int]:
    """Return a canonical rank (0..n-1, all distinct) per atom."""
    n = mol.num_atoms()
    if n == 0:
        return []
    ring_member = mol.ring_membership()
    inv = []
    for i, atom in enumerate(mol.atoms):
        inv.append(
            (
                atom.atomic_num,
                atom.symbol,  # separates "*" aliases from elements
                mol.degree(i),
                atom.charge,
                mol.total_h(i),
                atom.isotope,
                atom.aromatic,
                ring_member[i],
                atom.alias,
            )
        )
    order = sorted(range(n), key=lambda i: inv[i])
    ranks = [0] * n
    r = 0
    for j, i in enumerate(order):
        if j > 0 and inv[i] != inv[order[j - 1]]:
            r = j
        ranks[i] = r
    ranks = _refine(mol, ranks)

    # tie-breaking: promote one member of the lowest tied class, re-refine
    while True:
        count: Dict[int, List[int]] = {}
        for i, rk in enumerate(ranks):
            count.setdefault(rk, []).append(i)
        tied = sorted(k for k, v in count.items() if len(v) > 1)
        if not tied:
            return ranks
        cls = count[tied[0]]
        chosen = min(cls)  # in-class members are automorphic; see module doc
        ranks = [rk + 1 if rk > ranks[chosen] or (rk == ranks[chosen] and i != chosen) else rk
                 for i, rk in enumerate(ranks)]
        ranks = _refine(mol, ranks)
