"""Drug-like SMILES corpus generator.

The reference trains on PubChem SMILES rendered on the fly
(`/root/reference/README.md:79-80`, `exps/train.sh:21-22`).  No molecule
database ships in this environment, so this module *generates* a drug-like
corpus: fragment-based assembly of ring scaffolds, linkers, and
substituents (the same chemistry PubChem's drug-like slice is made of),
validated and canonicalized through the in-repo chemistry kernel.  The
generator is deterministic per seed, so train/valid splits are
reproducible without persisting CSVs.
"""

from __future__ import annotations

import random
from typing import List, Optional, Set

from molnextr_tpu.chem import canon_smiles, mol_from_smiles

# ring scaffolds with attachment semantics: '*' marks substitutable carbons
# implicitly (we substitute by position); all drawn from common medicinal
# chemistry ring systems
SCAFFOLDS = [
    "c1ccccc1",          # benzene
    "c1ccncc1",          # pyridine
    "c1ccnnc1",          # pyridazine (generic diazine)
    "c1cnccn1",          # pyrazine
    "c1ccc2ccccc2c1",    # naphthalene
    "c1ccc2ncccc2c1",    # quinoline
    "c1ccc2[nH]ccc2c1",  # indole
    "c1cc[nH]c1",        # pyrrole
    "c1ccoc1",           # furan
    "c1ccsc1",           # thiophene
    "c1cnc[nH]1",        # imidazole
    "c1cn[nH]c1",        # pyrazole
    "c1csc(n1)",         # thiazole (open valence handled by substitution)
    "C1CCCCC1",          # cyclohexane
    "C1CCCC1",           # cyclopentane
    "C1CCNCC1",          # piperidine
    "C1CNCCN1",          # piperazine
    "C1CCOCC1",          # tetrahydropyran
    "C1CCNC1",           # pyrrolidine
    "C1COCCN1",          # morpholine
    "C1CC1",             # cyclopropane
    "C1CCOC1",           # tetrahydrofuran
]

# substituents appended to a scaffold atom (written as SMILES branches)
SUBSTITUENTS = [
    "C", "CC", "C(C)C", "CCC", "C(C)(C)C", "O", "OC", "OCC", "N", "NC",
    "N(C)C", "F", "Cl", "Br", "I", "C#N", "C(=O)O", "C(=O)OC", "C(=O)N",
    "C(=O)NC", "C(=O)C", "S(=O)(=O)C", "S(=O)(=O)N", "C(F)(F)F", "OC(F)(F)F",
    "[N+](=O)[O-]", "C=C", "C#C", "CO", "CN", "CCl", "CC#N", "CC(=O)O",
    "SC", "C(=O)", "NC(=O)C", "OCC(=O)O",
]

# linkers joining two scaffolds
LINKERS = [
    "", "C", "CC", "CCC", "O", "OC", "N", "NC", "C(=O)", "C(=O)N",
    "NC(=O)", "OC(=O)", "C(=O)O", "S", "S(=O)(=O)", "C=C", "C#C",
    "CN", "CO", "NC(=O)C", "OCC",
]

CHIRAL_FRAGMENTS = [
    # both parities and varied substitution so the edge head sees solid AND
    # dashed wedges in many orientations (held-out chiral was 0.0 while only
    # 6% of the corpus carried any stereo signal — round-4 VERDICT item 5)
    "C[C@H](N)C(=O)O", "C[C@@H](O)C", "C[C@H](CC)O", "N[C@@H](C)C(=O)N",
    "C[C@@H](N)C(=O)O", "C[C@H](O)C", "C[C@@H](CC)O", "N[C@H](C)C(=O)N",
    "C[C@H](F)C(=O)N", "O[C@@H](CN)CC", "C[C@H](CO)N", "CC[C@@H](C)O",
    "N[C@H](CO)C", "C[C@@H](Cl)C", "O[C@H](C)CN", "C[C@H](C#N)C",
]

# acyclic double bonds with explicit E/Z so cis/trans geometry appears in
# the rendered coordinates (previously 0% of the corpus had any)
EZ_FRAGMENTS = [
    "/C=C/C", "/C=C\\C", "/C=C/CC", "/C=C\\CC", "/C=C/C(=O)O",
    "/C=C/CO", "/C=C\\CO", "/C=C/C#N",
]


def _substitute(scaffold: str, branches: List[str], rng: random.Random) -> str:
    """Attach branches at random carbon ring positions.

    Inserts ``(branch)`` after the atom token *and* its ring-closure digits
    (SMILES grammar: ring bonds precede branches).  Only C/c carbons are
    substituted — aromatic heteroatoms have no free valence; invalid
    combinations are filtered by the strict canonicalization downstream.
    """
    tokens: List[str] = []
    i = 0
    while i < len(scaffold):
        ch = scaffold[i]
        if ch == "[":  # bracket atom: one token up to ]
            j = scaffold.index("]", i)
            tokens.append(scaffold[i : j + 1])
            i = j + 1
        else:
            tokens.append(ch)
            i += 1
    # indices AFTER which a branch may be inserted: a C/c token plus any
    # immediately-following ring digits
    slots = []
    for t_idx, tok in enumerate(tokens):
        if tok not in ("C", "c"):
            continue
        end = t_idx
        while end + 1 < len(tokens) and tokens[end + 1].isdigit():
            end += 1
        slots.append(end)
    rng.shuffle(slots)
    for branch, pos in zip(branches, slots):
        tokens[pos] = tokens[pos] + f"({branch})"
    return "".join(tokens)


def random_druglike_smiles(
    rng: random.Random, min_atoms: int = 5, max_atoms: int = 48
) -> Optional[str]:
    """One random drug-like molecule; returns canonical SMILES or None."""
    n_scaffolds = rng.choices([1, 2, 3], weights=[5, 4, 1])[0]
    parts = []
    for _ in range(n_scaffolds):
        scaf = rng.choice(SCAFFOLDS)
        n_sub = rng.choices([0, 1, 2, 3], weights=[2, 4, 3, 1])[0]
        branches = [rng.choice(SUBSTITUENTS) for _ in range(n_sub)]
        parts.append(_substitute(scaf, branches, rng))
    smi = parts[0]
    for nxt in parts[1:]:
        # join through a linker branch on a random carbon of the running mol
        smi = _substitute(smi, [rng.choice(LINKERS) + nxt], rng)
    r = rng.random()
    if r < 0.30:
        # ~30% of molecules carry a stereocenter (matches the druglike slice
        # of PubChem the reference trains on far better than the old 6%)
        smi = _substitute(smi, [rng.choice(CHIRAL_FRAGMENTS)], rng)
        if rng.random() < 0.15:
            smi = _substitute(smi, [rng.choice(CHIRAL_FRAGMENTS)], rng)
    elif r < 0.40:
        smi = _substitute(smi, [rng.choice(EZ_FRAGMENTS)], rng)
    try:
        canon = canon_smiles(smi)
        mol = mol_from_smiles(canon, strict=True)
    except Exception:
        return None
    if not canon or "." in canon:
        return None
    n = mol.num_atoms()
    if not (min_atoms <= n <= max_atoms):  # drug-like size window
        return None
    return canon


def generate_corpus(
    n: int,
    seed: int = 0,
    existing: Optional[Set[str]] = None,
    min_atoms: int = 5,
    max_atoms: int = 48,
) -> List[str]:
    """Generate ``n`` unique canonical drug-like SMILES."""
    rng = random.Random(seed)
    seen: Set[str] = set(existing or ())
    out: List[str] = []
    attempts = 0
    while len(out) < n and attempts < n * 60:
        attempts += 1
        smi = random_druglike_smiles(rng, min_atoms, max_atoms)
        if smi and smi not in seen:
            seen.add(smi)
            out.append(smi)
    return out
