"""Deterministic vocabulary generation.

The reference ships two vocab files: a 101-entry character vocabulary
(`MolNexTR/vocab/vocab_chars.json`, used by the released chartok_coords model)
and a 2013-entry atomwise vocabulary mined from USPTO training data
(`vocab_uspto.json`).  We regenerate equivalents programmatically so the vocab
is a reproducible artifact rather than opaque data:

* ``vocab_chars.json``  -- specials + printable SMILES characters.
* ``vocab_atoms.json``  -- specials + SMILES punctuation + ring digits + all
  element symbols + an enumeration of common bracket atoms (charge/H/stereo
  combinations) + R-group placeholders.

Run:  python -m molnextr_tpu.vocab.build_vocab
"""

import json
import os
import string

SPECIALS = ["<pad>", "<sos>", "<eos>", "<unk>", "<mask>"]

PUNCT = list(".-=#:/\\()[]@+%*~;,'$?!><_^`{}|\"&")
DIGITS = list(string.digits)
LOWER = list(string.ascii_lowercase)
UPPER = list(string.ascii_uppercase)

ELEMENTS = [
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr",
    "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm",
    "Md", "No", "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds",
    "Rg", "Cn", "Nh", "Fl", "Mc", "Lv", "Ts", "Og",
]

AROMATIC = ["b", "c", "n", "o", "p", "s"]


def build_char_vocab():
    chars = SPECIALS + PUNCT + DIGITS + LOWER + UPPER
    return {c: i for i, c in enumerate(chars)}


def build_atom_vocab():
    tokens = list(SPECIALS)
    tokens += list(".-=#:/\\()@+%*~")
    tokens += DIGITS + [f"%{i}" for i in range(10, 40)]
    # bare organic-subset atoms and aromatics appear unbracketed in SMILES
    tokens += ["B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"] + AROMATIC
    # bracket atoms: enumerate the common charge/H/stereo decorations
    bracket = []
    for el in ELEMENTS:
        bracket.append(f"[{el}]")
        for dec in ("H", "H2", "H3", "+", "-", "+2", "-2", "H+", "H-", "H2+", "H2-"):
            bracket.append(f"[{el}{dec}]")
    for el in ("C", "N", "S", "P", "Si"):
        for st in ("@", "@@"):
            bracket.append(f"[{el}{st}]")
            bracket.append(f"[{el}{st}H]")
    for ar in AROMATIC + ["se", "te", "as"]:
        bracket.append(f"[{ar}]")
        bracket.append(f"[{ar}H]")
        bracket.append(f"[{ar}+]")
        bracket.append(f"[{ar}-]")
    # R-group / wildcard placeholders used by the OCSR task
    for r in range(1, 21):
        bracket.append(f"[R{r}]")
        bracket.append(f"[{r}*]")
    bracket += ["[R]", "[R']", "[X]", "[Y]", "[Z]", "[Ar]", "[*]", "[H]", "[2H]", "[3H]", "[13C]", "[15N]"]
    seen = set(tokens)
    for t in bracket:
        if t not in seen:
            tokens.append(t)
            seen.add(t)
    return {t: i for i, t in enumerate(tokens)}


def main():
    here = os.path.dirname(__file__)
    for name, builder in (
        ("vocab_chars.json", build_char_vocab),
        ("vocab_atoms.json", build_atom_vocab),
    ):
        vocab = builder()
        with open(os.path.join(here, name), "w") as f:
            json.dump(vocab, f, indent=0)
        print(f"{name}: {len(vocab)} tokens")


if __name__ == "__main__":
    main()
