"""Native C++ matcher: build, parity with the Python matcher, fallback."""

import os

import pytest

from molnextr_tpu.chem.aromaticity import sanitize
from molnextr_tpu.chem.smiles_parser import parse_smiles


def _match_sets(mol, pattern, af):
    from molnextr_tpu.chem.match import find_substructures

    return sorted(
        tuple(sorted(m.values())) for m in find_substructures(mol, pattern, af)
    )


@pytest.fixture(scope="module")
def native_lib():
    from molnextr_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeMatcher:
    def test_parity_with_python(self, native_lib, monkeypatch):
        from molnextr_tpu.data.synthetic import _patterns

        mols = [
            "CC(=O)Oc1ccccc1C(=O)O",
            "CCOC(=O)CCC(=O)OCC",
            "CC(C)(C)OC(=O)NC1CCNCC1",
            "CS(=O)(=O)Oc1ccccc1",
            "FC(F)(F)c1ccccc1OC",
        ]
        pats = _patterns()
        for smi in mols:
            mol = parse_smiles(smi)
            sanitize(mol)
            for sub, pat, af in pats:
                if pat.num_atoms() > mol.num_atoms():
                    continue
                native = _match_sets(mol, pat, af)
                import molnextr_tpu.native as N

                monkeypatch.setenv("MOLNEXTR_NO_NATIVE", "1")
                N._LIB, N._TRIED = None, False
                python = _match_sets(mol, pat, af)
                monkeypatch.delenv("MOLNEXTR_NO_NATIVE")
                N._LIB, N._TRIED = None, False
                assert native == python, (smi, sub.abbrvs)

    def test_direct_call(self, native_lib):
        from molnextr_tpu.native import find_substructures_native

        mol = parse_smiles("CC(=O)OC")
        sanitize(mol)
        pat = parse_smiles("[O]C(C)=O", strict=False)  # OAc expansion
        sanitize(pat, strict=False)
        from molnextr_tpu.chem.graph import _attachment_points, free_valence

        af = {i: free_valence(pat, i) for i in range(pat.num_atoms())}
        for p in _attachment_points(pat, "[O]C(C)=O"):
            af[p] = max(af.get(p, 0), 3)
        matches = find_substructures_native(mol, pat, af)
        assert matches is not None and len(matches) == 1

    def test_fallback_when_disabled(self, monkeypatch):
        import molnextr_tpu.native as N

        monkeypatch.setenv("MOLNEXTR_NO_NATIVE", "1")
        N._LIB, N._TRIED = None, False
        assert N.get_lib() is None
        mol = parse_smiles("CCO")
        sanitize(mol)
        assert N.find_substructures_native(mol, mol) is None
        N._LIB, N._TRIED = None, False
