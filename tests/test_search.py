"""Molecule index (Bingo-analogue) tests."""

from molnextr_tpu.chem.search import MoleculeIndex


class TestMoleculeIndex:
    def setup_method(self):
        self.idx = MoleculeIndex()
        self.ids = self.idx.insert_many(
            ["CCO", "CCCO", "c1ccccc1", "c1ccccc1O", "CC(=O)OCC", "CCN"]
        )

    def test_similarity_search(self):
        hits = self.idx.search_sim("CCO", min_sim=0.3)
        assert hits and hits[0][1] == 1.0
        assert self.idx.smiles(hits[0][0]) == "CCO"

    def test_substructure_search(self):
        hits = self.idx.search_sub("c1ccccc1")
        found = {self.idx.smiles(i) for i in hits}
        assert found == {"c1ccccc1", "c1ccccc1O"}

    def test_substructure_chain(self):
        hits = self.idx.search_sub("CCO")
        found = {self.idx.smiles(i) for i in hits}
        assert "CCO" in found and "CCCO" in found
        assert "CCN" not in found
