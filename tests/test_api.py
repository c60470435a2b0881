"""End-to-end API tests: image file -> prediction dict (tiny model)."""

import os

import numpy as np
import pytest

from molnextr_tpu.api import BOND_TYPES, MolNexTR, MolNexTRSingleton, get_predictions
from molnextr_tpu.config import tiny_test_config

EXAMPLE = "/root/reference/examples/1.png"


@pytest.fixture(scope="module")
def tiny_model():
    return MolNexTR(cfg=tiny_test_config(), num_workers=1)


class TestMolNexTR:
    def test_predict_image_files(self, tiny_model):
        if not os.path.exists(EXAMPLE):
            pytest.skip("example image unavailable")
        out = tiny_model.predict_final_results(EXAMPLE, return_atoms_bonds=True)
        assert "predicted_smiles" in out
        assert "predicted_molfile" in out
        assert isinstance(out["atom_sets"], list)
        assert isinstance(out["bond_sets"], list)
        for bond in out["bond_sets"]:
            assert bond["bond_type"] in BOND_TYPES

    def test_predict_images_batch(self, tiny_model):
        imgs = [
            (np.random.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(3)
        ]
        outs = tiny_model.predict_images(imgs, return_atoms_bonds=False)
        assert len(outs) == 3
        for o in outs:
            assert "predicted_smiles" in o

    def test_confidence_fields(self, tiny_model):
        img = (np.random.rand(48, 48, 3) * 255).astype(np.uint8)
        out = tiny_model.predict_image(
            img, return_atoms_bonds=True, return_confidence=True
        )
        for a in out["atom_sets"]:
            assert "confidence" in a

    def test_bond_sets_bounded_by_edge_matrix(self, tiny_model, monkeypatch):
        """Regression: a malformed decode can emit more symbols than the
        edge head scored (k x k with k < len(symbols)); bond-dict assembly
        must bound the pair loop by the matrix, not the symbol list."""
        fmt = tiny_model.engine.fmt
        fake = {
            fmt: {
                "smiles": "CCO",
                "coords": [(0.1, 0.1), (0.5, 0.5), (0.9, 0.9)],
                "symbols": ["C", "C", "O"],
                "atom_scores": [1.0, 1.0, 1.0],
            },
            "edges": [[0, 1], [1, 0]],  # only 2 atoms scored
            "edge_scores": [[1.0, 1.0], [1.0, 1.0]],
            "overall_score": 1.0,
        }
        monkeypatch.setattr(
            tiny_model.engine,
            "predict_images",
            lambda batch, compute_confidence=False: [dict(fake)] * len(batch),
        )
        img = (np.random.rand(48, 48, 3) * 255).astype(np.uint8)
        out = tiny_model.predict_image(img, return_atoms_bonds=True)
        assert len(out["atom_sets"]) == 3
        for b in out["bond_sets"]:
            i, j = b["endpoints"]
            assert i < 2 and j < 2


class TestCheckpointRoundtrip:
    def test_save_load(self, tiny_model, tmp_path):
        from molnextr_tpu.checkpoint import load_model, save_model

        p = save_model(str(tmp_path / "bundle"), tiny_model.cfg, tiny_model.params)
        cfg, params = load_model(p, params_template=tiny_model.params)
        assert cfg.decoder.num_layers == tiny_model.cfg.decoder.num_layers
        import jax

        leaves1 = jax.tree_util.tree_leaves(tiny_model.params)
        leaves2 = jax.tree_util.tree_leaves(params)
        assert all(np.allclose(a, b) for a, b in zip(leaves1, leaves2))

    def test_singleton_with_bundle(self, tiny_model, tmp_path, monkeypatch):
        from molnextr_tpu.checkpoint import save_model

        p = save_model(str(tmp_path / "bundle"), tiny_model.cfg, tiny_model.params)
        MolNexTRSingleton.reset()
        monkeypatch.setenv("MOLNEXTR_MODEL_PATH", p)
        inst = MolNexTRSingleton.get_instance()
        assert inst.cfg.decoder.num_layers == tiny_model.cfg.decoder.num_layers
        MolNexTRSingleton.reset()


class TestTransforms:
    def test_eval_pipeline_shapes(self):
        from molnextr_tpu.data.transforms import get_transforms

        t = get_transforms(64, augment=False, rotate=False)
        img = np.full((100, 80, 3), 255, np.uint8)
        img[40:60, 30:50] = 0
        out = t(image=img, keypoints=[[40, 50]])
        assert out["image"].shape == (64, 64, 3)
        assert out["image"].dtype == np.float32

    def test_train_pipeline_keypoints_tracked(self):
        from molnextr_tpu.data.transforms import get_transforms

        t = get_transforms(64, augment=True, rotate=True)
        img = np.full((100, 100, 3), 255, np.uint8)
        img[20:80, 20:80] = 0
        out = t(image=img, keypoints=[[50, 50], [25, 25]])
        assert out["image"].shape == (64, 64, 3)
        assert out["keypoints"].shape == (2, 2)

    def test_crop_white_keypoint_shift(self):
        from molnextr_tpu.data.transforms import CropWhite

        img = np.full((50, 50, 3), 255, np.uint8)
        img[20:30, 20:30] = 0
        kp = np.array([[25.0, 25.0]], np.float32)
        out_img, out_kp = CropWhite(pad=5).apply(img, kp)
        assert out_img.shape == (20, 20, 3)
        assert np.allclose(out_kp, [[10.0, 10.0]])

    def test_perturbation_pipeline(self):
        from molnextr_tpu.data.transforms import get_perturbation_transforms

        t = get_perturbation_transforms(64)
        img = np.full((80, 80, 3), 255, np.uint8)
        img[30:50, 30:50] = 0
        out = t(image=img)
        assert out["image"].shape == (64, 64, 3)


class TestCheckpointCacheAndPth:
    """Checkpoint auto-download/cache surface (`molnextr.py:126-143`) and
    direct .pth loading through the API."""

    def test_cache_hit_wins(self, tmp_path, monkeypatch):
        from molnextr_tpu.api import MolNexTRSingleton

        monkeypatch.setenv("MOLNEXTR_CACHE", str(tmp_path))
        (tmp_path / "molnextr_best.pth").write_bytes(b"stub")
        assert MolNexTRSingleton._ensure_checkpoint() == str(
            tmp_path / "molnextr_best.pth"
        )

    def test_offline_returns_none(self, tmp_path, monkeypatch):
        from molnextr_tpu.api import MolNexTRSingleton

        monkeypatch.setenv("MOLNEXTR_CACHE", str(tmp_path / "empty"))
        monkeypatch.setenv("MOLNEXTR_NO_DOWNLOAD", "1")
        assert MolNexTRSingleton._ensure_checkpoint() is None

    def test_pth_model_path_loads_and_predicts(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from torch_semantics import TorchDecoderBundle, TorchEncoder

        from molnextr_tpu.api import MolNexTR
        from molnextr_tpu.config import DecoderConfig, EncoderConfig, tiny_test_config
        from molnextr_tpu.tokenization import get_tokenizer

        cfg = tiny_test_config()
        cfg.encoder = EncoderConfig(
            name="swin_pth_test", patch_size=4, window_size=4, embed_dim=16,
            depths=(1, 1), num_heads=(2, 2), drop_path_rate=0.0, use_remat=False,
        )
        cfg.decoder = DecoderConfig(num_layers=2, hidden_size=32, attn_heads=2,
                                    hidden_dropout=0.0, attn_dropout=0.0,
                                    max_len=24, use_remat=False)
        fmt = "chartok_coords"
        cfg.data.formats = (fmt, "edges")
        vocab = len(get_tokenizer(cfg.data)[fmt])
        torch.manual_seed(0)
        c = cfg.encoder
        tenc = TorchEncoder(img_size=cfg.data.input_size, patch_size=4,
                            embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                            window_size=4)
        tdec = TorchDecoderBundle(fmt, c.num_features, 32, 2, 2, vocab)
        path = str(tmp_path / "ref.pth")
        torch.save({"encoder": tenc.state_dict(), "decoder": tdec.state_dict()}, path)

        model = MolNexTR(model_path=path, cfg=cfg)
        preds = model.predict_images(
            [np.zeros((cfg.data.input_size, cfg.data.input_size, 3), np.uint8)]
        )
        assert len(preds) == 1 and "predicted_smiles" in preds[0]
