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
