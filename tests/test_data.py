"""Synthetic generation, graph/label alignment, dataset + loader tests."""

import random

import numpy as np
import pytest

from molnextr_tpu.config import Config, tiny_test_config
from molnextr_tpu.data import DataLoader, Sample, TrainDataset
from molnextr_tpu.data.synthetic import (
    collapse_functional_groups,
    gen_rand_condensed,
    generate_synthetic_image,
)
from molnextr_tpu.tokenization import PAD_ID, get_tokenizer

SMILES = [
    "CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "CCOC", "CN", "CO",
    "CC(=O)Oc1ccccc1C(=O)O", "C[C@H](N)C(=O)OCC",
]


class TestSyntheticGeneration:
    def test_roundtrip_unaugmented(self):
        from molnextr_tpu.chem import canonicalize_smiles

        random.seed(0)
        for smi in SMILES:
            img, out, graph, ok = generate_synthetic_image(
                smi, mol_augment=False, default_option=True
            )
            assert ok, smi
            assert canonicalize_smiles(out)[0] == canonicalize_smiles(smi)[0], smi

    def test_label_graph_alignment(self):
        random.seed(3)
        cfg = Config()
        tok = get_tokenizer(cfg.data)["chartok_coords"]
        for smi in SMILES:
            img, out, graph, ok = generate_synthetic_image(smi, mol_augment=True)
            assert ok
            coords = np.asarray(graph["coords"], np.float32)
            h, w = img.shape[:2]
            c01 = coords.copy()
            c01[:, 0] /= w
            c01[:, 1] /= h
            labels, indices = tok.smiles_to_sequence(out, c01.tolist())
            assert len(indices) == graph["num_atoms"], out

    def test_edges_antisymmetric_wedges(self):
        random.seed(5)
        found = False
        for _ in range(10):
            img, out, graph, ok = generate_synthetic_image("C[C@H](N)C(=O)O")
            if not ok:
                continue
            e = graph["edges"]
            for i in range(e.shape[0]):
                for j in range(e.shape[0]):
                    if e[i, j] in (5, 6):
                        assert e[j, i] == 11 - e[i, j]
                        found = True
        # wedges should appear at least once for a chiral molecule
        assert found

    def test_failure_returns_flag(self):
        img, out, graph, ok = generate_synthetic_image("not_a_smiles((((")
        assert not ok

    def test_rand_condensed_nonempty(self):
        random.seed(0)
        for _ in range(20):
            s = gen_rand_condensed()
            assert len(s) >= 1


class TestCollapse:
    def test_collapse_produces_superatom(self):
        from molnextr_tpu.chem.smiles_parser import parse_smiles
        from molnextr_tpu.chem.aromaticity import sanitize

        random.seed(1)
        hit = False
        for _ in range(20):
            mol = parse_smiles("CCOC(=O)CCC(=O)OCC", strict=True)
            sanitize(mol)
            out = collapse_functional_groups(mol)
            if any(a.alias for a in out.atoms):
                hit = True
                break
        assert hit


class TestDatasetLoader:
    def test_static_shapes(self):
        random.seed(2)
        cfg = tiny_test_config()
        ds = TrainDataset(cfg, [Sample(s) for s in SMILES], get_tokenizer(cfg.data))
        dl = DataLoader(ds, batch_size=4, num_workers=0)
        shapes = set()
        for batch in dl:
            shapes.add(batch["refs"]["chartok_coords"].shape)
            assert batch["refs"]["edges"].shape == (4, 8, 8)
            # training wire format: raw uint8, single grayscale channel
            # (ToGray makes all three equal), normalized+broadcast on-device
            assert batch["images"].dtype == np.uint8
            assert batch["images"].shape[-1] == 1
            # label wire format: int8 (promoted to int32 on device by
            # train.step._as_model_refs; EDGE_IGNORE=-100 fits in int8)
            assert batch["refs"]["edges"].dtype == np.int8
        assert len(shapes) == 1  # static across batches

    def test_eval_split_images_ride_uint8_wire(self):
        cfg = tiny_test_config()
        ds = TrainDataset(
            cfg, [Sample("CCO")], get_tokenizer(cfg.data), split="valid",
            dynamic=True,
        )
        # valid split is not dynamic (no render) — go through the transform
        # directly, as evaluate_model does; the engine normalizes on device
        img = np.full((64, 64, 3), 255, np.uint8)
        out = ds.transform(image=img, keypoints=[])
        assert out["image"].dtype == np.uint8
        from molnextr_tpu.train.loop import _wire_image

        wired = _wire_image(out["image"])
        assert wired.dtype == np.uint8 and wired.shape[-1] == 1

    def test_item_cache_roundtrip(self, tmp_path):
        import dataclasses

        cfg = tiny_test_config()
        cfg.data = dataclasses.replace(
            cfg.data, render_cache=True, augment=False, mol_augment=False,
            default_style=True, mask_ratio=0.0,
        )
        smiles = ["CCO", "c1ccccc1", "CC(=O)O"]
        ds = TrainDataset(cfg, [Sample(s) for s in smiles], get_tokenizer(cfg.data))
        assert ds._item_cacheable
        items = [ds[i] for i in range(len(ds))]
        assert ds.item_cache_complete()
        path = str(tmp_path / "item_cache.pkl")
        assert ds.save_item_cache(path)

        ds2 = TrainDataset(cfg, [Sample(s) for s in smiles], get_tokenizer(cfg.data))
        assert ds2.load_item_cache(path)
        for i, it in enumerate(items):
            got = ds2[i]
            np.testing.assert_array_equal(got["image"], it["image"])
            np.testing.assert_array_equal(
                got["chartok_coords"], it["chartok_coords"]
            )

        # fingerprint mismatch (different corpus) must refuse the cache
        ds3 = TrainDataset(
            cfg, [Sample(s) for s in smiles[:2]], get_tokenizer(cfg.data)
        )
        assert not ds3.load_item_cache(path)

    def test_item_cache_invalidated_by_render_flags(self, tmp_path):
        """Flags that change rendered pixels/labels must key the fingerprint
        (round-3 advisor: a stale cache was silently adopted otherwise)."""
        import dataclasses

        cfg = tiny_test_config()
        cfg.data = dataclasses.replace(
            cfg.data, render_cache=True, augment=False, mol_augment=False,
            default_style=True, mask_ratio=0.0, include_condensed=False,
        )
        smiles = ["CCO", "c1ccccc1"]
        ds = TrainDataset(cfg, [Sample(s) for s in smiles], get_tokenizer(cfg.data))
        [ds[i] for i in range(len(ds))]
        path = str(tmp_path / "item_cache.pkl")
        assert ds.save_item_cache(path)

        cfg2 = dataclasses.replace(cfg)
        cfg2.data = dataclasses.replace(cfg.data, include_condensed=True)
        ds2 = TrainDataset(cfg2, [Sample(s) for s in smiles], get_tokenizer(cfg2.data))
        assert not ds2.load_item_cache(path)

        # shuffle_nodes randomizes labels per epoch: never cacheable at all
        cfg3 = dataclasses.replace(cfg)
        cfg3.data = dataclasses.replace(cfg.data, shuffle_nodes=True)
        ds3 = TrainDataset(cfg3, [Sample(s) for s in smiles], get_tokenizer(cfg3.data))
        assert not ds3._item_cacheable

    def test_worker_pool_matches_inline_count(self):
        random.seed(2)
        cfg = tiny_test_config()
        ds = TrainDataset(cfg, [Sample(s) for s in SMILES], get_tokenizer(cfg.data))
        n_inline = sum(1 for _ in DataLoader(ds, batch_size=2, num_workers=0))
        n_pool = sum(1 for _ in DataLoader(ds, batch_size=2, num_workers=2))
        assert n_inline == n_pool == 5

    def test_file_based_dataset(self, tmp_path):
        import cv2

        cfg = tiny_test_config()
        img = np.full((64, 64, 3), 255, np.uint8)
        cv2.line(img, (10, 10), (50, 50), (0, 0, 0), 2)
        p = str(tmp_path / "mol.png")
        cv2.imwrite(p, img)
        ds = TrainDataset(
            cfg,
            [Sample("CCO", image_path=p)],
            get_tokenizer(cfg.data),
            split="test",
        )
        item = ds[0]
        assert item is not None
        assert item["image"].shape == (32, 32, 3)

    def test_bad_sample_filtered(self):
        cfg = tiny_test_config()
        ds = TrainDataset(
            cfg,
            [Sample("x(((bad"), Sample("CCO")],
            get_tokenizer(cfg.data),
        )
        dl = DataLoader(ds, batch_size=2, num_workers=0, drop_last=False)
        batches = list(dl)
        assert len(batches) == 1
        assert batches[0]["images"].shape[0] == 1  # bad sample dropped


class TestReaction:
    def test_reaction_render_and_graph(self):
        import random

        random.seed(0)
        from molnextr_tpu.data.reaction import generate_reaction_image

        img, label, graph, ok = generate_reaction_image(
            "CCO.CC(=O)O>[H+]>CCOC(C)=O.O"
        )
        assert ok
        assert label.count(">") == 2
        assert graph["num_atoms"] == len(graph["symbols"]) == len(graph["coords"])
        assert graph["edges"].shape == (graph["num_atoms"], graph["num_atoms"])

    def test_reaction_failure_flag(self):
        from molnextr_tpu.data.reaction import generate_reaction_image

        _, _, _, ok = generate_reaction_image("notareaction")
        assert not ok


class TestContinuousCoords:
    def test_batch_carries_coord_targets(self):
        import dataclasses

        cfg = tiny_test_config()
        cfg.data = dataclasses.replace(cfg.data, continuous_coords=True)
        ds = TrainDataset(cfg, [Sample("CCO")], get_tokenizer(cfg.data))
        dl = DataLoader(ds, batch_size=1, num_workers=0)
        batch = next(iter(dl))
        coords = batch["refs"]["coords"]
        assert coords.shape == (1, cfg.data.max_atoms, 2)
        # real atoms labeled (augmentation may add atoms), the rest -1 padded
        n = int(batch["refs"]["num_atoms"][0])
        assert n >= 3
        assert (coords[0, :n] >= 0).all()
        assert (coords[0, n:] == -1).all()


class TestResizePadAndConditional:
    """ResizePad + ConditionalPadToSquare parity (`data_aug.py:212-243,
    316-356`) and the ACS/UOB composition switch (`dataset.py:165-167`)."""

    def test_resizepad_downscale_and_center(self):
        from molnextr_tpu.data.transforms import ResizePad

        img = np.full((100, 400, 3), 128, np.uint8)
        kps = np.asarray([[0.0, 0.0], [400.0, 100.0]], np.float32)
        out, okps = ResizePad(200, 200).apply(img, kps)
        assert out.shape[:2] == (200, 200)
        # width clamped 400->200, height 100 kept; pad centers vertically
        np.testing.assert_allclose(okps[0], [0.0, 50.0])
        np.testing.assert_allclose(okps[1], [200.0, 150.0])
        assert (out[0] == 255).all() and (out[-1] == 255).all()  # white pad

    def test_resizepad_no_upscale(self):
        from molnextr_tpu.data.transforms import ResizePad

        img = np.full((50, 60, 3), 99, np.uint8)
        kps = np.asarray([[30.0, 25.0]], np.float32)
        out, okps = ResizePad(100, 100).apply(img, kps)
        assert out.shape[:2] == (100, 100)
        np.testing.assert_allclose(okps[0], [30.0 + 20, 25.0 + 25])
        # original pixels preserved (no resize happened)
        assert (out[25:75, 20:80] == 99).all()

    def test_conditional_pad_triggers_on_elongated(self):
        from molnextr_tpu.data.transforms import ConditionalPadToSquare

        img = np.full((100, 300, 3), 50, np.uint8)
        kps = np.asarray([[10.0, 10.0]], np.float32)
        out, okps = ConditionalPadToSquare(ratio_threshold=1.5).apply(img, kps)
        assert out.shape[:2] == (300, 300)
        np.testing.assert_allclose(okps[0], [10.0, 110.0])  # top pad 100

    def test_conditional_pad_skips_near_square(self):
        from molnextr_tpu.data.transforms import ConditionalPadToSquare

        img = np.full((100, 120, 3), 50, np.uint8)
        kps = np.asarray([[10.0, 10.0]], np.float32)
        out, okps = ConditionalPadToSquare(ratio_threshold=1.5).apply(img, kps)
        assert out.shape[:2] == (100, 120)
        np.testing.assert_allclose(okps[0], [10.0, 10.0])

    def test_dataset_switch(self):
        from molnextr_tpu.data.transforms import (
            PadToSquare,
            dataset_pads_to_square,
            get_transforms,
        )

        assert dataset_pads_to_square("real/acs.csv")
        assert dataset_pads_to_square("real/UOB.csv")
        assert dataset_pads_to_square("acs") and dataset_pads_to_square("UOB")
        assert not dataset_pads_to_square("real/uspto.csv")
        assert not dataset_pads_to_square(None)
        tf = get_transforms(64, augment=False, dataset="real/acs.csv")
        assert any(isinstance(t, PadToSquare) for t in tf.transforms)
        tf2 = get_transforms(64, augment=False, dataset="real/uspto.csv")
        assert not any(isinstance(t, PadToSquare) for t in tf2.transforms)

    def test_clutter_augment_composition(self):
        """clutter=True appends the perturbed-suite noise family at train
        time (pixel-only, keypoints untouched) and stays OFF by default."""
        from molnextr_tpu.data.transforms import (
            AddBondNoise,
            AddLineNoise,
            get_transforms,
        )

        base = get_transforms(64, augment=True, normalize=False)
        assert not any(isinstance(t, AddLineNoise) for t in base.transforms)
        tf = get_transforms(64, augment=True, normalize=False, clutter=True)
        assert any(isinstance(t, AddLineNoise) for t in tf.transforms)
        assert any(isinstance(t, AddBondNoise) for t in tf.transforms)
        # the clutter fine-tune runs clutter WITHOUT the photometric set
        from molnextr_tpu.data.transforms import Downscale

        tf_only = get_transforms(64, augment=False, normalize=False,
                                 clutter=True)
        assert any(isinstance(t, AddLineNoise) for t in tf_only.transforms)
        assert not any(isinstance(t, Downscale) for t in tf_only.transforms)

        # clutter transforms are pixel-only: force p=1 on each and check
        # keypoints ride through a 2-point set unchanged
        import random

        import numpy as np

        random.seed(0)
        img = np.full((80, 80, 3), 255, np.uint8)
        kps = np.asarray([[10.0, 20.0], [60.0, 70.0]], np.float32)
        for t in tf.transforms:
            if type(t).__name__.startswith(("Add", "Draw")):
                out_img, out_kps = t.apply(img, kps)
                assert out_img.shape == img.shape
                assert out_img.dtype == np.uint8
                np.testing.assert_allclose(out_kps, kps)
