"""End-to-end training-loop and CLI tests (tiny config, CPU mesh)."""

import json
import os

import numpy as np
import pytest

from molnextr_tpu.config import tiny_test_config
from molnextr_tpu.data import Sample

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "CCOC", "CN", "CO",
          "CCC", "CCCl", "CBr", "CCS", "CC=C", "C#N", "CCCO", "COC"]


class TestTrainLoop:
    def test_two_epoch_run_with_eval_and_ckpt(self, tmp_path):
        from molnextr_tpu.train.loop import train_loop

        cfg = tiny_test_config()
        cfg.train.epochs = 2
        cfg.train.batch_size = 8
        cfg.train.save_path = str(tmp_path)
        cfg.train.save_mode = "best"
        samples = [Sample(s) for s in SMILES]
        state = train_loop(
            cfg, samples, valid_samples=samples[:4], num_workers=0,
            print_freq=1,
        )
        assert int(state.step) == 2 * (len(SMILES) // 8)
        metrics = [
            json.loads(line)
            for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))
        ]
        assert len(metrics) == 2
        assert "valid_canon_smiles" in metrics[0]
        assert np.isfinite(metrics[-1]["train_loss"])
        # best checkpoint written with full config + opt state
        ckpt_dir = os.path.join(str(tmp_path), "ckpt_best")
        assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
        assert os.path.exists(os.path.join(ckpt_dir, "params.msgpack"))
        assert os.path.exists(os.path.join(ckpt_dir, "opt_state.msgpack"))

    def test_resume_restores_step(self, tmp_path):
        from molnextr_tpu.checkpoint import CheckpointManager
        from molnextr_tpu.models.model import MolNexTRModel
        from molnextr_tpu.tokenization import get_tokenizer
        from molnextr_tpu.train import create_train_state
        from molnextr_tpu.train.loop import _dummy_init_batch

        import jax

        cfg = tiny_test_config()
        cfg.train.save_path = str(tmp_path)
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        batch = _dummy_init_batch(cfg, tokenizers)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10, batch)
        state = state.replace(step=state.step + 7)
        mgr = CheckpointManager(str(tmp_path), "best")
        mgr.save(cfg, state, epoch=0, score=0.5)
        fresh = create_train_state(cfg, model, jax.random.PRNGKey(1), 10, batch)
        restored, meta = mgr.restore(fresh, "best")
        assert int(restored.step) == 7
        assert meta["epoch"] == 0

    def test_resume_missing_snapshot_starts_fresh(self, tmp_path):
        """--resume last on an empty save dir must fall back to a fresh
        start (the relay babysitter always passes --resume last, including
        on the very first launch after a wipe — round-4 advisor)."""
        from molnextr_tpu.train.loop import train_loop

        cfg = tiny_test_config()
        cfg.train.epochs = 1
        cfg.train.batch_size = 8
        cfg.train.save_path = str(tmp_path)
        samples = [Sample(s) for s in SMILES]
        state = train_loop(
            cfg, samples, valid_samples=samples[:4], num_workers=0,
            print_freq=1, resume="last",
        )
        assert int(state.step) == len(SMILES) // 8

    def test_snapshot_atomic_swap_keeps_old_on_partial(self, tmp_path):
        """A stale .tmp staging dir from a killed writer must not corrupt
        the next save or load (atomic snapshot protocol)."""
        import jax

        from molnextr_tpu.checkpoint import CheckpointManager
        from molnextr_tpu.models.model import MolNexTRModel
        from molnextr_tpu.tokenization import get_tokenizer
        from molnextr_tpu.train import create_train_state
        from molnextr_tpu.train.loop import _dummy_init_batch

        cfg = tiny_test_config()
        cfg.train.save_path = str(tmp_path)
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        batch = _dummy_init_batch(cfg, tokenizers)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10, batch)
        mgr = CheckpointManager(str(tmp_path), "last")
        mgr.save(cfg, state, epoch=0, score=0.1)
        # simulate a writer killed mid-stage: leave a half-written tmp dir
        stale = os.path.join(str(tmp_path), "ckpt_last.tmp")
        os.makedirs(stale)
        with open(os.path.join(stale, "params.msgpack"), "wb") as f:
            f.write(b"partial")
        state2 = state.replace(step=state.step + 3)
        mgr.save(cfg, state2, epoch=1, score=0.2)
        assert not os.path.exists(stale)
        restored, meta = mgr.restore(state, "last")
        assert int(restored.step) == 3
        assert meta["epoch"] == 1


class TestCLIs:
    def test_evaluate_cli(self, tmp_path, capsys):
        import pandas as pd

        from molnextr_tpu.evaluate_cli import main

        gold = tmp_path / "gold.csv"
        pred = tmp_path / "pred.csv"
        pd.DataFrame(
            {"image_id": ["a", "b"], "SMILES": ["CCO", "c1ccccc1"]}
        ).to_csv(gold, index=False)
        pd.DataFrame(
            {"image_id": ["b", "a"], "SMILES": ["c1ccccc1", "OCC"]}
        ).to_csv(pred, index=False)
        main(["--gold_file", str(gold), "--pred_file", str(pred),
              "--num_workers", "1"])
        out = json.loads(capsys.readouterr().out)
        assert out["canon_smiles"] == 1.0

    def test_train_cli_smoke(self, tmp_path):
        import pandas as pd

        from molnextr_tpu.config import tiny_test_config
        from molnextr_tpu.train import main

        csv = tmp_path / "train.csv"
        pd.DataFrame({"SMILES": SMILES}).to_csv(csv, index=False)
        cfg = tiny_test_config()
        cfg_path = tmp_path / "cfg.json"
        with open(cfg_path, "w") as f:
            f.write(cfg.to_json())
        main([
            "--train_file", str(csv),
            "--config", str(cfg_path),
            "--save_path", str(tmp_path / "out"),
            "--epochs", "1",
            "--batch_size", "8",
            "--num_workers", "0",
            "--no_eval",
        ])
        assert os.path.exists(tmp_path / "out" / "metrics.jsonl")


class TestRollingLastCheckpoint:
    def test_best_mode_keeps_rolling_last(self, tmp_path):
        """In best mode, non-improving epochs still persist ckpt_last, so a
        plateaued run can ship/resume its newest weights."""
        import os

        import jax

        from molnextr_tpu.checkpoint import CheckpointManager
        from molnextr_tpu.config import tiny_test_config
        from molnextr_tpu.models.model import MolNexTRModel
        from molnextr_tpu.tokenization import get_tokenizer
        from molnextr_tpu.train import create_train_state
        from molnextr_tpu.train.loop import _dummy_init_batch

        cfg = tiny_test_config()
        cfg.train.save_path = str(tmp_path)
        toks = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in toks.items()})
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), 10, _dummy_init_batch(cfg, toks)
        )
        mgr = CheckpointManager(str(tmp_path), mode="best")
        p0 = mgr.save(cfg, state, epoch=0, score=0.0)  # first: best
        assert p0 and p0.endswith("ckpt_best")
        state = state.replace(step=state.step + 5)
        p1 = mgr.save(cfg, state, epoch=1, score=0.0)  # tie: NOT best
        assert p1 is None
        last = os.path.join(str(tmp_path), "ckpt_last")
        assert os.path.isdir(last)
        restored, meta = mgr.restore(state, tag="last")
        assert meta["epoch"] == 1 and int(restored.step) == int(state.step)
        # best still points at epoch 0
        _, meta_best = mgr.restore(state, tag="best")
        assert meta_best["epoch"] == 0
