"""Multi-host eval gather path, tested single-process with a fake gather.

SURVEY.md §4: multi-host logic gets a fake-backend substitute — here the
``gather_arrays`` function is replaced by one that simulates N processes'
shards, exercising the padding / reordering / pad-row filtering logic of
``_gather_shards`` exactly as ``process_allgather`` would see it.
"""

import numpy as np
import pytest

from molnextr_tpu.train.loop import _gather_shards


def simulate(world_arrays, world_idx):
    """Run _gather_shards as each rank would, with a gather that stacks all
    ranks' (identically-ordered) contributions."""
    world = len(world_arrays)
    # first, record the sequence of gather calls each rank makes by running
    # rank 0 with a recording stub, assuming symmetric call order
    contribs = [[] for _ in range(world)]

    def make_gather(rank):
        def gather(a):
            contribs[rank].append(np.asarray(a))
            pos = len(contribs[rank]) - 1
            # wait until all ranks recorded this position (simulated by
            # computing the others' contributions eagerly below)
            return np.stack([all_contribs[r][pos] for r in range(world)])

        return gather

    # precompute each rank's gather inputs by replaying the pure padding
    # logic: n_local gather, then idx, then each named array
    all_contribs = []
    n_max = max(len(i) for i in world_idx)
    for r in range(world):
        idx = np.asarray(world_idx[r], np.int32)
        pad = n_max - len(idx)
        seq = [np.asarray([len(idx)], np.int32), np.pad(idx + 1, (0, pad))]
        for k, a in world_arrays[r].items():
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            seq.append(np.pad(a, widths))
        all_contribs.append(seq)

    out, idx = _gather_shards(
        world_arrays[0], np.asarray(world_idx[0], np.int32),
        make_gather(0), world,
    )
    return out, idx


class TestGatherShards:
    def test_unequal_shards_reorder(self):
        # 5 samples over 2 processes round-robin: rank0 -> 0,2,4; rank1 -> 1,3
        seq0 = np.arange(3 * 4).reshape(3, 4).astype(np.int32)
        seq1 = (100 + np.arange(2 * 4).reshape(2, 4)).astype(np.int32)
        out, idx = simulate(
            [{"seq": seq0}, {"seq": seq1}],
            [[0, 2, 4], [1, 3]],
        )
        assert idx.tolist() == [0, 1, 2, 3, 4]
        np.testing.assert_array_equal(out["seq"][0], seq0[0])
        np.testing.assert_array_equal(out["seq"][1], seq1[0])
        np.testing.assert_array_equal(out["seq"][2], seq0[1])
        np.testing.assert_array_equal(out["seq"][3], seq1[1])
        np.testing.assert_array_equal(out["seq"][4], seq0[2])

    def test_dropped_samples_skipped(self):
        # rank1 lost sample 3 (render failure): global order skips it
        out, idx = simulate(
            [{"seq": np.ones((2, 4), np.int32)},
             {"seq": np.full((1, 4), 7, np.int32)}],
            [[0, 2], [1]],
        )
        assert idx.tolist() == [0, 1, 2]
        np.testing.assert_array_equal(out["seq"][1], np.full(4, 7))

    def test_multiple_arrays_consistent(self):
        out, idx = simulate(
            [
                {"seq": np.zeros((2, 4), np.int32), "edges": np.zeros((2, 3, 3), np.int32)},
                {"seq": np.ones((2, 4), np.int32), "edges": np.ones((2, 3, 3), np.int32)},
            ],
            [[0, 2], [1, 3]],
        )
        assert idx.tolist() == [0, 1, 2, 3]
        np.testing.assert_array_equal(out["seq"][:, 0], [0, 1, 0, 1])
        np.testing.assert_array_equal(out["edges"][:, 0, 0], [0, 1, 0, 1])

    def test_single_process_identity(self):
        arrays = {"seq": np.arange(8).reshape(2, 4).astype(np.int32)}
        out, idx = _gather_shards(
            arrays, np.asarray([0, 1], np.int32),
            lambda a: np.asarray(a)[None], 1,
        )
        assert idx.tolist() == [0, 1]
        np.testing.assert_array_equal(out["seq"], arrays["seq"])


class TestEvalEngineReuse:
    def test_evaluate_with_cached_engine(self):
        """evaluate_model with a prebuilt engine + params override works and
        returns scores (single process path)."""
        import jax

        from molnextr_tpu.config import tiny_test_config
        from molnextr_tpu.data import Sample
        from molnextr_tpu.inference import InferenceEngine
        from molnextr_tpu.models.model import MolNexTRModel
        from molnextr_tpu.tokenization import get_tokenizer
        from molnextr_tpu.train.loop import evaluate_model

        cfg = tiny_test_config()
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        refs = {
            "chartok_coords": np.ones((1, 8), np.int32),
            "atom_indices": np.zeros((1, cfg.data.max_atoms), np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            np.zeros((1, cfg.data.input_size, cfg.data.input_size, 3), np.float32),
            refs, deterministic=True,
        )
        engine = InferenceEngine(cfg, tokenizers, model, params)
        samples = [Sample(smiles="CC"), Sample(smiles="CCO")]
        scores = evaluate_model(
            cfg, model, params, tokenizers, samples,
            num_workers=0, engine=engine,
        )
        assert scores["n"] == 2
        assert "canon_smiles" in scores


class TestTwoProcessGather:
    def test_two_real_jax_processes(self, tmp_path):
        """Run evaluate_model's world>1 branch across TWO real JAX CPU
        processes (``jax.distributed.initialize`` + gloo collectives), so the
        actual ``process_allgather`` path — not a fake — is executed.

        Replaces-the-reference check for ``dist.all_gather_object``
        (`/root/reference/main.py:294-301`)."""
        import os
        import socket
        import subprocess
        import sys

        worker = os.path.join(os.path.dirname(__file__), "multihost_eval_worker.py")
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(r), str(port), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for r in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode("utf-8", "replace"))
        for r, p in enumerate(procs):
            assert p.returncode == 0, f"rank{r} failed:\n{outs[r][-4000:]}"

        import json

        with open(tmp_path / "rank0.json") as f:
            scores0 = json.load(f)
        with open(tmp_path / "rank1.json") as f:
            scores1 = json.load(f)
        # main process scores the full gathered set; non-main returns {}
        assert scores1 == {}
        assert scores0["n"] == 5
        assert "canon_smiles" in scores0
