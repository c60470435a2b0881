"""Worker process for the real two-process multi-host eval test.

Launched (twice) by tests/test_multihost_eval.py::TestTwoProcessGather with
``JAX_PLATFORMS=cpu``.  Each process joins a 2-process JAX distributed
runtime over localhost (gloo CPU collectives), builds the identical tiny
model from a fixed seed, and runs ``evaluate_model``'s world>1 branch —
exercising the REAL ``parallel.distributed.gather_arrays`` /
``process_allgather`` path that replaces the reference's
``dist.all_gather_object`` (`/root/reference/main.py:294-301`).

Usage: python multihost_eval_worker.py RANK PORT OUTDIR
"""

import json
import sys


def main() -> None:
    rank, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    from molnextr_tpu.config import tiny_test_config
    from molnextr_tpu.data import Sample
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
        refs,
        deterministic=True,
    )
    # 5 samples over 2 hosts round-robin -> unequal shards (3 vs 2), so the
    # pad/reorder logic of _gather_shards runs against real collectives
    samples = [Sample(smiles=s) for s in ["C", "CC", "CCO", "CCC", "CCN"]]
    scores = evaluate_model(
        cfg, model, params, tokenizers, samples, num_workers=0
    )
    with open(f"{outdir}/rank{rank}.json", "w") as f:
        json.dump(scores, f)


if __name__ == "__main__":
    main()
