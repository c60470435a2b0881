"""Training orchestration: epochs, meters, per-epoch eval, checkpoints.

The TPU-native counterpart of the reference driver (`/root/reference/main.py:192-427`):

* one jitted data-parallel train step over the device mesh (replacing the
  DDP + AMP + two-optimizer inner loop, `main.py:204-255`),
* step-time meters with ETA printing (`main.py:194-252`),
* per-epoch greedy-decode evaluation scored with SmilesEvaluator
  (`main.py:379`, `:514-529`),
* best/all/last checkpointing keyed on the validation canon_smiles score
  (`main.py:400-424`),
* metrics appended to ``metrics.jsonl`` (replacing tensorboardX scalars,
  `main.py:405-412`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from molnextr_tpu.checkpoint import CheckpointManager
from molnextr_tpu.config import Config
from molnextr_tpu.data import DataLoader, Sample, TrainDataset
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.parallel import make_mesh, shard_batch, shard_batch_group
from molnextr_tpu.tokenization import get_tokenizer
from molnextr_tpu.train.losses import Criterion
from molnextr_tpu.train.state import TrainState, create_train_state
from molnextr_tpu.train.step import jit_multi_train_step, jit_train_step
from molnextr_tpu.utils import AverageMeter, LossMeter, print_rank_0, seed_everything, time_since


def _dummy_init_batch(cfg: Config, tokenizers) -> Dict[str, Any]:
    """Shape-correct batch for parameter initialization."""
    from molnextr_tpu.utils import FORMAT_INFO

    s = cfg.data.input_size
    k = cfg.data.max_atoms
    refs: Dict[str, Any] = {}
    for fmt in cfg.data.formats:
        if fmt == "edges":
            continue
        max_len = min(FORMAT_INFO[fmt]["max_len"], cfg.decoder.max_len)
        refs[fmt] = np.ones((1, max_len), np.int32)
    refs["atom_indices"] = np.zeros((1, k), np.int32)
    refs["num_atoms"] = np.zeros((1,), np.int32)
    refs["edges"] = np.zeros((1, k, k), np.int32)
    return {"images": np.zeros((1, s, s, 3), np.float32), "refs": refs}


def _gather_shards(
    arrays: Dict[str, np.ndarray], idx: np.ndarray, gather, world: int
):
    """Pad per-host result arrays to a common length, all-gather them, and
    restore global order, dropping pad rows.

    ``arrays``: per-host numeric results keyed by name (leading axis =
    local samples); ``idx``: global sample index per local row; ``gather``:
    a ``gather_arrays``-style function.  Factored out so the multi-host
    path is unit-testable with a fake gather (SURVEY.md §4: fake-backend
    substitute).
    """
    n_local = int(idx.shape[0])
    n_max = int(gather(np.asarray([n_local], np.int32)).max())
    pad = n_max - n_local

    def pad0(a):
        if pad == 0:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    idx_g = gather(pad0(np.asarray(idx, np.int32) + 1))  # +1: 0 marks padding
    idx_g = idx_g.reshape(world * n_max)
    keep = idx_g > 0
    order = np.argsort(idx_g[keep], kind="stable")
    out: Dict[str, np.ndarray] = {}
    for k, a in arrays.items():
        g = gather(pad0(a)).reshape((world * n_max,) + a.shape[1:])
        out[k] = g[keep][order]
    return out, idx_g[keep][order] - 1


def _wire_image(image: np.ndarray) -> np.ndarray:
    """Compact eval wire: uint8 grayscale single channel (ToGray guarantees
    channel equality); float32 images pass through for compatibility."""
    if image.dtype == np.uint8 and image.ndim == 3 and image.shape[-1] == 3:
        return np.ascontiguousarray(image[..., :1])
    return image if image.dtype == np.uint8 else image.astype(np.float32)


def evaluate_model(
    cfg: Config,
    model: MolNexTRModel,
    params,
    tokenizers,
    valid_samples: Sequence[Sample],
    num_workers: int = 8,
    batch_size: Optional[int] = None,
    dump_csv: Optional[str] = None,
    engine=None,
    render_cache: Optional[Dict[int, Any]] = None,
) -> Dict[str, Any]:
    """Greedy-decode the validation set and score it (`main.py:430-529`).

    Multi-host: samples shard round-robin over processes, each host decodes
    its shard to NUMERIC arrays (token ids + edge classes), the arrays are
    all-gathered as tensors (`parallel.distributed.gather_arrays`, the
    XLA-native replacement for the reference's ``all_gather_object`` of
    python dicts, `main.py:294-301`), and only the main process runs the
    chemistry + scoring — non-main processes return ``{}``.

    ``engine`` reuses a prebuilt ``InferenceEngine`` (with ``params``
    overriding its stored weights) so per-epoch eval compiles the decode
    graph exactly once per training run.  ``dump_csv`` writes the
    predictions CSV with JSON-encoded node_coords/node_symbols/edges
    columns (`main.py:531-540`, `utils.py:145-163`)."""
    from molnextr_tpu.chem.graph import convert_graph_to_smiles
    from molnextr_tpu.evaluation import SmilesEvaluator
    from molnextr_tpu.inference import InferenceEngine
    from molnextr_tpu.parallel.distributed import (
        gather_arrays,
        is_main_process,
        process_count,
    )

    if engine is None:
        engine = InferenceEngine(cfg, tokenizers, model, params)
    ds = TrainDataset(cfg, list(valid_samples), tokenizers, split="valid", dynamic=True)
    # validation images render deterministically (no style jitter / augment)
    ds.dynamic = True
    bs = batch_size or cfg.decode.batch_size
    world = process_count()
    try:
        rank = jax.process_index()
    except Exception:
        rank = 0
    my_rows = list(range(rank, len(ds), world))

    golds_all: List[Optional[str]] = [s.smiles for s in ds.samples]
    seqs: List[np.ndarray] = []
    edges_mats: List[np.ndarray] = []
    kept_idx: List[int] = []
    batch_imgs: List[np.ndarray] = []
    batch_idx: List[int] = []

    def flush():
        if not batch_imgs:
            return
        raw = engine.predict_images_raw(np.stack(batch_imgs), params=params)
        seqs.append(raw["seq"])
        if "edges" in raw:
            edges_mats.append(raw["edges"])
        kept_idx.extend(batch_idx)
        batch_imgs.clear()
        batch_idx.clear()

    for i in my_rows:
        sample = ds.samples[i]
        if sample.image_path is None:
            # validation renders are deterministic (no augment, default
            # style), so per-epoch eval can reuse them across calls
            if render_cache is not None and i in render_cache:
                transformed, smiles = render_cache[i]
                golds_all[i] = smiles
                batch_imgs.append(transformed)
                batch_idx.append(i)
                if len(batch_imgs) == bs:
                    flush()
                continue
            from molnextr_tpu.data.synthetic import generate_synthetic_image

            img, smiles, graph, ok = generate_synthetic_image(
                sample.smiles, mol_augment=False, default_option=True,
                size=cfg.data.input_size,
            )
            if not ok:
                continue
            golds_all[i] = smiles  # canonical form actually rendered
            out = ds.transform(image=img, keypoints=[])
            if render_cache is not None:
                render_cache[i] = (_wire_image(out["image"]), smiles)
        else:
            import cv2

            img = cv2.imread(sample.image_path)
            if img is None:
                continue
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            out = ds.transform(image=img, keypoints=[])
        batch_imgs.append(_wire_image(out["image"]))
        batch_idx.append(i)
        if len(batch_imgs) == bs:
            flush()
    flush()

    local = {"seq": np.concatenate(seqs) if seqs else np.zeros((0, engine.max_len), np.int32)}
    if "edges" in cfg.data.formats:
        # ALWAYS present (possibly zero-length) so every host runs the same
        # gather sequence — a host whose shard produced no batches must not
        # issue fewer collectives than its peers
        k = engine.max_atoms
        local["edges"] = (
            np.concatenate(edges_mats)
            if edges_mats
            else np.zeros((0, k, k), np.int32)
        )
    if world > 1:
        # golds for synthetic rows are re-canonicalized by the host that
        # rendered them; ship the strings as fixed-width byte rows so the
        # main process scores against exactly what each host rendered
        GOLD_W = 512
        gold_bytes = np.zeros((len(kept_idx), GOLD_W), np.uint8)
        for r, i in enumerate(kept_idx):
            enc = (golds_all[i] or "").encode("utf-8")[:GOLD_W]
            gold_bytes[r, : len(enc)] = np.frombuffer(enc, np.uint8)
        local["gold"] = gold_bytes
        gathered, idx = _gather_shards(
            local, np.asarray(kept_idx, np.int32), gather_arrays, world
        )
        if not is_main_process():
            return {}
        for r, i in enumerate(idx):
            raw = bytes(gathered["gold"][r])
            golds_all[i] = raw.rstrip(b"\x00").decode("utf-8", "replace")
    else:
        gathered, idx = local, np.asarray(kept_idx, np.int32)

    fmt = engine.fmt
    coords, symbols, edges = [], [], []
    for row_i in range(gathered["seq"].shape[0]):
        parsed = engine.tokenizer.sequence_to_smiles(
            gathered["seq"][row_i].tolist()
        )
        coords.append(parsed["coords"])
        symbols.append(parsed["symbols"])
        k = min(len(parsed["indices"]), engine.max_atoms)
        if "edges" in gathered:
            edges.append(gathered["edges"][row_i, :k, :k].tolist())
        else:
            edges.append([[0] * k for _ in range(k)])
    golds = [golds_all[i] for i in idx]
    smiles_list, _, _ = convert_graph_to_smiles(
        coords, symbols, edges, num_workers=num_workers
    )
    evaluator = SmilesEvaluator(golds[: len(smiles_list)], num_workers=num_workers)
    scores = evaluator.evaluate(smiles_list)
    scores["n"] = len(smiles_list)
    if dump_csv:
        import pandas as pd

        from molnextr_tpu.utils import format_df

        df = pd.DataFrame(
            {
                "image_id": list(range(len(smiles_list))),
                "gold_SMILES": golds[: len(smiles_list)],
                "SMILES": smiles_list,
                "node_coords": coords,
                "node_symbols": symbols,
                "edges": [
                    e.tolist() if hasattr(e, "tolist") else e for e in edges
                ],
            }
        )
        format_df(df).to_csv(dump_csv, index=False)
        with open(dump_csv.replace(".csv", "_scores.json"), "w") as f:
            json.dump({k: v for k, v in scores.items()}, f, indent=2)
    return scores


def train_loop(
    cfg: Config,
    train_samples: Sequence[Sample],
    valid_samples: Optional[Sequence[Sample]] = None,
    num_workers: Optional[int] = None,
    print_freq: int = 50,
    do_eval: bool = True,
    eval_every: int = 1,
    save_images: int = 0,
    profile_steps: int = 0,
    resume: Optional[str] = None,
) -> TrainState:
    """Full training run; returns the final state.

    ``save_images`` dumps the first N synthetic renders for inspection
    (the reference's ``--save_image``, `dataset.py:404-407`);
    ``profile_steps`` captures a jax profiler trace of that many steps into
    ``save_path/profile`` (the tracing hook, SURVEY.md section 5).
    """
    seed_everything(cfg.train.seed)
    if save_images > 0:
        import cv2

        from molnextr_tpu.data.synthetic import generate_synthetic_image

        img_dir = os.path.join(cfg.train.save_path, "images")
        os.makedirs(img_dir, exist_ok=True)
        for i, sample in enumerate(train_samples[:save_images]):
            if sample.image_path is None:
                img, _, _, ok = generate_synthetic_image(sample.smiles)
                if ok:
                    cv2.imwrite(os.path.join(img_dir, f"{i}.png"), img)
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    n_dev = mesh.devices.size
    tokenizers = get_tokenizer(cfg.data)
    vocab_sizes = {f: len(t) for f, t in tokenizers.items()}
    dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
    model = MolNexTRModel(cfg, vocab_sizes, dtype=dtype)

    ds = TrainDataset(cfg, list(train_samples), tokenizers, split="train")
    workers = cfg.train.num_workers if num_workers is None else num_workers
    item_cache_path = os.path.join(cfg.train.save_path, "item_cache.pkl")
    if workers == 0 and ds._item_cacheable and ds.load_item_cache(item_cache_path):
        print_rank_0(f"item cache loaded: {len(ds._item_cache)} prebuilt items")
    loader = DataLoader(
        ds, batch_size=cfg.train.batch_size, shuffle=True,
        num_workers=workers, seed=cfg.train.seed,
    )
    steps_per_epoch = (
        cfg.train.train_steps_per_epoch
        if cfg.train.train_steps_per_epoch > 0
        else len(loader)
    )
    # The LR schedule counts OPTIMIZER UPDATES: under optax.MultiSteps the
    # inner transform (and its cosine schedule) only advances every
    # grad_accum_steps loader batches, so decay_steps must be divided by the
    # accumulation factor or the cosine would run grad_accum× too slow.
    accum = max(cfg.train.grad_accum_steps, 1)
    total_steps = max(steps_per_epoch * cfg.train.epochs // accum, 1)
    print_rank_0(
        f"devices={n_dev} micro_batch={cfg.train.batch_size} "
        f"global_batch={cfg.train.batch_size * accum} "
        f"steps/epoch={steps_per_epoch} total_updates={total_steps}"
    )

    init_batch = _dummy_init_batch(cfg, tokenizers)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(cfg.train.seed), total_steps, init_batch
    )
    coord_vocab = None
    for fmt in cfg.data.formats:
        tok = tokenizers.get(fmt)
        if fmt.endswith("_coords") and tok is not None and not tok.continuous_coords:
            coord_vocab = (tok.offset, tok.maxx, tok.maxy, tok.sep_xy)
            break
    criterion = Criterion(
        cfg.data.formats, cfg.train.label_smoothing, coord_vocab=coord_vocab,
        heatmap_weight=cfg.train.aux_heatmap_weight,
    )
    compiled = None
    ckpt = CheckpointManager(cfg.train.save_path, cfg.train.save_mode)
    start_epoch = 0
    if resume:
        # Unattended-run safety (round-4 advisor): if the requested snapshot
        # is missing/partial (e.g. the writer was killed mid-save before
        # snapshots became atomic), fall back to ckpt_best, then to a fresh
        # start, instead of crash-looping under the relay babysitter.
        tried = [resume] + (["best"] if resume != "best" else [])
        for tag in tried:
            try:
                state, meta = ckpt.restore(state, tag)
                start_epoch = int(meta.get("epoch", -1)) + 1
                print_rank_0(
                    f"resumed from {tag}: step {int(state.step)}, epoch {start_epoch}"
                )
                break
            except (FileNotFoundError, OSError, ValueError, KeyError) as e:
                print_rank_0(f"resume from {tag} failed ({e!r}); trying next fallback")
        else:
            print_rank_0("no loadable snapshot; starting fresh")
    metrics_path = os.path.join(cfg.train.save_path, "metrics.jsonl")
    os.makedirs(cfg.train.save_path, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.train.seed + 1)

    global_step = int(state.step)
    start = time.time()
    eval_engine = None
    def _epoch_batches(epoch: int):
        """Up to steps_per_epoch batches, cycling (and reshuffling) the
        loader when train_steps_per_epoch asks for more steps than one pass
        provides — a cap-only break silently shrank such epochs to one
        loader pass."""
        produced = 0
        pass_i = 0
        while produced < steps_per_epoch:
            if pass_i:
                loader.set_epoch(epoch + 9973 * pass_i)
            got_any = False
            for b in loader:
                got_any = True
                yield b
                produced += 1
                if produced >= steps_per_epoch:
                    return
            if not got_any:
                return
            pass_i += 1

    dispatch_k = max(cfg.train.dispatch_steps, 1)

    def _dispatch_units(epoch: int):
        """Group consecutive batches into (stacked_group, k) dispatch units.

        The collate is static-shape, so stacking K batches gives one
        (K, batch, ...) pytree that a single jitted lax.scan consumes — one
        tunnel dispatch per K optimizer updates.  A trailing partial group
        falls back to single-step dispatches so epoch boundaries stay
        exact."""
        buf: list = []
        for b in _epoch_batches(epoch):
            b.pop("smiles", None)
            b["refs"].pop("num_atoms", None)
            if dispatch_k == 1:
                yield b, 1
                continue
            buf.append(b)
            if len(buf) == dispatch_k:
                yield jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *buf
                ), dispatch_k
                buf = []
        for b in buf:
            yield b, 1

    compiled_multi = None
    tracing = False
    # profiler latch is relative to the RUN start, not absolute step 1: on a
    # resumed run global_step restores > 0, so an absolute latch would start
    # the trace before the first post-resume dispatch and capture the very
    # recompile it exists to exclude (round-4 advisor)
    profile_base = global_step
    for epoch in range(start_epoch, cfg.train.epochs):
        loader.set_epoch(epoch)
        loss_meter = LossMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        t_prev = time.time()
        bidx = -1
        for unit, unit_k in _dispatch_units(epoch):
            bidx += unit_k
            data_time.update(time.time() - t_prev)
            # latch on >= base+1: with dispatch_steps>1 global_step advances
            # 0->K per dispatch and never equals base+1 exactly (r3 advisor);
            # skipping the run's first dispatch keeps the compile out of the
            # trace, including after resume (base = step at run start)
            if profile_steps and not tracing and global_step >= profile_base + 1:
                jax.profiler.start_trace(os.path.join(cfg.train.save_path, "profile"))
                tracing = True
            # fresh dropout key per step — required for correct dropout AND
            # for speed: re-dispatching with an identical key array makes
            # the remote runtime's step 14x slower (measured 33.9s vs 2.4s;
            # its dispatch memoization probes pathologically on repeated
            # identical operands)
            step_rng = jax.random.fold_in(rng, global_step)
            if unit_k > 1:
                dev_group = shard_batch_group(mesh, unit)
                if compiled_multi is None:
                    compiled_multi = jit_multi_train_step(
                        model, criterion, mesh, dev_group
                    )
                state, metrics = compiled_multi(state, dev_group, step_rng)
            else:
                dev_batch = shard_batch(mesh, unit)
                if compiled is None:
                    compiled = jit_train_step(model, criterion, mesh, dev_batch)
                state, metrics = compiled(state, dev_batch, step_rng)
            # sync EVERY dispatch: the remote runtime's completion polling
            # backs off when results are not promptly awaited — measured
            # 9s/step with an immediate per-step sync vs 19-40s/step with
            # deferred syncs (lag-1 or every-25), with the tunnel's polling
            # thread burning the host core in the deferred case.  The lost
            # host/device overlap (~1-2s of device time) is far cheaper.
            jax.block_until_ready(metrics["loss"])
            global_step += unit_k
            # free jax-array reference cycles (device buffers!) promptly:
            # a young-gen sweep every step catches just-created cycles for
            # microseconds, and a full sweep at print cadence bounds the
            # rest — without this, dead 113MB batch buffers accumulate in
            # HBM and remote dispatch latency grows with step count
            import gc

            gc.collect(0)
            if bidx % print_freq < unit_k:
                gc.collect()
            if tracing and global_step >= profile_base + 1 + profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profile_steps = 0
                tracing = False
            if bidx % print_freq < unit_k or bidx >= steps_per_epoch - 1:
                host = {k: float(v) for k, v in metrics.items()}
                loss_meter.update(host.pop("loss"), host, n=cfg.train.batch_size)
                pct = (bidx + 1) / steps_per_epoch
                n_live = len(jax.live_arrays())
                accs = " ".join(
                    f"{k[4:]} {v:.3f}" for k, v in host.items()
                    if k.startswith("acc_")
                )
                print_rank_0(
                    f"epoch {epoch} [{bidx + 1}/{steps_per_epoch}] "
                    f"loss {loss_meter.val:.4f} (avg {loss_meter.avg:.4f}) "
                    f"{accs} "
                    f"data {data_time.avg:.3f}s batch {batch_time.avg:.3f}s "
                    f"live_arrays {n_live} "
                    f"{time_since(start, (epoch + pct) / cfg.train.epochs)}"
                )
            batch_time.update(time.time() - t_prev)
            t_prev = time.time()

        scores: Dict[str, Any] = {}
        is_eval_epoch = (
            (epoch + 1) % max(eval_every, 1) == 0 or epoch == cfg.train.epochs - 1
        )
        if do_eval and valid_samples and is_eval_epoch:
            if eval_engine is None:
                from molnextr_tpu.inference import InferenceEngine

                # built once: per-epoch eval reuses the compiled decode
                # graph with fresh params (no per-epoch re-jit)
                eval_engine = InferenceEngine(
                    cfg, tokenizers, model, state.params
                )
                eval_render_cache: Dict[int, Any] = {}
            scores = evaluate_model(
                cfg, model, state.params, tokenizers, valid_samples,
                num_workers=max(workers, 1), engine=eval_engine,
                render_cache=eval_render_cache,
            )
            print_rank_0(f"epoch {epoch} eval: {scores}")
        with open(metrics_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "epoch": epoch,
                        "step": global_step,
                        "train_loss": loss_meter.epoch.avg,
                        **{
                            f"train_{k}": m.epoch.avg
                            for k, m in loss_meter.subs.items()
                        },
                        **{f"valid_{k}": v for k, v in scores.items()},
                    }
                )
                + "\n"
            )
        ckpt.save(cfg, state, epoch, score=scores.get("canon_smiles"))
        if (
            workers == 0
            and ds.item_cache_complete()
            and not os.path.exists(item_cache_path)
        ):
            t0 = time.time()
            if ds.save_item_cache(item_cache_path):
                print_rank_0(
                    f"item cache saved ({len(ds._item_cache)} items, "
                    f"{time.time() - t0:.1f}s)"
                )
    return state
