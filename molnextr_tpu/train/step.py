"""Jitted train / eval steps with data-parallel sharding.

TPU-native replacement for the reference's train_fn inner loop
(`/root/reference/main.py:204-255`): one compiled function does
forward (teacher forcing, all formats), loss, backward, clip, and both
optimizer updates.  Data parallelism comes from jitting with the batch
sharded over the mesh ``data`` axis and the state replicated — XLA inserts
the gradient all-reduce over ICI (the DDP all-reduce equivalent,
`main.py:218`), no explicit collectives needed.

bf16 policy: parameters and optimizer state stay float32, activations run
in the model's compute dtype; loss/grad math is float32 (the TPU analogue
of the reference's AMP GradScaler path, `main.py:209-231` — no loss scaling
needed in bf16).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from molnextr_tpu.train.losses import Criterion
from molnextr_tpu.train.state import TrainState
from molnextr_tpu.train.wire import as_model_images as _as_model_images
from molnextr_tpu.train.wire import as_model_refs as _as_model_refs


def make_batch_shardings(mesh: Mesh, batch_tree) -> Any:
    """Data-axis sharding for every leaf of the batch pytree."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P("data")), batch_tree
    )


def train_step_fn(model, criterion: Criterion):
    """Returns step(state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch, dropout_rng):
        refs = _as_model_refs(batch["refs"])
        outputs = model.apply(
            params,
            _as_model_images(batch["images"]),
            refs,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        total, losses = criterion(outputs, refs)
        return total, losses

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, Any]]:
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng
        )
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, **losses}
        return new_state, metrics

    return step


def eval_step_fn(model, criterion: Criterion):
    """Teacher-forced validation loss (no param update)."""

    def step(params, batch) -> Dict[str, Any]:
        refs = _as_model_refs(batch["refs"])
        outputs = model.apply(
            params, _as_model_images(batch["images"]), refs,
            deterministic=True,
        )
        total, losses = criterion(outputs, refs)
        return {"loss": total, **losses}

    return step


def jit_train_step(model, criterion: Criterion, mesh: Mesh, sample_batch):
    """Compile the train step with explicit shardings over the mesh."""
    step = train_step_fn(model, criterion)
    repl = NamedSharding(mesh, P())
    batch_sh = make_batch_shardings(mesh, sample_batch)
    return jax.jit(
        step,
        in_shardings=(None, batch_sh, repl),
        out_shardings=(None, repl),
        donate_argnums=(0,),
    )


def multi_train_step_fn(model, criterion: Criterion):
    """K optimizer updates per dispatch via ``lax.scan`` over stacked batches.

    On this repo's remote-TPU tunnel each dispatch costs seconds of
    runtime/polling latency while the actual swin_medium step computes in
    ~0.3s — one dispatch per K steps amortizes that overhead K-fold (the
    same idiom as the reference's DataLoader prefetch hiding host latency,
    `main.py:329-337`, but applied to the dispatch boundary).  Metrics are
    averaged over the K sub-steps.  The per-sub-step dropout key folds the
    incrementing ``state.step``, so keys stay distinct (identical-operand
    re-dispatch is also what the remote runtime punishes — see
    train/loop.py sync notes).
    """
    step = train_step_fn(model, criterion)

    def multi(state: TrainState, batches, rng):
        def body(s, batch):
            s, m = step(s, batch, rng)
            return s, m

        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(
            lambda x: x.mean(axis=0), metrics
        )

    return multi


def jit_multi_train_step(model, criterion: Criterion, mesh: Mesh, sample_group):
    """Compile the K-step dispatch; ``sample_group`` leaves carry a leading
    (K, ...) axis and shard batch-dim over the mesh ``data`` axis."""
    multi = multi_train_step_fn(model, criterion)
    repl = NamedSharding(mesh, P())
    group_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(None, "data")), sample_group
    )
    return jax.jit(
        multi,
        in_shardings=(None, group_sh, repl),
        out_shardings=(None, repl),
        donate_argnums=(0, 1),
    )
