"""Train state: two-group AdamW with per-group clipping and LR schedules.

The reference trains with two separate AdamW optimizers and schedulers — one
for the encoder, one for the decoder — each with its own learning rate and a
per-module gradient clip (`/root/reference/main.py:168-231`).  Here the same
structure is one ``optax.multi_transform`` over parameter groups labeled by
the top-level parameter collection: the ``encoder`` subtree forms the encoder
group; everything else (enc_trans projection, per-format decoders, edge head)
belongs to the decoder group, matching the reference where the encoder->
decoder projection lives inside the decoder module (`components.py:183-187`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax import struct

from molnextr_tpu.config import Config


class TrainState(struct.PyTreeNode):
    """Minimal mutable-by-replacement train state (flax.struct pytree)."""

    step: jnp.ndarray
    params: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_schedules(
    cfg: Config, total_steps: int
) -> Tuple[optax.Schedule, optax.Schedule]:
    """Cosine-with-warmup (HF ``get_scheduler`` semantics, `main.py:183-189`)
    or constant-with-warmup, one per parameter group."""
    warmup = max(int(total_steps * cfg.train.warmup_ratio), 1)

    def build(lr: float) -> optax.Schedule:
        if cfg.train.scheduler == "cosine":
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=lr,
                warmup_steps=warmup,
                decay_steps=max(total_steps, warmup + 1),
                end_value=0.0,
            )
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
            [warmup],
        )

    return build(cfg.train.encoder_lr), build(cfg.train.decoder_lr)


def _group_label_tree(params) -> Any:
    """Label every leaf 'encoder' or 'decoder' by its top-level collection."""

    def label_subtree(name: str, sub):
        lbl = "encoder" if name == "encoder" else "decoder"
        return jax.tree_util.tree_map(lambda _: lbl, sub)

    inner = params["params"] if "params" in params else params
    labeled = {k: label_subtree(k, v) for k, v in inner.items()}
    return {"params": labeled} if "params" in params else labeled


def make_optimizer(cfg: Config, total_steps: int) -> optax.GradientTransformation:
    enc_sched, dec_sched = make_schedules(cfg, total_steps)

    def group(sched) -> optax.GradientTransformation:
        return optax.chain(
            # per-module clip, matching the reference's two clip_grad_norm_
            # calls (`main.py:220-226`)
            optax.clip_by_global_norm(cfg.train.max_grad_norm),
            optax.adamw(
                learning_rate=sched,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=cfg.train.weight_decay,
            ),
        )

    tx = optax.multi_transform(
        {"encoder": group(enc_sched), "decoder": group(dec_sched)},
        _group_label_tree,
    )
    if cfg.train.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.grad_accum_steps)
    return tx


def create_train_state(
    cfg: Config, model, rng: jax.Array, total_steps: int, sample_batch: Dict[str, Any]
) -> TrainState:
    """Initialize parameters from a sample batch and wrap them in a state."""
    from molnextr_tpu.train.wire import as_model_images, as_model_refs

    params_rng, dropout_rng = jax.random.split(rng)

    # decode the wire format before tracing init so parameter shapes match
    # what the step (which applies the same decoding) will use — e.g. the
    # (B,H,W,1) grayscale wire must not create a 1-channel patch embed
    def init(images, refs):
        return model.init(
            {"params": params_rng, "dropout": dropout_rng},
            as_model_images(images),
            as_model_refs(refs),
            deterministic=True,
        )

    # jit the init: unjitted flax init dispatches op-by-op, which is very
    # slow over a remote TPU tunnel
    params = jax.jit(init)(sample_batch["images"], sample_batch["refs"])
    tx = make_optimizer(cfg, total_steps)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )
