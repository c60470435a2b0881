"""Losses: label-smoothing sequence CE + weighted 7-class edge CE.

Functional equivalents of the reference criterion stack
(`/root/reference/MolNexTR/loss_fuc.py`):

* ``sequence_loss``      -- :class:`SequenceLoss` (`loss_fuc.py:76-111`):
  token-level cross entropy over (B, T, V) logits ignoring PAD and MASK
  targets, with label smoothing expressed as the equivalent smoothed-CE
  (the reference computes the same quantity as a KL divergence against the
  smoothed one-hot, `loss_fuc.py:38-73`).
* ``graph_loss``         -- :class:`GraphLoss` (`loss_fuc.py:8-35`): 7-class
  edge cross entropy with class weight 1 for "no bond" and 10 for every real
  bond class, ignoring -100 padding; plus an optional masked L1 coords loss.
* ``Criterion``          -- per-format dict of losses summed by the train
  step (`loss_fuc.py:117-151`, summed at `main.py:213`).

All reductions are means over non-ignored elements, matching torch's
``F.cross_entropy(weight=..., ignore_index=-100)`` semantics (weighted mean:
sum of weighted losses / sum of weights).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from molnextr_tpu.tokenization import MASK_ID, PAD_ID

EDGE_IGNORE = -100
# "no bond" weighted 1, all six bond classes weighted 10 (`loss_fuc.py:14`).
EDGE_CLASS_WEIGHTS = (1.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0)


def label_smoothing_ce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.0,
    ignore_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Smoothed cross entropy, mean over non-ignored targets.

    logits: (..., V) float; targets: (...,) int; ignore_mask: (...,) bool,
    True where the target must not contribute.
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if smoothing > 0.0:
        # uniform smoothing mass over the non-target entries; identical
        # minimizer to the reference KL form (`loss_fuc.py:57-73`)
        smooth = -logp.mean(axis=-1)
        loss = (1.0 - smoothing) * nll + smoothing * smooth
    else:
        loss = nll
    if ignore_mask is not None:
        keep = (~ignore_mask).astype(jnp.float32)
        return (loss * keep).sum() / jnp.maximum(keep.sum(), 1.0)
    return loss.mean()


def sequence_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Token CE on shifted labels; PAD and MASK positions are ignored.

    logits: (B, T-1, V) from teacher forcing; labels: (B, T) including SOS.
    The model already drops the last logit and the train step compares with
    labels[:, 1:] (`components.py:241-251`).
    """
    targets = labels[:, 1:]
    ignore = (targets == PAD_ID) | (targets == MASK_ID)
    # clip so ignored targets still index validly
    safe = jnp.where(ignore, 0, targets)
    return label_smoothing_ce(logits, safe, smoothing, ignore)


def graph_loss(
    edge_logits: jnp.ndarray,
    edge_targets: jnp.ndarray,
    coords_pred: Optional[jnp.ndarray] = None,
    coords_targets: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted 7-class CE over all atom pairs (`loss_fuc.py:8-35`).

    edge_logits: (B, 7, K, K); edge_targets: (B, K, K) int with -100 padding.
    """
    logits = edge_logits.transpose(0, 2, 3, 1)  # (B, K, K, 7)
    ignore = edge_targets == EDGE_IGNORE
    safe = jnp.where(ignore, 0, edge_targets)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = jnp.asarray(EDGE_CLASS_WEIGHTS, jnp.float32)[safe]
    w = jnp.where(ignore, 0.0, w)
    loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    if coords_pred is not None and coords_targets is not None:
        # masked mean-L1 on continuous coords (`loss_fuc.py:24-31`)
        cmask = (coords_targets >= 0).all(axis=-1, keepdims=True)
        l1 = jnp.abs(coords_pred - coords_targets) * cmask
        loss = loss + l1.sum() / jnp.maximum(cmask.sum() * 2, 1.0)
    return loss


def heatmap_loss(
    logits: jnp.ndarray, grid: jnp.ndarray, pos_weight: float = 10.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Auxiliary dense atom-detection loss (no reference counterpart: the
    reference fine-tunes a pretrained encoder, `train.sh`; from scratch the
    encoder needs dense gradients — see TrainConfig.aux_heatmap_weight).

    logits: (B, G, G, 1 + C) — [presence, element classes].
    grid:   (B, G, G) int; -1 = empty cell, -2 = unlabeled sample, >= 0 =
    element class.  Returns (loss, presence-recall metric).
    """
    presence = logits[..., 0].astype(jnp.float32)
    classes = logits[..., 1:].astype(jnp.float32)
    known = grid != -2
    pos = grid >= 0
    # sigmoid BCE with positive weighting (~5% of cells hold an atom)
    target = pos.astype(jnp.float32)
    bce = jnp.maximum(presence, 0) - presence * target + jnp.log1p(
        jnp.exp(-jnp.abs(presence))
    )
    w = jnp.where(pos, pos_weight, 1.0) * known.astype(jnp.float32)
    loss = (bce * w).sum() / jnp.maximum(w.sum(), 1.0)
    # element-class CE on atom cells
    logp = jax.nn.log_softmax(classes, axis=-1)
    safe = jnp.where(pos, grid, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    posf = pos.astype(jnp.float32)
    loss = loss + (nll * posf).sum() / jnp.maximum(posf.sum(), 1.0)
    recall = ((presence > 0) & pos).sum() / jnp.maximum(pos.sum(), 1)
    return loss, recall


class Criterion:
    """Per-format loss dispatcher (`loss_fuc.py:117-151`).

    Call with the model's training outputs and the batch refs; returns
    ``(total, {name: value})``.
    """

    def __init__(
        self,
        formats: Tuple[str, ...],
        label_smoothing: float = 0.1,
        coord_vocab: Optional[Tuple[int, int, int, bool]] = None,
        heatmap_weight: float = 0.0,
    ):
        """``coord_vocab`` = (offset, maxx, maxy, sep_xy) of the primary
        coordinate tokenizer; when given, teacher-forced argmax accuracy is
        reported separately for symbol / x-bin / y-bin token classes so
        "coordinates converge late" is a measurement, not a guess."""
        self.formats = tuple(formats)
        self.smoothing = label_smoothing
        self.coord_vocab = coord_vocab
        self.heatmap_weight = heatmap_weight

    def _seq_accuracies(
        self, logits: jnp.ndarray, labels: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        off, maxx, maxy, sep_xy = self.coord_vocab
        targets = labels[:, 1:]
        pred = jnp.argmax(logits, axis=-1)
        valid = (targets != PAD_ID) & (targets != MASK_ID)
        correct = (pred == targets) & valid

        def acc(mask):
            m = valid & mask
            return (correct & m).sum() / jnp.maximum(m.sum(), 1)

        if sep_xy:
            is_x = (targets >= off) & (targets < off + maxx)
            is_y = targets >= off + maxx
            return {
                "acc_sym": acc(~is_x & ~is_y),
                "acc_x": acc(is_x),
                "acc_y": acc(is_y),
            }
        is_coord = targets >= off
        return {"acc_sym": acc(~is_coord), "acc_xy": acc(is_coord)}

    @staticmethod
    def _edge_accuracies(
        edge_logits: jnp.ndarray, edge_targets: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        pred = jnp.argmax(edge_logits.transpose(0, 2, 3, 1), axis=-1)
        valid = edge_targets != EDGE_IGNORE
        correct = (pred == edge_targets) & valid
        bond = valid & (edge_targets > 0)
        return {
            "acc_edge": (correct & valid).sum() / jnp.maximum(valid.sum(), 1),
            "acc_bond": (correct & bond).sum() / jnp.maximum(bond.sum(), 1),
        }

    def __call__(
        self, outputs: Dict[str, Any], refs: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        for fmt in self.formats:
            if fmt == "edges":
                losses[fmt] = graph_loss(
                    outputs["edges"],
                    refs["edges"],
                    outputs.get("coords"),
                    refs.get("coords"),
                )
                metrics.update(self._edge_accuracies(outputs["edges"], refs["edges"]))
            else:
                losses[fmt] = sequence_loss(outputs[fmt], refs[fmt], self.smoothing)
                if self.coord_vocab is not None and fmt.endswith("_coords"):
                    metrics.update(self._seq_accuracies(outputs[fmt], refs[fmt]))
        if (
            self.heatmap_weight > 0
            and "heatmap" in outputs
            and "atom_grid" in refs
        ):
            hl, recall = heatmap_loss(outputs["heatmap"], refs["atom_grid"])
            losses["heatmap"] = self.heatmap_weight * hl
            metrics["acc_heat"] = recall
        total = jnp.asarray(0.0, jnp.float32)
        for v in losses.values():
            total = total + v
        return total, {**losses, **metrics}
