"""Host->device wire-format decoding for training batches.

The training pipeline ships compact batches over the (slow) device tunnel —
uint8 single-channel images, int8 label matrices — and re-expands them
on-device inside the jitted step, where XLA fuses the conversions into the
first consumers.  This module is the single definition of that decoding so
the train step, eval step, and parameter init all trace the same shapes.

Wire formats (see ``data/dataset.py::pad_batch``):
- images: uint8 (B, H, W, 1) grayscale (ToGray guarantees channel equality)
  or uint8 (B, H, W, 3); float32 batches pass through already normalized.
- edges / atom_grid: int8, promoted to int32 (EDGE_IGNORE=-100 fits int8).
"""

from __future__ import annotations

import jax.numpy as jnp


def as_model_images(images):
    """uint8 wire -> ImageNet-normalized float32 (B, H, W, 3).

    Single-channel wire batches broadcast against the per-channel mean/std,
    reproducing ToGray's channel replication.  The dtype/shape checks are
    static at trace time.
    """
    if images.dtype == jnp.uint8:
        from molnextr_tpu.data.transforms import device_normalize

        return device_normalize(images)
    return images


def as_model_refs(refs):
    """Promote int8 wire-format label leaves back to int32 on device."""
    return {
        k: v.astype(jnp.int32) if v.dtype == jnp.int8 else v
        for k, v in refs.items()
    }
