"""Device mesh and sharding helpers.

The reference scales with torch DDP over gloo/nccl (`/root/reference/main.py:160-163`,
`:577-581`): replicated weights, batch split across ranks, implicit gradient
all-reduce.  The TPU-native equivalent is a single :class:`jax.sharding.Mesh`
whose leading axis is data-parallel; the train step is jitted with the batch
sharded over that axis and parameters replicated, and XLA inserts the
gradient ``psum`` over ICI — no explicit communication code.

A ``model`` axis is carried in the mesh so tensor-sharded layouts can be
expressed later without re-plumbing (the reference model is ~100M params, so
weights stay replicated for parity — SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh; a single -1 dim absorbs all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = math.prod(d for d in shape if d != -1)
        shape[shape.index(-1)] = n // known
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch dim sharded."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def shard_batch_group(mesh: Mesh, group):
    """Place a stacked (K, batch, ...) dispatch group onto the mesh: the
    leading scan axis replicated, the batch dim sharded over ``data``."""
    s = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), group)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n


def pad_to_devices(n: int, mesh: Mesh) -> int:
    """Smallest multiple of the device count >= n (eval batch padding)."""
    d = mesh.devices.size
    return ((n + d - 1) // d) * d
