"""Optional tensor-parallel parameter shardings.

The reference is data-parallel only (SURVEY.md §2: TP "not required for
parity", the model is ~100M params), but the framework carries a ``model``
mesh axis so wide layers can be sharded without re-plumbing.  These rules
shard the decoder FFN (column-parallel w1, row-parallel w2 — the Megatron
pattern) and the vocabulary projection across the ``model`` axis; XLA's SPMD
partitioner propagates the shardings and inserts the reduce-scatter/all-
reduce collectives over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def decoder_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for the params pytree.

    Kernels ending in ``ffn/w1/kernel`` and ``output/kernel`` are sharded on
    their output dim, ``ffn/w2/kernel`` on its input dim; everything else is
    replicated.  Works for both plain and scan-stacked (leading L axis)
    leaves because rules index from the trailing dims.
    """
    if "model" not in mesh.axis_names:
        repl = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: repl, params)

    n_model = mesh.shape["model"]

    def rule(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        nd = getattr(leaf, "ndim", 0)
        shape = getattr(leaf, "shape", ())

        def ok(axis):
            # dims must divide evenly across the model axis; a non-dividing
            # dim stays REPLICATED by design (e.g. the chartok vocab
            # projection, V=229: at hidden 256 that matmul is ~59k MACs —
            # far cheaper than the all-gather a padded shard would need)
            return shape[axis] % n_model == 0

        if nd >= 2:
            spec = [None] * nd
            if (
                name.endswith("ffn/w1/kernel") or name.endswith("output/kernel")
            ) and ok(-1):
                spec[-1] = "model"  # column parallel
                return NamedSharding(mesh, P(*spec))
            if name.endswith("ffn/w2/kernel") and ok(-2):
                spec[-2] = "model"  # row parallel
                return NamedSharding(mesh, P(*spec))
        if nd >= 1 and name.endswith("ffn/w1/bias") and ok(-1):
            spec = [None] * nd
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place parameters onto the mesh under the TP rules."""
    return jax.device_put(params, decoder_tp_shardings(params, mesh))
