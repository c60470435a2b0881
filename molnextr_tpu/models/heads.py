"""Output heads: vocabulary projection and the pairwise bond (edge) head.

The edge head mirrors ``GraphPredictor`` (`/root/reference/MolNexTR/
components.py:350-400`): decoder hidden states gathered at atom-token
positions, expanded to all pairs, concatenated and pushed through a 2-layer
GELU MLP onto 7 bond classes (none/single/double/triple/aromatic/wedge/dash).
Symmetrization of the predicted probabilities is a vectorized jnp op instead
of the reference's python triple loop (`components.py:383-400`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GraphPredictor(nn.Module):
    hidden: int
    coords: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, indices, valid_mask=None):
        """hidden_states: (B, T, D); indices: (B, K) int32 positions.

        Returns dict with ``edges`` logits (B, 7, K, K) and optionally
        ``coords`` (B, K, 2).

        The reference materializes an all-pairs concat (B, K, K, 2D) and
        pushes it through a Linear (`components.py:365-377`).  Factored
        here: ``mlp1([a_i ; a_j]) == a_i @ W_row + a_j @ W_col + bias``, two
        (B, K, D) matmuls plus a broadcast add — mathematically identical,
        but the K^2-sized tensor only exists at the (cheap) GELU input, not
        as a matmul operand (at B=256, K=128, D=512 the concat alone is
        4.3GB).
        """
        b, t, d = hidden_states.shape
        gathered = jnp.take_along_axis(
            hidden_states, jnp.clip(indices, 0, t - 1)[..., None], axis=1
        )  # (B, K, D)
        k = gathered.shape[1]
        row = nn.Dense(self.hidden, dtype=self.dtype, name="mlp1_row")(gathered)
        col = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="mlp1_col")(
            gathered
        )
        y = row[:, :, None, :] + col[:, None, :, :]  # (B, K, K, hidden)
        y = jax.nn.gelu(y, approximate=False)
        edges = nn.Dense(7, dtype=self.dtype, name="mlp2")(y)  # (B, K, K, 7)
        out = {"edges": edges.transpose(0, 3, 1, 2)}
        if self.coords:
            cy = nn.Dense(self.hidden, dtype=self.dtype, name="coords1")(gathered)
            cy = jax.nn.gelu(cy, approximate=False)
            out["coords"] = nn.Dense(2, dtype=self.dtype, name="coords2")(cy)
        return out


# Element classes for the auxiliary atom heatmap (last slot = "other",
# covering superatom aliases, R-groups and rare elements).
HEATMAP_ELEMENTS = ("C", "N", "O", "S", "F", "Cl", "Br", "I", "P", "B", "Si")


def heatmap_class_of(symbol: str) -> int:
    """Map a graph node symbol (possibly bracketed, charged, aromatic or a
    superatom alias) onto a HEATMAP_ELEMENTS class; unknown -> len(list)."""
    s = symbol.strip("[]")
    # strip isotope digits to reach the leading element token
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    s = s[i:]
    two, one = s[:2].capitalize(), s[:1].upper()
    for j, el in enumerate(HEATMAP_ELEMENTS):
        if len(el) == 2 and two == el:
            return j
    # a two-letter element symbol NOT in the list (Na, Fe, Se, Sn, ...) is
    # "other" — falling through to the first-letter match would alias it
    # onto an unrelated class (Na->N, Fe->F; round-3 advisor finding)
    if len(s) >= 2 and s[1].islower():
        return len(HEATMAP_ELEMENTS)
    for j, el in enumerate(HEATMAP_ELEMENTS):
        if len(el) == 1 and one == el:
            return j
    return len(HEATMAP_ELEMENTS)


class AtomHeatmapHead(nn.Module):
    """Auxiliary dense atom detector over encoder feature maps.

    Reads the FINAL encoder stage (so every encoder layer receives dense
    gradient — supervising an early stage alone would let later stages
    collapse) upsampled to the stride-8 grid, plus the stride-8 stage map
    as a skip, and predicts per-cell [atom-presence logit, element-class
    logits].  Purely a training-time head: inference never calls it, and
    with ``aux_heatmap_weight == 0`` the model omits it entirely.
    """

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        """fine: (B, G, G, Cf) stride-8 map; coarse: (B, g, g, Cc) final map.
        Returns (B, G, G, 1 + n_classes) logits."""
        b, gf, _, _ = fine.shape
        up = jax.image.resize(
            coarse, (b, gf, gf, coarse.shape[-1]), method="nearest"
        )
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fine")(fine)
        y = y + nn.Dense(self.hidden, dtype=self.dtype, name="coarse")(up)
        y = jax.nn.gelu(y, approximate=False)
        n_out = 1 + len(HEATMAP_ELEMENTS) + 1
        return nn.Dense(n_out, dtype=self.dtype, name="out")(y)


def symmetrize_edge_probs(prob: jnp.ndarray) -> jnp.ndarray:
    """Symmetrize (K, K, 7) or (B, K, K, 7) edge probabilities.

    Classes 0-4 are symmetric; wedge (5) and dash (6) swap under transpose
    (an i->j wedge is a j->i dash), exactly the math of
    `components.py:389-397`.
    """
    pt = jnp.swapaxes(prob, -2, -3)  # transpose the K x K dims
    sym = (prob[..., :5] + pt[..., :5]) / 2
    w = (prob[..., 5] + pt[..., 6]) / 2
    d = (prob[..., 6] + pt[..., 5]) / 2
    return jnp.concatenate([sym, w[..., None], d[..., None]], axis=-1)


def edge_prediction(prob: jnp.ndarray):
    """argmax class + its probability after symmetrization."""
    sym = symmetrize_edge_probs(prob)
    return jnp.argmax(sym, axis=-1), jnp.max(sym, axis=-1)
