"""Beam search as a single compiled XLA loop.

The reference's beam search (`/root/reference/MolNexTR/decoding/beam_search.py`)
is dynamic-shape python (beam-expanded memory via repeat_interleave, finished
rows removed per step) and is actually broken as shipped — its
``super().__init__`` passes ``return_attention`` into the ``max_length``
positional slot (`beam_search.py:11-12` vs `decode_strategy.py:5`; the code
path is fenced off at `components.py:255-257`).  This is a correct
TPU-native design:

* state lives as ``(B, K)`` arrays inside one ``lax.while_loop`` with static
  shapes; the KV cache is beam-flattened to ``B*K`` and *reordered with a
  gather* after each top-k instead of compacting rows;
* finished lanes are frozen: they emit PAD with log-prob 0, staying in the
  beam with their final score;
* scores are length-normalized average token log-probs, matching the greedy
  path's confidence semantics (`greedy_search.py:109`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from molnextr_tpu.tokenization import EOS_ID, PAD_ID, SOS_ID


class BeamState(NamedTuple):
    step: jnp.ndarray
    tokens: jnp.ndarray  # (B, K)
    cache: Any  # leaves with leading dim containing B*K on some axis
    seq: jnp.ndarray  # (B, K, L)
    logprob_sum: jnp.ndarray  # (B, K)
    token_scores: jnp.ndarray  # (B, K, L)
    hiddens: jnp.ndarray  # (B, K, L, D)
    lengths: jnp.ndarray  # (B, K) int32
    finished: jnp.ndarray  # (B, K) bool


def _gather_beams(tree, beam_idx: jnp.ndarray, b: int, k: int, batch_axis: int = 0):
    """Reorder beam-major leaves by per-batch beam indices.

    beam_idx: (B, K) source beam per (batch, new beam).  Leaves have shape
    (..., B*K, ...) with the flattened batch*beam dim at ``batch_axis``.
    """
    flat_idx = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)  # (B*K,)

    def gather(x):
        if x.ndim <= batch_axis:  # scalar leaves (e.g. mem_len) pass through
            return x
        return jnp.take(x, flat_idx, axis=batch_axis)

    return jax.tree_util.tree_map(gather, tree)


def beam_decode(
    step_fn: Callable,
    init_cache_fn: Callable,
    memory: jnp.ndarray,
    token_class: jnp.ndarray,
    class_mask: jnp.ndarray,
    max_len: int,
    hidden_size: int,
    beam_size: int = 5,
    min_len: int = 1,
    use_constraint: bool = True,
    cache_batch_axis: int = 1,
    return_all: bool = False,
    phased: bool = True,
):
    """Run constrained beam search; returns the best hypothesis per image.

    step_fn(tokens (N,), pos, cache) -> (logits (N, V), hidden (N, D), cache)
    Returns (seq (B, L), avg_scores (B,), token_scores (B, L),
    hiddens (B, L, D)) — the same contract as
    :func:`molnextr_tpu.decoding.greedy.greedy_decode`, so the edge head can
    consume the best beam's hidden states.
    """
    b = memory.shape[0]
    k = beam_size
    dtype = memory.dtype
    mem_rep = jnp.repeat(memory, k, axis=0)  # (B*K, M, D)
    cache = init_cache_fn(mem_rep)

    state = BeamState(
        step=jnp.asarray(0, jnp.int32),
        tokens=jnp.full((b, k), SOS_ID, jnp.int32),
        cache=cache,
        seq=jnp.full((b, k, max_len), PAD_ID, jnp.int32),
        # only beam 0 is live at step 0 so identical expansions don't
        # crowd the beam
        logprob_sum=jnp.tile(
            jnp.asarray([0.0] + [-1e9] * (k - 1), jnp.float32)[None], (b, 1)
        ),
        token_scores=jnp.zeros((b, k, max_len), jnp.float32),
        hiddens=jnp.zeros((b, k, max_len, hidden_size), dtype),
        lengths=jnp.zeros((b, k), jnp.int32),
        finished=jnp.zeros((b, k), bool),
    )

    neg_inf = jnp.asarray(-1e9, jnp.float32)

    def cond(s: BeamState):
        return (s.step < max_len) & (~jnp.all(s.finished))

    def body(s: BeamState) -> BeamState:
        logits, hidden, cache = step_fn(s.tokens.reshape(b * k), s.step, s.cache)
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if use_constraint:
            mask = class_mask[token_class[s.tokens.reshape(b * k)]]
            logp = jnp.where(mask, logp - 10000.0, logp)
        logp = jnp.where(
            (s.step < min_len) & (jnp.arange(v) == EOS_ID)[None],
            neg_inf,
            logp,
        )
        logp = logp.reshape(b, k, v)
        # finished lanes: emit PAD at log-prob 0, everything else impossible
        pad_row = jnp.where(jnp.arange(v) == PAD_ID, 0.0, neg_inf)
        logp = jnp.where(s.finished[..., None], pad_row[None, None], logp)

        cand = s.logprob_sum[..., None] + logp  # (B, K, V)
        flat = cand.reshape(b, k * v)
        top_val, top_idx = jax.lax.top_k(flat, k)  # (B, K)
        beam_idx = top_idx // v
        next_tok = (top_idx % v).astype(jnp.int32)

        # per-token score of the chosen continuation
        step_score = top_val - jnp.take_along_axis(s.logprob_sum, beam_idx, axis=1)

        # reorder beam-carried state
        gather2 = lambda x: jnp.take_along_axis(x, beam_idx, axis=1)
        seq = jnp.take_along_axis(s.seq, beam_idx[..., None], axis=1)
        token_scores = jnp.take_along_axis(s.token_scores, beam_idx[..., None], axis=1)
        hiddens = jnp.take_along_axis(
            s.hiddens, beam_idx[..., None, None], axis=1
        )
        lengths = gather2(s.lengths)
        finished = gather2(s.finished)
        cache = _gather_beams(cache, beam_idx, b, k, batch_axis=cache_batch_axis)
        hidden = jnp.take_along_axis(
            hidden.reshape(b, k, -1), beam_idx[..., None], axis=1
        )

        seq = jax.lax.dynamic_update_slice(
            seq, next_tok[..., None], (0, 0, s.step)
        )
        token_scores = jax.lax.dynamic_update_slice(
            token_scores,
            jnp.where(finished, 0.0, step_score)[..., None],
            (0, 0, s.step),
        )
        hiddens = jax.lax.dynamic_update_slice(
            hiddens,
            hidden[:, :, None, :].astype(hiddens.dtype),
            (0, 0, s.step, 0),
        )
        newly = (next_tok == EOS_ID) & (~finished)
        lengths = lengths + (~finished).astype(jnp.int32)
        return BeamState(
            step=s.step + 1,
            tokens=next_tok,
            cache=cache,
            seq=seq,
            logprob_sum=top_val,
            token_scores=token_scores,
            hiddens=hiddens,
            lengths=lengths,
            finished=finished | newly,
        )

    self_k_full = state.cache.get("self_k") if isinstance(state.cache, dict) else None
    if phased and self_k_full is not None and self_k_full.shape[-2] > 128:
        # phased cache growth, as in greedy_decode: attention reads scale
        # with the current phase's cache length
        # every self-cache leaf (values AND int8 scales) keeps its time axis
        # at -2, so the phase slicing/padding is uniform over "self_*" keys
        self_keys = [key for key in state.cache if key.startswith("self_")]

        def slice_cache(c, length):
            return {
                **c,
                **{
                    key: jax.lax.slice_in_dim(c[key], 0, length, axis=-2)
                    for key in self_keys
                },
            }

        def grow_cache(c, target):
            cur = c["self_k"].shape[-2]
            if cur >= target:
                return c
            out = dict(c)
            for key in self_keys:
                pad = [(0, 0)] * c[key].ndim
                pad[-2] = (0, target - cur)
                out[key] = jnp.pad(c[key], pad)
            return out

        s = state._replace(cache=slice_cache(state.cache, 128))
        for phase_len in range(128, self_k_full.shape[-2] + 1, 128):
            s = s._replace(cache=grow_cache(s.cache, phase_len))
            limit = min(phase_len, max_len)

            def phase_cond(st, limit=limit):
                return (st.step < limit) & (~jnp.all(st.finished))

            s = jax.lax.while_loop(phase_cond, body, s)
        final = s
    else:
        final = jax.lax.while_loop(cond, body, state)

    # length-normalized score; pick the best beam per batch
    norm = final.logprob_sum / jnp.maximum(final.lengths, 1).astype(jnp.float32)
    best = jnp.argmax(norm, axis=1)  # (B,)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape(b, 1, *([1] * (x.ndim - 2))), axis=1
    )[:, 0]
    seq = take(final.seq)
    token_scores = take(final.token_scores)
    hiddens = take(final.hiddens)
    avg = jnp.exp(jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0])
    if return_all:
        # all hypotheses sorted by normalized score (n-best surface,
        # `beam_search.py:164-190`)
        order = jnp.argsort(-norm, axis=1)  # (B, K)
        all_seq = jnp.take_along_axis(final.seq, order[..., None], axis=1)
        all_scores = jnp.exp(jnp.take_along_axis(norm, order, axis=1))
        return seq, avg, token_scores, hiddens, all_seq, all_scores
    return seq, avg, token_scores, hiddens
