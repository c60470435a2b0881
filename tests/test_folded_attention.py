"""Head-folded decode-attention pallas kernels (interpret mode) vs the
pure-XLA reference and a from-scratch numpy softmax-attention oracle.

These kernels are a preserved negative-result experiment (per-head pallas
decode measured slower than XLA on v5e — CLAUDE.md perf notes); they stay in
the tree behind ``MOLNEXTR_PALLAS=1`` and this test keeps them correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.ops.folded_attention import (
    CHUNK,
    folded_decode_attention,
    folded_decode_attention_bb,
    folded_decode_attention_reference,
)


def _numpy_oracle(q, k_full, v_full, pos, layer, n_heads):
    k = np.asarray(k_full)[layer]  # (B, T, D)
    v = np.asarray(v_full)[layer]
    q = np.asarray(q)
    b, t, d = k.shape
    hd = d // n_heads
    out = np.zeros((b, d), np.float32)
    for bi in range(b):
        for h in range(n_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = k[bi, : pos + 1, sl] @ q[bi, sl] / np.sqrt(hd)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[bi, sl] = p @ v[bi, : pos + 1, sl]
    return out


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(7)
    L, B, T, H, hd = 2, 8, 2 * CHUNK, 4, 32
    D = H * hd
    q = rng.standard_normal((B, D), dtype=np.float32)
    k = rng.standard_normal((L, B, T, D), dtype=np.float32)
    v = rng.standard_normal((L, B, T, D), dtype=np.float32)
    return q, k, v, H


class TestFoldedDecodeAttention:
    @pytest.mark.parametrize("pos,layer", [(0, 0), (5, 1), (CHUNK - 1, 0), (CHUNK + 17, 1)])
    def test_reference_matches_numpy_oracle(self, case, pos, layer):
        q, k, v, H = case
        got = folded_decode_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(pos), jnp.int32(layer), H,
        )
        want = _numpy_oracle(q, k, v, pos, layer, H)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("pos,layer", [(0, 0), (CHUNK - 1, 1), (CHUNK + 17, 0)])
    def test_kernel_interpret_matches_reference(self, case, pos, layer):
        q, k, v, H = case
        want = folded_decode_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(pos), jnp.int32(layer), H,
        )
        got = folded_decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(pos), jnp.int32(layer), H, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("pos,layer", [(3, 0), (CHUNK + 40, 1)])
    def test_batch_blocked_kernel_interpret_matches_reference(self, case, pos, layer):
        q, k, v, H = case
        want = folded_decode_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(pos), jnp.int32(layer), H,
        )
        got = folded_decode_attention_bb(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(pos), jnp.int32(layer), H, bb=4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_dispatcher_cpu_fallback(self, case):
        from molnextr_tpu.ops.folded_attention import cached_folded_attention

        q, k, v, H = case
        got = cached_folded_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(9), jnp.int32(1), H,
        )
        want = _numpy_oracle(q, k, v, 9, 1, H)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
