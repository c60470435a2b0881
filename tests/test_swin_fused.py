"""Fused Swin kernels (pallas interpret mode) vs their XLA references, and
the fused-encoder forward vs the flax module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.ops.swin_fused import (
    fused_ln_mlp,
    fused_window_attention,
    ln_mlp_reference,
    window_attention_reference,
)


def _attn_inputs(b=2, hres=8, wres=8, c=16, heads=2, ws=4, seed=0):
    rng = np.random.RandomState(seed)
    n = ws * ws
    x = rng.randn(b, hres, wres, c).astype(np.float32)
    wqkv = (rng.randn(c, 3 * c) * 0.1).astype(np.float32)
    bqkv = (rng.randn(3 * c) * 0.1).astype(np.float32)
    wproj = (rng.randn(c, c) * 0.1).astype(np.float32)
    bproj = (rng.randn(c) * 0.1).astype(np.float32)
    ln_s = rng.rand(c).astype(np.float32) + 0.5
    ln_b = (rng.randn(c) * 0.1).astype(np.float32)
    bias = (rng.randn(heads, n, n) * 0.1).astype(np.float32)
    return x, wqkv, bqkv, wproj, bproj, ln_s, ln_b, bias


class TestFusedWindowAttention:
    def test_matches_reference_unshifted(self):
        args = _attn_inputs()
        got = fused_window_attention(
            *[jnp.asarray(a) for a in args], None, 2, 4, interpret=True
        )
        ref = window_attention_reference(
            *[jnp.asarray(a) for a in args], None, 2, 4
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_matches_reference_masked(self):
        from molnextr_tpu.models.swin import shift_attn_mask

        args = _attn_inputs(seed=1)
        maskb = shift_attn_mask(8, 8, 4, 2)  # (nW, N, N) bool
        mask = np.where(maskb, -100.0, 0.0).astype(np.float32)
        got = fused_window_attention(
            *[jnp.asarray(a) for a in args], mask, 2, 4, interpret=True
        )
        ref = window_attention_reference(
            *[jnp.asarray(a) for a in args], mask, 2, 4
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_reference_matches_flax_module(self):
        """window_attention_reference == LN1 + WindowAttention module, so
        kernel == reference == module transitively."""
        from flax.core import freeze

        from molnextr_tpu.models.swin import WindowAttention, window_partition, window_reverse

        x, wqkv, bqkv, wproj, bproj, ln_s, ln_b, bias = _attn_inputs(seed=2)
        b, hres, wres, c = x.shape
        ws, heads = 4, 2
        import flax.linen as nn

        xt = jnp.asarray(x)
        xf = xt.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
        windows = window_partition(xn, ws)
        module = WindowAttention(c, heads, ws)
        params = {
            "qkv": {"kernel": wqkv, "bias": bqkv},
            "proj": {"kernel": wproj, "bias": bproj},
            "rel_bias": np.zeros(((2 * ws - 1) ** 2, heads), np.float32),
        }
        out_mod = module.apply({"params": params}, windows, None)
        out_mod = window_reverse(out_mod, ws, hres, wres)

        full = window_attention_reference(
            xt, jnp.asarray(wqkv), jnp.asarray(bqkv), jnp.asarray(wproj),
            jnp.asarray(bproj), jnp.asarray(ln_s), jnp.asarray(ln_b),
            jnp.zeros((heads, ws * ws, ws * ws)), None, heads, ws,
        )
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(out_mod), rtol=2e-4, atol=2e-4
        )


class TestFusedLnMlp:
    def test_matches_reference(self):
        rng = np.random.RandomState(3)
        t, c, f = 512, 32, 128
        x = rng.randn(t, c).astype(np.float32)
        ln_s = rng.rand(c).astype(np.float32) + 0.5
        ln_b = rng.randn(c).astype(np.float32) * 0.1
        w1 = (rng.randn(c, f) * 0.1).astype(np.float32)
        b1 = (rng.randn(f) * 0.1).astype(np.float32)
        w2 = (rng.randn(f, c) * 0.1).astype(np.float32)
        b2 = (rng.randn(c) * 0.1).astype(np.float32)
        got = fused_ln_mlp(
            jnp.asarray(x), jnp.asarray(ln_s), jnp.asarray(ln_b),
            jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
            tile=128, chunk=64, interpret=True,
        )
        ref = ln_mlp_reference(
            jnp.asarray(x), ln_s, ln_b, w1, b1, w2, b2
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_single_chunk(self):
        rng = np.random.RandomState(4)
        t, c, f = 256, 16, 64
        x = rng.randn(t, c).astype(np.float32)
        args = [rng.rand(c) + 0.5, rng.randn(c) * 0.1,
                (rng.randn(c, f) * 0.1), rng.randn(f) * 0.1,
                (rng.randn(f, c) * 0.1), rng.randn(c) * 0.1]
        args = [jnp.asarray(a.astype(np.float32)) for a in args]
        got = fused_ln_mlp(jnp.asarray(x), *args, tile=256, chunk=64, interpret=True)
        ref = ln_mlp_reference(jnp.asarray(x), *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestFusedEncoderPath:
    def test_fused_encoder_matches_module_path(self, monkeypatch):
        """Full SwinEncoder forward: fused kernels (interpret mode) vs the
        flax module path, same params."""
        import flax.linen as nn

        from molnextr_tpu.config import EncoderConfig
        from molnextr_tpu.models.swin import SwinEncoder

        cfg = EncoderConfig(
            name="swin_fused_test", patch_size=4, window_size=4, embed_dim=16,
            depths=(2, 1), num_heads=(2, 4), drop_path_rate=0.0, use_remat=False,
        )
        enc = SwinEncoder(cfg, input_size=32)
        img = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(img))

        ref, ref_hidden = enc.apply(params, jnp.asarray(img))
        monkeypatch.setenv("MOLNEXTR_FUSED_INTERPRET", "1")
        got, got_hidden = enc.apply(params, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4)
        assert len(got_hidden) == len(ref_hidden)
        for g, r in zip(got_hidden, ref_hidden):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=3e-4, atol=3e-4)


class TestPickTile:
    def test_aligned_and_fallback(self):
        from molnextr_tpu.models.swin import _pick_tile

        assert _pick_tile(1024) == 512
        assert _pick_tile(16) == 16
        assert _pick_tile(40) == 8
        # batch-1 final stage: 36 rows — no aligned tile divides it, so the
        # whole array must become a single (legal) block instead of tile=1
        assert _pick_tile(36) == 36
        assert _pick_tile(6) == 6
