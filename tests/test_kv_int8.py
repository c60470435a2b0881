"""int8 KV-cache decode: equivalence with the bf16 cache path.

The decode loop is HBM-bound on its KV-cache reads (docs_bench_decode_r5.log);
``DecoderConfig.kv_int8`` halves that traffic by storing both caches int8
with per-token scales.  The scales factor out of the attention contractions
exactly, so the ONLY approximation is 8-bit rounding of K/V — these tests pin
(a) quantization round-trip error, (b) step-level hidden-state closeness, and
(c) end-to-end greedy agreement on a tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.config import Config, DataConfig, DecoderConfig, EncoderConfig
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.ops.decode_attention import (
    cross_decode_attention_folded,
    cross_decode_attention_folded_q8,
    decode_attention_reference,
    decode_attention_reference_q8,
    quantize_per_token,
)


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 32)), jnp.float32)
    q, s = quantize_per_token(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    recon = q.astype(jnp.float32) * s
    err = np.abs(np.asarray(recon - x)).max()
    amax = np.abs(np.asarray(x)).max()
    assert err <= amax / 127.0 + 1e-6


def test_self_attention_q8_close():
    rng = np.random.default_rng(1)
    b, h, t, d = 3, 4, 128, 32
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pos = jnp.asarray(63, jnp.int32)
    ref = decode_attention_reference(q, k, v, pos)
    kq, ks = quantize_per_token(k)
    vq, vs = quantize_per_token(v)
    got = decode_attention_reference_q8(q, kq, ks, vq, vs, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_cross_attention_q8_close():
    rng = np.random.default_rng(2)
    lcount, b, m, heads, d = 2, 3, 16, 4, 32
    q = jnp.asarray(rng.standard_normal((b, heads, d)), jnp.float32)
    mk = jnp.asarray(rng.standard_normal((lcount, b, m, heads * d)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((lcount, b, m, heads * d)), jnp.float32)
    layer = jnp.asarray(1, jnp.int32)
    ref = cross_decode_attention_folded(q, mk, mv, layer, heads)
    mkq, mks = quantize_per_token(mk)
    mvq, mvs = quantize_per_token(mv)
    got = cross_decode_attention_folded_q8(q, mkq, mks, mvq, mvs, layer, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def _tiny_cfg():
    cfg = Config()
    cfg.encoder = EncoderConfig(
        name="swin_tiny_test", patch_size=4, window_size=4, embed_dim=16,
        depths=(1, 1), num_heads=(2, 2), use_remat=False,
    )
    cfg.decoder = DecoderConfig(
        num_layers=2, hidden_size=64, attn_heads=4, max_len=32, use_remat=False,
    )
    cfg.data = DataConfig(input_size=64, formats=("chartok_coords", "edges"),
                          max_atoms=16)
    return cfg


def test_greedy_phased_q8_runs():
    """Full greedy_decode with int8 caches and phased growth (max_len > 128
    so the phase slicing/padding actually touches the scale leaves)."""
    import dataclasses

    from molnextr_tpu.decoding.greedy import greedy_decode
    from molnextr_tpu.tokenization import get_tokenizer

    cfg = _tiny_cfg()
    cfg.decoder = dataclasses.replace(
        cfg.decoder, kv_int8=True, max_len=256
    )
    tokenizers = get_tokenizer(cfg.data)
    vocab_sizes = {f: len(t) for f, t in tokenizers.items()}
    fmt = "chartok_coords"
    tok = tokenizers[fmt]
    tc, cm = tok.constraint_tables()
    rng = np.random.default_rng(5)
    imgs = np.asarray(rng.standard_normal((2, 64, 64, 3)), np.float32)
    refs = {
        fmt: jnp.ones((1, 8), jnp.int32),
        "atom_indices": jnp.zeros((1, cfg.data.max_atoms), jnp.int32),
        "edges": jnp.zeros((1, cfg.data.max_atoms, cfg.data.max_atoms), jnp.int32),
    }
    model = MolNexTRModel(cfg, vocab_sizes, dtype=jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        imgs[:1], refs, deterministic=True,
    )
    memory = model.apply(params, jnp.asarray(imgs), method=MolNexTRModel.encode)

    def step_fn(tokens, pos, cache):
        return model.apply(params, fmt, tokens, pos, cache,
                           method=MolNexTRModel.decode_step)

    def init_cache_fn(mem):
        return model.apply(params, fmt, mem, method=MolNexTRModel.init_cache)

    seq, avg, scores, hiddens = greedy_decode(
        step_fn, init_cache_fn, memory,
        jnp.asarray(tc), jnp.asarray(cm),
        cfg.decoder.max_len, cfg.decoder.hidden_size,
        min_len=140,  # force past the first 128-phase boundary
        phased=True,
    )
    assert seq.shape == (2, cfg.decoder.max_len)
    assert np.isfinite(np.asarray(avg)).all()


@pytest.mark.parametrize("steps", [12])
def test_decode_step_q8_matches_bf16(steps):
    """Hidden states after N cached decode steps agree between the bf16 and
    int8 cache paths within quantization tolerance."""
    from molnextr_tpu.tokenization import get_tokenizer

    cfg = _tiny_cfg()
    tokenizers = get_tokenizer(cfg.data)
    vocab_sizes = {f: len(t) for f, t in tokenizers.items()}
    fmt = "chartok_coords"
    rng = np.random.default_rng(3)
    imgs = np.asarray(rng.standard_normal((2, 64, 64, 3)), np.float32)
    refs = {
        fmt: jnp.ones((1, 8), jnp.int32),
        "atom_indices": jnp.zeros((1, cfg.data.max_atoms), jnp.int32),
        "edges": jnp.zeros((1, cfg.data.max_atoms, cfg.data.max_atoms), jnp.int32),
    }

    model = MolNexTRModel(cfg, vocab_sizes, dtype=jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        imgs[:1], refs, deterministic=True,
    )
    memory = model.apply(params, jnp.asarray(imgs), method=MolNexTRModel.encode)

    import dataclasses

    cfg_q8 = _tiny_cfg()
    cfg_q8.decoder = dataclasses.replace(cfg_q8.decoder, kv_int8=True)
    model_q8 = MolNexTRModel(cfg_q8, vocab_sizes, dtype=jnp.float32)

    cache = model.apply(params, fmt, memory, method=MolNexTRModel.init_cache)
    cache_q8 = model_q8.apply(params, fmt, memory, method=MolNexTRModel.init_cache)
    assert cache_q8["self_k"].dtype == jnp.int8
    assert cache_q8["mem_k"].dtype == jnp.int8

    tok = jnp.full((2,), 1, jnp.int32)
    tok_q8 = tok
    for step in range(steps):
        pos = jnp.asarray(step, jnp.int32)
        logits, hidden, cache = model.apply(
            params, fmt, tok, pos, cache, method=MolNexTRModel.decode_step
        )
        logits_q8, hidden_q8, cache_q8 = model_q8.apply(
            params, fmt, tok_q8, pos, cache_q8, method=MolNexTRModel.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(hidden_q8), np.asarray(hidden), atol=5e-2,
            err_msg=f"step {step}",
        )
        # greedy agreement: both paths pick the same token (feed it forward)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt_q8 = jnp.argmax(logits_q8, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(nxt_q8))
        tok = nxt
        tok_q8 = nxt_q8
