"""Decode-step micro-benchmark: time greedy decode variants on the chip.

Times the flagship-config constrained greedy decode (the `bench.py` decode
leg: worst-case full-length, batch 256) for several ``unroll`` settings
(decode steps per while_loop iteration) and prints ms/step per variant so
the fastest can become the default.  Distinct inputs per iteration (the
remote runtime memoizes repeated identical dispatches, CLAUDE.md).

Usage:  python scripts/bench_decode.py [--batch 256] [--iters 3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> None:
    """True execution barrier on the axon relay runtime.

    ``jax.block_until_ready`` returns before remote execution completes on
    this runtime (observed: a 0.5 s/batch Swin-base encode "timed" at 2 ms),
    so every timing must end with a device->host fetch — a single scalar is
    enough since the fetch queues behind the timed dispatch on the one
    device stream (same pattern as bench.py's ``np.asarray(out[0])``)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    # plain indexing, not reshape(-1): reshaping a large tiled array to 1-D
    # compiles a full materialized copy (observed 19 GB alloc for a 452 MB
    # image batch on v5e) — a scalar slice allocates nothing
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--unrolls", type=str, default="1,2,4")
    args = p.parse_args()

    from molnextr_tpu.config import Config
    from molnextr_tpu.inference import InferenceEngine, primary_format
    from molnextr_tpu.models.model import MolNexTRModel
    from molnextr_tpu.tokenization import get_tokenizer

    cfg = Config()
    tokenizers = get_tokenizer(cfg.data)
    model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()},
                          dtype=jnp.bfloat16)
    fmt = primary_format(cfg)
    max_len = min(480, cfg.decoder.max_len)

    b = args.batch
    s = cfg.data.input_size
    rng = np.random.default_rng(0)
    print(f"config: batch {b}, input {s}, max_len {max_len}")

    init_img = jnp.asarray(rng.standard_normal((b, s, s, 3), dtype=np.float32))
    refs = {
        fmt: jnp.ones((b, 8), jnp.int32),
        "atom_indices": jnp.zeros((b, cfg.data.max_atoms), jnp.int32),
    }
    params = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": k}, init_img, refs, deterministic=True
        )
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("init done")

    # distinct inputs generated ON DEVICE per iteration (bench.py pattern):
    # host->device of a 452 MB f32 batch rides the tunnel and would dominate
    # the timing; distinct keys defeat runtime dispatch memoization
    gen = jax.jit(
        lambda k: jax.random.normal(k, (b, s, s, 3), jnp.float32)
    )
    keys = iter(range(1, 1000))

    # encode timed separately so decode ms/step can be isolated
    encode = jax.jit(
        lambda p_, im: model.apply(p_, im, method=MolNexTRModel.encode)
    )
    et = []
    for _ in range(args.iters + 1):
        imgs = gen(jax.random.PRNGKey(next(keys)))
        _sync(imgs)
        t0 = time.time()
        _sync(encode(params, imgs))
        et.append(time.time() - t0)
    enc = min(et[1:] or et)
    print(f"encode leg: {enc:.3f}s/batch")

    results = {}
    for unroll in [int(u) for u in args.unrolls.split(",")]:
        cfg.decode.unroll = unroll
        engine = InferenceEngine(cfg, tokenizers, model, params)
        imgs = gen(jax.random.PRNGKey(next(keys)))
        t0 = time.time()
        _sync(engine._decode_jit(params, imgs)[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(args.iters):
            imgs = gen(jax.random.PRNGKey(next(keys)))
            _sync(imgs)
            t0 = time.time()
            _sync(engine._decode_jit(params, imgs)[0])
            times.append(time.time() - t0)
        best = min(times)
        ms_step = (best - enc) * 1000.0 / max_len
        results[f"unroll={unroll}"] = ms_step
        print(
            f"unroll={unroll}: total {best:.3f}s -> {ms_step:.3f} ms/step "
            f"[compile {compile_s:.0f}s]"
        )

    best = min(results, key=results.get)
    print(f"BEST: {best} at {results[best]:.3f} ms/step")


if __name__ == "__main__":
    main()
