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

    # encode timed separately so decode ms/step can be isolated
    encode = jax.jit(
        lambda p_, im: model.apply(p_, im, method=MolNexTRModel.encode)
    )
    et = []
    for _ in range(args.iters):
        imgs = jnp.asarray(rng.standard_normal((b, s, s, 3), dtype=np.float32))
        jax.block_until_ready(imgs)
        t0 = time.time()
        jax.block_until_ready(encode(params, imgs))
        et.append(time.time() - t0)
    enc = min(et[1:] or et)
    print(f"encode leg: {enc:.3f}s/batch")

    results = {}
    for unroll in [int(u) for u in args.unrolls.split(",")]:
        cfg.decode.unroll = unroll
        engine = InferenceEngine(cfg, tokenizers, model, params)
        imgs = jnp.asarray(rng.standard_normal((b, s, s, 3), dtype=np.float32))
        t0 = time.time()
        jax.block_until_ready(engine._decode_jit(params, imgs)[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(args.iters):
            imgs = jnp.asarray(
                rng.standard_normal((b, s, s, 3), dtype=np.float32)
            )
            jax.block_until_ready(imgs)
            t0 = time.time()
            jax.block_until_ready(engine._decode_jit(params, imgs)[0])
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
