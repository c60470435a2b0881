"""Benchmark: end-to-end inference throughput on one TPU chip.

Measures the full deployed device path — Swin-base encode, 480-step
KV-cached grammar-constrained greedy decode, pairwise edge head — at the
reference's training batch size (256), bf16.  The decode is forced to run
all 480 steps (min_len = max_len) so the number is a worst-case lower bound
independent of model weights.

Baseline: the driver target is 1500 images/sec on a v5e-8
(/root/repo/BASELINE.json north_star), i.e. 187.5 img/s/chip;
``vs_baseline`` is measured img/s/chip divided by that.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_IMG_PER_SEC_PER_CHIP = 1500.0 / 8.0

# Handshake files shared with scripts/relay_watch.sh: the babysitter will not
# (re)launch a trainer while BENCH_HOLD exists, and bench.py SIGTERMs any
# trainer recorded in TRAINER_PID before claiming the single chip (VERDICT r4
# weak #1: without this the driver's end-of-round bench contends with the
# unattended training run and hangs on the device claim).
BENCH_HOLD = "/tmp/bench_hold"
TRAINER_PID = "/tmp/druglike3.pid"


def _claim_chip() -> None:
    """Pause the babysat trainer (if any) so the bench owns the chip.

    Safe by construction: the trainer checkpoints atomically every epoch
    (molnextr_tpu/checkpoint.py) and the babysitter relaunches it with
    ``--resume last`` once BENCH_HOLD is gone, so at most one epoch of
    progress is redone."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    with open(BENCH_HOLD, "w") as f:
        f.write(str(os.getpid()))
    atexit.register(
        lambda: os.path.exists(BENCH_HOLD) and os.remove(BENCH_HOLD)
    )
    try:
        with open(TRAINER_PID) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return
    try:
        os.kill(pid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        return
    print(f"bench: paused trainer pid {pid} (resumes after bench)", file=sys.stderr)
    for _ in range(60):
        time.sleep(1)
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, PermissionError):
            break
    else:
        try:
            os.kill(pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        time.sleep(3)
    time.sleep(5)  # let the runtime release the device claim


def _tpu_relay_alive() -> bool:
    """The axon TPU rides a host relay on 127.0.0.1:8082; when the relay
    dies, every device claim hangs forever in nanosleep (CLAUDE.md).  Probe
    the port so a dead tunnel produces a fast, well-formed result instead
    of a hung benchmark."""
    import os
    import socket

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True  # not using the relay
    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=2):
            return True
    except OSError:
        return False


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--decode-len", type=int, default=480)
    p.add_argument(
        "--kv-int8", action=argparse.BooleanOptionalAction,
        default=(os.environ.get("MOLNEXTR_KV_INT8", "") == "1") or None,
        help="int8 KV caches in the decode loop; unset = DecoderConfig.kv_int8 "
             "default (ON since round 5, gated by AB_INT8_r5.json)",
    )
    args = p.parse_args()

    if not _tpu_relay_alive():
        print(
            json.dumps(
                {
                    "metric": "inference_images_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "img/s",
                    "vs_baseline": 0.0,
                    "error": "tpu_relay_down: port 8082 closed; see CLAUDE.md",
                }
            )
        )
        return

    _claim_chip()

    from molnextr_tpu.config import Config
    from molnextr_tpu.decoding.greedy import greedy_decode
    from molnextr_tpu.models.model import MolNexTRModel
    from molnextr_tpu.tokenization import get_tokenizer

    cfg = Config()
    cfg.decoder.max_len = args.decode_len
    if args.kv_int8 is not None:
        cfg.decoder.kv_int8 = args.kv_int8
    tokenizers = get_tokenizer(cfg.data)
    vocab_sizes = {f: len(t) for f, t in tokenizers.items()}
    model = MolNexTRModel(cfg, vocab_sizes, dtype=jnp.bfloat16)
    fmt = "chartok_coords"
    tok = tokenizers[fmt]
    tc, cm = tok.constraint_tables()
    token_class = jnp.asarray(tc)
    class_mask = jnp.asarray(cm)

    s = cfg.data.input_size
    # distinct inputs per iteration, generated on device: repeated identical
    # dispatches can be memoized by the runtime and undercount real work
    gen = jax.jit(
        lambda k: jax.random.normal(k, (args.batch, s, s, 3), jnp.float32)
    )
    images = gen(jax.random.PRNGKey(0))
    refs = {
        fmt: jnp.ones((1, 8), jnp.int32),
        "atom_indices": jnp.zeros((1, cfg.data.max_atoms), jnp.int32),
        "edges": jnp.zeros((1, cfg.data.max_atoms, cfg.data.max_atoms), jnp.int32),
    }
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.zeros((1, s, s, 3), np.float32),
        refs,
        deterministic=True,
    )

    max_atoms = cfg.data.max_atoms

    def infer(params, images):
        memory = model.apply(params, images, method=MolNexTRModel.encode)

        def step_fn(tokens, pos, cache):
            return model.apply(
                params, fmt, tokens, pos, cache, method=MolNexTRModel.decode_step
            )

        def init_cache_fn(mem):
            return model.apply(params, fmt, mem, method=MolNexTRModel.init_cache)

        seq, avg, scores, hiddens = greedy_decode(
            step_fn,
            init_cache_fn,
            memory,
            token_class,
            class_mask,
            cfg.decoder.max_len,
            cfg.decoder.hidden_size,
            min_len=cfg.decoder.max_len,  # force worst-case full-length decode
            phased=True,
        )
        indices = jnp.tile(jnp.arange(max_atoms, dtype=jnp.int32)[None], (images.shape[0], 1))
        edges = model.apply(params, hiddens, indices, method=MolNexTRModel.predict_edges)
        return seq, avg, edges["edges"]

    jit_infer = jax.jit(infer)
    # warmup / compile
    out = jit_infer(params, images)
    np.asarray(out[0])  # full sync through the transfer path

    t0 = time.perf_counter()
    for i in range(args.iters):
        out = jit_infer(params, gen(jax.random.PRNGKey(i + 1)))
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / args.iters

    img_per_sec = args.batch / dt
    print(
        json.dumps(
            {
                "metric": "inference_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
