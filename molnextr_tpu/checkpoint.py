"""Checkpointing: released-model bundles and full train-state snapshots.

Replaces the reference's single-file ``torch.save`` of model + optimizers +
schedulers + step (`/root/reference/main.py:389-424`) and the inference-side
``torch.load`` + arg-merging (`model.py:41-81`):

* A **model bundle** is a directory with ``config.json`` (the FULL typed
  config — the reference persists only four keys, `main.py:397`) and
  ``params.msgpack`` (flax-serialized parameters).  This is the release
  format the inference API loads.
* A **train snapshot** additionally serializes optimizer state and step via
  orbax, with the reference's best/all/last retention policy.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from molnextr_tpu.config import Config

MODEL_CONFIG = "config.json"
MODEL_PARAMS = "params.msgpack"
BEST_SCORES = "best_valid.json"


# -- model bundle (inference) -------------------------------------------------


def save_model(path: str, cfg: Config, params) -> str:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, MODEL_CONFIG), "w") as f:
        f.write(cfg.to_json())
    host_params = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(path, MODEL_PARAMS), "wb") as f:
        f.write(serialization.to_bytes(host_params))
    return path


def load_model(path: str, params_template=None) -> Tuple[Config, Any]:
    with open(os.path.join(path, MODEL_CONFIG)) as f:
        cfg = Config.from_json(f.read())
    with open(os.path.join(path, MODEL_PARAMS), "rb") as f:
        data = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, data)
    else:
        params = serialization.msgpack_restore(data)
    # float16 is a storage-only dtype here (bundles may be saved f16 to
    # halve disk size): TPUs have no native f16 and Mosaic rejects it, so
    # promote to f32 masters at load (flax modules then cast per-op dtype)
    import jax
    import jax.numpy as jnp
    import numpy as np

    def _promote(x):
        if hasattr(x, "dtype") and x.dtype == np.float16:
            return np.asarray(x, np.float32)
        return x

    params = jax.tree_util.tree_map(_promote, params)
    # Decode-path PERF knobs are runtime decisions, not part of the serialized
    # model contract: a bundle saved before round 5 carries kv_int8=False /
    # unroll=1, which would silently pin every loaded model to the slow decode
    # forever.  Reset them to the current dataclass defaults; callers that
    # want a specific setting override after load (scripts/ab_int8_suites.py).
    from .config import DecoderConfig, DecodeConfig

    cfg.decoder.kv_int8 = DecoderConfig.kv_int8
    cfg.decode.unroll = DecodeConfig.unroll
    cfg.decode.rerank = DecodeConfig.rerank
    return cfg, params


# -- train snapshots ----------------------------------------------------------


class CheckpointManager:
    """best/all/last retention over train-state snapshots
    (`main.py:400-424`)."""

    def __init__(self, save_path: str, mode: str = "best"):
        assert mode in ("best", "all", "last")
        self.save_path = save_path
        self.mode = mode
        os.makedirs(save_path, exist_ok=True)
        self._best: Optional[float] = None
        self._load_best()

    def _load_best(self):
        p = os.path.join(self.save_path, BEST_SCORES)
        if os.path.exists(p):
            with open(p) as f:
                self._best = json.load(f).get("best_score")

    def _snapshot_dir(self, tag: str) -> str:
        return os.path.join(self.save_path, f"ckpt_{tag}")

    def save(self, cfg: Config, state, epoch: int, score: Optional[float] = None) -> Optional[str]:
        """Snapshot according to policy; returns the path written (or None).

        ``best`` mode additionally keeps a rolling ``ckpt_last`` so an
        interrupted run can resume from (and ship) the newest weights even
        while the eval score hasn't improved — without it, a run whose
        score plateaus would only ever persist its first epoch."""
        is_best = score is not None and (self._best is None or score > self._best)
        if self.mode == "best":
            # ckpt_last is written UNCONDITIONALLY every epoch so `--resume
            # last` always finds the newest weights (improving-every-epoch
            # runs previously never created it); on improving epochs
            # ckpt_best is a DISK COPY of it — the device->host fetch of
            # params+opt dominates save time (it rides the TPU tunnel), so
            # it must happen exactly once per save
            last = self._snapshot_dir("last")
            self._write_snapshot(last, cfg, state, epoch, score)
            if not is_best:
                return None
            path = self._snapshot_dir("best")
            if os.path.exists(path):
                shutil.rmtree(path)
            shutil.copytree(last, path)
        else:
            tag = f"ep{epoch}" if self.mode == "all" else "last"
            path = self._snapshot_dir(tag)
            self._write_snapshot(path, cfg, state, epoch, score)
        if is_best:
            self._best = score
            with open(os.path.join(self.save_path, BEST_SCORES), "w") as f:
                json.dump({"best_score": score, "epoch": epoch}, f)
        return path

    def _write_snapshot(self, path: str, cfg: Config, state, epoch: int,
                        score: Optional[float]) -> None:
        # ATOMIC snapshot (round-4 advisor, medium): the device->host fetch
        # below rides the TPU tunnel and is the step that hangs (and gets
        # SIGKILLed by the relay babysitter) on a relay outage.  It must
        # happen BEFORE the old snapshot is touched, and the new snapshot is
        # staged in ``path + '.tmp'`` then swapped in with renames, so a kill
        # at ANY point leaves either the old or the new snapshot fully intact.
        host_params, host_opt = jax.device_get((state.params, state.opt_state))
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        save_model(tmp, cfg, host_params)
        extra = {
            "step": int(state.step),
            "epoch": epoch,
            "score": score,
        }
        with open(os.path.join(tmp, "train_meta.json"), "w") as f:
            json.dump(extra, f)
        with open(os.path.join(tmp, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(host_opt))
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def restore(self, state, tag: str = "best"):
        """Restore a train state (params + opt state + step) in place of the
        freshly-initialized ``state`` (the `--resume` path, `main.py:124-145`)."""
        path = self._snapshot_dir(tag)
        _cfg, params = load_model(path, params_template=state.params)
        with open(os.path.join(path, "opt_state.msgpack"), "rb") as f:
            opt_state = serialization.from_bytes(state.opt_state, f.read())
        with open(os.path.join(path, "train_meta.json")) as f:
            meta = json.load(f)
        import jax.numpy as jnp

        return (
            state.replace(
                params=params,
                opt_state=opt_state,
                step=jnp.asarray(meta["step"], jnp.int32),
            ),
            meta,
        )
