"""Inference engine: batched encode -> constrained decode -> edge prediction.

The TPU-native counterpart of ``Decoder.decode`` + ``predict_images``
(`/root/reference/MolNexTR/components.py:443-492`, `model.py:97-146`): the
image->tokens->hiddens->edge-probabilities path runs in two jit-compiled
calls with static shapes; only tokenization (sequence -> SMILES string) and
graph assembly stay on host.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from molnextr_tpu.config import Config
from molnextr_tpu.models.heads import symmetrize_edge_probs
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.decoding.beam import beam_decode
from molnextr_tpu.decoding.greedy import greedy_decode
from molnextr_tpu.utils import FORMAT_INFO


def primary_format(cfg: Config) -> str:
    for fmt in cfg.data.formats:
        if fmt in ("chartok_coords", "atomtok_coords", "atomtok"):
            return fmt
    raise ValueError("no sequence format configured")


class InferenceEngine:
    """Owns the jitted device functions and the host-side assembly."""

    def __init__(self, cfg: Config, tokenizers: Dict[str, Any], model: MolNexTRModel,
                 params, pad_batch: bool = True):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.fmt = primary_format(cfg)
        self.tokenizer = tokenizers[self.fmt]
        self.max_len = min(FORMAT_INFO[self.fmt]["max_len"], cfg.decoder.max_len)
        self.max_atoms = cfg.data.max_atoms
        self.pad_batch = pad_batch
        tc, cm = self.tokenizer.constraint_tables()
        self._token_class = jnp.asarray(tc)
        self._class_mask = jnp.asarray(cm)
        self._use_constraint = bool(self.tokenizer.output_constraint)
        self._decode_jit = jax.jit(self._decode)
        self._edges_jit = jax.jit(self._edges)

    # -- device functions -------------------------------------------------
    def _decode(self, params, images):
        from molnextr_tpu.train.wire import as_model_images

        model = self.model
        # accept the compact wire formats (uint8, single- or 3-channel) as
        # well as host-normalized float32 — decoded on device, so eval
        # batches ride the tunnel at 1/12 the float32-RGB width
        memory = model.apply(
            params, as_model_images(images), method=MolNexTRModel.encode
        )

        def step_fn(tokens, pos, cache):
            return model.apply(
                params, self.fmt, tokens, pos, cache, method=MolNexTRModel.decode_step
            )

        def init_cache_fn(mem):
            return model.apply(params, self.fmt, mem, method=MolNexTRModel.init_cache)

        if self.cfg.decode.beam_size > 1:
            return beam_decode(
                step_fn,
                init_cache_fn,
                memory,
                self._token_class,
                self._class_mask,
                self.max_len,
                self.cfg.decoder.hidden_size,
                beam_size=self.cfg.decode.beam_size,
                min_len=self.cfg.decode.min_length,
                use_constraint=self._use_constraint,
                return_all=self.cfg.decode.n_best > 1,
            )
        return greedy_decode(
            step_fn,
            init_cache_fn,
            memory,
            self._token_class,
            self._class_mask,
            self.max_len,
            self.cfg.decoder.hidden_size,
            min_len=self.cfg.decode.min_length,
            use_constraint=self._use_constraint,
            phased=True,  # grow the cache 128->...->T: ~15% faster decode
            unroll=self.cfg.decode.unroll,
        )

    def _edges(self, params, hiddens, indices):
        out = self.model.apply(
            params, hiddens, indices, method=MolNexTRModel.predict_edges
        )
        logits = out["edges"].transpose(0, 2, 3, 1)  # (B, K, K, 7)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        sym = symmetrize_edge_probs(probs)
        return jnp.argmax(sym, axis=-1), jnp.max(sym, axis=-1)

    # -- host orchestration ----------------------------------------------
    def predict_images_raw(
        self, images: np.ndarray, params=None
    ) -> Dict[str, np.ndarray]:
        """Numeric-only prediction: token ids + edge class matrix.

        The tensorized eval path (SURVEY.md §5): these arrays can ride a
        cross-host ``process_allgather`` — unlike the python dicts the
        reference gathers with ``dist.all_gather_object``
        (`main.py:294-301`).  ``params`` overrides the engine's stored
        parameters (same jitted graph, no recompile) so one engine serves
        every training epoch.
        """
        params = self.params if params is None else params
        n = images.shape[0]
        images = self._pad_to_pow2(images)
        out = self._decode_jit(params, jnp.asarray(images))
        seq, _, _, hiddens = out[:4]
        seq_np = np.asarray(seq)[:n]
        result: Dict[str, np.ndarray] = {"seq": seq_np}
        if "edges" in self.cfg.data.formats:
            batch_indices = np.zeros((images.shape[0], self.max_atoms), np.int32)
            for i in range(n):
                parsed = self.tokenizer.sequence_to_smiles(seq_np[i].tolist())
                k = min(len(parsed["indices"]), self.max_atoms)
                batch_indices[i, :k] = np.asarray(parsed["indices"][:k], np.int32)
            edge_pred, _ = self._edges_jit(
                params, hiddens, jnp.asarray(batch_indices)
            )
            result["edges"] = np.asarray(edge_pred)[:n].astype(np.int32)
        return result

    def _pad_to_pow2(self, images: np.ndarray) -> np.ndarray:
        if not self.pad_batch:
            return images
        n = images.shape[0]
        target = 1
        while target < n:
            target *= 2
        if target == n:
            return images
        pad = np.repeat(images[-1:], target - n, axis=0)
        return np.concatenate([images, pad], axis=0)

    def predict_images(
        self, images: np.ndarray, compute_confidence: bool = False, params=None
    ) -> List[Dict[str, Any]]:
        """images: (B, H, W, 3) float32, already normalized."""
        n = images.shape[0]
        if params is None:
            params = self.params
        # pad to the next power of two to bound recompilation
        images = self._pad_to_pow2(images)
        out = self._decode_jit(params, jnp.asarray(images))
        seq, avg_scores, token_scores, hiddens = out[:4]
        all_seq = np.asarray(out[4])[:n] if len(out) > 4 else None
        all_scores = np.asarray(out[5])[:n] if len(out) > 4 else None
        seq = np.asarray(seq)[:n]
        avg_scores = np.asarray(avg_scores)[:n]
        token_scores = np.asarray(token_scores)[:n]

        predictions: List[Dict[str, Any]] = []
        batch_indices = np.zeros((seq.shape[0], self.max_atoms), dtype=np.int32)
        for i in range(n):
            parsed = self.tokenizer.sequence_to_smiles(seq[i].tolist())
            k = min(len(parsed["indices"]), self.max_atoms)
            batch_indices[i, :k] = np.asarray(parsed["indices"][:k], dtype=np.int32)
            pred = {self.fmt: parsed}
            if compute_confidence:
                pred[self.fmt]["atom_scores"] = self._atom_scores(parsed, token_scores[i])
                pred[self.fmt]["average_token_score"] = float(avg_scores[i])
            if all_seq is not None:
                # n-best hypotheses (`beam_search.py:164-190`)
                pred["beams"] = [
                    {
                        "smiles": self.tokenizer.sequence_to_smiles(
                            all_seq[i, kbeam].tolist()
                        )["smiles"],
                        "score": float(all_scores[i, kbeam]),
                    }
                    for kbeam in range(
                        min(self.cfg.decode.n_best, all_seq.shape[1])
                    )
                ]
            predictions.append(pred)

        if "edges" in self.cfg.data.formats:
            hiddens_dev = hiddens[: len(predictions)] if not self.pad_batch else hiddens
            edge_pred, edge_score = self._edges_jit(
                params, hiddens_dev, jnp.asarray(
                    np.pad(batch_indices, ((0, hiddens.shape[0] - seq.shape[0]), (0, 0)))
                )
            )
            edge_pred = np.asarray(edge_pred)[:n]
            edge_score = np.asarray(edge_score)[:n]
            for i, pred in enumerate(predictions):
                k = len(pred[self.fmt]["indices"])
                k = min(k, self.max_atoms)
                pred["edges"] = edge_pred[i, :k, :k].tolist()
                if compute_confidence:
                    es = edge_score[i, :k, :k]
                    pred["edge_scores"] = es.tolist()
                    prod = float(np.sqrt(np.prod(np.clip(es, 1e-12, 1.0))))
                    pred["overall_score"] = pred[self.fmt]["average_token_score"] * prod
        return predictions

    def _atom_scores(self, parsed: Dict[str, Any], token_scores: np.ndarray) -> List[float]:
        """Per-atom confidence (`components.py:457-469`): geometric mean of
        the symbol characters' scores times x/y scores for chartok."""
        scores = np.exp(token_scores)
        out = []
        for symbol, index in zip(parsed["symbols"], parsed["indices"]):
            idx = index - 3
            if self.fmt == "chartok_coords":
                lo = max(idx - len(symbol) + 1, 0)
                seg = scores[lo: idx + 1]
                out.append(float(np.prod(seg) ** (1.0 / max(len(seg), 1))))
            else:
                out.append(float(scores[idx]))
        return out
