"""Public inference API.

TPU-native counterpart of the reference's user-facing surface:

* :class:`MolNexTR` — the ``molnextr`` model wrapper
  (`/root/reference/MolNexTR/model.py:33-196`) with
  ``predict_image(s)/predict_image_files/predict_final_results``.
* :class:`MolNexTRSingleton` — cached instance + hardware autodetect
  (`molnextr.py:42-211`; MPS->CUDA->CPU becomes TPU->CPU).
* :func:`get_predictions` — the one-call API (`molnextr.py:214-309`)
  returning the same result-dict schema (predicted_smiles, atom_sets,
  bond_sets, predicted_molfile, device_info, prediction_time_seconds).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from molnextr_tpu.config import Config
from molnextr_tpu.utils import logger

# Bond class names, index-aligned with the 7-way edge head
# (`model.py:30`).
BOND_TYPES = [
    "",
    "single",
    "double",
    "triple",
    "aromatic",
    "solid wedge",
    "dashed wedge",
]


class MolNexTR:
    """End-to-end image -> molecule predictor."""

    def __init__(self, model_path: Optional[str] = None, cfg: Optional[Config] = None,
                 params=None, num_workers: int = 16):
        import jax.numpy as jnp

        from molnextr_tpu.checkpoint import load_model
        from molnextr_tpu.data.transforms import get_transforms
        from molnextr_tpu.inference import InferenceEngine
        from molnextr_tpu.models.model import MolNexTRModel
        from molnextr_tpu.tokenization import get_tokenizer

        if model_path is not None:
            if model_path.endswith((".pth", ".pt")):
                # reference PyTorch checkpoint: read torch-free + convert
                from molnextr_tpu.convert import load_torch_checkpoint

                cfg, variables = load_torch_checkpoint(model_path, cfg)
                params = variables
            else:
                cfg, params = load_model(model_path)
        if cfg is None:
            raise ValueError("need model_path or (cfg, params)")
        _kv8 = os.environ.get("MOLNEXTR_KV_INT8", "")
        if _kv8 in ("0", "1"):
            # runtime-only decode option (never persisted in bundles):
            # int8 KV caches halve the decode loop's HBM traffic.  Default
            # ON since round 5 (DecoderConfig.kv_int8); "0" forces the
            # exact bf16/f32 cache path back on.
            import dataclasses

            cfg.decoder = dataclasses.replace(
                cfg.decoder, kv_int8=_kv8 == "1"
            )
        self.cfg = cfg
        self.num_workers = num_workers
        self.tokenizers = get_tokenizer(cfg.data)
        vocab_sizes = {f: len(t) for f, t in self.tokenizers.items()}
        dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
        self.model = MolNexTRModel(cfg, vocab_sizes, dtype=dtype)
        if params is None:
            params = self._init_params()
        self.params = params
        # normalize=False keeps transformed images uint8; the engine
        # normalizes on device (train/wire.py), so prediction batches ship
        # one grayscale channel instead of float32 RGB
        self.transform = get_transforms(
            cfg.data.input_size, augment=False, rotate=False, normalize=False
        )
        self.engine = InferenceEngine(cfg, self.tokenizers, self.model, params)

    def _init_params(self):
        """Random init (used when no checkpoint is supplied, e.g. smoke
        tests)."""
        import jax
        import numpy as np

        s = self.cfg.data.input_size
        k = self.cfg.data.max_atoms
        fmt = next(f for f in self.cfg.data.formats if f != "edges")
        refs = {
            fmt: np.ones((1, 8), np.int32),
            "atom_indices": np.zeros((1, k), np.int32),
            "edges": np.zeros((1, k, k), np.int32),
        }
        return jax.jit(self.model.init, static_argnames=("deterministic",))(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            np.zeros((1, s, s, 3), np.float32),
            refs,
            deterministic=True,
        )

    # -- prediction -------------------------------------------------------
    def predict_images(
        self,
        input_images: List[np.ndarray],
        return_atoms_bonds: bool = False,
        return_confidence: bool = False,
        batch_size: int = 16,
    ) -> List[Dict[str, Any]]:
        from molnextr_tpu.chem.graph import convert_graph_to_smiles

        predictions: List[Dict[str, Any]] = []
        for start in range(0, len(input_images), batch_size):
            chunk = input_images[start : start + batch_size]
            batch = np.stack(
                [self.transform(image=im)["image"] for im in chunk], axis=0
            )
            if batch.dtype == np.uint8 and batch.shape[-1] == 3:
                # ToGray ran in the transform: all channels equal
                batch = np.ascontiguousarray(batch[..., :1])
            predictions += self.engine.predict_images(
                batch, compute_confidence=return_confidence
            )

        fmt = self.engine.fmt
        node_coords = [p[fmt]["coords"] for p in predictions]
        node_symbols = [p[fmt]["symbols"] for p in predictions]
        edges = [p["edges"] for p in predictions]
        smiles_list, molblock_list, _ = convert_graph_to_smiles(
            node_coords, node_symbols, edges,
            images=input_images, num_workers=self.num_workers,
        )

        if self.cfg.decode.rerank == "roundtrip":
            # round-trip verification (rerank.py): candidates are the graph
            # view (rank 0, assembly-corrected), the raw token view, and any
            # beam n-best strings; a challenger replaces rank 0 only when
            # its re-render CONFIDENTLY matches the input ink, so images
            # where the views agree — or where the compare frame is broken
            # (clutter, foreign renderer) — are untouched.
            from molnextr_tpu.rerank import roundtrip_rerank, smiles_to_molblock

            for i, pred in enumerate(predictions):
                cands = [smiles_list[i], pred[fmt]["smiles"]]
                cands += [b["smiles"] for b in pred.get("beams", [])]
                winner, _ = roundtrip_rerank(input_images[i], cands)
                if winner is not None:
                    smiles_list[i] = winner
                    molblock_list[i] = smiles_to_molblock(winner)

        outputs: List[Dict[str, Any]] = []
        for smiles, molfile, pred in zip(smiles_list, molblock_list, predictions):
            d: Dict[str, Any] = {
                "predicted_smiles": smiles,
                "predicted_molfile": molfile,
            }
            if return_atoms_bonds:
                coords = pred[fmt]["coords"]
                symbols = pred[fmt]["symbols"]
                atom_list = []
                for i, (symbol, coord) in enumerate(zip(symbols, coords)):
                    ad = {
                        "atom_number": f"{i}",
                        "atom_symbol": symbol,
                        "coords": (round(coord[0], 3), round(coord[1], 3)),
                    }
                    if return_confidence:
                        ad["confidence"] = pred[fmt]["atom_scores"][i]
                    atom_list.append(ad)
                d["atom_sets"] = atom_list
                bond_list = []
                # the edge head scores at most k = min(len(indices), max_atoms)
                # atoms (inference.py:207-209); a malformed decode can emit
                # more symbols than scored atoms — bound by the matrix.
                n = min(len(symbols), len(pred.get("edges", [])))
                for i in range(n - 1):
                    for j in range(i + 1, n):
                        bt = int(pred["edges"][i][j])
                        if bt != 0:
                            bd = {
                                "atom_number": f"{i}",
                                "bond_type": BOND_TYPES[bt],
                                "endpoints": (i, j),
                            }
                            if return_confidence:
                                bd["confidence"] = pred["edge_scores"][i][j]
                            bond_list.append(bd)
                d["bond_sets"] = bond_list
            if return_confidence:
                d["confidence"] = pred.get("overall_score")
            outputs.append(d)
        return outputs

    def predict_image(self, image, return_atoms_bonds=False, return_confidence=False):
        return self.predict_images(
            [image], return_atoms_bonds=return_atoms_bonds,
            return_confidence=return_confidence,
        )[0]

    def predict_image_files(self, image_files: List[str], return_atoms_bonds=False,
                            return_confidence=False):
        import cv2

        images = []
        for path in image_files:
            image = cv2.imread(path)
            if image is None:
                raise FileNotFoundError(path)
            images.append(cv2.cvtColor(image, cv2.COLOR_BGR2RGB))
        return self.predict_images(
            images, return_atoms_bonds=return_atoms_bonds,
            return_confidence=return_confidence,
        )

    def predict_final_results(self, image_file: str, return_atoms_bonds=False,
                              return_confidence=False):
        return self.predict_image_files(
            [image_file], return_atoms_bonds=return_atoms_bonds,
            return_confidence=return_confidence,
        )[0]


# alias matching the reference class name (`model.py:33`)
molnextr = MolNexTR


class MolNexTRSingleton:
    """Process-wide cached model (`molnextr.py:42-211`)."""

    _instance: Optional[MolNexTR] = None
    _device_name: str = "unknown"

    # released reference checkpoint (`molnextr.py:130`); downloaded into the
    # pystow-style cache on first use when the environment allows egress
    MODEL_URL = (
        "https://huggingface.co/datasets/CYF200127/MolNexTR/resolve/main/"
        "molnextr_best.pth"
    )

    @classmethod
    def cache_dir(cls) -> str:
        """Checkpoint cache directory (pystow layout: ~/.data/molnextr,
        overridable via MOLNEXTR_CACHE)."""
        return os.environ.get(
            "MOLNEXTR_CACHE",
            os.path.join(os.path.expanduser("~"), ".data", "molnextr"),
        )

    @classmethod
    def _ensure_checkpoint(cls) -> Optional[str]:
        """Locate or download the released checkpoint
        (`molnextr.py:126-143`): cached file wins; otherwise attempt the
        HuggingFace download (returns None on failure, e.g. offline)."""
        cached = os.path.join(cls.cache_dir(), "molnextr_best.pth")
        if os.path.exists(cached):
            logger.info(f"using cached checkpoint at {cached}")
            return cached
        if os.environ.get("MOLNEXTR_NO_DOWNLOAD"):
            return None
        try:
            import shutil
            import urllib.request

            os.makedirs(cls.cache_dir(), exist_ok=True)
            logger.info(f"downloading checkpoint from {cls.MODEL_URL}")
            tmp = cached + ".part"
            with urllib.request.urlopen(cls.MODEL_URL, timeout=30) as resp:
                with open(tmp, "wb") as f:
                    shutil.copyfileobj(resp, f)
            expect = os.environ.get("MOLNEXTR_MODEL_SHA256")
            if expect:
                import hashlib

                h = hashlib.sha256()
                with open(tmp, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                if h.hexdigest() != expect.lower():
                    os.remove(tmp)
                    raise RuntimeError(
                        "downloaded checkpoint failed SHA-256 verification"
                    )
            os.replace(tmp, cached)
            logger.info(f"downloaded checkpoint to {cached}")
            return cached
        except Exception as e:
            logger.warning(f"checkpoint download unavailable ({e})")
            return None

    @classmethod
    def get_instance(cls, model_path: Optional[str] = None) -> MolNexTR:
        if cls._instance is None:
            cls._detect_hardware()
            if model_path is not None and not os.path.exists(model_path):
                # a typo'd explicit path must not silently become a network
                # fetch of a different checkpoint
                raise FileNotFoundError(
                    f"model_path does not exist: {model_path}"
                )
            path = model_path or os.environ.get("MOLNEXTR_MODEL_PATH")
            if not (path and os.path.exists(path)):
                path = cls._ensure_checkpoint()
            if path and os.path.exists(path):
                logger.info(f"loading model bundle from {path}")
                cls._instance = MolNexTR(model_path=path)
            else:
                logger.warning(
                    "no model bundle found; initializing random weights "
                    "(set MOLNEXTR_MODEL_PATH for real predictions)"
                )
                cls._instance = MolNexTR(cfg=Config())
        return cls._instance

    @classmethod
    def _detect_hardware(cls) -> None:
        """TPU -> CPU probe (the reference's MPS->CUDA->CPU ladder,
        `molnextr.py:67-123`)."""
        try:
            import jax

            dev = jax.devices()[0]
            cls._device_name = f"{dev.platform.upper()} ({dev.device_kind})"
        except Exception:
            cls._device_name = "CPU (fallback)"
        logger.info(f"using device: {cls._device_name}")

    @classmethod
    def get_device(cls):
        return cls._device_name

    @classmethod
    def reset(cls):
        cls._instance = None


def get_predictions(
    imagepath: str,
    atoms_bonds: bool = False,
    smiles: bool = True,
    predicted_molfile: bool = False,
) -> Dict[str, Any]:
    """One-call prediction API (`molnextr.py:214-309`)."""
    t0 = time.perf_counter()
    model = MolNexTRSingleton.get_instance()
    try:
        predictions = model.predict_final_results(
            imagepath, return_atoms_bonds=atoms_bonds
        )
    except Exception as e:
        logger.error(f"prediction failed: {e}; retrying on CPU")
        MolNexTRSingleton.reset()
        os.environ["JAX_PLATFORMS"] = "cpu"
        model = MolNexTRSingleton.get_instance()
        predictions = model.predict_final_results(
            imagepath, return_atoms_bonds=atoms_bonds
        )
    result: Dict[str, Any] = {}
    if smiles:
        result["predicted_smiles"] = predictions["predicted_smiles"]
    if atoms_bonds:
        result["atom_sets"] = predictions["atom_sets"]
        result["bond_sets"] = predictions["bond_sets"]
    if predicted_molfile:
        result["predicted_molfile"] = predictions["predicted_molfile"]
    result["device_info"] = MolNexTRSingleton.get_device()
    result["prediction_time_seconds"] = time.perf_counter() - t0
    if not (smiles or atoms_bonds or predicted_molfile):
        return predictions
    return result
