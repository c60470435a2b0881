"""Keypoint-aware image transforms (numpy/cv2).

A dependency-free re-design of the reference's albumentations pipeline
(`/root/reference/MolNexTR/data_aug.py`, composed at `dataset.py:158-185`).
Each transform maps ``(image HxWx3 uint8, keypoints Nx2 float)`` to the same
pair; a :class:`Compose` chains them with per-transform probabilities.  The
normalize step returns float32; the final on-device resize/normalize variant
lives in :func:`molnextr_tpu.data.transforms.device_normalize` so the TPU
path can fuse it into the encoder graph (BASELINE.json north star).
"""

from __future__ import annotations

import math
import random
import string
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

cv2.setNumThreads(1)  # transforms run inside worker processes (`dataset.py:25`)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

Image = np.ndarray
Keypoints = np.ndarray  # (N, 2) float32 in pixel coords


class Transform:
    """Base: subclasses override apply(); p gates application."""

    def __init__(self, p: float = 1.0):
        self.p = p

    def __call__(self, image: Image, keypoints: Keypoints):
        if random.random() < self.p:
            return self.apply(image, keypoints)
        return image, keypoints

    def apply(self, image: Image, keypoints: Keypoints):
        raise NotImplementedError


class Compose:
    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, image: Image, keypoints=None):
        kps = (
            np.asarray(keypoints, np.float32).reshape(-1, 2)
            if keypoints is not None and len(keypoints)
            else np.zeros((0, 2), np.float32)
        )
        if image.ndim == 2:
            image = cv2.cvtColor(image, cv2.COLOR_GRAY2RGB)
        for t in self.transforms:
            image, kps = t(image, kps)
        return {"image": image, "keypoints": kps}


# -- geometric ---------------------------------------------------------------


class SafeRotate(Transform):
    """Rotate with canvas enlargement so nothing is cropped
    (`data_aug.py:11-95`)."""

    def __init__(self, limit: int = 90, value=(255, 255, 255), p: float = 0.5):
        super().__init__(p)
        self.limit = limit
        self.value = value

    def apply(self, image, keypoints):
        angle = random.uniform(-self.limit, self.limit)
        h, w = image.shape[:2]
        rad = math.radians(angle)
        new_w = int(math.ceil(abs(w * math.cos(rad)) + abs(h * math.sin(rad))))
        new_h = int(math.ceil(abs(w * math.sin(rad)) + abs(h * math.cos(rad))))
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        m[0, 2] += new_w / 2 - w / 2
        m[1, 2] += new_h / 2 - h / 2
        image = cv2.warpAffine(
            image, m, (new_w, new_h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=self.value,
        )
        if len(keypoints):
            ones = np.ones((len(keypoints), 1), np.float32)
            pts = np.concatenate([keypoints, ones], axis=1)
            keypoints = (pts @ m.T).astype(np.float32)
        return image, keypoints


class CropWhite(Transform):
    """Trim white margins, then pad a fixed border (`data_aug.py:98-150`)."""

    def __init__(self, value=(255, 255, 255), pad: int = 0, p: float = 1.0):
        super().__init__(p)
        self.value = value
        self.pad = pad

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        nonwhite = (image != np.asarray(self.value, image.dtype)).sum(axis=2)
        if nonwhite.sum() == 0:
            return image, keypoints
        rows = nonwhite.sum(axis=1).nonzero()[0]
        cols = nonwhite.sum(axis=0).nonzero()[0]
        top, bottom = int(rows[0]), int(rows[-1]) + 1
        left, right = int(cols[0]), int(cols[-1]) + 1
        image = image[top:bottom, left:right]
        image = cv2.copyMakeBorder(
            image, self.pad, self.pad, self.pad, self.pad,
            cv2.BORDER_CONSTANT, value=self.value,
        )
        if len(keypoints):
            keypoints = keypoints + np.asarray(
                [self.pad - left, self.pad - top], np.float32
            )
        return image, keypoints


class PadWhite(Transform):
    """Random one-sided white padding (`data_aug.py:153-187`)."""

    def __init__(self, pad_ratio: float = 0.2, value=(255, 255, 255), p: float = 0.5):
        super().__init__(p)
        self.pad_ratio = pad_ratio
        self.value = value

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        side = random.randrange(4)
        amount = random.random() * self.pad_ratio
        t = b = l = r = 0
        if side == 0:
            t = int(h * amount)
        elif side == 1:
            b = int(h * amount)
        elif side == 2:
            l = int(w * amount)
        else:
            r = int(w * amount)
        image = cv2.copyMakeBorder(image, t, b, l, r, cv2.BORDER_CONSTANT, value=self.value)
        if len(keypoints):
            keypoints = keypoints + np.asarray([l, t], np.float32)
        return image, keypoints


class PadToSquare(Transform):
    """Center-pad the short side to square (`data_aug.py:286-314`)."""

    def __init__(self, value=(255, 255, 255), p: float = 1.0):
        super().__init__(p)
        self.value = value

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        size = max(h, w)
        t = (size - h) // 2
        b = size - h - t
        l = (size - w) // 2
        r = size - w - l
        image = cv2.copyMakeBorder(image, t, b, l, r, cv2.BORDER_CONSTANT, value=self.value)
        if len(keypoints):
            keypoints = keypoints + np.asarray([l, t], np.float32)
        return image, keypoints


class ResizePad(Transform):
    """Clamp each dimension to (height, width) then center-pad with white
    (`data_aug.py:212-243`).  Matches the reference: dimensions already
    within bounds are NOT upscaled, and aspect ratio is not preserved when
    clamping (each axis clamps independently)."""

    def __init__(self, height: int, width: int, value=(255, 255, 255), p: float = 1.0):
        super().__init__(p)
        self.height = height
        self.width = width
        self.value = value

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        nh, nw = min(h, self.height), min(w, self.width)
        if (nh, nw) != (h, w):
            image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
            if len(keypoints):
                keypoints = keypoints * np.asarray([nw / w, nh / h], np.float32)
        t = (self.height - nh) // 2
        b = self.height - nh - t
        l = (self.width - nw) // 2
        r = self.width - nw - l
        image = cv2.copyMakeBorder(
            image, t, b, l, r, cv2.BORDER_CONSTANT, value=self.value
        )
        if len(keypoints):
            keypoints = keypoints + np.asarray([l, t], np.float32)
        return image, keypoints


class ConditionalPadToSquare(Transform):
    """Pad to square only when the aspect ratio is at least
    ``ratio_threshold`` (`data_aug.py:316-356`)."""

    def __init__(self, value=(255, 255, 255), ratio_threshold: float = 1.5,
                 p: float = 1.0):
        super().__init__(p)
        self.value = value
        self.ratio_threshold = ratio_threshold

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        if max(h, w) / max(min(h, w), 1) < self.ratio_threshold:
            return image, keypoints
        diff = abs(h - w)
        p1, p2 = diff // 2, diff - diff // 2
        if h < w:
            image = cv2.copyMakeBorder(
                image, p1, p2, 0, 0, cv2.BORDER_CONSTANT, value=self.value
            )
            if len(keypoints):
                keypoints = keypoints + np.asarray([0, p1], np.float32)
        else:
            image = cv2.copyMakeBorder(
                image, 0, 0, p1, p2, cv2.BORDER_CONSTANT, value=self.value
            )
            if len(keypoints):
                keypoints = keypoints + np.asarray([p1, 0], np.float32)
        return image, keypoints


class CropAndPad(Transform):
    """Random all-side crop by a percent range (A.CropAndPad equivalent with
    negative percents, `dataset.py:169`)."""

    def __init__(self, percent=(-0.01, 0.0), p: float = 0.5):
        super().__init__(p)
        self.percent = percent

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        fracs = [random.uniform(*self.percent) for _ in range(4)]  # t, r, b, l
        t = int(round(-fracs[0] * h)) if fracs[0] < 0 else 0
        r = int(round(-fracs[1] * w)) if fracs[1] < 0 else 0
        b = int(round(-fracs[2] * h)) if fracs[2] < 0 else 0
        l = int(round(-fracs[3] * w)) if fracs[3] < 0 else 0
        if t + b >= h or l + r >= w:
            return image, keypoints
        image = image[t : h - b, l : w - r]
        if len(keypoints):
            keypoints = keypoints - np.asarray([l, t], np.float32)
        return image, keypoints


class Resize(Transform):
    def __init__(self, height: int, width: int, p: float = 1.0):
        super().__init__(p)
        self.height = height
        self.width = width

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        image = cv2.resize(image, (self.width, self.height), interpolation=cv2.INTER_LINEAR)
        if len(keypoints):
            keypoints = keypoints * np.asarray(
                [self.width / w, self.height / h], np.float32
            )
        return image, keypoints


# -- photometric / noise -----------------------------------------------------


class Downscale(Transform):
    """Downscale then upscale to simulate low resolution (`dataset.py:171`)."""

    def __init__(self, scale_min: float = 0.2, scale_max: float = 0.5, p: float = 0.5):
        super().__init__(p)
        self.scale_min = scale_min
        self.scale_max = scale_max

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        s = random.uniform(self.scale_min, self.scale_max)
        small = cv2.resize(image, (max(int(w * s), 1), max(int(h * s), 1)), interpolation=cv2.INTER_AREA)
        image = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        return image, keypoints


class Blur(Transform):
    def __init__(self, max_ksize: int = 7, p: float = 0.5):
        super().__init__(p)
        self.max_ksize = max_ksize

    def apply(self, image, keypoints):
        k = random.choice(range(3, self.max_ksize + 1, 2))
        return cv2.blur(image, (k, k)), keypoints


class GaussNoise(Transform):
    def __init__(self, var_limit=(10.0, 50.0), p: float = 0.5):
        super().__init__(p)
        self.var_limit = var_limit

    def apply(self, image, keypoints):
        var = random.uniform(*self.var_limit)
        noise = np.random.normal(0, var ** 0.5, image.shape).astype(np.float32)
        image = np.clip(image.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        return image, keypoints


class SaltAndPepperNoise(Transform):
    """Random dark dots (`data_aug.py:190-210`)."""

    def __init__(self, num_dots: int = 20, value=(0, 0, 0), p: float = 0.5):
        super().__init__(p)
        self.num_dots = num_dots
        self.value = value

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        image = image.copy()
        for _ in range(random.randrange(self.num_dots + 1)):
            image[random.randrange(h), random.randrange(w)] = self.value
        return image, keypoints


class NormalizedGridDistortion(Transform):
    """Grid distortion with unit-mean step normalization
    (`data_aug.py:246-282`), keypoints unchanged (matching the reference,
    which applies it to images/masks only)."""

    def __init__(self, num_steps: int = 10, distort_limit: float = 0.3, p: float = 0.5):
        super().__init__(p)
        self.num_steps = num_steps
        self.distort_limit = distort_limit

    def apply(self, image, keypoints):
        h, w = image.shape[:2]
        ns = self.num_steps
        xsteps = np.array(
            [1 + random.uniform(-self.distort_limit, self.distort_limit) for _ in range(ns + 1)]
        )
        ysteps = np.array(
            [1 + random.uniform(-self.distort_limit, self.distort_limit) for _ in range(ns + 1)]
        )
        xsteps = xsteps / xsteps.mean()
        ysteps = ysteps / ysteps.mean()

        def axis_map(size, steps):
            span = size // ns
            pos = [0.0]
            for i in range(ns):
                pos.append(pos[-1] + span * steps[i])
            pos = np.asarray(pos) * (size - 1) / max(pos[-1], 1e-6)
            xs = np.zeros(size, np.float32)
            for i in range(ns):
                lo, hi = i * span, min((i + 1) * span, size)
                if hi > lo:
                    xs[lo:hi] = np.linspace(pos[i], pos[i + 1], hi - lo)
            if ns * span < size:
                xs[ns * span :] = np.linspace(pos[-1], size - 1, size - ns * span)
            return xs

        map_x = np.tile(axis_map(w, xsteps)[None], (h, 1))
        map_y = np.tile(axis_map(h, ysteps)[:, None], (1, w))
        image = cv2.remap(
            image, map_x, map_y, interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(255, 255, 255),
        )
        return image, keypoints


# -- synthetic clutter (robustness suite, `data_aug.py:359-547`) -------------


class AddLineNoise(Transform):
    def __init__(self, num_lines: int = 3, p: float = 0.3):
        super().__init__(p)
        self.num_lines = num_lines

    def apply(self, image, keypoints):
        image = image.copy()
        h, w = image.shape[:2]
        for _ in range(random.randrange(1, self.num_lines + 1)):
            p1 = (random.randrange(w), random.randrange(h))
            p2 = (random.randrange(w), random.randrange(h))
            cv2.line(image, p1, p2, (0, 0, 0), random.randrange(1, 3))
        return image, keypoints


class AddEdgeElementSymbolNoise(Transform):
    """Stray element symbols near the borders (`data_aug.py:388-425`)."""

    SYMBOLS = ["C", "N", "O", "H", "S", "Cl", "Br", "F", "P", "OH", "NH"]

    def __init__(self, num_symbols: int = 3, p: float = 0.3):
        super().__init__(p)
        self.num_symbols = num_symbols

    def apply(self, image, keypoints):
        image = image.copy()
        h, w = image.shape[:2]
        margin = max(min(h, w) // 10, 12)
        for _ in range(random.randrange(1, self.num_symbols + 1)):
            side = random.randrange(4)
            if side == 0:
                x, y = random.randrange(w), random.randrange(margin, 2 * margin)
            elif side == 1:
                x, y = random.randrange(w), h - random.randrange(margin, 2 * margin)
            elif side == 2:
                x, y = random.randrange(margin, 2 * margin), random.randrange(h)
            else:
                x, y = w - random.randrange(margin, 2 * margin), random.randrange(h)
            cv2.putText(
                image, random.choice(self.SYMBOLS), (x, y),
                cv2.FONT_HERSHEY_SIMPLEX, random.uniform(0.4, 0.8), (0, 0, 0), 1,
                cv2.LINE_AA,
            )
        return image, keypoints


class DrawBorder(Transform):
    def __init__(self, p: float = 0.2):
        super().__init__(p)

    def apply(self, image, keypoints):
        image = image.copy()
        h, w = image.shape[:2]
        cv2.rectangle(image, (0, 0), (w - 1, h - 1), (0, 0, 0), random.randrange(1, 3))
        return image, keypoints


class AddBondNoise(Transform):
    """Short bond-like segments in empty areas (`data_aug.py:445-489`)."""

    def __init__(self, num_bonds: int = 3, p: float = 0.3):
        super().__init__(p)
        self.num_bonds = num_bonds

    def apply(self, image, keypoints):
        image = image.copy()
        h, w = image.shape[:2]
        length = max(min(h, w) // 12, 8)
        for _ in range(random.randrange(1, self.num_bonds + 1)):
            x, y = random.randrange(w), random.randrange(h)
            a = random.uniform(0, 2 * math.pi)
            x2 = int(x + length * math.cos(a))
            y2 = int(y + length * math.sin(a))
            cv2.line(image, (x, y), (x2, y2), (0, 0, 0), random.randrange(1, 3))
            if random.random() < 0.3:  # double bond
                off = 3
                cv2.line(image, (x + off, y + off), (x2 + off, y2 + off), (0, 0, 0), 1)
        return image, keypoints


class AddIncompleteStructuralNoise(Transform):
    """Partial polygons mimicking cut-off ring fragments
    (`data_aug.py:493-547`)."""

    def __init__(self, num_structs: int = 2, p: float = 0.3):
        super().__init__(p)
        self.num_structs = num_structs

    def apply(self, image, keypoints):
        image = image.copy()
        h, w = image.shape[:2]
        r = max(min(h, w) // 10, 10)
        for _ in range(random.randrange(1, self.num_structs + 1)):
            cx, cy = random.randrange(w), random.randrange(h)
            n = random.choice([5, 6])
            start = random.uniform(0, 2 * math.pi)
            pts = [
                (int(cx + r * math.cos(start + 2 * math.pi * k / n)),
                 int(cy + r * math.sin(start + 2 * math.pi * k / n)))
                for k in range(n)
            ]
            keep = random.randrange(2, n)  # draw only part of the ring
            for k in range(keep):
                cv2.line(image, pts[k], pts[(k + 1) % n], (0, 0, 0), 1)
        return image, keypoints


# -- output formatting --------------------------------------------------------


class ToGray(Transform):
    def apply(self, image, keypoints):
        g = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        return cv2.cvtColor(g, cv2.COLOR_GRAY2RGB), keypoints


class Normalize(Transform):
    """ImageNet-normalized float32 output, HWC."""

    def apply(self, image, keypoints):
        img = image.astype(np.float32) / 255.0
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return img, keypoints


def device_normalize(images):
    """ImageNet normalization as an on-device jnp op.

    The training pipeline ships uint8 images to the TPU (4x less tunnel
    bandwidth + host collate memory than normalized float32) and folds this
    into the jitted step; XLA fuses it into the first conv.  Matches
    :class:`Normalize` bit-for-bit in float32.

    Single-channel wire batches (B, H, W, 1) — the grayscale train wire,
    see ``pad_batch`` — broadcast against the per-channel mean/std to the
    (B, H, W, 3) the encoder expects; this reproduces ToGray's
    channel-replication exactly.
    """
    import jax.numpy as jnp

    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def dataset_pads_to_square(dataset: Optional[str]) -> bool:
    """Per-dataset composition switch (`dataset.py:165-167`): the ACS and
    UOB eval sets get a PadToSquare after CropWhite.  Accepts either a
    dataset name ("acs", "uob") or the reference's test_file path
    ("real/acs.csv", "real/UOB.csv")."""
    if not dataset:
        return False
    name = dataset.lower()
    name = name.rsplit("/", 1)[-1].replace(".csv", "")
    return name in ("acs", "uob")


def get_transforms(
    input_size: int,
    augment: bool = True,
    rotate: bool = True,
    debug: bool = False,
    pad_to_square: bool = False,
    dataset: Optional[str] = None,
    normalize: bool = True,
    clutter: bool = False,
) -> Compose:
    """Training/eval pipeline composition (`dataset.py:158-185`).

    ``normalize=False`` keeps the output uint8 (the training path — the
    jitted step applies :func:`device_normalize` on the TPU instead).

    ``clutter=True`` additionally draws the structured clutter noise the
    robustness suite perturbs with (line/bond/symbol/incomplete-structure
    noise + borders, `data_aug.py` clutter family — the reference defines
    these but never trains with them, `dataset.py:19` imports them unused;
    we opt them into the augmentation fine-tune phase so the model is not
    clutter-fragile on the perturbed suite).  Pixel-only: none of these
    move keypoints.
    """
    trans: List[Transform] = []
    if augment and rotate:
        trans.append(SafeRotate(limit=90))
    trans.append(CropWhite(pad=50))
    if pad_to_square or dataset_pads_to_square(dataset):
        trans.append(PadToSquare(p=1.0))
    if augment:
        trans += [
            CropAndPad(percent=(-0.01, 0.0), p=0.5),
            PadWhite(pad_ratio=0.4, p=0.2),
            Downscale(scale_min=0.2, scale_max=0.5, p=0.5),
            Blur(p=0.5),
            GaussNoise(p=0.5),
            SaltAndPepperNoise(num_dots=20, p=0.5),
        ]
    if clutter:
        # mirror get_perturbation_transforms' clutter family at train time
        # (lower p: clean images must stay the majority of the stream).
        # Independent of ``augment``: the round-5 druglike3 fine-tune showed
        # the photometric set is DESTRUCTIVE at 192px (Downscale scale_min
        # 0.2 is calibrated for 384px inputs; at 192px it renders 38px-
        # effective images — held-out clean fell 0.281→0.133 over 5 epochs,
        # output/druglike3/metrics.jsonl epochs 39→45) while clutter is what
        # the perturbed suite actually applies, so the robustness fine-tune
        # uses clutter WITHOUT the photometric set.
        trans += [
            AddLineNoise(p=0.3),
            AddEdgeElementSymbolNoise(p=0.3),
            AddBondNoise(p=0.3),
            AddIncompleteStructuralNoise(p=0.3),
            DrawBorder(p=0.2),
        ]
    trans.append(Resize(input_size, input_size))
    if not debug:
        trans.append(ToGray(p=1.0))
        if normalize:
            trans.append(Normalize(p=1.0))
    return Compose(trans)


def get_perturbation_transforms(input_size: int) -> Compose:
    """The robustness-suite pipeline: clutter noise, no normalization jitter
    (perturbed eval sets, SURVEY.md section 6)."""
    return Compose(
        [
            CropWhite(pad=50),
            AddLineNoise(p=0.5),
            AddEdgeElementSymbolNoise(p=0.5),
            AddBondNoise(p=0.5),
            AddIncompleteStructuralNoise(p=0.5),
            DrawBorder(p=0.3),
            Resize(input_size, input_size),
            ToGray(p=1.0),
            Normalize(p=1.0),
        ]
    )
