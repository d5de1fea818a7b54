"""Vectorized anchor (prior box) generation for RetinaFace-style detectors.

Reproduces the math of the reference's ``create_anchor_retinaface``
(``src/retinaface.cpp:210-240``; config ``conversion/retina/config.py:2-20``):
3 FPN levels with strides (8, 16, 32) and min_sizes ((10, 20), (32, 64),
(128, 256)), two anchors per cell, anchor order = (row-major cells, then
min_size) — which matches the head output order after the (0,2,3,1) permute
in ``conversion/retina/models/retinaface_trim.py:20-24``.

Anchors are a pure function of the static input geometry, so they constant-
fold under jit. Computed with numpy; returned as a jnp array (A, 4) of
normalized (cx, cy, sx, sy).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

RETINAFACE_STEPS: Tuple[int, ...] = (8, 16, 32)
RETINAFACE_MIN_SIZES: Tuple[Tuple[int, ...], ...] = ((10, 20), (32, 64), (128, 256))

# 4-level SSD-style variants (reference conversion/retina/config.py:22-52)
SLIM_RFB_STEPS: Tuple[int, ...] = (8, 16, 32, 64)
SLIM_RFB_MIN_SIZES: Tuple[Tuple[int, ...], ...] = (
    (10, 16, 24), (32, 48), (64, 96), (128, 192, 256))


@functools.lru_cache(maxsize=16)
def _generate_anchors_np(
    input_hw: Tuple[int, int],
    steps: Tuple[int, ...],
    min_sizes: Tuple[Tuple[int, ...], ...],
) -> np.ndarray:
    h, w = input_hw
    out = []
    for step, sizes in zip(steps, min_sizes):
        fh = math.ceil(h / step)
        fw = math.ceil(w / step)
        jj, ii, ll = np.meshgrid(
            np.arange(fw), np.arange(fh), np.arange(len(sizes)), indexing="xy")
        # meshgrid(xy) gives shape (fh, fw, L) with row-major (i, j, l) order
        sizes_arr = np.asarray(sizes, dtype=np.float64)[ll]
        cx = (jj + 0.5) * step / w
        cy = (ii + 0.5) * step / h
        sx = sizes_arr / w
        sy = sizes_arr / h
        out.append(np.stack([cx, cy, sx, sy], -1).reshape(-1, 4))
    return np.concatenate(out, 0).astype(np.float32)


def generate_anchors(
    input_hw: Tuple[int, int],
    steps: Tuple[int, ...] = RETINAFACE_STEPS,
    min_sizes: Tuple[Tuple[int, ...], ...] = RETINAFACE_MIN_SIZES,
) -> jnp.ndarray:
    """(A, 4) normalized anchors (cx, cy, sx, sy) for the given input size.

    The numpy computation is cached; the jnp conversion happens per call so
    no traced constant is ever cached across jit traces.
    """
    return jnp.asarray(_generate_anchors_np(input_hw, tuple(steps),
                                            tuple(map(tuple, min_sizes))))


def num_anchors(input_hw: Tuple[int, int],
                steps: Sequence[int] = RETINAFACE_STEPS,
                min_sizes: Sequence[Sequence[int]] = RETINAFACE_MIN_SIZES) -> int:
    h, w = input_hw
    return sum(math.ceil(h / s) * math.ceil(w / s) * len(m)
               for s, m in zip(steps, min_sizes))
