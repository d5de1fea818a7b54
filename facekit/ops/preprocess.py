"""Pixel normalization for the two model inputs.

Reference semantics:
  * detector: BGR image minus channel means (104, 117, 123), stays BGR,
    letterbox padding value 128 (``src/retinaface.cpp:125-130``).
  * recognizer: BGR -> RGB, then (x - 127.5) * 0.0078125
    (``src/arcface.cpp:105-114``).

facekit keeps images NHWC end to end (TPU-friendly); the reference's CHW
split is a TensorRT layout detail we do not reproduce.
"""

from __future__ import annotations

import jax.numpy as jnp

# BGR channel means used by RetinaFace training (src/retinaface.cpp:130).
DET_MEAN_BGR = (104.0, 117.0, 123.0)
REC_SCALE = 0.0078125  # 1/128


def det_normalize(img_bgr: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR uint8/float -> zero-mean float32, BGR order."""
    mean = jnp.asarray(DET_MEAN_BGR, dtype=jnp.float32)
    return img_bgr.astype(jnp.float32) - mean


def rec_normalize(img_bgr: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR uint8/float -> RGB in [-1, 1) float32."""
    rgb = img_bgr[..., ::-1]
    return (rgb.astype(jnp.float32) - 127.5) * REC_SCALE
