"""OpenCV-parity tests for the matmul-based resize ops.

The reference resizes with cv2 INTER_LINEAR (letterbox,
src/retinaface.cpp:124) and INTER_CUBIC (face crop, src/arcface.cpp:9).
facekit reproduces those semantics on device; cv2 itself is the oracle.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from facekit.ops import (crop_resize, letterbox, letterbox_geometry,
                         resize_image)


@pytest.mark.parametrize("method,cv_flag", [
    ("linear", cv2.INTER_LINEAR), ("cubic", cv2.INTER_CUBIC)])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((480, 640), (288, 320)),   # detector downscale
    ((37, 53), (112, 112)),     # face upscale
    ((200, 100), (112, 112)),
    ((112, 112), (112, 112)),   # identity
])
def test_resize_matches_opencv_float(rng, method, cv_flag, in_hw, out_hw):
    img = rng.uniform(0, 255, size=(*in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_image(jnp.asarray(img), out_hw, method))
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv_flag)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=0)


@pytest.mark.parametrize("method,cv_flag", [
    ("linear", cv2.INTER_LINEAR), ("cubic", cv2.INTER_CUBIC)])
def test_resize_close_to_opencv_uint8_path(rng, method, cv_flag):
    """The reference feeds uint8 Mats (fixed-point path); stay within 1 LSB."""
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    ours = np.asarray(resize_image(jnp.asarray(img, dtype=jnp.float32),
                                   (288, 320), method, saturate=True))
    ref = cv2.resize(img, (320, 288), interpolation=cv_flag).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0 + 1e-4


def test_letterbox_matches_reference_recipe(rng):
    """Full letterbox: integer geometry + INTER_LINEAR + pad 128."""
    frame = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    target = (288, 320)
    ours = np.asarray(letterbox(jnp.asarray(frame, jnp.float32), target))

    h, w, y, x, _ = letterbox_geometry((480, 640), target)
    re = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
    out = np.full((*target, 3), 128, np.uint8)
    out[y:y + h, x:x + w] = re
    assert np.abs(ours - out.astype(np.float32)).max() <= 1.0 + 1e-4


def test_letterbox_geometry_tall_frame():
    # frame taller than wide relative to target -> horizontal padding
    h, w, y, x, scale = letterbox_geometry((640, 480), (288, 320))
    assert h == 288 and y == 0
    assert w == int((288 / 640) * 480)
    assert x == (320 - w) // 2


def test_crop_resize_matches_opencv(rng):
    frame = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    # boxes: (x1, y1, x2, y2) columns/rows
    boxes = np.array([
        [100.7, 50.2, 300.9, 250.5],
        [0.0, 0.0, 640.0, 480.0],
        [600.0, 400.0, 640.0, 480.0],
    ], np.float32)
    ours = np.asarray(crop_resize(jnp.asarray(frame), jnp.asarray(boxes),
                                  (112, 112), "cubic", saturate=False))
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        crop = frame[y1:y2, x1:x2]
        ref = cv2.resize(crop, (112, 112), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(ours[i], ref, atol=2e-2, rtol=0)


def test_crop_resize_batched_shapes(rng):
    frame = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    boxes = np.tile(np.array([[10, 10, 110, 110]], np.float32), (4, 1))
    out = crop_resize(jnp.asarray(frame), jnp.asarray(boxes))
    assert out.shape == (4, 112, 112, 3)
