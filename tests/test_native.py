"""Native C++ host-ops vs cv2/numpy/JAX oracles."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from facekit import native
from facekit.ops import letterbox, det_normalize
from facekit.ops.boxes import nms as jax_nms

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_resize_matches_cv2(rng):
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    for method, flag in (("linear", cv2.INTER_LINEAR),
                         ("cubic", cv2.INTER_CUBIC)):
        ours = native.resize_u8(img, (288, 320), method)
        ref = cv2.resize(img, (320, 288), interpolation=flag).astype(np.float32)
        assert np.abs(ours - ref).max() <= 1.0 + 1e-4, method


def test_native_letterbox_matches_jax(rng):
    frame = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    ours = native.letterbox_det(frame, (288, 320))
    ref = np.asarray(det_normalize(letterbox(
        jnp.asarray(frame, jnp.float32), (288, 320))))
    assert np.abs(ours - ref).max() <= 1.0 + 1e-4


def test_native_nms_matches_jax(rng):
    n = 80
    centers = rng.uniform(50, 400, size=(n, 2))
    sizes = rng.uniform(20, 120, size=(n, 2))
    boxes = np.concatenate([centers - sizes / 2,
                            centers + sizes / 2], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)

    kept = native.nms(boxes, scores, 0.4, max_out=n)
    tb, ts, keep = jax_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4,
                           top_k=n)
    ref_scores = np.asarray(ts)[np.asarray(keep)]
    np.testing.assert_allclose(scores[kept], ref_scores, rtol=1e-6)


def test_native_gallery_top1(rng):
    gallery = rng.normal(size=(5000, 512)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    queries = gallery[[7, 42, 4999]] + rng.normal(0, 0.01, (3, 512)).astype(np.float32)
    scores, idx = native.gallery_top1(gallery, queries)
    ref = queries @ gallery.T
    np.testing.assert_array_equal(idx, ref.argmax(1))
    np.testing.assert_allclose(scores, ref.max(1), rtol=1e-5)
