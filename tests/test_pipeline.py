"""End-to-end pipeline tests (random weights; shapes/semantics, not accuracy)."""

import numpy as np
import jax
import pytest

from facekit.config import FaceKitConfig
from facekit.models import arcface_init, retinaface_init
from facekit.pipeline import FacePipeline


@pytest.fixture(scope="module")
def pipeline():
    cfg = FaceKitConfig(input_frameWidth=320, input_frameHeight=240,
                        det_inputShape=(3, 192, 192), compute_dtype="float32")
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    return FacePipeline(cfg, det, rec)


def test_recognize_frame_shapes(pipeline, rng):
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    res = pipeline.recognize_frame(frame, return_crops=True)
    f = pipeline.config.det_maxFacesPerScene
    assert res.boxes.shape == (f, 4)
    assert res.embeddings.shape == (f, 512)
    assert res.landmarks.shape == (f, 5, 2)
    assert res.crops.shape == (f, 112, 112, 3)
    # valid embeddings should be L2-normalized
    emb = np.asarray(res.embeddings)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)


def test_embed_cropped_resizes(pipeline, rng):
    img = rng.integers(0, 256, size=(99, 140, 3), dtype=np.uint8)
    emb = pipeline.embed_cropped(img)
    assert emb.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-4)


def test_embed_cropped_exact_size(pipeline, rng):
    img = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
    emb = pipeline.embed_cropped(img)
    assert emb.shape == (512,)


def test_deterministic(pipeline, rng):
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    r1 = pipeline.recognize_frame(frame)
    r2 = pipeline.recognize_frame(frame)
    np.testing.assert_array_equal(np.asarray(r1.embeddings),
                                  np.asarray(r2.embeddings))


def test_no_landmark_pipeline(rng):
    cfg = FaceKitConfig(input_frameWidth=320, input_frameHeight=240,
                        det_inputShape=(3, 192, 192), compute_dtype="float32")
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=False)
    rec = arcface_init(jax.random.PRNGKey(1))
    pipe = FacePipeline(cfg, det, rec)
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    res = pipe.recognize_frame(frame)
    assert res.landmarks is None
    assert res.embeddings.shape == (4, 512)


def test_recognize_frames_batched_matches_single(pipeline, rng):
    frames = rng.integers(0, 256, size=(3, 240, 320, 3), dtype=np.uint8)
    batched = pipeline.recognize_frames(frames)
    assert batched.embeddings.shape == (3, 4, 512)
    assert batched.boxes.shape == (3, 4, 4)
    for i in range(3):
        single = pipeline.recognize_frame(frames[i])
        np.testing.assert_allclose(np.asarray(batched.boxes[i]),
                                   np.asarray(single.boxes), atol=1e-3)
        np.testing.assert_allclose(np.asarray(batched.embeddings[i]),
                                   np.asarray(single.embeddings),
                                   atol=1e-4, rtol=1e-4)


def test_slim_detector_pipeline(rng):
    """det_network='slim' serves through the same fused pipeline."""
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(input_frameWidth=320, input_frameHeight=240,
                        det_inputShape=(3, 192, 192), det_network="slim",
                        compute_dtype="float32")
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1))
    pipe = FacePipeline(cfg, det, rec)
    assert pipe.use_landmarks  # slim always has landmark heads
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    res = pipe.recognize_frame(frame)
    assert res.embeddings.shape == (4, 512)
    assert res.landmarks.shape == (4, 5, 2)
    batched = pipe.recognize_frames(frame[None].repeat(2, 0))
    assert batched.embeddings.shape == (2, 4, 512)


def test_detect_frames_matches_recognize_frames(pipeline, rng):
    """The detection-only program returns the same detections the fused
    recognize program computes internally (same ops, no embedder)."""
    frames = rng.integers(0, 256, size=(2, 240, 320, 3), dtype=np.uint8)
    det = pipeline.detect_frames(frames)
    res = pipeline.recognize_frames(frames)
    np.testing.assert_allclose(np.asarray(det.boxes),
                               np.asarray(res.boxes), atol=1e-3)
    np.testing.assert_allclose(np.asarray(det.scores),
                               np.asarray(res.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(det.valid),
                                  np.asarray(res.valid))
    assert det.landmarks is not None
    np.testing.assert_allclose(np.asarray(det.landmarks),
                               np.asarray(res.landmarks), atol=1e-3)


def test_det_quantize_pipeline(rng):
    """``det_quantize: true`` quantizes the detector's backbone convs at
    pipeline construction (heads stay float) and the full fused program
    serves through the int8 detector; detections stay deterministic and
    use_landmarks survives the param-tree transform. Drift bounds live at
    the model level (test_model_parity.test_retinaface_int8_drift)."""
    cfg = FaceKitConfig(input_frameWidth=320, input_frameHeight=240,
                        det_inputShape=(3, 192, 192),
                        compute_dtype="float32", det_quantize=True)
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    pipe = FacePipeline(cfg, det, rec)
    assert pipe.use_landmarks
    assert isinstance(pipe.det_params["stage2"][0]["pw_conv"], dict)
    assert pipe.det_params["stage2"][0]["pw_conv"]["q"].dtype == np.int8
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    r1 = pipe.recognize_frame(frame)
    r2 = pipe.recognize_frame(frame)
    assert r1.embeddings.shape == (4, 512)
    np.testing.assert_array_equal(np.asarray(r1.boxes), np.asarray(r2.boxes))
    # detect-only program runs the same quantized tree
    d = pipe.detect_frames(frame[None])
    np.testing.assert_allclose(np.asarray(d.boxes)[0],
                               np.asarray(r1.boxes), atol=1e-3)
