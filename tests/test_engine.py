"""Serialized serving engines (jax.export artifacts) — the reference's
prebuilt .engine UX (src/arcface.cpp:45-69): export, reload without the
model-building code path, and verify outputs match the live pipeline."""

import json

import numpy as np
import jax
import pytest

from facekit.config import FaceKitConfig
from facekit.engine import (export_embed_engine, export_recognize_engine,
                            load_engine, save_engine)
from facekit.models import arcface_init
from facekit.models.lightdet import lightdet_init
from facekit.pipeline import FacePipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = FaceKitConfig(det_network="slim", rec_network="ir_tiny",
                        det_inputShape=(3, 64, 64),
                        input_frameWidth=160, input_frameHeight=120,
                        compute_dtype="float32", det_threshold_bbox=0.3)
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    return FacePipeline(cfg, det, rec)


def test_recognize_engine_roundtrip(tiny_pipe, tmp_path, rng):
    blob, meta = export_recognize_engine(tiny_pipe, batch_size=2)
    path = str(tmp_path / "recognize.fke")
    save_engine(path, blob, meta)
    assert meta["program"] == "recognize" and meta["batch_size"] == 2
    assert json.load(open(path + ".json"))["magic"] == "facekit-engine-v1"

    call, meta2 = load_engine(path)
    frames = rng.integers(0, 256, size=(2, 120, 160, 3)).astype(np.uint8)
    boxes, scores, valid, emb = call(tiny_pipe.det_params,
                                     tiny_pipe.rec_params, frames)
    ref = tiny_pipe.recognize_frames(frames)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref.embeddings),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref.boxes),
                               rtol=1e-5, atol=1e-4)


def test_embed_engine_roundtrip(tiny_pipe, tmp_path, rng):
    blob, meta = export_embed_engine(tiny_pipe, batch_size=3)
    path = str(tmp_path / "embed.fke")
    save_engine(path, blob, meta)
    call, _ = load_engine(path)
    crops = rng.integers(0, 256, size=(3, 112, 112, 3)).astype(np.uint8)
    emb = np.asarray(call(tiny_pipe.rec_params, crops))
    ref = tiny_pipe.embed_cropped_batch(crops)
    np.testing.assert_allclose(emb, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_load_engine_rejects_foreign_file(tmp_path):
    p = tmp_path / "bogus.fke"
    p.write_bytes(b"not an engine")
    (tmp_path / "bogus.fke.json").write_text(json.dumps({"magic": "nope"}))
    with pytest.raises(ValueError, match="not a facekit engine"):
        load_engine(str(p))
    # a missing sidecar must also refuse cleanly, not feed arbitrary
    # bytes into the deserializer
    q = tmp_path / "naked.fke"
    q.write_bytes(b"some bytes")
    with pytest.raises(ValueError, match="sidecar"):
        load_engine(str(q))


def test_engine_cli_with_slim_detector(tmp_path):
    """The CLI must honor det_network (it used to hardcode retinaface)."""
    from facekit import engine
    cfg_path = tmp_path / "slim.json"
    cfg_path.write_text(json.dumps({
        "det_network": "slim", "rec_network": "ir_tiny",
        "det_inputShape": [3, 64, 64],
        "input_frameWidth": 160, "input_frameHeight": 120,
        "compute_dtype": "float32"}))
    out = tmp_path / "engines"
    engine.main(["export", "-c", str(cfg_path), "-o", str(out), "-b", "2"])
    call, meta = load_engine(str(out / "recognize.fke"))
    assert meta["det_network"] == "slim"


def test_engine_cli_defaults_to_config_ladder(tmp_path):
    """Without -b the CLI exports one engine pair per bucket of the
    config's OWN server_batchBuckets — exactly the set the server's
    --engines validation will demand for that config (r4)."""
    from facekit import engine
    cfg_path = tmp_path / "ladder.json"
    cfg_path.write_text(json.dumps({
        "det_network": "slim", "rec_network": "ir_tiny",
        "det_inputShape": [3, 64, 64],
        "input_frameWidth": 160, "input_frameHeight": 120,
        "compute_dtype": "float32",
        "server_batchBuckets": [1, 2]}))
    out = tmp_path / "engines"
    engine.main(["export", "-c", str(cfg_path), "-o", str(out)])
    for sfx in ("b1", "b2"):
        for prog in ("recognize", "embed"):
            _, meta = load_engine(str(out / f"{prog}.{sfx}.fke"))
            assert meta["batch_size"] == int(sfx[1])


def test_engine_meta_records_quantization_state(tiny_pipe, tmp_path, rng):
    """Engine meta must carry rec_quantize/rec_calibrated so a loader can
    detect a params-signature mismatch up front instead of an opaque
    pytree error (r2 advisor finding)."""
    import cv2
    _, meta = export_embed_engine(tiny_pipe, batch_size=2)
    assert meta["rec_quantize"] is False and meta["rec_calibrated"] is False

    cfg_q = FaceKitConfig(det_network="slim", rec_network="ir_tiny",
                          det_inputShape=(3, 64, 64),
                          input_frameWidth=160, input_frameHeight=120,
                          compute_dtype="float32", rec_quantize=True)
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    pipe_q = FacePipeline(cfg_q, det, rec)
    _, meta_q = export_embed_engine(pipe_q, batch_size=2)
    assert meta_q["rec_quantize"] is True and meta_q["rec_calibrated"] is False

    crop = rng.integers(0, 256, size=(1, 112, 112, 3)).astype(np.uint8)
    pipe_q.calibrate_embedder([crop])
    _, meta_c = export_embed_engine(pipe_q, batch_size=2)
    assert meta_c["rec_calibrated"] is True

    # calibrate_embedder and the server/export path share ONE headroom
    # default (r2 advisor finding #2)
    from facekit.pipeline.recognize import CALIBRATION_HEADROOM
    import inspect
    sig = inspect.signature(FacePipeline.calibrate_embedder)
    assert sig.parameters["headroom"].default == CALIBRATION_HEADROOM


def test_engine_cli_refuses_unusable_calibration(tmp_path):
    """A configured-but-unusable rec_calibrationDir must FAIL the export
    (a server degrades with a warning; a frozen artifact must not bake in
    the wrong params signature — r2 advisor finding)."""
    from facekit import engine
    cfg_path = tmp_path / "badcal.json"
    cfg_path.write_text(json.dumps({
        "det_network": "slim", "rec_network": "ir_tiny",
        "det_inputShape": [3, 64, 64],
        "input_frameWidth": 160, "input_frameHeight": 120,
        "compute_dtype": "float32", "rec_quantize": True,
        "extras": {"rec_calibrationDir": str(tmp_path / "nonexistent")}}))
    with pytest.raises(SystemExit, match="refusing to export"):
        engine.main(["export", "-c", str(cfg_path),
                     "-o", str(tmp_path / "e"), "-b", "2"])


def test_identify_mesh_engine_export(tmp_path):
    """--identify-mesh exports the complete fused identify program
    sharded over a REAL v5e:2x4 topology: 8-device TPU artifact with
    sharding annotations, loadable without the hardware (execution needs
    a real slice; compile/serialize is the deployable contract)."""
    try:
        from jax.experimental import topologies
        topologies.get_topology_desc("v5e:2x4")
    except Exception as e:
        pytest.skip(f"v5e topology unavailable: {e}")
    from facekit import engine
    from facekit.engine import load_engine
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "det_network": "slim", "rec_network": "ir_tiny",
        "det_inputShape": [3, 64, 64],
        "input_frameWidth": 160, "input_frameHeight": 120,
        "compute_dtype": "bfloat16"}))
    out = tmp_path / "engines"
    engine.main(["export", "-c", str(cfg_path), "-o", str(out), "-b", "8",
                 "--identify-mesh", "data=2,gallery=4",
                 "--gallery-rows", "8192"])
    call, meta = load_engine(str(out / "identify.fke"))
    assert meta["program"] == "identify"
    assert meta["nr_devices"] == 8
    assert meta["mesh_shape"] == {"data": 2, "gallery": 4}
    assert meta["gallery_rows"] == 8192
    assert callable(call)


def test_engine_meta_records_det_quantize(tiny_pipe, tmp_path, rng):
    """det_quantize is a frozen static: the exported program embeds the
    int8 detector tree's SIGNATURE, so a loader given a float-detector
    config must refuse up front (same contract as rec_quantize, r5)."""
    from facekit.engine import _quant_meta, _check_pipeline_statics

    blob, meta = export_recognize_engine(tiny_pipe, batch_size=2,
                                         return_crops=True)
    assert meta["det_quantize"] is False

    cfg_q = FaceKitConfig(det_network="slim", rec_network="ir_tiny",
                          det_inputShape=(3, 64, 64),
                          input_frameWidth=160, input_frameHeight=120,
                          compute_dtype="float32", det_threshold_bbox=0.3,
                          det_quantize=True)
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    pipe_q = FacePipeline(cfg_q, det, rec)
    blob_q, meta_q = export_recognize_engine(pipe_q, batch_size=2,
                                             return_crops=True)
    assert meta_q["det_quantize"] is True

    # a float-detector server must refuse the quantized artifact loudly
    with pytest.raises(ValueError, match="det_quantize"):
        _check_pipeline_statics("x.fke", meta_q, tiny_pipe.config,
                                tiny_pipe, _quant_meta(tiny_pipe),
                                "recognize")
    # and the quantized server must accept its own artifact's statics
    _check_pipeline_statics("x.fke", meta_q, cfg_q, pipe_q,
                            _quant_meta(pipe_q), "recognize")
