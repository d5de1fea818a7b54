"""The identify.fke consumer: loading + serving the multi-chip artifact.

r4 shipped the exporter for the complete sharded identification
transaction (engine.py export_identify_engine) but nothing consumed it —
the reference's defining UX is that the serving process boots FROM its
compiled artifacts (src/arcface.cpp:45-69). These tests close that loop
on the 8-device virtual CPU mesh with the XLA-search export variant
(platforms=["cpu"], use_pallas=False): the same artifact shape the TPU
deployment uses, minus the Pallas kernels that only lower for TPU.
"""

import json

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facekit.config import FaceKitConfig
from facekit.engine import (IdentifyEngine, export_identify_engine,
                            load_identify_engines, save_engine)
from facekit.models import arcface_init
from facekit.models.lightdet import lightdet_init
from facekit.parallel import make_mesh
from facekit.parallel.sharded_search import shard_gallery
from facekit.pipeline import FacePipeline
from facekit.server import FaceServer, make_app

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

BATCH = 2
ROWS = 64
MESH_SHAPE = {"data": 2, "gallery": 4}


def _cfg(db_path: str = "unused.db") -> FaceKitConfig:
    return FaceKitConfig(
        database_path=db_path, det_network="slim", rec_network="ir_tiny",
        det_inputShape=(3, 64, 64), input_frameWidth=160,
        input_frameHeight=120, compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        det_threshold_bbox=0.05, mesh_shape=dict(MESH_SHAPE),
        gallery_bucket_sizes=(ROWS,),
        extras={"server_batchSize": BATCH})


@pytest.fixture(scope="module")
def params():
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    return det, rec


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dict(MESH_SHAPE))


@pytest.fixture(scope="module")
def identify_dir(tmp_path_factory, params, mesh):
    det, rec = params
    pipe = FacePipeline(_cfg(), det, rec)
    out = tmp_path_factory.mktemp("idengines")
    blob, meta = export_identify_engine(
        pipe, BATCH, ROWS, mesh=mesh, platforms=["cpu"],
        use_pallas=False, return_crops=True)
    save_engine(str(out / "identify.fke"), blob, meta)
    return str(out)


def test_identify_engine_cold_load_bit_identical(identify_dir, params,
                                                 mesh, rng):
    """Load identify.fke cold (no mesh passed: the engine rebuilds the
    frozen mesh shape from local devices) and serve the complete sharded
    transaction bit-identically to the in-process jit path."""
    det, rec = params
    pipe = FacePipeline(_cfg(), det, rec)
    eng = IdentifyEngine(identify_dir + "/identify.fke")   # cold, no mesh
    assert eng.gallery_rows == ROWS and eng.batch_size == BATCH
    assert dict(eng.mesh.shape) == MESH_SHAPE

    gal_np = rng.standard_normal((ROWS, 512)).astype(np.float32)
    gal_np /= np.linalg.norm(gal_np, axis=1, keepdims=True)
    gal = shard_gallery(jnp.asarray(gal_np), mesh)
    frames = rng.integers(0, 256, size=(BATCH, 120, 160, 3)).astype(np.uint8)

    boxes, scores, valid, emb, sims, idx, crops = eng(
        pipe.det_params, pipe.rec_params, gal, 5, frames)
    res, rsims, ridx = pipe.recognize_and_match(
        frames, gal, 5, use_pallas=False, return_crops=True, mesh=mesh)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(res.valid))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(emb), np.asarray(res.embeddings),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sims), np.asarray(rsims),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(res.boxes),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(crops), np.asarray(res.crops),
                               rtol=0, atol=1e-5)


def test_identify_engine_refuses_wrong_mesh(identify_dir):
    other = make_mesh({"data": 4, "gallery": 2})
    with pytest.raises(ValueError, match="sharded for mesh"):
        IdentifyEngine(identify_dir + "/identify.fke", mesh=other)


def test_identify_engine_refuses_wrong_shapes(identify_dir, params, mesh,
                                              rng):
    det, rec = params
    eng = IdentifyEngine(identify_dir + "/identify.fke", mesh=mesh)
    gal = shard_gallery(jnp.zeros((ROWS, 512), jnp.float32), mesh)
    with pytest.raises(ValueError, match="frozen at batch"):
        eng(det, rec, gal, 1,
            np.zeros((BATCH + 2, 120, 160, 3), np.uint8))
    big = shard_gallery(jnp.zeros((2 * ROWS, 512), jnp.float32), mesh)
    with pytest.raises(ValueError, match="frozen at gallery capacity"):
        eng(det, rec, big, 1, np.zeros((BATCH, 120, 160, 3), np.uint8))


@pytest.fixture(scope="module")
def server_pair(tmp_path_factory, params, identify_dir):
    """(jit mesh-served, identify-engine mesh-served) over the SAME db."""
    det, rec = params
    db = str(tmp_path_factory.mktemp("iddb") / "shared.db")
    jit_srv = FaceServer(_cfg(db), det_params=det, rec_params=rec,
                         warmup=False)
    eng_srv = FaceServer(_cfg(db), det_params=det, rec_params=rec,
                         warmup=False, engines_dir=identify_dir)
    rng = np.random.default_rng(7)
    for uid in ("rick", "morty"):
        jit_srv.db.insert_user(uid, uid.title())
        emb = rng.standard_normal(512).astype(np.float32)
        jit_srv.db.insert_face(uid, f"{uid}.jpg",
                               emb / np.linalg.norm(emb))
    jit_srv.reload_gallery()
    eng_srv.reload_gallery()
    return jit_srv, eng_srv


def _jpg(seed: int, hw=(120, 160)) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def test_identify_server_boots_from_artifact(server_pair):
    _, eng_srv = server_pair
    assert eng_srv.identify_engines is not None
    assert sorted(eng_srv.identify_engines) == [BATCH]
    assert eng_srv.engines is None
    # the artifact's frozen capacity pins the gallery bucket ladder
    assert eng_srv.gallery.buckets == (ROWS,)


async def test_identify_ws_inference_bit_identical(server_pair):
    """The WS hot path served from identify.fke must be byte-identical to
    the jit mesh-served reply — including the base64 crop."""
    jit_srv, eng_srv = server_pair
    bodies = {}
    for name, srv in (("jit", jit_srv), ("engine", eng_srv)):
        c = TestClient(TestServer(make_app(srv)))
        await c.start_server()
        try:
            ws = await c.ws_connect("/inference")
            outs = []
            for seed in (3, 4):
                await ws.send_bytes(_jpg(seed))
                msg = await ws.receive()
                outs.append(msg.data)
            await ws.close()
        finally:
            await c.close()
        bodies[name] = outs
    assert bodies["jit"] == bodies["engine"]
    for body in bodies["jit"]:
        assert body != "null"
        assert "image" in json.loads(body)


def test_identify_server_refuses_missing_bucket(tmp_path, params,
                                                identify_dir):
    det, rec = params
    cfg = _cfg(str(tmp_path / "b.db"))
    cfg.extras["server_batchBuckets"] = [BATCH, 4]
    with pytest.raises(ValueError, match=r"identify engine for batch"):
        FaceServer(cfg, det_params=det, rec_params=rec, warmup=False,
                   engines_dir=identify_dir)


def test_identify_server_refuses_no_crops(tmp_path, params, mesh):
    det, rec = params
    pipe = FacePipeline(_cfg(), det, rec)
    out = tmp_path / "nocrops"
    out.mkdir()
    blob, meta = export_identify_engine(
        pipe, BATCH, ROWS, mesh=mesh, platforms=["cpu"], use_pallas=False,
        return_crops=False)
    save_engine(str(out / "identify.fke"), blob, meta)
    with pytest.raises(ValueError, match="no-crops"):
        FaceServer(_cfg(str(tmp_path / "c.db")), det_params=det,
                   rec_params=rec, warmup=False, engines_dir=str(out))


def test_identify_server_refuses_reload_past_frozen_capacity(
        tmp_path, params, identify_dir):
    """A reload that outgrows the artifact's frozen gallery capacity must
    refuse at /reload time (the old gallery keeps serving) — a frozen
    artifact cannot resize, exactly like the reference's .engine files."""
    det, rec = params
    db = str(tmp_path / "grow.db")
    srv = FaceServer(_cfg(db), det_params=det, rec_params=rec,
                     warmup=False, engines_dir=identify_dir)
    rng = np.random.default_rng(1)
    srv.db.insert_user("u", "U")
    for i in range(ROWS + 1):
        emb = rng.standard_normal(512).astype(np.float32)
        srv.db.insert_face("u", f"{i}.jpg", emb / np.linalg.norm(emb))
    with pytest.raises(ValueError, match="frozen at capacity"):
        srv.reload_gallery()


def test_load_identify_engines_validates_statics(tmp_path, params, mesh):
    """Frozen detection statics must match the serving config (same
    contract as recognize engines: r4 review finding)."""
    import dataclasses
    det, rec = params
    stale = dataclasses.replace(_cfg(), det_threshold_bbox=0.4)
    pipe = FacePipeline(stale, det, rec)
    out = tmp_path / "stale"
    out.mkdir()
    blob, meta = export_identify_engine(
        pipe, BATCH, ROWS, mesh=mesh, platforms=["cpu"], use_pallas=False,
        return_crops=True)
    save_engine(str(out / "identify.fke"), blob, meta)
    good_pipe = FacePipeline(_cfg(), det, rec)
    with pytest.raises(ValueError, match="det_threshold_bbox"):
        load_identify_engines(str(out), _cfg(), good_pipe, mesh)
