"""Engine-served startup: the server boots FROM exported .fke artifacts.

The reference's serving process deserializes prebuilt engines at startup
(src/arcface.cpp:45-69, src/retinaface.cpp:31-55) — the offline
toolchain's artifact is the server's input. These tests close that loop
for facekit: a server constructed with ``engines_dir`` must serve
responses BIT-IDENTICAL to the jit-served server, and refuse loudly when
the artifacts don't match the serving config.
"""

import contextlib
import json
import os

import cv2
import jax
import numpy as np
import pytest

from facekit.config import FaceKitConfig
from facekit.engine import (export_embed_engine, export_recognize_engine,
                            save_engine)
from facekit.models import arcface_init
from facekit.models.lightdet import lightdet_init
from facekit.pipeline import FacePipeline
from facekit.server import FaceServer, make_app

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

BATCH = 2


def _cfg(db_path: str) -> FaceKitConfig:
    # det_threshold_bbox ~0 guarantees valid detections from random-init
    # weights (NMS keeps the top max_faces anchors), so the WS reply path
    # with crops is actually exercised, not just the "null" branch
    return FaceKitConfig(
        database_path=db_path, det_network="slim", rec_network="ir_tiny",
        det_inputShape=(3, 64, 64), input_frameWidth=160,
        input_frameHeight=120, compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        det_threshold_bbox=0.05,
        extras={"server_batchSize": BATCH})


@pytest.fixture(scope="module")
def params():
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    return det, rec


@pytest.fixture(scope="module")
def engines_dir(tmp_path_factory, params):
    det, rec = params
    cfg = _cfg("unused.db")
    pipe = FacePipeline(cfg, det, rec)
    out = tmp_path_factory.mktemp("engines")
    blob, meta = export_recognize_engine(pipe, BATCH, return_crops=True)
    save_engine(str(out / "recognize.fke"), blob, meta)
    blob, meta = export_embed_engine(pipe, BATCH)
    save_engine(str(out / "embed.fke"), blob, meta)
    return str(out)


@pytest.fixture(scope="module")
def server_pair(tmp_path_factory, params, engines_dir):
    """(jit-served, engine-served) servers over the SAME db + params."""
    det, rec = params
    db = str(tmp_path_factory.mktemp("db") / "shared.db")
    jit_srv = FaceServer(_cfg(db), det_params=det, rec_params=rec,
                         warmup=False)
    eng_srv = FaceServer(_cfg(db), det_params=det, rec_params=rec,
                         warmup=False, engines_dir=engines_dir)
    # enroll identical identities through one db; both galleries reload
    # from it (insert does not touch the live gallery — reference
    # semantics)
    rng = np.random.default_rng(7)
    for uid in ("rick", "morty"):
        jit_srv.db.insert_user(uid, uid.title())
        emb = rng.standard_normal(512).astype(np.float32)
        jit_srv.db.insert_face(uid, f"{uid}.jpg",
                               emb / np.linalg.norm(emb))
    jit_srv.reload_gallery()
    eng_srv.reload_gallery()
    return jit_srv, eng_srv


@contextlib.asynccontextmanager
async def make_client(face_server):
    c = TestClient(TestServer(make_app(face_server)))
    await c.start_server()
    try:
        yield c
    finally:
        await c.close()


def _jpg(seed: int, hw=(120, 160)) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def test_engine_server_loads(server_pair):
    _, eng_srv = server_pair
    assert eng_srv.engines is not None
    assert sorted(eng_srv.engines["recognize"]) == [BATCH]
    assert sorted(eng_srv.engines["embed"]) == [BATCH]


async def test_recognize_bit_identical(server_pair):
    jit_srv, eng_srv = server_pair
    for seed in (1, 2):
        data = _jpg(seed, hw=(112, 112))
        async with make_client(jit_srv) as c:
            jit_body = await (await c.post("/recognize", data=data)).text()
        async with make_client(eng_srv) as c:
            eng_body = await (await c.post("/recognize", data=data)).text()
        assert jit_body == eng_body
        assert json.loads(jit_body)["userId"] in ("rick", "morty")


async def test_ws_inference_bit_identical(server_pair):
    jit_srv, eng_srv = server_pair
    bodies = {}
    for name, srv in (("jit", jit_srv), ("engine", eng_srv)):
        async with make_client(srv) as c:
            ws = await c.ws_connect("/inference")
            outs = []
            for seed in (3, 4):
                await ws.send_bytes(_jpg(seed))
                msg = await ws.receive()
                outs.append(msg.data)
            await ws.close()
        bodies[name] = outs
    assert bodies["jit"] == bodies["engine"]
    # the threshold-0.05 config guarantees real detections: the reply
    # path with the base64 crop is what matched, not two "null"s
    for body in bodies["jit"]:
        assert body != "null"
        assert "image" in json.loads(body)


def test_engine_server_rejects_mismatched_artifacts(tmp_path, params):
    """A stale artifact (different frozen geometry) must refuse at
    startup, naming the field — not serve garbage (the reference has no
    such check)."""
    det, rec = params
    other = _cfg("unused.db")
    import dataclasses
    other = dataclasses.replace(other, det_maxFacesPerScene=2)
    pipe = FacePipeline(other, det, rec)
    out = tmp_path / "stale"
    out.mkdir()
    blob, meta = export_recognize_engine(pipe, BATCH, return_crops=True)
    save_engine(str(out / "recognize.fke"), blob, meta)
    blob, meta = export_embed_engine(pipe, BATCH)
    save_engine(str(out / "embed.fke"), blob, meta)
    with pytest.raises(ValueError, match="max_faces"):
        FaceServer(_cfg(str(tmp_path / "a.db")), det_params=det,
                   rec_params=rec, warmup=False, engines_dir=str(out))


def test_engine_server_rejects_stale_det_threshold(tmp_path, params,
                                                   engines_dir):
    """Detection statics (thresholds, NMS knobs) are frozen into the
    traced program like the geometry; an artifact exported at a different
    det_threshold_bbox must refuse — otherwise the engine hot path would
    silently detect at the OLD threshold while the in-process jit paths
    (e.g. /insert/face) use the new one (r4 review finding)."""
    det, rec = params
    import dataclasses
    cfg = dataclasses.replace(_cfg(str(tmp_path / "t.db")),
                              det_threshold_bbox=0.3)
    with pytest.raises(ValueError, match="det_threshold_bbox"):
        FaceServer(cfg, det_params=det, rec_params=rec, warmup=False,
                   engines_dir=engines_dir)


def test_engine_server_rejects_missing_bucket(tmp_path, params, engines_dir):
    """Every ladder bucket needs an engine pair; the error says how to
    export the full ladder."""
    det, rec = params
    cfg = _cfg(str(tmp_path / "b.db"))
    cfg.extras["server_batchBuckets"] = [BATCH, 8]
    with pytest.raises(ValueError, match=r"batch bucket.*\[8\]"):
        FaceServer(cfg, det_params=det, rec_params=rec, warmup=False,
                   engines_dir=engines_dir)


def test_engine_server_rejects_no_crops_artifact(tmp_path, params):
    """recognize engines without the crops output can't feed the WS
    reply; refuse with the re-export hint."""
    det, rec = params
    pipe = FacePipeline(_cfg("unused.db"), det, rec)
    out = tmp_path / "nocrops"
    out.mkdir()
    blob, meta = export_recognize_engine(pipe, BATCH, return_crops=False)
    save_engine(str(out / "recognize.fke"), blob, meta)
    blob, meta = export_embed_engine(pipe, BATCH)
    save_engine(str(out / "embed.fke"), blob, meta)
    with pytest.raises(ValueError, match="no-crops"):
        FaceServer(_cfg(str(tmp_path / "c.db")), det_params=det,
                   rec_params=rec, warmup=False, engines_dir=str(out))
