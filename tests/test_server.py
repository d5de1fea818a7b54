"""API-contract tests replaying the reference's documented curl examples
(app/README.md) against the aiohttp app, including the WS path."""

import contextlib
import json
import os

import cv2
import jax
import numpy as np
import pytest

from facekit.config import FaceKitConfig
from facekit.models import arcface_init, retinaface_init
from facekit.server import FaceServer, make_app

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402


@pytest.fixture(scope="module")
def face_server(tmp_path_factory):
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("db") / "test.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False)
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    return FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)


@contextlib.asynccontextmanager
async def make_client(face_server):
    c = TestClient(TestServer(make_app(face_server)))
    await c.start_server()
    try:
        yield c
    finally:
        await c.close()


def _jpg(rng, hw=(240, 320)):
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    return buf.tobytes(), img


async def test_insert_user_contract(face_server):
    async with make_client(face_server) as client:
        r = await client.post("/insert/user", data=json.dumps(
            {"userId": "morty", "userName": "Morty Smith"}))
        assert await r.text() == "Success! User `morty` inserted.\n"
        r = await client.post("/insert/user", data=json.dumps(
            {"userId": "morty", "userName": "Morty Smith"}))
        assert await r.text() == "Fail! User `morty` already in database.\n"
        r = await client.post("/insert/user", data="not json")
        assert r.status == 400


async def test_insert_face_and_reload_and_recognize(face_server, tmp_path,
                                                    rng):
    async with make_client(face_server) as client:
        data, img = _jpg(rng, hw=(112, 112))
        path = tmp_path / "face.jpg"
        path.write_bytes(data)

        r = await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "morty", "imgPath": str(path)}]}))
        assert "Success! Embedding for `morty` inserted successfully." in (
            await r.text())

        # insert does NOT touch the live gallery (reference semantics)
        assert face_server.gallery.count == 0
        r = await client.get("/reload")
        assert await r.text() == "Success\n"
        assert face_server.gallery.count == 1

        # /recognize on the same image must match morty with sim ~1
        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "morty"
        assert body["similarity"] > 0.95


async def test_insert_face_missing_path(face_server):
    async with make_client(face_server) as client:
        r = await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "x", "imgPath": "/nonexistent.jpg"}]}))
        assert "Image path not found" in await r.text()


async def test_insert_face_batch_aborts_like_reference(face_server,
                                                       tmp_path, rng):
    """A failing element ABORTS the batch (reference src/app.cpp:131-217
    puts its catch OUTSIDE the loop): the error string replaces any
    accumulated successes, earlier elements' DB inserts persist, and
    later elements are never processed (r4 review finding)."""
    async with make_client(face_server) as client:
        data, _ = _jpg(rng, hw=(112, 112))
        p1, p3 = tmp_path / "one.jpg", tmp_path / "three.jpg"
        p1.write_bytes(data)
        p3.write_bytes(data)
        before = face_server.db.get_num_embeddings()
        r = await client.post("/insert/face", data=json.dumps({"data": [
            {"userId": "ok1", "imgPath": str(p1)},
            {"userId": "bad", "imgPath": "/nonexistent.jpg"},
            {"userId": "ok2", "imgPath": str(p3)}]}))
        assert await r.text() == "Image path not found\n"
        assert face_server.db.get_num_embeddings() == before + 1  # ok1 only
        # clean up the committed row so later tests' counts are unaffected
        with face_server.db._lock:
            face_server.db._conn.execute("DELETE FROM FACE "
                                         "WHERE USR_ID='ok1'")
            face_server.db._conn.commit()


async def test_insert_face_bad_json(face_server):
    async with make_client(face_server) as client:
        r = await client.post("/insert/face", data="{{{")
        assert await r.text() == "Please check json input\n"
        r = await client.post("/insert/face", data=json.dumps({"foo": 1}))
        assert await r.text() == "Cant find field `data` in input!\n"
        # a binary (non-UTF-8) body — e.g. a raw JPEG POSTed by mistake —
        # must hit the same json-failure contract path, not 500
        r = await client.post("/insert/face", data=b"\xff\xd8\xff\xe0junk")
        assert await r.text() == "Please check json input\n"


async def test_recognize_empty_gallery_returns_null(face_server, rng):
    async with make_client(face_server) as client:
        saved = face_server.gallery
        face_server.gallery.reset()
        data, _ = _jpg(rng)
        r = await client.post("/recognize", data=data)
        assert await r.text() == "null"
        await client.get("/reload")


async def test_recognize_invalid_image(face_server):
    async with make_client(face_server) as client:
        r = await client.post("/recognize", data=b"not an image")
        assert await r.text() == "null"


async def test_delete_endpoints(face_server):
    async with make_client(face_server) as client:
        r = await client.get("/delete/user", params={"id": "morty"})
        assert await r.text() == "Success\n"
        r = await client.get("/delete/user")
        assert await r.text() == "Failed\n"
        r = await client.get("/delete/face", params={"id": "1"})
        assert await r.text() == "Success\n"
        await client.get("/reload")
        assert face_server.gallery.count == 0


async def test_delete_then_reload_removes_identity(face_server, tmp_path,
                                                   rng):
    """Full lifecycle: two enrolled identities; deleting one (user + its
    face rows) and /reload-ing must remove it from the live gallery and
    flip /recognize to the survivor — the reference's own deleteFace
    silently never deleted (src/db.cpp:172); facekit's must actually
    work end to end, not just return 'Success'."""
    async with make_client(face_server) as client:
        datas = {}
        for uid in ("keep", "drop"):
            data, _ = _jpg(rng, hw=(112, 112))
            datas[uid] = data
            p = tmp_path / f"{uid}.jpg"
            p.write_bytes(data)
            await client.post("/insert/user", data=json.dumps(
                {"userId": uid, "userName": uid}))
            r = await client.post("/insert/face", data=json.dumps(
                {"data": [{"userId": uid, "imgPath": str(p)}]}))
            assert "inserted successfully" in await r.text()
        await client.get("/reload")
        n0 = face_server.gallery.count
        assert "drop" in face_server.gallery.names

        # delete drop's face rows by id, then the user, then reload
        with face_server.db._lock:
            ids = [row[0] for row in face_server.db._conn.execute(
                "SELECT IMG_ID FROM FACE WHERE USR_ID='drop'")]
        for fid in ids:
            r = await client.get("/delete/face", params={"id": str(fid)})
            assert await r.text() == "Success\n"
        await client.get("/delete/user", params={"id": "drop"})
        await client.get("/reload")
        assert face_server.gallery.count == n0 - len(ids)
        assert "drop" not in face_server.gallery.names

        # the survivor still recognizes; the deleted identity cannot match
        r = await client.post("/recognize", data=datas["keep"])
        body = json.loads(await r.text())
        assert body["userId"] == "keep"
        r = await client.post("/recognize", data=datas["drop"])
        body = json.loads(await r.text())
        assert body["userId"] != "drop"


async def test_inference_ws(face_server, tmp_path, rng):
    async with make_client(face_server) as client:
        # enroll one gallery face first
        data, img = _jpg(rng, hw=(112, 112))
        path = tmp_path / "w.jpg"
        path.write_bytes(data)
        await client.post("/insert/user", data=json.dumps(
            {"userId": "w", "userName": "W"}))
        await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "w", "imgPath": str(path)}]}))
        await client.get("/reload")

        frame_bytes, _ = _jpg(rng, hw=(240, 320))
        ws = await client.ws_connect("/inference")
        await ws.send_bytes(frame_bytes)
        msg = await ws.receive()
        await ws.close()
        # random weights may detect 0 faces ("null") or some (json reply)
        if msg.data != "null":
            body = json.loads(msg.data)
            assert set(body) == {"image", "userId", "userName", "similarity",
                                 "isUnknown"}
            assert isinstance(body["isUnknown"], bool)


async def test_health(face_server):
    async with make_client(face_server) as client:
        r = await client.get("/health")
        body = json.loads(await r.text())
        assert body["status"] == "ok"


async def test_probe_device_endpoint(face_server):
    """GET /probe/device (facekit extension): host->device link probe the
    loadtest records so published runs carry the link measurement that
    interprets them (the r4 loadtest was transfer-bound on a 10-30 MB/s
    tunnel and the confound had to be measured by hand)."""
    async with make_client(face_server) as client:
        r = await client.get("/probe/device?mb=0.5")
        assert r.status == 200
        body = json.loads(await r.text())
        assert body["bytes"] == int(0.5 * (1 << 20))
        assert body["upload_MBps"] > 0
        assert body["dispatch_ms"] > 0
        assert body["platform"] == "cpu"
        # the probe shares the serving device executor, so an immediate
        # second probe hits the cooldown (r4 advisor finding: an
        # unauthenticated poller must not be able to stall the hot path)
        r2 = await client.get("/probe/device?mb=0.5")
        assert r2.status == 429
        assert "Retry-After" in r2.headers
        for bad in ("mb=nope", "mb=0", "mb=1000"):
            r = await client.get(f"/probe/device?{bad}")
            assert r.status == 400
    # cooldown is configurable; 0 disables (loadtest drives its own probe
    # before the measured phases)
    face_server.config.extras["server_probeCooldownS"] = 0
    try:
        async with make_client(face_server) as client:
            for _ in range(2):   # second call = warmed-dispatch path
                r = await client.get("/probe/device?mb=0.5")
                assert r.status == 200
                assert json.loads(await r.text())["dispatch_ms"] > 0
    finally:
        face_server.config.extras.pop("server_probeCooldownS", None)


def test_visualize_overlay(rng):
    from facekit.server.visualize import draw_results
    frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    boxes = np.array([[10, 10, 100, 120], [150, 30, 250, 180]], np.float32)
    out = draw_results(frame, boxes, ["alice", "bob"], [0.9, 0.3],
                       known_threshold=0.65,
                       valid=np.array([True, True]))
    assert out.shape == frame.shape
    assert (out != frame).any()          # something was drawn
    # invalid slots are skipped
    out2 = draw_results(frame, boxes, ["a", "b"], [0.9, 0.3],
                        valid=np.array([False, False]))
    np.testing.assert_array_equal(out2, frame)


async def test_concurrent_recognize_batching(face_server, tmp_path, rng):
    """Concurrent /recognize requests micro-batch and all answer correctly."""
    import asyncio
    async with make_client(face_server) as client:
        # enroll 4 users with distinct random faces
        datas = {}
        for name in ("u1", "u2", "u3", "u4"):
            data, _ = _jpg(rng, hw=(112, 112))
            p = tmp_path / f"{name}.jpg"
            p.write_bytes(data)
            datas[name] = data
            await client.post("/insert/user", data=json.dumps(
                {"userId": name, "userName": name.upper()}))
            await client.post("/insert/face", data=json.dumps(
                {"data": [{"userId": name, "imgPath": str(p)}]}))
        await client.get("/reload")

        async def ask(name):
            r = await client.post("/recognize", data=datas[name])
            return name, json.loads(await r.text())

        results = await asyncio.gather(*[ask(n) for n in datas] * 2)
        for name, body in results:
            assert body["userId"] == name, (name, body)
            assert body["similarity"] > 0.9


async def test_recognize_png_with_alpha(face_server, rng):
    """IMREAD_UNCHANGED yields BGRA for alpha PNGs; must not 500."""
    img = rng.integers(0, 256, size=(112, 112, 4), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img)
    async with make_client(face_server) as client:
        r = await client.post("/recognize", data=buf.tobytes())
        assert r.status == 200


async def test_search_topk_extension(face_server, tmp_path, rng):
    async with make_client(face_server) as client:
        for name in ("s1", "s2", "s3"):
            data, _ = _jpg(rng, hw=(112, 112))
            p = tmp_path / f"{name}.jpg"
            p.write_bytes(data)
            if name == "s1":
                probe = data
            await client.post("/insert/user", data=json.dumps(
                {"userId": name, "userName": name}))
            await client.post("/insert/face", data=json.dumps(
                {"data": [{"userId": name, "imgPath": str(p)}]}))
        await client.get("/reload")

        r = await client.post("/search?k=3", data=probe)
        body = json.loads(await r.text())
        assert len(body["matches"]) == 3
        assert body["matches"][0]["userId"] == "s1"
        assert body["matches"][0]["similarity"] > 0.9
        sims = [m["similarity"] for m in body["matches"]]
        assert sims == sorted(sims, reverse=True)


async def test_server_with_int8_gallery(tmp_path_factory, tmp_path, rng):
    """The whole serving flow with a quantized gallery."""
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("q") / "q.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="int8", use_pallas_search=False)
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert srv.gallery.quantized
    async with make_client(srv) as client:
        data, _ = _jpg(rng, hw=(112, 112))
        p = tmp_path / "q.jpg"
        p.write_bytes(data)
        await client.post("/insert/user", data=json.dumps(
            {"userId": "q", "userName": "Q"}))
        await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "q", "imgPath": str(p)}]}))
        await client.get("/reload")
        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "q"
        assert body["similarity"] > 0.95


async def test_bucket_growth_through_serving_flow(tmp_path_factory, rng):
    """10k-row gallery: bucket ladder growth + search correctness through
    the server (enrollment via DB directly to keep CI fast)."""
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("big") / "big.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False)
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)

    n = 10_000
    embs = rng.normal(size=(n, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    with srv.db._lock:
        srv.db._conn.executemany(
            "INSERT INTO FACE (USR_ID, IMG_PATH, EMBEDDING) VALUES (?, ?, ?)",
            [(f"u{i}", f"p{i}", embs[i].tobytes()) for i in range(n)])
        srv.db._conn.commit()

    async with make_client(srv) as client:
        r = await client.get("/reload")
        assert await r.text() == "Success\n"
    assert srv.gallery.count == n
    assert srv.gallery.capacity == 65536  # third bucket

    vals, idx, names = srv.gallery.search(
        np.asarray(embs[[1234, 9876]]), k=1)
    assert names[idx[0, 0]] == "u1234"
    assert names[idx[1, 0]] == "u9876"
    np.testing.assert_allclose(vals[:, 0], 1.0, rtol=1e-5)


async def test_ws_pipeline_window_preserves_order(tmp_path_factory, rng):
    """extras.server_wsPipeline > 1: frames on ONE socket process
    concurrently (they batch into one fused device call) but replies come
    back strictly in message order. Verified by matching each reply's
    deterministic similarity to per-frame sequential ground truth."""
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("wsp") / "wsp.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        det_threshold_bbox=0.0,      # random weights must yield detections
        extras={"server_batchSize": 4, "server_wsPipeline": 4})
    from facekit.models.lightdet import lightdet_init
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    emb = rng.normal(size=(3, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    srv.gallery.load(["a", "b", "c"], emb)

    frames = []
    for i in range(8):
        img = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        frames.append(buf.tobytes())

    async with make_client(srv) as client:
        # ground truth: sequential request/reply per frame
        ws = await client.ws_connect("/inference")
        expected = []
        for f in frames:
            await ws.send_bytes(f)
            expected.append((await ws.receive_str()))
        await ws.close()
        assert any(e != "null" for e in expected)  # detections exist

        # pipelined: fire all 8 without reading, then read 8 replies
        ws = await client.ws_connect("/inference")
        for f in frames:
            await ws.send_bytes(f)
        got = [await ws.receive_str() for _ in frames]
        await ws.close()

    def sim(reply):
        return None if reply == "null" else round(
            json.loads(reply)["similarity"], 5)
    assert [sim(g) for g in got] == [sim(e) for e in expected], \
        "pipelined replies out of order or wrong"


async def test_ws_frame_device_error_replies_null(tmp_path_factory, rng):
    """A transient device error mid-frame must map to the WS contract
    "null" (reference src/app.cpp:340-343) and leave the connection
    serving — an escaping exception used to kill the sender task and
    silently hang the socket while the reader kept accepting frames
    (r4 review finding)."""
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("wse") / "e.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        extras={"server_batchSize": 2})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    emb = rng.normal(size=(1, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    srv.gallery.load(["a"], emb)   # non-empty: frames reach the device call

    def boom(frames, snap):
        raise RuntimeError("transient device error")

    srv.serving_recognize = boom
    data, _ = _jpg(rng, hw=(120, 160))
    data2, _ = _jpg(rng, hw=(120, 160))
    async with make_client(srv) as client:
        ws = await client.ws_connect("/inference")
        await ws.send_bytes(data)
        assert await ws.receive_str() == "null"
        # the connection must still be alive and replying
        await ws.send_bytes(data2)
        assert await ws.receive_str() == "null"
        await ws.close()


def test_warm_capacity_waiter_retries_after_owner_failure(
        tmp_path_factory):
    """A waiter on a claimed capacity must NOT treat the claimant's
    FAILURE as success (the failure path pops the claim before setting
    the event): it retries, becoming the new claimant — otherwise a
    /reload racing a failing prewarm would swap the gallery in with
    uncompiled programs (r4 review finding)."""
    import threading
    import time as _time
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("warm") / "w.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False)
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)

    calls = []
    owner_started = threading.Event()
    owner_release = threading.Event()

    def fail_then_ok(arr, count, scales):
        calls.append(1)
        if len(calls) == 1:
            owner_started.set()
            owner_release.wait(20)
            raise RuntimeError("transient compile failure")

    srv._warm_serving_programs = fail_then_ok
    owner_errs = []

    def owner():
        try:
            srv._warm_capacity(8)
        except RuntimeError as e:
            owner_errs.append(e)

    to = threading.Thread(target=owner)
    to.start()
    assert owner_started.wait(20)
    tw = threading.Thread(target=lambda: srv._warm_capacity(8))
    tw.start()
    _time.sleep(0.2)        # let the waiter reach ev.wait()
    owner_release.set()
    to.join(20)
    tw.join(20)
    assert owner_errs, "owner must surface the failure"
    assert len(calls) == 2, "waiter must retry as the new claimant"
    assert srv._warm_events[8].is_set()   # and the retry succeeded


async def test_bucket_growth_never_recompiles_on_serving_path(
        tmp_path_factory, tmp_path, rng):
    """VERDICT r2 weak #1: crossing a gallery capacity bucket must NOT
    stall serving behind a fresh jit compile. The prewarm machinery
    compiles the next bucket's programs in the background once count
    crosses the threshold, so the post-growth serving calls are pure
    jit-cache hits (probed via the pjit cache sizes)."""
    from facekit.models.lightdet import lightdet_init
    from facekit.pipeline.recognize import (_embed_and_match,
                                            _recognize_and_match)
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("grow") / "grow.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        gallery_bucket_sizes=(4, 8, 16),
        extras={"server_batchSize": 2})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")

    embs = rng.normal(size=(6, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)

    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=True)

    def insert_rows(lo, hi):
        with srv.db._lock:
            srv.db._conn.executemany(
                "INSERT INTO FACE (USR_ID, IMG_PATH, EMBEDDING) "
                "VALUES (?, ?, ?)",
                [(f"u{i}", f"p{i}", embs[i].tobytes())
                 for i in range(lo, hi)])
            srv.db._conn.commit()

    async with make_client(srv) as client:
        # 4/4 rows: past the 0.8 threshold -> reload spawns the prewarm
        insert_rows(0, 4)
        await client.get("/reload")
        assert srv.gallery.capacity == 4
        t = srv._prewarm_thread
        assert t is not None, "prewarm thread should have been spawned"
        t.join(timeout=120)
        assert not t.is_alive()
        # entry present + event set == capacity 8 known compiled
        assert srv._warm_events[8].is_set()

        sizes = (_recognize_and_match._cache_size(),
                 _embed_and_match._cache_size())

        # growth: 6 rows -> capacity 8. Serving after the swap must be
        # compile-free on both fused paths.
        insert_rows(4, 6)
        await client.get("/reload")
        assert srv.gallery.capacity == 8
        crop = np.zeros((112, 112, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", crop)
        r = await client.post("/recognize", data=buf.tobytes())
        assert json.loads(await r.text())["userId"].startswith("u")
        frame = np.zeros((120, 160, 3), np.uint8)
        ok, fbuf = cv2.imencode(".jpg", frame)
        ws = await client.ws_connect("/inference")
        await ws.send_bytes(fbuf.tobytes())
        reply = await ws.receive_str()
        assert reply == "null" or "userId" in json.loads(reply)
        await ws.close()
        assert (_recognize_and_match._cache_size(),
                _embed_and_match._cache_size()) == sizes, \
            "serving call after bucket growth triggered a fresh compile"

        # exact gallery search result survives the growth path
        vals, idx, names = srv.gallery.search(embs[[5]], k=1)
        assert names[idx[0, 0]] == "u5"


async def test_server_with_mesh_backed_gallery(tmp_path_factory, tmp_path,
                                               rng):
    """Multi-chip serving config: frames batch-sharded over "data", gallery
    rows over "gallery", on the 8-device virtual mesh. The fused serving
    path must route through the sharded search (ADVICE r1), and both the
    /recognize and WS /inference flows must work end to end."""
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("m") / "m.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        mesh_shape={"data": 2, "gallery": 4},
        extras={"server_batchSize": 4})
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert srv.mesh is not None and dict(srv.mesh.shape) == {
        "data": 2, "gallery": 4}
    assert srv.batch_size % 2 == 0

    async with make_client(srv) as client:
        data, _ = _jpg(rng, hw=(112, 112))
        p = tmp_path / "m.jpg"
        p.write_bytes(data)
        await client.post("/insert/user", data=json.dumps(
            {"userId": "mesh", "userName": "Mesh"}))
        await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "mesh", "imgPath": str(p)}]}))
        await client.get("/reload")
        assert len(srv.gallery._device_arr.sharding.device_set) == 8

        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "mesh"
        assert body["similarity"] > 0.95

        frame_bytes, _ = _jpg(rng, hw=(240, 320))
        ws = await client.ws_connect("/inference")
        await ws.send_bytes(frame_bytes)
        reply = await ws.receive_str()
        assert reply == "null" or "userId" in json.loads(reply)
        await ws.close()


async def test_server_mesh_int8_gallery(tmp_path_factory, tmp_path, rng):
    """mesh x int8: the combination that silently bypassed sharding in r1."""
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("mq") / "mq.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="int8", use_pallas_search=False,
        mesh_shape={"gallery": 8})
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    async with make_client(srv) as client:
        data, _ = _jpg(rng, hw=(112, 112))
        p = tmp_path / "mq.jpg"
        p.write_bytes(data)
        await client.post("/insert/user", data=json.dumps(
            {"userId": "mq", "userName": "MQ"}))
        await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "mq", "imgPath": str(p)}]}))
        await client.get("/reload")
        assert srv.gallery.quantized
        assert len(srv.gallery._scales.sharding.device_set) == 8
        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "mq"
        assert body["similarity"] > 0.95


async def test_server_restart_recovers_state(tmp_path_factory, tmp_path,
                                             rng):
    """Recovery model parity (SURVEY §5.3/5.4): state lives in SQLite, so a
    process restart (new FaceServer over the same DB) restores users and
    gallery without any migration step."""
    db = str(tmp_path_factory.mktemp("restart") / "r.db")
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    cfg = FaceKitConfig(
        database_path=db, input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False)

    srv1 = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    data, _ = _jpg(rng, hw=(112, 112))
    p = tmp_path / "r.jpg"
    p.write_bytes(data)
    async with make_client(srv1) as client:
        await client.post("/insert/user", data=json.dumps(
            {"userId": "ra", "userName": "RA"}))
        await client.post("/insert/face", data=json.dumps(
            {"data": [{"userId": "ra", "imgPath": str(p)}]}))
        await client.get("/reload")
    srv1.db.close() if hasattr(srv1.db, "close") else None

    # "restart": a fresh server over the same database
    srv2 = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert srv2.gallery.count == 1
    assert srv2.user_dict == {"ra": "RA"}
    async with make_client(srv2) as client:
        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "ra"
        assert body["similarity"] > 0.95


def test_profiler_port_option(tmp_path_factory):
    """extras.profiler_port starts a jax.profiler server for live traces.

    Note: jax allows one profiler server per process, never stopped — this
    must stay the only test that sets profiler_port."""
    import socket
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))          # pick a genuinely free port
    port = probe.getsockname()[1]
    probe.close()
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("prof") / "p.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        extras={"profiler_port": port})
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    s = socket.socket()
    try:
        s.settimeout(5)
        s.connect(("127.0.0.1", port))    # the profiler is listening
    finally:
        s.close()


async def test_server_full_int8_with_mesh(tmp_path_factory, tmp_path, rng):
    """The complete low-precision serving point: rec_quantize embedder +
    int8 gallery + sharded mesh, through the real endpoints."""
    from facekit.models.lightdet import lightdet_init
    # tiny models: XLA's CPU int8 convs are slow, and the combination
    # under test (quantized embedder + int8 sharded gallery through the
    # endpoints) is model-size-independent
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("fi") / "fi.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="int8", rec_quantize=True, use_pallas_search=False,
        mesh_shape={"data": 2, "gallery": 4},
        extras={"server_batchSize": 2})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert srv.gallery.quantized
    # enroll via the pipeline directly (the HTTP enrollment path is covered
    # elsewhere; CPU int8-conv compiles are slow, keep this test to ONE
    # embed program): the gallery row IS the quantized-embedder output
    data, _ = _jpg(rng, hw=(112, 112))
    decoded = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    emb = srv.pipeline.embed_cropped(decoded)
    srv.gallery.load(["fi"], emb[None])
    async with make_client(srv) as client:
        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "fi"
        assert body["similarity"] > 0.9


async def test_server_int8_calibration_dir(tmp_path_factory, tmp_path, rng):
    """extras.rec_calibrationDir: the server calibrates the quantized
    embedder at startup (static activation scales) and the endpoint flow
    still identifies the enrolled face."""
    from facekit.models.lightdet import lightdet_init
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    for i in range(3):
        img = rng.integers(0, 256, size=(112, 112, 3)).astype(np.uint8)
        cv2.imwrite(str(calib_dir / f"c{i}.jpg"), img)
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("cal") / "cal.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        rec_quantize=True, use_pallas_search=False,
        extras={"server_batchSize": 2,
                "rec_calibrationDir": str(calib_dir)})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    # every quantized conv carries a static scale after calibration
    assert "ascale" in srv.pipeline.rec_params["input"]["conv"]
    data, _ = _jpg(rng, hw=(112, 112))
    decoded = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    emb = srv.pipeline.embed_cropped(decoded)
    srv.gallery.load(["cal"], emb[None])
    async with make_client(srv) as client:
        r = await client.post("/recognize", data=data)
        body = json.loads(await r.text())
        assert body["userId"] == "cal"
        assert body["similarity"] > 0.9


async def test_mesh_with_bucket_ladder(tmp_path_factory, rng):
    """Mesh-sharded serving + the padded-batch bucket ladder: every
    bucket is rounded to the data-axis multiple, lone requests dispatch
    the small bucket's sharded program, and replies stay correct."""
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("mbk") / "mb.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        use_pallas_search=False,
        mesh_shape={"data": 2, "gallery": 4},
        extras={"server_batchSize": 4,
                "server_batchBuckets": [1, 3]})   # round -> [2, 4]
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert srv.batch_buckets == [2, 4] and srv.batch_size == 4

    emb = rng.normal(0, 1, size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    srv.gallery.load(["ma", "mb"], emb)

    dispatched = []
    orig = srv.pipeline.embed_and_match

    def spy(crops, *a, **k):
        dispatched.append(crops.shape[0])
        return orig(crops, *a, **k)

    srv.pipeline.embed_and_match = spy
    data, _ = _jpg(rng, hw=(112, 112))
    async with make_client(srv) as client:
        r = await client.post("/recognize", data=data)
        assert json.loads(await r.text())["userId"] in ("ma", "mb")
    assert dispatched[-1] == 2   # lone request -> small (rounded) bucket


async def test_server_missing_calibration_dir_degrades(tmp_path_factory,
                                                       rng):
    """A configured-but-absent rec_calibrationDir must not refuse startup:
    the server logs a warning and serves with dynamic activation scales."""
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("nocal") / "n.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        rec_quantize=True, use_pallas_search=False,
        extras={"server_batchSize": 2,
                "rec_calibrationDir": "/nonexistent/calib"})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert "ascale" not in srv.pipeline.rec_params["input"]["conv"]
    data, _ = _jpg(rng, hw=(112, 112))
    decoded = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    emb = srv.pipeline.embed_cropped(decoded)
    srv.gallery.load(["nc"], emb[None])
    async with make_client(srv) as client:
        r = await client.post("/recognize", data=data)
        assert json.loads(await r.text())["userId"] == "nc"


async def test_batch_bucket_ladder(tmp_path_factory, rng):
    """server_batchBuckets: a lone request pads to the SMALL bucket's
    program (low latency); bursts pad to a larger bucket; every dispatch
    shape is a configured bucket."""
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("bkt") / "b.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        use_pallas_search=False,
        extras={"server_batchSize": 4, "server_batchBuckets": [1, 2, 4]})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    srv = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)
    assert srv.batch_buckets == [1, 2, 4] and srv.batch_size == 4
    emb = rng.normal(0, 1, size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    srv.gallery.load(["a", "b"], emb)

    dispatched = []
    orig = srv.pipeline.embed_and_match

    def spy(crops, *a, **k):
        dispatched.append(crops.shape[0])
        return orig(crops, *a, **k)

    srv.pipeline.embed_and_match = spy
    data, _ = _jpg(rng, hw=(112, 112))
    async with make_client(srv) as client:
        r = await client.post("/recognize", data=data)
        assert json.loads(await r.text())["userId"] in ("a", "b")
        assert dispatched[-1] == 1   # lone request -> batch-1 program
        import asyncio
        rs = await asyncio.gather(*[client.post("/recognize", data=data)
                                    for _ in range(4)])
        for r in rs:
            json.loads(await r.text())
    assert set(dispatched) <= {1, 2, 4}, dispatched
    assert sum(dispatched) >= 5               # 1 + the burst


def test_int8_residual_requires_calibration_config():
    """extras.rec_int8Residual is consumed inside calibrate_embedder
    only; a config that can never reach calibration (no rec_quantize or
    no rec_calibrationDir) must refuse loudly instead of silently
    serving plain int8 while the operator believes residual mode is on
    (r4 review finding)."""
    from facekit.server.app import calibrate_from_config
    for quant in (False, True):   # missing dir, with and without quantize
        cfg = FaceKitConfig(rec_quantize=quant,
                            extras={"rec_int8Residual": True})
        with pytest.raises(ValueError, match="rec_int8Residual"):
            # the check fires before the pipeline is touched
            calibrate_from_config(None, cfg)


def test_throughput_config_profile_loads():
    """configs/throughput.json parses: typed fields land, serving knobs
    land in extras, and it selects the measured throughput configuration
    (batch-64, int8 embedder + gallery)."""
    from facekit.config import load_config
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "throughput.json"))
    assert cfg.rec_quantize is True
    assert cfg.gallery_dtype == "int8"
    assert cfg.compute_dtype == "bfloat16"
    assert int(cfg.extras["server_batchSize"]) == 64
    assert cfg.extras["rec_calibrationDir"]
    # both shipped profiles ship the batch-1 lone-request bucket (r4)
    assert list(cfg.extras["server_batchBuckets"])[0] == 1
    dcfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                    "configs", "default.json"))
    assert list(dcfg.extras["server_batchBuckets"]) == [1, 8]


def test_config_roundtrip_new_fields(tmp_path):
    """Round-2 config fields load from JSON files (det_nmsTopK/Exact,
    rec_quantize, mesh_shape) and reference JSONs still work verbatim."""
    from facekit.config import load_config
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "det_nmsTopK": 256, "det_nmsExact": False, "rec_quantize": True,
        "mesh_shape": {"data": 2, "gallery": 4},
        "gallery_dtype": "int8",
        "det_engine": "legacy.engine",          # reference key -> extras
        "server_batchWaitMs": 1.5,              # unknown -> extras
    }))
    cfg = load_config(str(p))
    assert cfg.det_nmsTopK == 256 and cfg.det_nmsExact is False
    assert cfg.rec_quantize is True
    assert cfg.mesh_shape == {"data": 2, "gallery": 4}
    assert cfg.extras["det_engine"] == "legacy.engine"
    assert cfg.extras["server_batchWaitMs"] == 1.5

    ref = load_config("/root/reference/app/config.json")
    assert ref.det_maxFacesPerScene >= 1           # reference schema loads
    assert ref.det_nmsTopK == 128 and ref.det_nmsExact is True  # defaults


async def test_python_demo_client_flow(face_server, tmp_path, rng,
                                        monkeypatch):
    """The Python demo client (reference main.cpp role): POST /recognize,
    parse the reply, write the annotated vis image."""
    from aiohttp.test_utils import TestServer as _TS
    from facekit.server import client as democlient

    ts = _TS(make_app(face_server))
    await ts.start_server()
    try:
        data, img = _jpg(rng, hw=(112, 112))
        p = tmp_path / "demo.jpg"
        p.write_bytes(data)
        face_server.gallery.load(
            ["demo"], np.asarray(
                face_server.pipeline.embed_cropped(
                    cv2.imdecode(np.frombuffer(data, np.uint8),
                                 cv2.IMREAD_COLOR)))[None])
        out_path = str(tmp_path / "vis.jpg")
        # the demo client is synchronous urllib: run it off the event loop
        # (the TestServer serves on THIS loop — calling it inline deadlocks)
        import asyncio
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None, democlient.recognize, ts.host, ts.port, str(p), out_path)
        assert result["userId"] == "demo"
        assert result["similarity"] > 0.9
        vis = cv2.imread(out_path)
        assert vis is not None and vis.shape[-1] == 3   # annotated output
    finally:
        await ts.close()
