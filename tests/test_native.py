"""Native C++ host-ops vs cv2/numpy/JAX oracles."""

import os

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
    tb, ts, keep, _ = jax_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4,
                           top_k=n)
    ref_scores = np.asarray(ts)[np.asarray(keep)]
    np.testing.assert_allclose(scores[kept], ref_scores, rtol=1e-6)


def test_native_jpeg_decode_bit_identical_to_cv2(rng):
    """Both decoders are libjpeg-turbo family: decode must be BIT-identical
    (measured 0 max diff), which makes native-served responses match
    cv2-served ones exactly for unresized JPEG frames."""
    img = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    data = buf.tobytes()
    ours = native.decode_jpeg_bgr(data)
    ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(ours, ref)
    # grayscale JPEG -> BGR expansion, also exact
    okg, bufg = cv2.imencode(".jpg", img[:, :, 0])
    g = native.decode_jpeg_bgr(bufg.tobytes())
    refg = cv2.cvtColor(cv2.imdecode(np.frombuffer(bufg.tobytes(),
                                                   np.uint8),
                                     cv2.IMREAD_GRAYSCALE),
                        cv2.COLOR_GRAY2BGR)
    np.testing.assert_array_equal(g, refg)


def test_native_jpeg_decode_fused_resize(rng):
    img = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    data = cv2.imencode(".jpg", img)[1].tobytes()
    ours = native.decode_jpeg_bgr(data, (80, 60))
    ref = cv2.resize(cv2.imdecode(np.frombuffer(data, np.uint8),
                                  cv2.IMREAD_COLOR), (80, 60))
    assert ours.shape == (60, 80, 3) and ours.dtype == np.uint8
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_native_jpeg_rejects_garbage():
    assert native.decode_jpeg_bgr(b"not a jpeg") is None
    ok_img = np.zeros((16, 16, 3), np.uint8)
    data = cv2.imencode(".jpg", ok_img)[1].tobytes()
    assert native.decode_jpeg_bgr(data[:40]) is None   # truncated
    # PNG payloads are out of the JPEG-only codec's contract -> None
    png = cv2.imencode(".png", ok_img)[1].tobytes()
    assert native.decode_jpeg_bgr(png) is None


def test_native_jpeg_encode_roundtrip(rng):
    img = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
    enc = native.encode_jpeg_bgr(img)
    assert enc is not None and enc[:2] == b"\xff\xd8"
    back = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_COLOR)
    assert back.shape == img.shape
    # lossy codec on noise: just require the same ballpark cv2's own
    # roundtrip achieves at the shared default quality (95)
    cv2_back = cv2.imdecode(cv2.imencode(".jpg", img)[1], cv2.IMREAD_COLOR)
    ours_err = np.abs(back.astype(int) - img.astype(int)).mean()
    cv2_err = np.abs(cv2_back.astype(int) - img.astype(int)).mean()
    assert ours_err <= cv2_err * 1.5 + 1


def test_native_gallery_top1(rng):
    gallery = rng.normal(size=(5000, 512)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    queries = gallery[[7, 42, 4999]] + rng.normal(0, 0.01, (3, 512)).astype(np.float32)
    scores, idx = native.gallery_top1(gallery, queries)
    ref = queries @ gallery.T
    np.testing.assert_array_equal(idx, ref.argmax(1))
    np.testing.assert_allclose(scores, ref.max(1), rtol=1e-5)


class TestNativeClient:
    """Build the C++ demo client and drive it against a live server —
    the reference's client-process e2e check (src/main.cpp:11-56), natively."""

    @pytest.fixture(scope="class")
    def client_bin(self, tmp_path_factory):
        import subprocess
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "facekit", "native", "client.cpp")
        out = str(tmp_path_factory.mktemp("bin") / "facekit_client")
        try:
            r = subprocess.run(
                ["g++", "-std=c++17", "-O2", "-o", out, src],
                check=False, capture_output=True, timeout=120)
        except FileNotFoundError:
            pytest.skip("no C++ toolchain (g++ missing)")
        # a compile ERROR must fail the test, not silently skip coverage
        assert r.returncode == 0, r.stderr.decode()
        return out

    async def test_http_and_ws_against_live_server(self, client_bin,
                                                   tmp_path_factory,
                                                   tmp_path, rng):
        import asyncio
        import json
        import cv2
        import jax
        from aiohttp.test_utils import TestClient, TestServer
        from facekit.config import FaceKitConfig
        from facekit.models import arcface_init, retinaface_init
        from facekit.server import FaceServer, make_app

        cfg = FaceKitConfig(
            database_path=str(tmp_path_factory.mktemp("nc") / "nc.db"),
            input_frameWidth=320, input_frameHeight=240,
            det_inputShape=(3, 192, 192), compute_dtype="float32",
            gallery_dtype="float32", use_pallas_search=False)
        srv = FaceServer(cfg,
                         det_params=retinaface_init(jax.random.PRNGKey(0)),
                         rec_params=arcface_init(jax.random.PRNGKey(1)),
                         warmup=False)
        img = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        img_path = tmp_path / "native.jpg"
        img_path.write_bytes(buf.tobytes())

        client = TestClient(TestServer(make_app(srv)))
        await client.start_server()
        try:
            await client.post("/insert/user", data=json.dumps(
                {"userId": "native", "userName": "Native"}))
            await client.post("/insert/face", data=json.dumps(
                {"data": [{"userId": "native",
                           "imgPath": str(img_path)}]}))
            await client.get("/reload")
            host, port = client.server.host, client.server.port

            async def run_native(*extra):
                proc = await asyncio.create_subprocess_exec(
                    client_bin, host, str(port), str(img_path), *extra,
                    stdout=asyncio.subprocess.PIPE,
                    stderr=asyncio.subprocess.PIPE)
                out, err = await asyncio.wait_for(proc.communicate(), 120)
                assert proc.returncode == 0, err.decode()
                return out.decode().strip().splitlines()

            # HTTP /recognize
            lines = await run_native("--repeat", "2")
            assert len(lines) == 2
            for ln in lines:
                body = json.loads(ln)
                assert body["userId"] == "native"
                assert body["similarity"] > 0.95

            # WS /inference (full-frame random image; reply is json or null)
            frame = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
            ok, fbuf = cv2.imencode(".jpg", frame)
            fpath = tmp_path / "frame.jpg"
            fpath.write_bytes(fbuf.tobytes())
            proc = await asyncio.create_subprocess_exec(
                client_bin, host, str(port), str(fpath), "--ws",
                stdout=asyncio.subprocess.PIPE,
                stderr=asyncio.subprocess.PIPE)
            out, err = await asyncio.wait_for(proc.communicate(), 180)
            assert proc.returncode == 0, err.decode()
            reply = out.decode().strip()
            assert reply == "null" or "userId" in json.loads(reply)
        finally:
            await client.close()


async def test_server_serves_through_native_pixels(tmp_path_factory,
                                                   tmp_path, rng):
    """The native host runtime in the REAL serving path: a server with
    extras.server_hostOps="native" (decode, resize, reply-encode all via
    facekit.native, zero cv2 in the data path) answers /insert/face,
    /recognize and WS /inference — and, because native JPEG decode is
    bit-identical to cv2's, the match results equal the cv2-backed
    server's."""
    import json
    import jax
    from aiohttp.test_utils import TestClient, TestServer
    from facekit.config import FaceKitConfig
    from facekit.models import arcface_init
    from facekit.models.lightdet import lightdet_init
    from facekit.server import FaceServer, make_app

    def cfg(db, host_ops=None):
        extras = {"server_batchSize": 2}
        if host_ops:
            extras["server_hostOps"] = host_ops
        return FaceKitConfig(
            database_path=db, det_network="slim", rec_network="ir_tiny",
            det_inputShape=(3, 64, 64), input_frameWidth=160,
            input_frameHeight=120, compute_dtype="float32",
            gallery_dtype="float32", use_pallas_search=False,
            det_threshold_bbox=0.05, extras=extras)

    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    db_dir = tmp_path_factory.mktemp("nativedb")
    nat = FaceServer(cfg(str(db_dir / "n.db"), "native"), det_params=det,
                     rec_params=rec, warmup=False)
    ref = FaceServer(cfg(str(db_dir / "c.db")), det_params=det,
                     rec_params=rec, warmup=False)
    assert nat.pixels.name == "native" and ref.pixels.name == "cv2"

    img = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
    path = str(tmp_path / "face.jpg")
    cv2.imwrite(path, img)
    frame = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    frame_jpg = cv2.imencode(".jpg", frame)[1].tobytes()
    crop_jpg = cv2.imencode(".jpg", img)[1].tobytes()

    outs = {}
    for name, srv in (("native", nat), ("cv2", ref)):
        client = TestClient(TestServer(make_app(srv)))
        await client.start_server()
        try:
            r = await client.post("/insert/user", data=json.dumps(
                {"userId": "u", "userName": "U"}))
            assert "inserted" in await r.text()
            r = await client.post("/insert/face", data=json.dumps(
                {"data": [{"userId": "u", "imgPath": path}]}))
            assert "inserted successfully" in await r.text()
            await client.get("/reload")
            r = await client.post("/recognize", data=crop_jpg)
            rec_body = json.loads(await r.text())
            ws = await client.ws_connect("/inference")
            await ws.send_bytes(frame_jpg)
            ws_body = json.loads((await ws.receive()).data)
            await ws.close()
            outs[name] = (rec_body, ws_body)
        finally:
            await client.close()

    # decode parity -> identical device results on both backends
    assert outs["native"][0] == outs["cv2"][0]
    n_ws, c_ws = outs["native"][1], outs["cv2"][1]
    img_n, img_c = n_ws.pop("image"), c_ws.pop("image")
    assert n_ws == c_ws
    # reply crops: same pixels, each encoded by its own backend
    import base64
    dec_n = cv2.imdecode(np.frombuffer(base64.b64decode(img_n), np.uint8),
                         cv2.IMREAD_COLOR)
    dec_c = cv2.imdecode(np.frombuffer(base64.b64decode(img_c), np.uint8),
                         cv2.IMREAD_COLOR)
    assert dec_n.shape == dec_c.shape
    assert np.abs(dec_n.astype(int) - dec_c.astype(int)).mean() < 12.0
