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
