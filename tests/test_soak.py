"""Bounded soak: sustained mixed traffic must not grow process memory.

The reference leaks per call BY DESIGN (featureMatching ``new``s
m_outputs every call and /reload re-news the gallery + re-cudaMallocs
without freeing — SURVEY.md §2 quirks). facekit's claim is the opposite:
stateless jitted programs, immutable snapshot arrays, atomic swaps. This
test demonstrates it: after a warmup phase (compiles + allocator
high-water), hundreds of mixed requests (/recognize, WS /inference,
periodic /reload and gallery appends) must leave RSS within a small
envelope.
"""

import asyncio
import json
import resource
import time

import numpy as np
import pytest


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


async def test_soak_memory_and_latency_stable(tmp_path_factory, rng):
    import cv2
    import jax
    from aiohttp.test_utils import TestClient, TestServer
    from facekit.config import FaceKitConfig
    from facekit.models import arcface_init
    from facekit.models.lightdet import lightdet_init
    from facekit.server import FaceServer, make_app

    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("soak") / "soak.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        extras={"server_batchSize": 4})
    srv = FaceServer(cfg, det_params=lightdet_init(jax.random.PRNGKey(0),
                                                   variant="slim"),
                     rec_params=arcface_init(jax.random.PRNGKey(1),
                                             network="ir_tiny"),
                     warmup=False)
    # seed gallery directly (HTTP enrollment is covered elsewhere)
    emb = rng.normal(0, 1, size=(4, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    srv.gallery.load([f"u{i}" for i in range(4)], emb)

    frames = []
    for i in range(4):
        img = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        frames.append(buf.tobytes())

    client = TestClient(TestServer(make_app(srv)))
    await client.start_server()
    try:
        async def burst(n):
            async def one(i):
                if i % 7 == 3:   # WS /inference (full detect path)
                    async with client.ws_connect("/inference") as ws:
                        await ws.send_bytes(frames[i % 4])
                        await ws.receive(timeout=120)
                else:            # POST /recognize (embed path)
                    r = await client.post("/recognize",
                                          data=frames[i % 4])
                    json.loads(await r.text())
            await asyncio.gather(*[one(i) for i in range(n)])

        # warmup: compiles + allocator high-water mark
        await burst(12)
        await client.get("/reload")
        rss0 = _rss_mb()

        t0 = time.perf_counter()
        n_requests = 0
        for round_ in range(6):
            await burst(30)
            n_requests += 30
            # mutate state the way long-lived deployments do
            srv.gallery.add(f"x{round_}", emb[round_ % 4])
            await client.get("/reload")
        elapsed = time.perf_counter() - t0

        growth = _rss_mb() - rss0
        assert growth < 96.0, (
            f"RSS grew {growth:.1f} MB over {n_requests} requests "
            f"(+{6} reloads/appends) — leak?")
        # throughput floor: far from a hang (tiny models on 1 CPU core)
        assert elapsed < 120.0, elapsed
    finally:
        await client.close()
