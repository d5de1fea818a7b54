"""Serving load generator: client-side latency + server /metrics capture.

Drives a RUNNING facekit server (``python -m facekit.server``) the way the
reference's clients do — HTTP ``POST /recognize`` with raw image bytes and
WS ``/inference`` frames (``src/main.cpp``/``src/webclient.cpp``) — at a
ladder of concurrency levels, and reports both client-observed latency and
the server's own ``/metrics`` percentiles.

Measurement rules for the dev-TPU tunnel (CLAUDE.md): every request body is
UNIQUE (the tunnel serves identical remote executions from cache, so a
repeated JPEG would measure a cache hit, not the serving path) — payloads
are pre-encoded before the clock starts so client-side JPEG work doesn't
contend with the server on small hosts.

Usage (against a live server):

    python -m facekit.server.loadtest --port 18080 \
        --concurrency 1,8,64 --requests 32,96,256 [--grow]

``--grow`` inserts faces and issues ``/reload`` sized to cross the next
gallery capacity bucket DURING the middle load phase — the operational
event the bucket-prewarm machinery (server/app.py) keeps off the serving
path; latency percentiles before/after quantify it.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from typing import Dict, List, Optional

import numpy as np


def _percentiles(xs: List[float]) -> Dict[str, float]:
    a = np.asarray(xs) * 1e3
    return {"n": len(xs), "p50_ms": float(np.percentile(a, 50)),
            "p90_ms": float(np.percentile(a, 90)),
            "p99_ms": float(np.percentile(a, 99)),
            "mean_ms": float(a.mean())}


def make_payloads(n: int, hw, seed: int = 0) -> List[bytes]:
    """n unique JPEG payloads of (h, w) noise-perturbed frames.

    Uniqueness is verified on the ENCODED bytes (a fixed perturbation
    walk repeats after a few thousand payloads, and JPEG quantization
    could collapse near-identical perturbations), so the tunnel's
    identical-execution cache can never be hit within one pool."""
    import cv2
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(*hw, 3)).astype(np.uint8)
    bh, bw = min(8, hw[0]), min(8, hw[1])
    out = []
    seen = set()
    for i in range(n):
        for _ in range(100):   # re-roll on (rare) post-encode collision
            img = base.copy()
            y = int(rng.integers(0, max(hw[0] - bh, 1)))
            x = int(rng.integers(0, max(hw[1] - bw, 1)))
            img[y:y + bh, x:x + bw] = rng.integers(0, 256, (bh, bw, 3))
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            b = buf.tobytes()
            if b not in seen:
                break
        seen.add(b)
        out.append(b)
    return out


async def run_http_phase(session, url: str, payloads: List[bytes],
                         concurrency: int) -> Dict[str, float]:
    """POST /recognize at fixed concurrency; returns latency percentiles."""
    times: List[float] = []
    shed = 0
    errors = 0
    it = iter(payloads)

    async def worker():
        nonlocal shed, errors
        while True:
            try:
                body = next(it)
            except StopIteration:
                return
            t0 = time.perf_counter()
            async with session.post(url + "/recognize", data=body) as r:
                await r.read()
                # a 503 shed mid-ladder is data, not a crash: latency
                # percentiles cover ACCEPTED requests only
                if r.status == 200:
                    times.append(time.perf_counter() - t0)
                elif r.status == 503:
                    shed += 1
                else:
                    errors += 1

    await asyncio.gather(*[worker() for _ in range(concurrency)])
    stats = _percentiles(times) if times else {"n": 0}
    stats["shed"] = shed
    stats["errors"] = errors
    return stats


async def run_ws_phase(session, url: str, payloads: List[bytes],
                       concurrency: int, depth: int = 1,
                       return_raw: bool = False) -> Dict[str, float]:
    """WS /inference: one socket per worker. ``depth`` = frames in flight
    per socket (1 == the reference client's request/reply protocol,
    src/webclient.cpp; >1 models a streaming camera feed and requires
    the server's ``server_wsPipeline`` window to actually overlap).

    ``return_raw`` adds the raw sample lists under ``_times_s`` /
    ``_null_times_s`` so the caller can re-fold nulls once it knows the
    phase's shed count (see the ladder loop)."""
    from collections import deque
    times: List[float] = []
    null_times: List[float] = []
    it = iter(payloads)

    async def worker():
        ws_url = url.replace("http", "ws", 1) + "/inference"
        async with session.ws_connect(ws_url, max_msg_size=64 << 20) as ws:
            inflight: deque = deque()
            exhausted = False
            while True:
                while not exhausted and len(inflight) < depth:
                    try:
                        body = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    await ws.send_bytes(body)
                    inflight.append(time.perf_counter())
                if not inflight:
                    return
                msg = await ws.receive()
                dt = time.perf_counter() - inflight.popleft()
                # "null" = no-face reply OR a queue shed (WS has no status
                # codes); shed replies return near-instantly, so mixing
                # them into the percentile sample would deflate it (r4
                # advisor finding) — keep them out, like the HTTP phase's
                # accepted-only accounting, and report them separately
                (null_times if msg.data == "null" else times).append(dt)

    await asyncio.gather(*[worker() for _ in range(concurrency)])
    stats = _percentiles(times) if times else {"n": 0}
    # compare null_replies with the server's /metrics shed_count to
    # disambiguate no-face nulls from shed nulls
    stats["null_replies"] = len(null_times)
    if null_times:
        stats["null_p50_ms"] = _percentiles(null_times)["p50_ms"]
    if return_raw:
        stats["_times_s"] = times
        stats["_null_times_s"] = null_times
    return stats


async def run_overload_phase(session, url: str, payloads: List[bytes],
                             concurrency: int) -> Dict:
    """Offered load >> capacity: fire every payload from ``concurrency``
    workers with no pacing and count shed (503) vs accepted replies.

    The point of the bounded batcher queue (server_maxQueueDepth): the
    server must shed the excess and keep latency for ACCEPTED requests
    bounded, instead of converting overload into unbounded queueing for
    everyone (r3 measured 16-24 s queue waits at concurrency 64 with the
    unbounded queue)."""
    accepted: List[float] = []
    shed = 0
    other = 0
    it = iter(payloads)

    async def worker():
        nonlocal shed, other
        while True:
            try:
                body = next(it)
            except StopIteration:
                return
            t0 = time.perf_counter()
            async with session.post(url + "/recognize", data=body) as r:
                await r.read()
                if r.status == 200:
                    accepted.append(time.perf_counter() - t0)
                elif r.status == 503:
                    shed += 1
                else:
                    other += 1

    t0 = time.perf_counter()
    await asyncio.gather(*[worker() for _ in range(concurrency)])
    wall = time.perf_counter() - t0
    out = {"offered": len(payloads), "concurrency": concurrency,
           "accepted": len(accepted), "shed": shed, "errors": other,
           "wall_s": wall,
           "accepted_per_s": len(accepted) / max(wall, 1e-9)}
    if accepted:
        out["accepted_latency"] = _percentiles(accepted)
    return out


async def grow_gallery(session, url: str, crops: List[bytes], tmp_dir: str,
                       count: int, prefix: str = "lt") -> Dict[str, float]:
    """Insert ``count`` faces (unique crops written to tmp files, distinct
    ``prefix`` per phase so userIds never collide) and /reload — the
    bucket-growth event, timed."""
    import os
    t0 = time.perf_counter()
    for i, body in enumerate(crops[:count]):
        p = os.path.join(tmp_dir, f"{prefix}_grow_{i}.jpg")
        with open(p, "wb") as f:
            f.write(body)
        async with session.post(url + "/insert/user", data=json.dumps(
                {"userId": f"{prefix}{i}", "userName": f"LT {i}"})) as r:
            txt = await r.text()   # close + sanity-check; a rerun
            # against a persistent db re-seeds the same userIds
            assert "inserted" in txt or "already in database" in txt, txt
        async with session.post(url + "/insert/face", data=json.dumps(
                {"data": [{"userId": f"{prefix}{i}", "imgPath": p}]})) as r:
            assert "inserted successfully" in await r.text()
    insert_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    async with session.get(url + "/reload") as r:
        assert (await r.text()) == "Success\n"
    return {"insert_s": insert_s, "reload_s": time.perf_counter() - t0}


async def amain(args) -> Dict:
    import aiohttp
    import tempfile

    url = f"http://{args.host}:{args.port}"
    conc = [int(c) for c in args.concurrency.split(",")]
    reqs = [int(r) for r in args.requests.split(",")]
    assert len(conc) == len(reqs)
    if args.grow and args.grow_count <= 4:
        # 4 payloads seed the gallery; the growth phase inserts
        # grow_count - 4 — a smaller value would silently measure nothing
        raise SystemExit("--grow needs --grow-count > 4 "
                         "(4 payloads are used for the initial seed)")

    timeout = aiohttp.ClientTimeout(total=None, sock_read=600)
    results: Dict = {"phases": []}
    async with aiohttp.ClientSession(timeout=timeout) as session:
        async with session.get(url + "/health") as r:
            health = json.loads(await r.text())
        results["health"] = health

        # host->device link probe (GET /probe/device): serving latency on
        # a dev host is often dominated by the accelerator link, not the
        # pipeline (r4 measured a 10-30 MB/s tunnel that made every
        # dispatch transfer-bound) — record the link next to the
        # percentiles so the run is interpretable on its own
        if args.probe_mb > 0:
            link: Optional[List[Dict]] = []
            attempts = 0
            while link is not None and len(link) < 3 and attempts < 8:
                attempts += 1
                async with session.get(
                        url + f"/probe/device?mb={args.probe_mb}") as r:
                    if r.status == 429:   # probe cooldown: honor and retry
                        wait = float(r.headers.get("Retry-After", "10"))
                        await asyncio.sleep(min(wait, 30.0))
                    elif r.status != 200:  # server predates the endpoint
                        link = None
                    else:
                        link.append(json.loads(await r.text()))
            if link:
                ups = [p["upload_MBps"] for p in link]
                rtts = [p["dispatch_ms"] for p in link]
                results["link"] = {
                    "probe_mb": args.probe_mb,
                    "platform": link[0]["platform"],
                    "upload_MBps_best": max(ups),
                    "upload_MBps_median": float(np.median(ups)),
                    "dispatch_ms_best": min(rtts),
                    "dispatch_ms_median": float(np.median(rtts)),
                }
                # gate on link health (r4: a 10-30 MB/s tunnel made every
                # dispatch transfer-bound and the protocol shape
                # unmeasurable — that run should have refused itself)
                min_mbps = getattr(args, "min_link_mbps", 200.0)
                degraded = (link[0]["platform"] != "cpu"
                            and max(ups) < min_mbps)
                if degraded:
                    results["link"]["degraded"] = True
                    results["link"]["note"] = (
                        f"accelerator link below {min_mbps} "
                        "MB/s: percentiles measure the LINK, not the "
                        "serving protocol")
                    print(f"# WARNING: {results['link']['note']}",
                          file=sys.stderr, flush=True)
                    if getattr(args, "require_link", False):
                        results["aborted"] = "link degraded"
                        return results

        # payload pools (pre-encoded; /recognize takes crops, WS frames)
        crop_hw = tuple(args.crop_hw)
        frame_hw = tuple(args.frame_hw)
        n_total = sum(reqs)
        crops = make_payloads(n_total + args.grow_count, crop_hw, seed=1)
        frames = make_payloads(n_total, frame_hw, seed=2)

        # seed the gallery so /recognize has something to match
        with tempfile.TemporaryDirectory() as td:
            await grow_gallery(session, url, crops[n_total:], td,
                               min(4, args.grow_count), prefix="seed")
        # warm both serving programs once (compile if cold) off the
        # clock — with DEDICATED payloads: reusing crops[0]/frames[0]
        # would make phase 1 re-send the warmup body, and the dev tunnel
        # serves identical executions from cache (one artificially fast
        # sample in the first phase's percentiles — the uniqueness rule
        # this file's docstring states applies to the warmup too)
        warm_crop = make_payloads(1, crop_hw, seed=7)
        warm_frame = make_payloads(1, frame_hw, seed=8)
        async with session.post(url + "/recognize", data=warm_crop[0]) as r:
            await r.read()
        await run_ws_phase(session, url, warm_frame, 1)

        async def shed_total():
            async with session.get(url + "/metrics") as r:
                m = json.loads(await r.text())
            return sum(v.get("shed_count", 0) for v in m.values()
                       if isinstance(v, dict))

        off = 0
        grow_info = None
        for li, (c, n) in enumerate(zip(conc, reqs)):
            shed0 = await shed_total()
            http_stats = await run_http_phase(
                session, url, crops[off:off + n], c)
            shed_http = await shed_total()
            ws_stats = await run_ws_phase(
                session, url, frames[off:off + n], c,
                depth=args.ws_pipeline, return_raw=True)
            ws_shed = await shed_total() - shed_http
            raw_t = ws_stats.pop("_times_s")
            raw_n = ws_stats.pop("_null_times_s")
            # "null" mixes near-instant SHEDS with FULL-COST no-face
            # replies (WS has no status codes). The server's shed count
            # disambiguates: zero sheds during the WS phase means every
            # null paid the whole decode+dispatch, so fold them back
            # into the latency sample (with random-init weights at the
            # production threshold EVERY reply is a no-face null, and an
            # all-excluded sample would report n=0); any shed keeps the
            # exclusion (r4 advisor finding) with the ambiguity stated.
            if raw_n and ws_shed == 0:
                merged = _percentiles(raw_t + raw_n)
                merged["null_replies"] = len(raw_n)
                merged["null_p50_ms"] = ws_stats.get("null_p50_ms")
                merged["nulls_in_sample"] = (
                    "no sheds during WS phase: nulls are full-cost "
                    "no-face replies, included")
                ws_stats = merged
            elif raw_n:
                ws_stats["nulls_excluded"] = (
                    "server shed during WS phase: nulls mix sheds with "
                    "no-face replies, percentiles are accepted-only")
            ws_stats["ws_shed_delta"] = ws_shed
            phase = {"concurrency": c, "http_recognize": http_stats,
                     "ws_inference": ws_stats,
                     "server_shed_delta": await shed_total() - shed0}
            results["phases"].append(phase)
            off += n
            if args.grow and grow_info is None:
                # bucket growth between the first and second phases: the
                # later phases' percentiles show whether growth cost the
                # serving path anything (with prewarm it must not)
                with tempfile.TemporaryDirectory() as td:
                    grow_info = await grow_gallery(
                        session, url, crops[n_total + 4:], td,
                        args.grow_count - 4, prefix="grow")
                results["grow"] = grow_info
        if args.overload:
            ov_payloads = make_payloads(args.overload, crop_hw, seed=3)
            results["overload"] = await run_overload_phase(
                session, url, ov_payloads, args.overload_concurrency)
        async with session.get(url + "/metrics") as r:
            results["server_metrics"] = json.loads(await r.text())
        async with session.get(url + "/health") as r:
            results["health_after"] = json.loads(await r.text())
    return results


def main(argv=None):
    ap = argparse.ArgumentParser("facekit load test")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=18080)
    ap.add_argument("--concurrency", default="1,8,64")
    ap.add_argument("--requests", default="32,96,256")
    ap.add_argument("--crop-hw", type=int, nargs=2, default=(112, 112))
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--grow", action="store_true",
                    help="insert faces + /reload between the first and "
                         "second phases. To actually cross a capacity "
                         "bucket, --grow-count must exceed the server's "
                         "FIRST gallery bucket (the shipped configs use "
                         "the default ladder starting at 1024 — serve a "
                         "config with small gallery_bucket_sizes, e.g. "
                         "[16, 64, ...], for a growth drill)")
    ap.add_argument("--grow-count", type=int, default=16)
    ap.add_argument("--overload", type=int, default=0,
                    help="after the ladder, fire N /recognize requests at "
                         "--overload-concurrency with no pacing (offered "
                         "load >> capacity): reports accepted-request "
                         "percentiles + shed (503) count. With the "
                         "server's bounded queue the accepted p99 stays "
                         "~max_queue/throughput; sheds are nonzero only "
                         "when in-flight load exceeds the server's "
                         "server_maxQueueDepth (default 32x batch), so "
                         "size --overload-concurrency above it")
    ap.add_argument("--overload-concurrency", type=int, default=128)
    ap.add_argument("--probe-mb", type=float, default=8.0,
                    help="size of the host->device link probe "
                         "(GET /probe/device) recorded as results['link']; "
                         "0 disables")
    ap.add_argument("--ws-pipeline", type=int, default=1,
                    help="frames in flight per WS socket (>1 needs the "
                         "server's extras.server_wsPipeline window)")
    ap.add_argument("--min-link-mbps", type=float, default=200.0,
                    help="accelerator-link health floor: below this the "
                         "run is annotated link.degraded=true (the "
                         "percentiles measure the link, not the "
                         "protocol); cpu backends are exempt")
    ap.add_argument("--require-link", action="store_true",
                    help="ABORT instead of annotating when the link is "
                         "below --min-link-mbps")
    ap.add_argument("-o", "--out", default=None, help="write JSON here too")
    args = ap.parse_args(argv)

    results = asyncio.run(amain(args))
    js = json.dumps(results, indent=1)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js)
    return results


if __name__ == "__main__":
    main()
