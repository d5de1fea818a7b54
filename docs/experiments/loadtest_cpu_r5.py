"""CPU-backend colocated protocol-shape loadtest + decode-pool contention.

VERDICT r4 next-steps #3/#8: the TPU tunnel was down for most of r4/r5,
so this is the CPU-backend protocol record the verdict sanctions —
batching ladder, WS pipelining, overload shedding, and the decode-pool
contention question are all properties of the SERVER PROTOCOL, not the
accelerator. CONFOUNDS (stated up front, non-negotiable): one CPU core
shared by client + server + codec; tiny models (slim + ir_tiny at
160x120) so the device program isn't the bottleneck; absolute numbers
are meaningless — only the protocol shapes (shed counts, pipelining
effect, queue-wait deltas) transfer.

Contention phase (r4 weak #7): the 4-thread decode pool is shared by
serving decode, DB commits, and the whole bulk /insert/face host loop.
We run a WS phase alone, then a WS phase with 4 concurrent bulk
/insert/face posts saturating the pool, and compare the server-side
"decode_wait" metric (queue wait of SERVING decodes, added r5) — the
attribution-correct signal even on a loaded box.

Run: python docs/experiments/loadtest_cpu_r5.py
Writes docs/serving_loadtest_r5_cpu.json.
"""

import asyncio
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

PORT = 18093
OUT = os.path.join(REPO, "docs", "serving_loadtest_r5_cpu.json")

CFG = {
    "det_network": "slim", "rec_network": "ir_tiny",
    "det_inputShape": [3, 64, 64],
    "input_frameWidth": 160, "input_frameHeight": 120,
    "compute_dtype": "float32", "gallery_dtype": "float32",
    "use_pallas_search": False, "det_threshold_bbox": 0.05,
    "extras": {"server_batchSize": 16, "server_batchBuckets": [1, 4, 16],
               "server_wsPipeline": 8, "server_maxQueueDepth": 64,
               "server_probeCooldownS": 0},
}


async def decode_wait(session, url):
    async with session.get(url + "/metrics") as r:
        m = json.loads(await r.text())
    return m.get("decode_wait")


async def contention_phase(session, url, tmp):
    """WS load alone vs WS load + 4 concurrent bulk enrollments."""
    from facekit.server.loadtest import make_payloads, run_ws_phase

    # bulk-enrollment payloads: 4 posts x 24 images each (pool has 4
    # threads; each post occupies one end-to-end)
    import numpy as np
    import cv2
    paths = []
    rng = np.random.default_rng(11)
    for i in range(96):
        img = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"bulk_{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    async with session.post(url + "/insert/user", data=json.dumps(
            {"userId": "bulk", "userName": "Bulk"})) as r:
        await r.text()

    frames = make_payloads(96, (120, 160), seed=21)
    out = {}
    # baseline: WS alone
    out["ws_alone"] = await run_ws_phase(session, url, frames[:48], 4)
    out["decode_wait_after_alone"] = await decode_wait(session, url)

    async def bulk_post(chunk):
        body = json.dumps({"data": [{"userId": "bulk", "imgPath": p}
                                    for p in chunk]})
        async with session.post(url + "/insert/face", data=body) as r:
            return await r.text()

    t0 = time.perf_counter()
    ws_task = asyncio.create_task(
        run_ws_phase(session, url, frames[48:], 4))
    bulk_tasks = [asyncio.create_task(bulk_post(paths[k * 24:(k + 1) * 24]))
                  for k in range(4)]
    out["ws_during_bulk"] = await ws_task
    bulk_replies = await asyncio.gather(*bulk_tasks)
    out["bulk_wall_s"] = time.perf_counter() - t0
    out["bulk_inserted"] = sum(r.count("inserted successfully")
                               for r in bulk_replies)
    out["decode_wait_after_bulk"] = await decode_wait(session, url)
    return out


async def amain(url, tmp):
    import aiohttp
    from facekit.server import loadtest as LT

    args = type("A", (), {})()
    args.host, args.port = "127.0.0.1", PORT
    args.concurrency, args.requests = "1,8,32", "32,96,192"
    args.crop_hw, args.frame_hw = (112, 112), (120, 160)
    args.grow, args.grow_count = False, 16
    args.overload, args.overload_concurrency = 256, 128
    args.probe_mb, args.ws_pipeline = 2.0, 8

    results = await LT.amain(args)
    timeout = aiohttp.ClientTimeout(total=None, sock_read=600)
    async with aiohttp.ClientSession(timeout=timeout) as session:
        results["decode_contention"] = await contention_phase(
            session, url, tmp)
    return results


def main():
    os.makedirs("/tmp/lt5", exist_ok=True)
    cfg = dict(CFG)
    cfg["database_path"] = f"/tmp/lt5/lt_{int(time.time())}.db"
    cfg_path = "/tmp/lt5/cfg.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    srv = subprocess.Popen(
        [sys.executable, "-m", "facekit.server", "-c", cfg_path,
         "--port", str(PORT)],
        env=env, cwd=REPO, stdout=open("/tmp/lt5/server.log", "w"),
        stderr=subprocess.STDOUT)
    url = f"http://127.0.0.1:{PORT}"
    try:
        import urllib.request
        for _ in range(180):
            try:
                urllib.request.urlopen(url + "/health", timeout=2)
                break
            except Exception:
                time.sleep(2)
        else:
            raise SystemExit("server never became healthy; see "
                             "/tmp/lt5/server.log")
        with tempfile.TemporaryDirectory() as tmp:
            results = asyncio.run(amain(url, tmp))
    finally:
        srv.send_signal(signal.SIGINT)
        try:
            srv.wait(timeout=15)
        except subprocess.TimeoutExpired:
            srv.kill()
    results["confounds"] = (
        "CPU backend, one core shared by client+server+codec, tiny models"
        " (slim+ir_tiny at 160x120). Protocol shapes only (shedding,"
        " pipelining, queue-wait deltas); absolute latencies do not"
        " transfer to TPU serving.")
    results["config"] = cfg
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("decode_contention", "overload") if k in results},
                     indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
