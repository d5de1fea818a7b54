"""TPU-host serving loadtest, gated on the link probe (VERDICT r4 #3).

r4's protocol record was useless because a 10-30 MB/s tunnel made every
dispatch transfer-bound; the verdict asked for ONE clean record whose
`link` section is healthy. This driver boots the SHIPPED production
config (configs/default.json: RetinaFace-mobilenet0.25 288x320 + IR-50
bf16, buckets [1,8]) against the real chip, runs the concurrency ladder
plus an overload phase through `facekit.server.loadtest` with
--require-link (abort if the probe reads under --min-link-mbps), and
records the probe result next to the percentiles so the record is
self-describing either way.

Client is colocated with the server on the TPU host (same box the
bench runs from), so client<->server HTTP cost is loopback; the
host->device tunnel is the link the probe measures.

Run (TPU): python docs/experiments/loadtest_tpu_r5.py
Writes docs/serving_loadtest_r5.json (supersedes the CPU-backend
protocol-shape record docs/serving_loadtest_r5_cpu.json).
"""

import asyncio
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

PORT = 18095
OUT = os.path.join(REPO, "docs", "serving_loadtest_r5.json")


def main():
    cfg = json.load(open(os.path.join(REPO, "configs", "default.json")))
    cfg["database_path"] = f"/tmp/lt_tpu_{int(time.time())}.db"
    # probes are part of the measurement here; disable the cooldown
    cfg.setdefault("extras", {})["server_probeCooldownS"] = 0
    cfg_path = "/tmp/lt_tpu_cfg.json"
    json.dump(cfg, open(cfg_path, "w"))

    srv = subprocess.Popen(
        [sys.executable, "-m", "facekit.server", "-c", cfg_path,
         "--port", str(PORT)],
        cwd=REPO, stdout=open("/tmp/lt_tpu_server.log", "w"),
        stderr=subprocess.STDOUT)
    url = f"http://127.0.0.1:{PORT}"
    try:
        import urllib.request
        for _ in range(300):   # TPU cold compile can take minutes
            try:
                urllib.request.urlopen(url + "/health", timeout=2)
                break
            except Exception:
                time.sleep(2)
        else:
            raise SystemExit("server never became healthy; see "
                             "/tmp/lt_tpu_server.log")

        from facekit.server import loadtest as LT
        args = type("A", (), {})()
        args.host, args.port = "127.0.0.1", PORT
        args.concurrency, args.requests = "1,8,32", "32,96,192"
        args.crop_hw, args.frame_hw = (112, 112), (480, 640)
        args.grow, args.grow_count = False, 16
        args.overload, args.overload_concurrency = 256, 64
        args.probe_mb, args.ws_pipeline = 8.0, 8
        args.min_link_mbps, args.require_link = 200.0, True
        results = asyncio.run(LT.amain(args))
    finally:
        srv.send_signal(signal.SIGINT)
        try:
            srv.wait(timeout=15)
        except subprocess.TimeoutExpired:
            srv.kill()

    results["config"] = cfg
    results["note"] = (
        "TPU-host record, shipped production config, client colocated "
        "(loopback HTTP); host->device tunnel health in `link`. "
        "Aborts rather than records if the tunnel is degraded "
        "(--require-link, 200 MB/s gate).")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    keys = [k for k in ("link", "overload", "aborted") if k in results]
    print(json.dumps({k: results[k] for k in keys}, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
