"""Cold-start measurement: jit-served vs engine-served boot (VERDICT r3 #1).

Times `python -m facekit.server` from process spawn to the first
successful /health (the server warms its serving programs inside
FaceServer.__init__ before the HTTP app listens, so /health == ready to
serve at full speed). Four variants:

  jit/cold      in-process trace + XLA compile, empty compilation cache
  jit/warm      in-process trace, persistent-cache hits
  engine/cold   .fke deserialize (no trace) + XLA compile, empty cache
  engine/warm   .fke deserialize + persistent-cache hits

Reference analog: deserializeCudaEngine startup (src/arcface.cpp:45-69).
Run on the TPU host with engines pre-exported:
  python -m facekit.engine export -c configs/default.json -o /tmp/engines_r4 -b 8,64
  python docs/experiments/measure_coldstart.py /tmp/engines_r4
"""
import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request

PORT = 18093
CACHE = "/tmp/facekit-coldstart-cache"
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def boot_once(engines_dir, clear_cache):
    if clear_cache:
        shutil.rmtree(CACHE, ignore_errors=True)
    cfg = json.load(open(os.path.join(REPO, "configs/default.json")))
    cfg.setdefault("extras", {})["compilation_cache_dir"] = CACHE
    cfg_path = "/tmp/coldstart_cfg.json"
    json.dump(cfg, open(cfg_path, "w"))
    db = "/tmp/coldstart_%d.db" % time.time()
    cmd = [sys.executable, "-m", "facekit.server", "-c", cfg_path,
           "--port", str(PORT), "--db", db]
    if engines_dir:
        cmd += ["--engines", engines_dir]
    t0 = time.monotonic()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = t0 + 1200
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        "http://127.0.0.1:%d/health" % PORT, timeout=1) as r:
                    if r.status == 200:
                        return time.monotonic() - t0
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError("server exited rc=%s" % proc.returncode)
                time.sleep(0.25)
        raise RuntimeError("timeout")
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
        for p in (db, db + "-journal"):
            if os.path.exists(p):
                os.unlink(p)


def main():
    engines = sys.argv[1] if len(sys.argv) > 1 else None
    out = {}
    plan = [("jit/cold", None, True), ("jit/warm", None, False)]
    if engines:
        plan += [("engine/cold", engines, True),
                 ("engine/warm", engines, False)]
    for name, eng, cold in plan:
        t = boot_once(eng, cold)
        out[name] = round(t, 2)
        print(name, out[name], "s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
