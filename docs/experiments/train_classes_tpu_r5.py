"""Round-5 continuation: train-step cost vs identity count on the chip.

The r5 training record (train_step_tpu_r5.json) fixes n_classes=1000;
real face-recognition training runs 10k-100k+ identities and the
classic ArcFace head is a full FC over all of them. This measures the
IR-50 bf16 batch-64 step at growing class counts so the record says
where the head starts to matter on one v5e chip (and therefore when the
dp×tp mesh's class-sharded head — tests/test_parallel.py — becomes the
recipe rather than an option).

Run on the TPU host: ``python docs/experiments/train_classes_tpu_r5.py``
Writes docs/experiments/train_classes_tpu_r5.json.
"""

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from bench import device_time_per_call                  # noqa: E402
from facekit.train import make_train_step, train_state_init  # noqa: E402

OUT = os.path.join(REPO, "docs", "experiments",
                   "train_classes_tpu_r5.json")
BATCH = 64
N_CALLS = 5


def bench_classes(n_classes):
    state = train_state_init(jax.random.PRNGKey(0), n_classes,
                             network="ir_50", lr=0.05)
    step = make_train_step(network="ir_50", lr=0.05,
                           compute_dtype=jnp.bfloat16)
    imgs = [jax.random.normal(jax.random.PRNGKey(10 + i),
                              (BATCH, 112, 112, 3), jnp.float32)
            for i in range(N_CALLS + 1)]
    lbls = jnp.arange(BATCH, dtype=jnp.int32) % n_classes
    t0 = time.time()
    state, loss = step(state, imgs[-1], lbls)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0
    box = {"state": state}

    def call(j):
        box["state"], loss = step(box["state"], imgs[j], lbls)
        return loss

    dev = device_time_per_call(call, N_CALLS)
    rec = {"n_classes": n_classes, "batch": BATCH, "dtype": "bf16",
           "compile_s": round(compile_s, 1)}
    if dev:
        rec["step_device_ms"] = round(dev * 1e3, 3)
        rec["images_per_sec"] = round(BATCH / dev)
    return rec


def main():
    out = {"device": str(jax.devices()[0]), "network": "ir_50",
           "configs": []}
    for n in (1000, 10_000, 50_000, 100_000):
        rec = bench_classes(n)
        out["configs"].append(rec)
        print(json.dumps(rec), flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("FINAL written", OUT)


if __name__ == "__main__":
    main()
