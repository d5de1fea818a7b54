"""TPU train-step bench + train->serve cycle on the real chip (r5).

VERDICT r4 weak #3: the training subsystem had CPU-mesh evidence only.
This script produces the hardware record:

  1. IR-50 train-step device time at batch 32/64, remat on/off, plus the
     bf16 mixed-precision points (facekit extension: compute_dtype) —
     step ms and images/s from the profiler xplane (the tunnel's wall
     clock is untrustworthy, bench.py discipline).
  2. One complete ir_tiny train -> orbax checkpoint -> `facekit.weights
     train-checkpoint` CLI -> serve cycle executed against the TPU
     backend, asserting the served embeddings match the checkpointed
     backbone.

Run (TPU):  python docs/experiments/train_step_tpu.py
Writes docs/experiments/train_step_tpu_r5.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np                                      # noqa: E402
import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from bench import device_time_per_call                  # noqa: E402
from facekit.train import make_train_step, train_state_init  # noqa: E402

OUT = os.path.join(REPO, "docs", "experiments", "train_step_tpu_r5.json")
N_CLASSES = 1000


def bench_train_step(network, batch, remat, dtype_name, n_calls=5):
    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    state = train_state_init(jax.random.PRNGKey(0), N_CLASSES,
                             network=network, lr=0.05)
    step = make_train_step(network=network, lr=0.05, remat=remat,
                           compute_dtype=dt)
    # unique image batch per profiled call (the tunnel caches identical
    # remote executions) + the state chains through calls anyway
    imgs = [jax.random.normal(jax.random.PRNGKey(10 + i),
                              (batch, 112, 112, 3), jnp.float32)
            for i in range(n_calls + 1)]
    lbls = jnp.arange(batch, dtype=jnp.int32) % N_CLASSES
    t0 = time.time()
    state, loss = step(state, imgs[-1], lbls)      # compile + warm
    jax.block_until_ready(loss)
    compile_s = time.time() - t0

    box = {"state": state}

    def call(j):
        box["state"], loss = step(box["state"], imgs[j], lbls)
        return loss

    dev_s = device_time_per_call(call, n_calls)
    rec = {"network": network, "batch": batch, "remat": remat,
           "dtype": dtype_name, "compile_s": round(compile_s, 1)}
    if dev_s:
        rec["step_device_ms"] = dev_s * 1e3
        rec["images_per_sec"] = batch / dev_s
    # free the big state before the next config
    del state, box, step, imgs
    return rec


def train_to_serve_cycle(tmp_root):
    """ir_tiny: train on TPU -> orbax -> weights CLI -> serve on TPU."""
    from facekit.config import FaceKitConfig
    from facekit.pipeline import FacePipeline
    from facekit.train.checkpoint import save_checkpoint
    from facekit.weights.io import load_params

    rng = np.random.default_rng(42)
    n_ids = 6
    base = rng.uniform(40, 215, size=(n_ids, 112, 112, 3))

    def sample(k):
        return np.clip(base[k] + rng.normal(0, 12, base[k].shape),
                       0, 255).astype(np.float32)

    imgs_np = np.stack([sample(k) for k in range(n_ids) for _ in range(2)])
    state = train_state_init(jax.random.PRNGKey(0), n_ids,
                             network="ir_tiny", lr=0.003)
    step = make_train_step(network="ir_tiny", lr=0.003)
    imgs = jnp.asarray((imgs_np - 127.5) / 128.0)
    lbls = jnp.asarray(np.repeat(np.arange(n_ids), 2).astype(np.int32))
    losses = []
    for _ in range(10):
        state, loss = step(state, imgs, lbls)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses

    ckpt_dir = os.path.join(tmp_root, "ckpt", "step_10")
    save_checkpoint(ckpt_dir, jax.device_get(state))
    out_msgpack = os.path.join(tmp_root, "ir_tiny_trained.msgpack")
    r = subprocess.run(
        [sys.executable, "-m", "facekit.weights", "train-checkpoint",
         ckpt_dir, out_msgpack,
         "--num-classes", str(n_ids), "--network", "ir_tiny"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, (r.stdout, r.stderr)

    template = train_state_init(jax.random.PRNGKey(1), n_ids,
                                network="ir_tiny").params
    restored = load_params(template, out_msgpack)
    cfg = FaceKitConfig(rec_network="ir_tiny", compute_dtype="float32")
    pipe = FacePipeline(cfg, {"unused": None}, restored)
    crops = np.stack([sample(k) for k in range(n_ids)])
    served = np.asarray(pipe.embed_cropped_batch(crops))

    # ground truth: the checkpointed backbone applied directly
    from facekit.models.arcface import arcface_apply
    from facekit.ops.preprocess import rec_normalize
    direct = np.asarray(arcface_apply(
        state.params, rec_normalize(jnp.asarray(crops)),
        network="ir_tiny", dtype=jnp.float32))
    cos = (served * direct).sum(-1)
    assert (1 - cos).max() < 1e-5, (1 - cos).max()
    return {"losses_first_last": [losses[0], losses[-1]],
            "served_vs_ckpt_cos_err": float((1 - cos).max()),
            "platform": jax.devices()[0].platform}


def main():
    results = {"device": str(jax.devices()[0]),
               "n_classes": N_CLASSES, "configs": []}
    combos = [
        ("ir_50", 32, False, "f32"),
        ("ir_50", 64, False, "f32"),
        ("ir_50", 32, True, "f32"),
        ("ir_50", 64, True, "f32"),
        ("ir_50", 32, False, "bf16"),
        ("ir_50", 64, False, "bf16"),
    ]
    for combo in combos:
        print(f"# bench {combo}", flush=True)
        try:
            rec = bench_train_step(*combo)
        except Exception as e:
            rec = {"combo": list(combo), "error": repr(e)[:300]}
        results["configs"].append(rec)
        print(json.dumps(rec), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    print("# train->serve cycle (ir_tiny)", flush=True)
    import tempfile
    with tempfile.TemporaryDirectory(prefix="fk-t2s-") as d:
        try:
            results["train_to_serve"] = train_to_serve_cycle(d)
        except Exception as e:
            results["train_to_serve"] = {"error": repr(e)[:300]}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["train_to_serve"]), flush=True)


if __name__ == "__main__":
    main()
