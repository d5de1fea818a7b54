"""Round-5 continuation: device numbers for the deeper IR embedders.

The standing record (bench.py, ROADMAP) profiles IR-50 only; the zoo
also serves ir_se_50 / ir_101 / ir_152 (parity-tested on CPU,
tests/test_model_parity.py). This lands xplane device time for the REAL
fused serving program (detect+align+embed, batch-8, shipped geometry)
per network, so a user picking a deeper backbone has a measured cost,
not a guess.

Run on the TPU host: ``python docs/experiments/ir_family_tpu_r5.py``
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

import bench
from dataclasses import replace as _cr
from facekit.config import load_config
from facekit.models import arcface_init, retinaface_init
from facekit.pipeline import FacePipeline


def main():
    cfg = load_config("/root/repo/configs/default.json")
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rng_np = np.random.default_rng(0)
    try:
        import cv2
        base = cv2.resize(cv2.imread("/root/reference/imgs/2.jpg"),
                          (cfg.input_frameWidth, cfg.input_frameHeight))
    except Exception:
        base = rng_np.integers(
            0, 256, size=(cfg.input_frameHeight, cfg.input_frameWidth, 3),
            dtype=np.uint8)
    frames = np.stack([np.clip(
        base.astype(np.int16) + rng_np.integers(-4, 5, base.shape), 0, 255
    ).astype(np.uint8) for _ in range(8)])

    out = {}
    slots = cfg.det_maxFacesPerScene
    for i, net in enumerate(("ir_50", "ir_se_50", "ir_101", "ir_152")):
        rec = arcface_init(jax.random.PRNGKey(1), network=net)
        pipe = FacePipeline(_cr(cfg, rec_network=net), det, rec)
        fbs, warm = bench.varied_batches(frames, 7 * i + 3)
        jax.block_until_ready(pipe.recognize_frames(warm).embeddings)
        dev = bench.device_time_per_call(
            lambda j: pipe.recognize_frames(fbs[j]).embeddings, 5)
        if dev:
            out[f"{net}_b8_device_ms"] = round(dev * 1e3, 3)
            out[f"{net}_slots_per_sec"] = round(len(frames) * slots / dev)
        print(json.dumps(out), flush=True)
        del rec, pipe

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
