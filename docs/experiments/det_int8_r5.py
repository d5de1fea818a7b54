"""Round-5 experiment: does int8-quantizing the DETECTOR pay on the chip?

Context: the embedder's int8 path is a measured 1.47x (ROADMAP round 2);
the detector still runs bf16. At the serving det size the detector is
only ~0.46 ms of the batch-8 pipeline (HBM-bound, ROADMAP op budget),
but the 640x640 detection-only bench point (4.58 ms batch-8) is
conv-dominated — the one remaining place int8 convs could move a
headline number. Measures, per the repo's transfer rule, the REAL
programs (detect_frames / recognize_frames), not isolated convs:

  1. detect_frames 640x640 batch-8: bf16 vs det_quantize (dw on/off)
  2. fused recognize batch-8 at serving size: bf16 vs bf16+det_quantize

Run on the TPU host: ``python docs/experiments/det_int8_r5.py``
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

import bench
from facekit.config import load_config
from facekit.models import arcface_init, retinaface_init
from facekit.pipeline import FacePipeline
from dataclasses import replace as _cr


def main():
    cfg = load_config("/root/repo/configs/default.json")
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    rng_np = np.random.default_rng(0)
    try:
        import cv2
        base = cv2.resize(cv2.imread("/root/reference/imgs/2.jpg"),
                          (cfg.input_frameWidth, cfg.input_frameHeight))
    except Exception:
        base = rng_np.integers(
            0, 256, size=(cfg.input_frameHeight, cfg.input_frameWidth, 3),
            dtype=np.uint8)

    out = {}

    # -- 1. detection-only 640x640, three precision variants ---------------
    iy = np.arange(640) * base.shape[0] // 640
    ix = np.arange(640) * base.shape[1] // 640
    sq_base = base[iy][:, ix].astype(np.int16)
    sq = np.stack([np.clip(
        sq_base + rng_np.integers(-4, 5, sq_base.shape), 0, 255
    ).astype(np.uint8) for _ in range(8)])

    for name, kw in (("bf16", {}),
                     ("int8_dw", {"det_quantize": True}),
                     ):
        cfg640 = _cr(cfg, det_inputShape=(3, 640, 640),
                     det_nmsTopK=256, det_nmsExact=True, **kw)
        pipe640 = FacePipeline(cfg640, det, rec)
        sqs, warm = bench.varied_batches(sq, 11 + len(name))
        jax.block_until_ready(pipe640.detect_frames(warm).boxes)
        dev = bench.device_time_per_call(
            lambda j: pipe640.detect_frames(sqs[j]).boxes, 5)
        out[f"det640_{name}_ms"] = dev * 1e3 if dev else None
        print(json.dumps(out), flush=True)

    # no-depthwise variant needs the transform called directly
    from facekit.models.retinaface import quantize_detector_params
    cfg640 = _cr(cfg, det_inputShape=(3, 640, 640),
                 det_nmsTopK=256, det_nmsExact=True)
    pipe_nodw = FacePipeline(cfg640, det, rec)
    pipe_nodw.det_params = quantize_detector_params(
        det, include_depthwise=False)
    sqs, warm = bench.varied_batches(sq, 29)
    jax.block_until_ready(pipe_nodw.detect_frames(warm).boxes)
    dev = bench.device_time_per_call(
        lambda j: pipe_nodw.detect_frames(sqs[j]).boxes, 5)
    out["det640_int8_nodw_ms"] = dev * 1e3 if dev else None
    print(json.dumps(out), flush=True)

    # -- 2. fused recognize batch-8, serving geometry ----------------------
    frames = np.stack([np.clip(
        base.astype(np.int16) + rng_np.integers(-4, 5, base.shape), 0, 255
    ).astype(np.uint8) for _ in range(8)])
    for name, kw in (("bf16", {}),
                     ("bf16_detq", {"det_quantize": True})):
        pipe = FacePipeline(_cr(cfg, **kw), det, rec)
        fbs, warm = bench.varied_batches(frames, 41 + len(name))
        jax.block_until_ready(pipe.recognize_frames(warm).embeddings)
        dev = bench.device_time_per_call(
            lambda j: pipe.recognize_frames(fbs[j]).embeddings, 5)
        out[f"recognize_b8_{name}_ms"] = dev * 1e3 if dev else None
        print(json.dumps(out), flush=True)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
