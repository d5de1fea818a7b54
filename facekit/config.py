"""Typed configuration, schema-compatible with the reference config JSON.

The reference reads a single JSON file once at startup (reference
``src/app.cpp:13-49``) with the canonical key set of ``app/config.json:1-24``.
We accept that exact schema (so a reference deployment's config file works
unchanged) and extend it with facekit-specific keys (weight pytree paths
replacing ``.engine`` files, compute dtype, gallery capacity bucketing, mesh
axes). Unknown keys are preserved in ``extras`` rather than rejected.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

# Reference engine paths are meaningless on TPU; these keys are accepted and
# ignored (weights come from `det_weights` / `rec_weights` pytree files).
_IGNORED_REFERENCE_KEYS = {
    "det_engine", "rec_engine",
    "det_inputName", "det_outputNames", "rec_inputName", "rec_outputName",
}


@dataclasses.dataclass(frozen=True)
class FaceKitConfig:
    """All knobs for the serving stack. Field names mirror app/config.json."""

    # --- persistence -----------------------------------------------------
    database_path: str = "facekit.db"

    # --- incoming frame geometry (reference input_frameWidth/Height) ------
    input_frameWidth: int = 640
    input_frameHeight: int = 480

    # --- detector ---------------------------------------------------------
    det_inputShape: Tuple[int, int, int] = (3, 288, 320)  # C, H, W
    det_maxBatchSize: int = 1
    det_threshold_nms: float = 0.4
    det_threshold_bbox: float = 0.6
    det_maxFacesPerScene: int = 4
    # NMS candidate window + exactness fallback (facekit extension; the
    # reference processes all 3,780 anchors, src/retinaface.cpp:248-271 —
    # with det_nmsExact the output equals the reference's for every input
    # while the hot path stays O(topk^2); see ops/boxes.py)
    det_nmsTopK: int = 128
    det_nmsExact: bool = True
    det_weights: Optional[str] = None        # msgpack pytree; None -> random init
    det_network: str = "mobilenet0.25"       # mobilenet0.25 | slim | rfb
    det_withLandmarks: bool = True           # landmark head + 5-pt alignment

    # --- recognizer --------------------------------------------------------
    rec_inputShape: Tuple[int, int, int] = (3, 112, 112)
    rec_outputDim: int = 512
    rec_maxBatchSize: int = 1
    rec_knownPersonThreshold: float = 0.65
    rec_weights: Optional[str] = None
    rec_network: str = "ir_50"               # ir_50|ir_101|ir_152|ir_se_50|...
    # int8 post-training quantization of the embedder's conv weights
    # (facekit's lower-precision serving point vs the reference's fp16
    # engines; ~1.8e-3 cosine drift — see models/arcface.py)
    rec_quantize: bool = False

    # int8 post-training quantization of the DETECTOR's backbone/FPN/SSH
    # conv weights (heads stay in the compute dtype — quantization noise
    # belongs in features, not the score/box decision layer); dynamic
    # per-sample activation scales, batch-invariant detections
    # (models/retinaface.py quantize_detector_params).
    # MEASURED NEGATIVE on v5e (r5): the 0.25-width MobileNet is
    # HBM/fusion-bound, so int8 SLOWS it — det640 batch-8 4.61 -> 6.95 ms,
    # fused pipeline 4.40 -> 5.38 ms (docs/experiments/det_int8_r5.json).
    # Kept as a tested opt-in; leave False unless re-measured.
    det_quantize: bool = False

    # --- batch-enrollment ("gen") mode (reference src/app.cpp:69-99) -------
    gen: bool = False
    gen_imgSource: str = "/data"
    gen_imgIsCropped: bool = True
    api_imgIsCropped: bool = True

    # --- facekit extensions -------------------------------------------------
    compute_dtype: str = "bfloat16"          # model compute dtype on TPU
    gallery_dtype: str = "bfloat16"          # gallery residency dtype
    gallery_bucket_sizes: Tuple[int, ...] = (1024, 8192, 65536, 1 << 20)
    gallery_topk: int = 1
    server_port: int = 18080
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {"data": 1, "gallery": 8}
    # Both search paths run at ~HBM speed-of-light on tile-aligned bucketed
    # capacities (1M x 512 bf16: pallas 1.42 ms, xla 1.47 ms on one v5e
    # chip); the Pallas kernel additionally never materializes the (B, N)
    # similarity matrix, so it is the default. The gallery store's bucket
    # ladder keeps capacities tile-aligned — never call the pallas path with
    # a non-aligned N on the hot path (the in-jit pad would copy the whole
    # gallery per batch).
    use_pallas_search: bool = True

    # Unknown/ignored keys from the source JSON, preserved for round-trips.
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # ---- derived geometry --------------------------------------------------
    @property
    def det_hw(self) -> Tuple[int, int]:
        return (self.det_inputShape[1], self.det_inputShape[2])

    @property
    def rec_hw(self) -> Tuple[int, int]:
        return (self.rec_inputShape[1], self.rec_inputShape[2])

    @property
    def frame_hw(self) -> Tuple[int, int]:
        return (self.input_frameHeight, self.input_frameWidth)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        extras = d.pop("extras")
        d.update(extras)
        for k in ("det_inputShape", "rec_inputShape", "gallery_bucket_sizes"):
            d[k] = list(d[k])
        return json.dumps(d, indent=2)


def load_config(path_or_dict) -> FaceKitConfig:
    """Load a config from a JSON file path or a dict (reference schema OK)."""
    if isinstance(path_or_dict, (str,)):
        with open(path_or_dict) as f:
            raw = json.load(f)
    else:
        raw = dict(path_or_dict)

    fields = {f.name: f for f in dataclasses.fields(FaceKitConfig)}
    kwargs: Dict[str, Any] = {}
    extras: Dict[str, Any] = {}
    for key, value in raw.items():
        if key in _IGNORED_REFERENCE_KEYS:
            extras[key] = value
            continue
        if key == "extras" and isinstance(value, dict):
            # an explicit extras block (the constructor's spelling) merges
            # with flat unknown keys instead of nesting under extras.extras
            extras.update(value)
            continue
        if key in fields and key != "extras":
            if key in ("det_inputShape", "rec_inputShape", "gallery_bucket_sizes"):
                value = tuple(value)
            kwargs[key] = value
        else:
            extras[key] = value
    kwargs["extras"] = extras
    return FaceKitConfig(**kwargs)
