"""Whole-pipeline parity: facekit's fused program vs a faithful
reconstruction of the reference flow (cv2 letterbox -> torch RetinaFace ->
scalar decode/NMS -> cv2 crop+INTER_CUBIC -> torch ArcFace) on a real image
with shared random weights.

This is the integration-level acceptance test: it exercises coordinate
conventions, letterbox un-mapping, NMS ordering, uint8 saturation, and the
embed path together. Tolerance: boxes sub-pixel, embeddings within the
1e-3 cosine budget (BASELINE.md).
"""

import math

import cv2
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from facekit.config import FaceKitConfig  # noqa: E402
from facekit.pipeline import FacePipeline  # noqa: E402
from facekit.weights import (convert_arcface_state_dict,  # noqa: E402
                             convert_retinaface_state_dict)
import oracles  # noqa: E402


@pytest.fixture(scope="module")
def models(reference_dir):
    ret_mod = oracles.load_retinaface_oracle()
    arc_mod = oracles.load_arcface_oracle()
    torch.manual_seed(11)
    det = ret_mod.RetinaFace(cfg=oracles.RETINA_CFG, phase="test").eval()
    rec = arc_mod.IR_50([112, 112]).eval()
    with torch.no_grad():
        for m in list(det.modules()) + list(rec.modules()):
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)
    return det, rec


def _reference_flow(det, rec, frame, score_thr, nms_thr, max_faces):
    """Faithful reconstruction of src/app.cpp:293-352 (sane xy convention)."""
    fh, fw = frame.shape[:2]
    th, tw = 288, 320
    # letterbox (src/retinaface.cpp:106-136)
    scale_h, scale_w = th / fh, tw / fw
    if scale_h > scale_w:
        w, h = tw, int(scale_w * fh)
        x, y = 0, (th - h) // 2
    else:
        w, h = int(scale_h * fw), th
        x, y = (tw - w) // 2, 0
    re = cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
    inp = np.full((th, tw, 3), 128, np.uint8)
    inp[y:y + h, x:x + w] = re
    net_in = inp.astype(np.float32) - np.array([104, 117, 123], np.float32)
    with torch.no_grad():
        loc, conf, _ = det(torch.from_numpy(
            net_in.transpose(2, 0, 1)[None]))
    loc = loc[0].numpy()
    scores = conf[0].numpy()[:, 1]

    # anchors + decode (src/retinaface.cpp:154-240)
    anchors = []
    for step, sizes in zip((8, 16, 32), ((10, 20), (32, 64), (128, 256))):
        for i in range(math.ceil(th / step)):
            for j in range(math.ceil(tw / step)):
                for s in sizes:
                    anchors.append(((j + 0.5) * step / tw,
                                    (i + 0.5) * step / th,
                                    s / tw, s / th))
    boxes = []
    scale = min(scale_h, scale_w)
    pad_x = (tw - scale * fw) / 2 if scale_w <= scale_h else 0.0
    pad_y = (th - scale * fh) / 2 if scale_h < scale_w else 0.0
    if scale_h > scale_w:
        pad_x, pad_y = 0.0, (th - scale * fh) / 2
    else:
        pad_x, pad_y = (tw - scale * fw) / 2, 0.0
    for a, (cx0, cy0, sx0, sy0), s in zip(loc, anchors, scores):
        if s <= score_thr:
            continue
        cx = cx0 + a[0] * 0.1 * sx0
        cy = cy0 + a[1] * 0.1 * sy0
        sx = sx0 * math.exp(a[2] * 0.2)
        sy = sy0 * math.exp(a[3] * 0.2)
        x1 = ((cx - sx / 2) * tw - pad_x) / scale
        y1 = ((cy - sy / 2) * th - pad_y) / scale
        x2 = ((cx + sx / 2) * tw - pad_x) / scale
        y2 = ((cy + sy / 2) * th - pad_y) / scale
        boxes.append([np.clip(x1, 0, fw - 1), np.clip(y1, 0, fh - 1),
                      np.clip(x2, 0, fw - 1), np.clip(y2, 0, fh - 1), s])
    boxes.sort(key=lambda b: -b[4])
    # greedy NMS (src/retinaface.cpp:248-271)
    i = 0
    while i < len(boxes):
        j = i + 1
        while j < len(boxes):
            a, b = boxes[i], boxes[j]
            aa = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
            ab = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
            iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
            ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
            inter = iw * ih
            if inter / (aa + ab - inter) >= nms_thr:
                del boxes[j]
            else:
                j += 1
        i += 1
    boxes = boxes[:max_faces]

    # crop + INTER_CUBIC + normalize + embed (src/arcface.cpp:3-17,105-137)
    embs = []
    for x1, y1, x2, y2, s in boxes:
        crop = frame[int(y1):int(y2), int(x1):int(x2)]
        face = cv2.resize(crop, (112, 112), interpolation=cv2.INTER_CUBIC)
        rgb = cv2.cvtColor(face, cv2.COLOR_BGR2RGB).astype(np.float32)
        net = (rgb - 127.5) * 0.0078125
        with torch.no_grad():
            e = rec(torch.from_numpy(net.transpose(2, 0, 1)[None]))[0]
        embs.append(e.numpy())
    return np.array(boxes, np.float32), np.array(embs, np.float32)


def test_full_pipeline_parity_on_real_image(models, reference_dir):
    det_t, rec_t = models
    frame = cv2.resize(cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480))

    # random weights produce arbitrary "detections"; lower the threshold so
    # several boxes survive and the whole path is exercised
    score_thr, nms_thr, max_faces = 0.3, 0.4, 4
    ref_boxes, ref_embs = _reference_flow(det_t, rec_t, frame, score_thr,
                                          nms_thr, max_faces)
    assert len(ref_boxes) > 0, "oracle found no boxes; lower the threshold"

    cfg = FaceKitConfig(det_threshold_bbox=score_thr,
                        det_threshold_nms=nms_thr,
                        det_maxFacesPerScene=max_faces,
                        compute_dtype="float32")
    pipe = FacePipeline(cfg,
                        convert_retinaface_state_dict(det_t.state_dict()),
                        convert_arcface_state_dict(rec_t.state_dict()))
    assert not pipe.align  # reference-parity mode: bbox crops
    res = pipe.recognize_frame(frame)

    nvalid = int(np.asarray(res.valid).sum())
    assert nvalid == len(ref_boxes)
    ours_boxes = np.asarray(res.boxes)[:nvalid]
    np.testing.assert_allclose(ours_boxes, ref_boxes[:, :4],
                               atol=0.2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res.scores)[:nvalid],
                               ref_boxes[:, 4], atol=1e-4)

    ours_embs = np.asarray(res.embeddings)[:nvalid]
    cos = (ours_embs * ref_embs).sum(-1)
    assert (1 - cos).max() < 1e-3, f"embedding cosine distance {(1 - cos)}"


def test_bf16_serving_dtype_acceptance(models, reference_dir):
    """bf16 is the dtype actually served (configs/default.json); the 1e-3
    cosine budget must hold for it, not just f32 (VERDICT r1 item 3).

    The detector and embedder are asserted separately on deterministic
    inputs: with random weights the conf scores are near-tie noise, so a
    ~1e-4 bf16 jitter can legitimately flip NMS *selection order* — that
    reordering is score-margin behavior, not numerical failure (real
    checkpoints separate faces by >>1e-2 score margins). Measured drift
    (2026-08-16, recorded in docs/PARITY.md): embedder cosine distance
    2.2e-4, L2 norm exact to 1e-6, detector conf drift 1.6e-4.
    """
    import jax.numpy as jnp
    from facekit.models import retinaface_apply
    from facekit.ops.preprocess import det_normalize
    from facekit.ops.resize import letterbox

    det_t, rec_t = models
    frame = cv2.resize(cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480))
    rp = convert_arcface_state_dict(rec_t.state_dict())
    dp = convert_retinaface_state_dict(det_t.state_dict())

    # -- embedder: fixed real-image crops, bf16 vs f32 ----------------------
    rng = np.random.default_rng(0)
    crops = np.stack([
        frame[y:y + 112, x:x + 112]
        for y, x in zip(rng.integers(0, 480 - 112, 8),
                        rng.integers(0, 640 - 112, 8))])
    embs = {}
    for dt in ("float32", "bfloat16"):
        pipe = FacePipeline(FaceKitConfig(compute_dtype=dt), dp, rp)
        embs[dt] = pipe.embed_cropped_batch(crops).astype(np.float32)
    e32, e16 = embs["float32"], embs["bfloat16"]
    # the in-graph L2 norm invariant (conversion/arcface/model_irse.py:171)
    np.testing.assert_allclose(np.linalg.norm(e16, axis=1), 1.0, atol=1e-2)
    cos = (e32 * e16).sum(-1) / (
        np.linalg.norm(e32, axis=1) * np.linalg.norm(e16, axis=1))
    assert (1 - cos).max() < 1e-3, f"bf16 embed drift {(1 - cos)}"

    # -- detector heads: raw outputs bf16 vs f32 ----------------------------
    x = det_normalize(letterbox(jnp.asarray(frame, jnp.float32),
                                (288, 320)))[None]
    loc32, conf32, _ = retinaface_apply(dp, x, dtype=jnp.float32)
    loc16, conf16, _ = retinaface_apply(dp, x, dtype=jnp.bfloat16)
    assert np.abs(np.asarray(conf32, np.float32)
                  - np.asarray(conf16, np.float32)).max() < 2e-3
    assert np.abs(np.asarray(loc32, np.float32)
                  - np.asarray(loc16, np.float32)).max() < 5e-3
