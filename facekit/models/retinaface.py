"""RetinaFace-MobileNetV1x0.25 (FPN + SSH + heads) as pure JAX functions.

Architecture parity targets in the reference:
  * backbone ``conversion/retina/models/net.py:102-136`` — 0.25-width
    MobileNetV1, stages 1-3 tapped as FPN inputs (channels 64/128/256);
  * FPN ``net.py:68-98`` — 1x1 laterals + nearest upsample + 3x3 merges;
  * SSH ``net.py:40-66`` — 3x3/5x5/7x7 context branches, concat + ReLU;
  * heads ``conversion/retina/models/retinaface_trim.py:14-46`` — 1x1 convs,
    2 anchors/cell; the served engine drops the landmark head (:87) while the
    full model keeps it (retinaface.py:87); facekit supports both via
    ``with_landmarks``;
  * test-phase softmax on class logits (retinaface_trim.py:126).

Returns fixed-shape (N, A, 4) bbox deltas, (N, A, 2) softmax scores and
optionally (N, A, 10) landmark deltas, with A = 3780 for 288x320 input
(``src/retinaface.cpp:13``).

Note: FPN/SSH use leaky=0.1 slope when out_channel <= 64 in the *upstream*
biubug6 repo, but this reference's net.py hardcodes plain ReLU (net.py:13,27
— the `leaky` variable is computed then unused), so facekit uses ReLU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from facekit.models import layers as L

# (cin, cout, stride) per conv_dw in each stage, after the stem conv_bn.
_STAGE1 = [(8, 16, 1), (16, 32, 2), (32, 32, 1), (32, 64, 2), (64, 64, 1)]
_STAGE2 = [(64, 128, 2)] + [(128, 128, 1)] * 5
_STAGE3 = [(128, 256, 2), (256, 256, 1)]
_FPN_IN = (64, 128, 256)
_OUT_CH = 64
_NUM_ANCHORS = 2


def _ssh_init(key, cin: int, cout: int):
    ks = jax.random.split(key, 5)
    return {
        "conv3x3": L.conv_bn_init(ks[0], cin, cout // 2),
        "conv5x5_1": L.conv_bn_init(ks[1], cin, cout // 4),
        "conv5x5_2": L.conv_bn_init(ks[2], cout // 4, cout // 4),
        "conv7x7_2": L.conv_bn_init(ks[3], cout // 4, cout // 4),
        "conv7x7_3": L.conv_bn_init(ks[4], cout // 4, cout // 4),
    }


def _ssh_apply(x, p):
    c3 = L.conv_bn_apply(x, p["conv3x3"], act="none")
    c5_1 = L.conv_bn_apply(x, p["conv5x5_1"])
    c5 = L.conv_bn_apply(c5_1, p["conv5x5_2"], act="none")
    c7_2 = L.conv_bn_apply(c5_1, p["conv7x7_2"])
    c7 = L.conv_bn_apply(c7_2, p["conv7x7_3"], act="none")
    return L.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def _head_init(key, cin: int, dim: int):
    w = L.kaiming_uniform_conv(key, (_NUM_ANCHORS * dim, cin, 1, 1))
    b = jnp.zeros((_NUM_ANCHORS * dim,), jnp.float32)
    return {"w": w, "b": b}


def _head_apply(x, p, dim: int):
    out = L.conv2d(x, p["w"], bias=p["b"])
    n, h, w, c = out.shape
    return out.reshape(n, h * w * _NUM_ANCHORS, dim)


def retinaface_init(key, with_landmarks: bool = True) -> Dict[str, Any]:
    n_dw = len(_STAGE1) + len(_STAGE2) + len(_STAGE3)
    keys = jax.random.split(key, n_dw + 20)
    it = iter(range(n_dw + 20))

    def nk():
        return keys[next(it)]

    params: Dict[str, Any] = {
        "stem": L.conv_bn_init(nk(), 3, 8),
        "stage1": [L.conv_dw_init(nk(), ci, co) for ci, co, _ in _STAGE1],
        "stage2": [L.conv_dw_init(nk(), ci, co) for ci, co, _ in _STAGE2],
        "stage3": [L.conv_dw_init(nk(), ci, co) for ci, co, _ in _STAGE3],
        "fpn": {
            "output1": L.conv_bn_init(nk(), _FPN_IN[0], _OUT_CH, ksize=1),
            "output2": L.conv_bn_init(nk(), _FPN_IN[1], _OUT_CH, ksize=1),
            "output3": L.conv_bn_init(nk(), _FPN_IN[2], _OUT_CH, ksize=1),
            "merge1": L.conv_bn_init(nk(), _OUT_CH, _OUT_CH),
            "merge2": L.conv_bn_init(nk(), _OUT_CH, _OUT_CH),
        },
        "ssh1": _ssh_init(nk(), _OUT_CH, _OUT_CH),
        "ssh2": _ssh_init(nk(), _OUT_CH, _OUT_CH),
        "ssh3": _ssh_init(nk(), _OUT_CH, _OUT_CH),
        "class_head": [_head_init(nk(), _OUT_CH, 2) for _ in range(3)],
        "bbox_head": [_head_init(nk(), _OUT_CH, 4) for _ in range(3)],
    }
    if with_landmarks:
        params["ldm_head"] = [_head_init(nk(), _OUT_CH, 10) for _ in range(3)]
    return params


#: conv-weight keys eligible for int8 inside detector param trees.
#: "conv" = conv_bn units (stem/FPN/SSH/merges), "pw_conv"/"dw_conv" =
#: the MobileNet depthwise-separable pairs (retinaface + lightdet chains).
#: Head subtrees (class/bbox/ldm, loc/conf/landm) are EXCLUDED: their
#: logits feed the score threshold and box decode directly, so they stay
#: in the compute dtype — quantization noise belongs in features, not in
#: the decision layer.
_QUANT_KEYS = ("conv", "pw_conv")
_QUANT_KEYS_DW = ("dw_conv",)
_HEAD_KEYS = ("class_head", "bbox_head", "ldm_head",   # retinaface
              "loc", "conf", "landm",                  # lightdet
              "conv14_a", "conv14_b", "rfb8")          # lightdet extras


def quantize_detector_params(params: Dict[str, Any],
                             include_depthwise: bool = True) -> Dict[str, Any]:
    """Post-training int8 weight quantization of a detector param tree.

    The facekit analog of handing the reference's TensorRT builder a
    lower-precision flag for the DETECTOR engine
    (``conversion/retina/torch2trt.py:84-89`` builds fp16 engines): every
    backbone/FPN/SSH conv weight leaf is replaced by
    ``{"q": int8 HWIO, "scale": (O,) f32}`` and the apply path (via
    ``layers.conv_any``) runs s8 x s8 -> s32 convs with dynamic per-sample
    activation scales — batch-invariant detections, measured drift bounds
    in tests/test_model_parity.py::test_retinaface_int8_drift.

    ``include_depthwise``: also quantize the 3x3 depthwise weights. They
    carry almost no weight bytes; the win (if any) is XLA narrowing the
    s8 activation buffers between the dw/pw pairs.

    MEASURED NEGATIVE on v5e (r5, docs/experiments/det_int8_r5.json):
    unlike the embedder's 1.47x rec_quantize win, the 0.25-width
    MobileNet detector is HBM/fusion-bound at every input size — int8
    measures 0.66x at 640x640 (0.55x with depthwise) and 0.82x on the
    fused serving pipeline. Kept as a tested opt-in precision knob
    (parity with the reference's per-engine precision flags); the
    detector-precision axis is closed unless new evidence reopens it.

    Works on retinaface AND lightdet trees (same conv_bn/conv_dw leaf
    keys); head subtrees and lightdet's biased conv14/RFB units keep the
    compute dtype.
    """
    keys = _QUANT_KEYS + (_QUANT_KEYS_DW if include_depthwise else ())

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in _HEAD_KEYS:
                    out[k] = v
                elif k in keys and hasattr(v, "ndim") and v.ndim == 4:
                    q, scale = L.quantize_conv_weight(v)
                    out[k] = {"q": q, "scale": scale}
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


@functools.partial(jax.jit, static_argnames=("dtype",))
def retinaface_apply(params: Dict[str, Any], x: jnp.ndarray,
                     dtype=jnp.float32):
    """(N, H, W, 3) normalized BGR -> (loc, conf[, ldm]) fixed-shape outputs.

    loc: (N, A, 4); conf: (N, A, 2) softmaxed; ldm: (N, A, 10) if the params
    carry a landmark head.
    """
    x = x.astype(dtype)
    x = L.conv_bn_apply(x, params["stem"], stride=2)
    feats = []
    for stage_name, spec in (("stage1", _STAGE1), ("stage2", _STAGE2),
                             ("stage3", _STAGE3)):
        for p, (_, _, stride) in zip(params[stage_name], spec):
            x = L.conv_dw_apply(x, p, stride)
        feats.append(x)

    f1, f2, f3 = feats
    fpn = params["fpn"]
    o1 = L.conv_bn_apply(f1, fpn["output1"], padding=0)
    o2 = L.conv_bn_apply(f2, fpn["output2"], padding=0)
    o3 = L.conv_bn_apply(f3, fpn["output3"], padding=0)
    o2 = o2 + L.nearest_resize_to(o3, o2.shape[1:3])
    o2 = L.conv_bn_apply(o2, fpn["merge2"])
    o1 = o1 + L.nearest_resize_to(o2, o1.shape[1:3])
    o1 = L.conv_bn_apply(o1, fpn["merge1"])

    s1 = _ssh_apply(o1, params["ssh1"])
    s2 = _ssh_apply(o2, params["ssh2"])
    s3 = _ssh_apply(o3, params["ssh3"])
    feats = [s1, s2, s3]

    loc = jnp.concatenate(
        [_head_apply(f, p, 4) for f, p in zip(feats, params["bbox_head"])], 1)
    logits = jnp.concatenate(
        [_head_apply(f, p, 2) for f, p in zip(feats, params["class_head"])], 1)
    conf = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    loc = loc.astype(jnp.float32)

    if "ldm_head" in params:
        ldm = jnp.concatenate(
            [_head_apply(f, p, 10) for f, p in zip(feats, params["ldm_head"])], 1)
        return loc, conf, ldm.astype(jnp.float32)
    return loc, conf
