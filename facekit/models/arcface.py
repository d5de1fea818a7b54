"""ArcFace IR/IR-SE backbones (face.evoLVe family) as pure JAX functions.

Architecture parity target: ``/root/reference/conversion/arcface/model_irse.py``
  * input layer: conv3x3 s1 p1 (3->64) + BN + PReLU            (:139-141)
  * bottleneck_IR: shortcut = MaxPool2d(1, stride) when in==depth else
    conv1x1(stride)+BN; residual = BN -> conv3x3 -> PReLU -> conv3x3(stride)
    -> BN                                                        (:48-65)
  * IR-SE adds an SE block (avgpool -> 1x1 -> ReLU -> 1x1 -> sigmoid) (:22-45)
  * stage units: 50 -> (3,4,14,3), 100 -> (3,13,30,3), 152 -> (3,8,36,3)
    at depths (64,128,256,512)                                   (:102-125)
  * output layer (112 input): BN2d -> Dropout(eval=id) -> Flatten(NCHW order)
    -> Linear(512*7*7, 512) -> BN1d -> in-graph L2 normalize     (:143-147,171)

Layout is NHWC (TPU native); the flatten transposes to NCHW order first so
converted torch Linear weights apply unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facekit.models import layers as L

ARCFACE_STAGE_UNITS = {
    "ir_50": (3, 4, 14, 3),
    "ir_101": (3, 13, 30, 3),
    "ir_152": (3, 8, 36, 3),
    # facekit-only miniature for tests/dryruns (not in the reference family)
    "ir_tiny": (1, 1, 1, 1),
}
_STAGE_DEPTHS = (64, 128, 256, 512)


def _block_specs(num_layers: str) -> List[Tuple[int, int, int]]:
    """(in_channel, depth, stride) per bottleneck, reference :97-125."""
    units = ARCFACE_STAGE_UNITS[num_layers]
    specs = []
    in_c = 64
    for depth, n in zip(_STAGE_DEPTHS, units):
        specs.append((in_c, depth, 2))
        specs.extend((depth, depth, 1) for _ in range(n - 1))
        in_c = depth
    return specs


def _se_init(key, channels: int, reduction: int = 16):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": L.xavier_uniform(k1, (channels // reduction, channels, 1, 1)),
        "fc2": L.xavier_uniform(k2, (channels, channels // reduction, 1, 1)),
    }


def _se_apply(x, p):
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
    s = L.relu(L.conv2d(s, p["fc1"]))
    s = jax.nn.sigmoid(L.conv2d(s, p["fc2"]))
    return x * s


def _block_init(key, in_c: int, depth: int, stride: int, se: bool):
    keys = jax.random.split(key, 4)
    p: Dict[str, Any] = {
        "bn1": L.bn_init(in_c),
        "conv1": L.xavier_uniform(keys[0], (depth, in_c, 3, 3)),
        "prelu": jnp.full((depth,), 0.25, jnp.float32),
        "conv2": L.xavier_uniform(keys[1], (depth, depth, 3, 3)),
        "bn2": L.bn_init(depth),
    }
    if in_c != depth:
        p["shortcut"] = {
            "conv": L.xavier_uniform(keys[2], (depth, in_c, 1, 1)),
            "bn": L.bn_init(depth),
        }
    if se:
        p["se"] = _se_init(keys[3], depth)
    return p


def _conv(x, w, stride: int, padding: int, stats=None, name: str = ""):
    """Dispatch on weight form: plain HWIO array, or {"q", "scale"[,
    "ascale"]} int8 dict produced by quantize_arcface_params (static at
    trace time). With ``stats`` (a dict, calibration mode) the input's
    amax is recorded under ``name`` — the same key quantize/calibrate use
    to attach the static activation scale."""
    if stats is not None:
        stats[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
    if isinstance(w, dict):
        return L.conv2d_int8(x, w["q"], w["scale"], stride=stride,
                             padding=padding, ascale=w.get("ascale"))
    return L.conv2d(x, w, stride=stride, padding=padding)


def _block_apply(x, p, stride: int, stats=None, prefix: str = ""):
    if "shortcut" in p:
        sc = _conv(x, p["shortcut"]["conv"], stride=stride, padding=0,
                   stats=stats, name=f"{prefix}.shortcut")
        sc = L.batch_norm(sc, p["shortcut"]["bn"])
    else:
        sc = L.strided_identity(x, stride)
    r = L.batch_norm(x, p["bn1"])
    r = _conv(r, p["conv1"], stride=1, padding=1, stats=stats,
              name=f"{prefix}.conv1")
    r = L.prelu(r, p["prelu"])
    r = _conv(r, p["conv2"], stride=stride, padding=1, stats=stats,
              name=f"{prefix}.conv2")
    r = L.batch_norm(r, p["bn2"])
    if "se" in p:
        r = _se_apply(r, p["se"])
    out = r + sc
    if stats is not None:   # block-output amax, for int8-residual oscales
        stats[f"{prefix}.out"] = jnp.max(jnp.abs(out.astype(jnp.float32)))
    return out


def _quantize_act(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def _block_apply_q8(xq, xs, p, stride: int, dtype):
    """int8-RESIDUAL block: the inter-block activation arrives and leaves
    as s8 + a calibrated scalar scale, killing the double-dtype activation
    write the fused int8 pipeline pays at every block boundary (each
    stage-1/2 output was stored BOTH bf16 for the residual path and s8
    for the next conv — docs/ROADMAP.md r3 per-HLO analysis; the input
    fusion alone wrote 462 MB/batch-64). Numerics delta vs the calibrated
    int8 path: ONE extra 127-level quantization of the block output
    (oscale, calibrated like the conv ascales); everything else is
    unchanged.

    MEASURED NEGATIVE (r4, full fused batch-64 pipeline, v5e): 20.173 ms
    vs 19.268 ms for plain calibrated int8 (0.96x) with ~2x the embedding
    drift (max cosine 5.0e-3 vs 2.9e-3 against f32) — the extra
    quantize/dequant chains cost more than the saved boundary writes.
    The mode stays available (flag `extras.rec_int8Residual`) as the
    recorded answer to the r3 open question, NOT as a recommended
    serving point; see docs/ROADMAP.md round 4."""
    x = (xq.astype(jnp.float32) * xs).astype(dtype)   # fuses; reads s8 only
    if "shortcut" in p:
        sc = _conv(x, p["shortcut"]["conv"], stride=stride, padding=0)
        sc = L.batch_norm(sc, p["shortcut"]["bn"])
    else:
        sc = L.strided_identity(x, stride)
    r = L.batch_norm(x, p["bn1"])
    r = _conv(r, p["conv1"], stride=1, padding=1)
    r = L.prelu(r, p["prelu"])
    r = _conv(r, p["conv2"], stride=stride, padding=1)
    r = L.batch_norm(r, p["bn2"])
    if "se" in p:
        r = _se_apply(r, p["se"])
    y = r + sc
    return _quantize_act(y, p["oscale"]), p["oscale"]


def quantize_arcface_params(params: Dict[str, Any],
                            act_amax: Optional[Dict[str, float]] = None,
                            skip_sites: Optional[set] = None,
                            int8_residual: bool = False
                            ) -> Dict[str, Any]:
    """Post-training int8 weight quantization of every backbone conv
    (per-output-channel scales); BN/PReLU/SE/linear stay float. Activations
    quantize dynamically per sample inside conv2d_int8 — or statically when
    ``act_amax`` (per-site activation maxima from ``arcface_act_amax`` /
    ``calibrate_arcface_int8``) provides a calibrated scale, which removes
    one full reduction pass over every conv input. Apply with the same
    ``arcface_apply`` — the weight form dispatches (facekit's
    lower-precision serving point vs the reference's fp16 engines,
    conversion/arcface/torch2trt.py:42-44). Drift bounds:
    tests/test_model_parity.py::test_arcface_int8_drift.

    ``skip_sites``: site names kept in the float/compute dtype (default:
    nothing skipped — mixed-precision serving was measured FLAT on the
    slow s8 stride-2 shapes, docs/ROADMAP.md r3; the knob remains for
    accuracy-driven mixed quantization).

    ``int8_residual``: keep inter-block activations s8-resident (requires
    calibrated ``act_amax`` including the ``*.out`` block-output maxima) —
    see _block_apply_q8 for the bandwidth rationale and numerics delta.
    """
    skip = skip_sites or set()
    if int8_residual:
        if act_amax is None:
            raise ValueError("int8_residual requires calibrated act_amax "
                             "(block-output scales have no dynamic mode)")
        if skip:
            raise ValueError("int8_residual with skip_sites unsupported")

    def oscale(name):
        return jnp.float32(max(float(act_amax[name]), 1e-12) / 127.0)

    def q(w, name):
        if name in skip:
            return w
        wq, scale = L.quantize_conv_weight(w)
        d = {"q": wq, "scale": scale}
        if act_amax is not None:
            d["ascale"] = jnp.float32(
                max(float(act_amax[name]), 1e-12) / 127.0)
        return d

    p_in = dict(params["input"], conv=q(params["input"]["conv"], "input"))
    if int8_residual:
        p_in["oscale"] = oscale("stem.out")
    out: Dict[str, Any] = {
        "input": p_in,
        "blocks": [],
        "output": params["output"],
    }
    for i, p in enumerate(params["blocks"]):
        blk = dict(p, conv1=q(p["conv1"], f"b{i}.conv1"),
                   conv2=q(p["conv2"], f"b{i}.conv2"))
        if "shortcut" in p:
            blk["shortcut"] = dict(p["shortcut"],
                                   conv=q(p["shortcut"]["conv"],
                                          f"b{i}.shortcut"))
        if int8_residual:
            blk["oscale"] = oscale(f"b{i}.out")
        out["blocks"].append(blk)
    return out


def arcface_init(key, network: str = "ir_50", input_size: int = 112,
                 embed_dim: int = 512) -> Dict[str, Any]:
    """Random params with torch-matching initializers (for tests/bench)."""
    se = network.startswith("ir_se")
    base = network.replace("ir_se", "ir")
    specs = _block_specs(base)
    n_keys = len(specs) + 3
    keys = jax.random.split(key, n_keys)
    fmap = input_size // 16  # 4 stride-2 stages
    lin_w, lin_b = _torch_linear_init(keys[1], embed_dim, 512 * fmap * fmap)
    params: Dict[str, Any] = {
        "input": {
            "conv": L.xavier_uniform(keys[0], (64, 3, 3, 3)),
            "bn": L.bn_init(64),
            "prelu": jnp.full((64,), 0.25, jnp.float32),
        },
        "blocks": [
            _block_init(keys[2 + i], in_c, d, s, se)
            for i, (in_c, d, s) in enumerate(specs)
        ],
        "output": {
            "bn2d": L.bn_init(512),
            "linear": {"w": lin_w, "b": lin_b},
            "bn1d": L.bn_init(embed_dim),
        },
    }
    return params


def _torch_linear_init(key, out_f: int, in_f: int):
    """xavier_uniform weight + zero bias (reference :187-190)."""
    a = float(np.sqrt(6.0 / (in_f + out_f)))
    w = jax.random.uniform(key, (out_f, in_f), jnp.float32, -a, a)
    return w, jnp.zeros((out_f,), jnp.float32)


def _network_specs(network: str):
    base = network.replace("ir_se", "ir")
    return _block_specs(base)


def _forward(params: Dict[str, Any], x: jnp.ndarray, network: str,
             dtype, stats=None) -> jnp.ndarray:
    specs = _network_specs(network)
    x = x.astype(dtype)
    p_in = params["input"]
    x = _conv(x, p_in["conv"], stride=1, padding=1, stats=stats,
              name="input")
    x = L.batch_norm(x, p_in["bn"])
    x = L.prelu(x, p_in["prelu"])
    if stats is not None:
        stats["stem.out"] = jnp.max(jnp.abs(x.astype(jnp.float32)))
    if isinstance(p_in, dict) and "oscale" in p_in:
        # int8-residual mode (see _block_apply_q8): activations stay s8
        # between blocks; one dequant after the last block
        xq, xs = _quantize_act(x, p_in["oscale"]), p_in["oscale"]
        for p_blk, (_, _, stride) in zip(params["blocks"], specs):
            xq, xs = _block_apply_q8(xq, xs, p_blk, stride, dtype)
        x = (xq.astype(jnp.float32) * xs).astype(dtype)
    else:
        for i, (p_blk, (_, _, stride)) in enumerate(zip(params["blocks"],
                                                        specs)):
            x = _block_apply(x, p_blk, stride, stats=stats, prefix=f"b{i}")
    p_out = params["output"]
    x = L.batch_norm(x, p_out["bn2d"])
    # torch flattens NCHW; transpose so converted Linear weights line up
    n, h, w, c = x.shape
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c * h * w)
    x = L.linear(x, p_out["linear"]["w"], p_out["linear"]["b"])
    x = L.batch_norm(x, p_out["bn1d"])
    x = x.astype(jnp.float32)
    # torch F.normalize clamps the denominator at eps=1e-12 (reference :171)
    norm = jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x / norm


@functools.partial(jax.jit, static_argnames=("network", "dtype"))
def arcface_apply(params: Dict[str, Any], x: jnp.ndarray,
                  network: str = "ir_50", dtype=jnp.float32) -> jnp.ndarray:
    """(N, H, W, 3) normalized RGB -> (N, 512) L2-normalized embeddings."""
    return _forward(params, x, network, dtype)


@functools.partial(jax.jit, static_argnames=("network",))
def arcface_act_amax(params: Dict[str, Any], x: jnp.ndarray,
                     network: str = "ir_50") -> Dict[str, jnp.ndarray]:
    """Per-conv-site activation amax of one f32 forward pass, keyed by the
    same site names quantize_arcface_params uses ("input", "b3.conv1", ...).
    Building block for int8 calibration."""
    stats: Dict[str, jnp.ndarray] = {}
    _forward(params, x, network, jnp.float32, stats=stats)
    return stats


def calibrate_arcface_int8(params: Dict[str, Any],
                           batches: Iterable[jnp.ndarray],
                           network: str = "ir_50",
                           headroom: float = 1.0,
                           int8_residual: bool = False) -> Dict[str, Any]:
    """Post-training calibration: fold activation maxima over the given
    (N, H, W, 3) normalized-RGB batches, then quantize with STATIC
    activation scales (amax * headroom). vs dynamic quantization this
    removes one full reduction pass per conv input (XLA fuses the
    elementwise quantize into the producer) at the cost of saturating
    activations that exceed the calibration range — the standard
    TensorRT-style PTQ trade (the reference's engines are built by the
    same kind of offline pass, conversion/arcface/torch2trt.py:29-47).
    """
    agg: Dict[str, float] = {}
    n = 0
    for x in batches:
        stats = arcface_act_amax(params, jnp.asarray(x), network=network)
        for k, v in stats.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return quantize_arcface_params(
        params, act_amax={k: v * headroom for k, v in agg.items()},
        int8_residual=int8_residual)
