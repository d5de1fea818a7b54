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
from typing import Any, Dict, List, Tuple

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


def _conv(x, w, stride: int, padding: int):
    """Dispatch on weight form: plain HWIO array, or {"q", "scale"} int8
    pair produced by quantize_arcface_params (static at trace time)."""
    if isinstance(w, dict):
        return L.conv2d_int8(x, w["q"], w["scale"], stride=stride,
                             padding=padding)
    return L.conv2d(x, w, stride=stride, padding=padding)


def _block_apply(x, p, stride: int):
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
    return r + sc


def quantize_arcface_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Post-training int8 weight quantization of every backbone conv
    (per-output-channel scales); BN/PReLU/SE/linear stay float. Activations
    quantize dynamically per sample inside conv2d_int8. Apply with the same
    ``arcface_apply`` — the weight form dispatches (facekit's lower-precision
    serving point vs the reference's fp16 engines,
    conversion/arcface/torch2trt.py:42-44). Drift bounds:
    tests/test_model_parity.py::test_arcface_int8_drift."""
    def q(w):
        wq, scale = L.quantize_conv_weight(w)
        return {"q": wq, "scale": scale}

    out: Dict[str, Any] = {
        "input": dict(params["input"], conv=q(params["input"]["conv"])),
        "blocks": [],
        "output": params["output"],
    }
    for p in params["blocks"]:
        blk = dict(p, conv1=q(p["conv1"]), conv2=q(p["conv2"]))
        if "shortcut" in p:
            blk["shortcut"] = dict(p["shortcut"],
                                   conv=q(p["shortcut"]["conv"]))
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


@functools.partial(jax.jit, static_argnames=("network", "dtype"))
def arcface_apply(params: Dict[str, Any], x: jnp.ndarray,
                  network: str = "ir_50", dtype=jnp.float32) -> jnp.ndarray:
    """(N, H, W, 3) normalized RGB -> (N, 512) L2-normalized embeddings."""
    specs = _network_specs(network)
    x = x.astype(dtype)
    p_in = params["input"]
    x = _conv(x, p_in["conv"], stride=1, padding=1)
    x = L.batch_norm(x, p_in["bn"])
    x = L.prelu(x, p_in["prelu"])
    for p_blk, (_, _, stride) in zip(params["blocks"], specs):
        x = _block_apply(x, p_blk, stride)
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
