"""Pure-functional NN layers (NHWC) used by the facekit model zoo.

Params are plain nested dicts/lists of jnp arrays (a valid pytree), produced
either by random init (tests/bench) or by converting a PyTorch state_dict
(facekit.weights.convert). Conventions:

  * conv weights are HWIO (converted from torch OIHW);
  * batch-norm is inference-only and keeps the torch parametrization
    (scale, bias, mean, var, eps=1e-5) so converted checkpoints match
    bit-for-bit; XLA folds the affine into the conv at compile time;
  * compute dtype is configurable (bf16 on TPU), accumulation is f32 via
    ``preferred_element_type``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# initializers (match torch defaults so random-weight parity tests line up)
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape_oihw: Tuple[int, ...], dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ on an OIHW conv weight, returned HWIO."""
    o, i, kh, kw = shape_oihw
    fan_in, fan_out = i * kh * kw, o * kh * kw
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    w = jax.random.uniform(key, (o, i, kh, kw), dtype, -a, a)
    return jnp.transpose(w, (2, 3, 1, 0))


def kaiming_uniform_conv(key, shape_oihw, dtype=jnp.float32):
    """torch Conv2d default init (kaiming_uniform a=sqrt(5)), HWIO output."""
    o, i, kh, kw = shape_oihw
    fan_in = i * kh * kw
    bound = float(1.0 / np.sqrt(fan_in)) * float(np.sqrt(3.0)) * float(np.sqrt(2.0 / (1 + 5)))
    w = jax.random.uniform(key, (o, i, kh, kw), dtype, -bound, bound)
    return jnp.transpose(w, (2, 3, 1, 0))


def bn_init(channels: int) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
        "mean": jnp.zeros((channels,), jnp.float32),
        "var": jnp.ones((channels,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# layer applications
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0,
           groups: int = 1, bias: Optional[jnp.ndarray] = None,
           dilation: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO weights, torch-compatible symmetric padding.

    Un-biased bf16 convs (the trained backbones) drop
    ``preferred_element_type``: the TPU MXU accumulates in f32 either
    way, so the single final rounding to bf16 is identical — and jax's
    conv TRANSPOSE rejects (bf16 operands, f32 preferred), which would
    break training under bf16 compute (make_train_step compute_dtype).
    BIASED convs (detector heads — never on a training grad path) keep
    the explicit f32 accumulation so the bias adds into the f32
    accumulator and the result rounds to bf16 exactly ONCE; dropping it
    there would round conv-then-bias separately, shifting head scores
    by an ulp and breaking bit-identity with exported engines."""
    preferred = {} if (x.dtype == jnp.bfloat16 and bias is None) else \
        {"preferred_element_type": jnp.float32}
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        rhs_dilation=(dilation, dilation),
        **preferred,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def quantize_conv_weight(w_hwio: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO weight.

    Returns (int8 HWIO, (O,) f32 scales) with w ~= q * scale[None,None,None,:].
    """
    amax = jnp.max(jnp.abs(w_hwio.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w_hwio.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def conv2d_int8(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
                stride: int = 1, padding: int = 0,
                groups: int = 1,
                ascale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """int8 conv: s8 x s8 -> s32 on the MXU, dequantized with
    (act_scale * per-channel weight scale).

    Halves the weight-streaming bandwidth vs bf16 and doubles MXU rate on
    hardware with native s8 matmul; the surrounding BN/PReLU stay in the
    compute dtype (XLA fuses the dequant into them). The facekit answer to
    the reference's fp16 TensorRT engines (conversion/arcface/torch2trt.py:42-44)
    — a lower-precision, higher-throughput serving point with measured
    drift bounds (tests/test_model_parity.py::test_arcface_int8_drift).

    Activation quantization, two modes:
      * dynamic (``ascale=None``): amax PER SAMPLE (over H, W, C) — a conv
        never mixes batch elements, so the dequant broadcasts (N,1,1,1)
        exactly, and one outlier face cannot widen the quantization step
        for its batch neighbours. Costs one full reduction pass over the
        input per conv.
      * static (``ascale`` = calibrated scalar): quantize is a pure
        elementwise op that XLA fuses into the producer — no reduction
        pass. Values beyond +-127*ascale saturate (standard post-training
        calibration semantics; see arcface.calibrate stats).
    Both modes keep embeddings bit-invariant to batch composition.
    """
    if ascale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3),
                       keepdims=True)
        ascale = jnp.maximum(amax, 1e-12) / 127.0
    else:
        ascale = jnp.asarray(ascale, jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (ascale * wscale.astype(jnp.float32))
    return out.astype(x.dtype)


def conv_any(x: jnp.ndarray, w, stride: int = 1, padding: int = 0,
             groups: int = 1, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Conv dispatch on the weight leaf: a plain HWIO array runs conv2d,
    a ``{"q": int8, "scale": (O,)}`` dict (from quantize_conv_weight) runs
    conv2d_int8 with dynamic per-sample activation scales unless the dict
    carries a calibrated scalar ``ascale``.

    Lets a whole model switch precision by transforming its PARAM tree
    (quantize_*_params) without touching its apply code — the detector
    models route every conv through here (facekit's analog of handing the
    reference's builder an int8/fp16 flag, conversion/*/torch2trt.py).
    """
    if isinstance(w, dict) and "q" in w:
        out = conv2d_int8(x, w["q"], w["scale"], stride=stride,
                          padding=padding, groups=groups,
                          ascale=w.get("ascale"))
        if bias is not None:
            out = (out.astype(jnp.float32)
                   + bias.astype(jnp.float32)).astype(x.dtype)
        return out
    return conv2d(x, w, stride=stride, padding=padding, groups=groups,
                  bias=bias)


def batch_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
               eps: float = BN_EPS) -> jnp.ndarray:
    """Inference batch-norm over the last axis (channels)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (p["bias"].astype(jnp.float32)
             - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
             ).astype(x.dtype)
    return x * scale + shift


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PReLU over the last axis."""
    a = alpha.astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """w is (out, in) torch layout."""
    out = jnp.dot(x, w.T.astype(x.dtype), preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def strided_identity(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """torch MaxPool2d(kernel=1, stride=s): pure subsampling."""
    if stride == 1:
        return x
    return x[:, ::stride, ::stride, :]


def nearest_resize_to(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') to an explicit size (NHWC)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = (np.arange(oh) * h) // oh
    cols = (np.arange(ow) * w) // ow
    return x[:, rows][:, :, cols]


# conv+bn compound units ----------------------------------------------------

def conv_bn_apply(x, p, stride=1, padding=1, act: str = "relu",
                  leaky_slope: float = 0.0, groups: int = 1):
    """conv -> BN -> (relu | leaky | none), the reference's conv_bn family
    (``conversion/retina/models/net.py:9-38``)."""
    x = conv_any(x, p["conv"], stride=stride, padding=padding, groups=groups)
    x = batch_norm(x, p["bn"])
    if act == "relu":
        x = relu(x)
    elif act == "leaky":
        x = leaky_relu(x, leaky_slope)
    return x


def conv_bn_init(key, cin, cout, ksize=3, init="kaiming"):
    fn = xavier_uniform if init == "xavier" else kaiming_uniform_conv
    return {"conv": fn(key, (cout, cin, ksize, ksize)), "bn": bn_init(cout)}


def conv_dw_apply(x, p, stride):
    """Depthwise-separable block: dw3x3+BN+ReLU then pw1x1+BN+ReLU
    (``conversion/retina/models/net.py:29-38``)."""
    c = x.shape[-1]
    x = conv_any(x, p["dw_conv"], stride=stride, padding=1, groups=c)
    x = relu(batch_norm(x, p["dw_bn"]))
    x = conv_any(x, p["pw_conv"], stride=1, padding=0)
    x = relu(batch_norm(x, p["pw_bn"]))
    return x


def conv_dw_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "dw_conv": kaiming_uniform_conv(k1, (cin, 1, 3, 3)),
        "dw_bn": bn_init(cin),
        "pw_conv": kaiming_uniform_conv(k2, (cout, cin, 1, 1)),
        "pw_bn": bn_init(cout),
    }
