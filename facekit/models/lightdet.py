"""Slim and RFB lightweight face detectors (the reference's alt backbones).

Parity targets: ``conversion/retina/models/net_slim.py`` and ``net_rfb.py``,
selectable in the reference's conversion CLI via ``--network``
(``conversion/retina/torch2trt.py:72-83``) with anchors from ``cfg_slim`` /
``cfg_rfb`` (``conversion/retina/config.py:22-52``): 4 SSD-style levels at
strides (8, 16, 32, 64) with (3, 2, 2, 3) anchors per cell and landmark
heads included.

Shared structure (net_slim.py:33-132 / net_rfb.py:100-199):
  conv1 conv_bn(3,16,s2); conv2-13 conv_dw chain; conv8 differs (Slim:
  conv_dw(64,64,1); RFB: BasicRFB(64,64,scale=1.0)); conv14 = 1x1(256->64)
  + ReLU + depth_conv2d(64,256,k3,s2,p1) + ReLU. Heads: depth_conv2d on
  levels 0-2, plain 3x3 conv on level 3. depth_conv2d = biased depthwise
  conv + ReLU + biased 1x1 (net_slim.py:15-20).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from facekit.models import layers as L

# (cin, cout, stride) for conv2..conv13 (conv8 handled specially for RFB)
_DW_CHAIN = [(16, 32, 1), (32, 32, 2), (32, 32, 1), (32, 64, 2),
             (64, 64, 1), (64, 64, 1), (64, 64, 1),          # conv2..conv8
             (64, 128, 2), (128, 128, 1), (128, 128, 1),     # conv9..conv11
             (128, 256, 2), (256, 256, 1)]                   # conv12..conv13
_LEVEL_CH = (64, 128, 256, 256)
_LEVEL_ANCHORS = (3, 2, 2, 3)


# -- units --------------------------------------------------------------------

def _depth_conv2d_init(key, cin, cout, ksize):
    k1, k2 = jax.random.split(key)
    return {
        "dw_w": L.kaiming_uniform_conv(k1, (cin, 1, ksize, ksize)),
        "dw_b": jnp.zeros((cin,), jnp.float32),
        "pw_w": L.kaiming_uniform_conv(k2, (cout, cin, 1, 1)),
        "pw_b": jnp.zeros((cout,), jnp.float32),
    }


def _depth_conv2d_apply(x, p, stride=1, padding=0):
    c = x.shape[-1]
    x = L.conv2d(x, p["dw_w"], stride=stride, padding=padding, groups=c,
                 bias=p["dw_b"])
    x = L.relu(x)
    return L.conv2d(x, p["pw_w"], bias=p["pw_b"])


def _basic_conv_init(key, cin, cout, ksize, bn=True):
    p = {"w": (L.kaiming_uniform_conv(key, (cout, cin, ksize, ksize)))}
    if bn:
        p["bn"] = L.bn_init(cout)
    else:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _basic_conv_apply(x, p, stride=1, padding=0, dilation=1, act=True):
    x = L.conv2d(x, p["w"], stride=stride, padding=padding,
                 dilation=dilation, bias=p.get("b"))
    if "bn" in p:
        x = L.batch_norm(x, p["bn"])
    return L.relu(x) if act else x


def _rfb_init(key, cin, cout, map_reduce=8):
    inter = cin // map_reduce
    ks = jax.random.split(key, 12)
    return {
        "b0": [_basic_conv_init(ks[0], cin, inter, 1),
               _basic_conv_init(ks[1], inter, 2 * inter, 3),
               _basic_conv_init(ks[2], 2 * inter, 2 * inter, 3)],
        "b1": [_basic_conv_init(ks[3], cin, inter, 1),
               _basic_conv_init(ks[4], inter, 2 * inter, 3),
               _basic_conv_init(ks[5], 2 * inter, 2 * inter, 3)],
        "b2": [_basic_conv_init(ks[6], cin, inter, 1),
               _basic_conv_init(ks[7], inter, (inter // 2) * 3, 3),
               _basic_conv_init(ks[8], (inter // 2) * 3, 2 * inter, 3),
               _basic_conv_init(ks[9], 2 * inter, 2 * inter, 3)],
        "linear": _basic_conv_init(ks[10], 6 * inter, cout, 1),
        "shortcut": _basic_conv_init(ks[11], cin, cout, 1),
    }


def _rfb_apply(x, p, scale=1.0, vision=1):
    # branch0: 1x1(no relu) -> 3x3 -> 3x3 dil=v+1 (no relu)
    b0 = _basic_conv_apply(x, p["b0"][0], act=False)
    b0 = _basic_conv_apply(b0, p["b0"][1], padding=1)
    b0 = _basic_conv_apply(b0, p["b0"][2], padding=vision + 1,
                           dilation=vision + 1, act=False)
    b1 = _basic_conv_apply(x, p["b1"][0], act=False)
    b1 = _basic_conv_apply(b1, p["b1"][1], padding=1)
    b1 = _basic_conv_apply(b1, p["b1"][2], padding=vision + 2,
                           dilation=vision + 2, act=False)
    b2 = _basic_conv_apply(x, p["b2"][0], act=False)
    b2 = _basic_conv_apply(b2, p["b2"][1], padding=1)
    b2 = _basic_conv_apply(b2, p["b2"][2], padding=1)
    b2 = _basic_conv_apply(b2, p["b2"][3], padding=vision + 4,
                           dilation=vision + 4, act=False)
    out = jnp.concatenate([b0, b1, b2], axis=-1)
    out = _basic_conv_apply(out, p["linear"], act=False)
    short = _basic_conv_apply(x, p["shortcut"], act=False)
    return L.relu(out * scale + short)


def _head_init(key, level: int, dim: int):
    cin = _LEVEL_CH[level]
    n_anchor = _LEVEL_ANCHORS[level]
    if level < 3:
        return _depth_conv2d_init(key, cin, n_anchor * dim, 3)
    w = L.kaiming_uniform_conv(key, (n_anchor * dim, cin, 3, 3))
    return {"w": w, "b": jnp.zeros((n_anchor * dim,), jnp.float32)}


def _head_apply(x, p, level: int, dim: int):
    if level < 3:
        out = _depth_conv2d_apply(x, p, padding=1)
    else:
        out = L.conv2d(x, p["w"], padding=1, bias=p["b"])
    n, h, w, c = out.shape
    return out.reshape(n, h * w * _LEVEL_ANCHORS[level], dim)


# -- full networks -------------------------------------------------------------

def lightdet_init(key, variant: str = "slim") -> Dict[str, Any]:
    keys = jax.random.split(key, 32)
    it = iter(range(32))

    def nk():
        return keys[next(it)]

    params: Dict[str, Any] = {
        "conv1": L.conv_bn_init(nk(), 3, 16),
        "dw": [],
        "conv14_a": {"w": L.kaiming_uniform_conv(nk(), (64, 256, 1, 1)),
                     "b": jnp.zeros((64,), jnp.float32)},
        "conv14_b": _depth_conv2d_init(nk(), 64, 256, 3),
    }
    for i, (ci, co, s) in enumerate(_DW_CHAIN):
        if variant == "rfb" and i == 6:  # conv8 is the RFB block
            params["rfb8"] = _rfb_init(nk(), 64, 64)
            params["dw"].append(None)
        else:
            params["dw"].append(L.conv_dw_init(nk(), ci, co))
    for name, dim in (("loc", 4), ("conf", 2), ("landm", 10)):
        params[name] = [_head_init(nk(), lvl, dim) for lvl in range(4)]
    return params


@functools.partial(jax.jit, static_argnames=("variant", "dtype"))
def lightdet_apply(params: Dict[str, Any], x: jnp.ndarray,
                   variant: str = "slim", dtype=jnp.float32):
    """(N, H, W, 3) normalized BGR -> (loc (N,A,4), conf (N,A,2) softmaxed,
    ldm (N,A,10)) over 4 levels at strides 8/16/32/64."""
    x = x.astype(dtype)
    x = L.conv_bn_apply(x, params["conv1"], stride=2)
    feats: List[jnp.ndarray] = []
    for i, (spec, p) in enumerate(zip(_DW_CHAIN, params["dw"])):
        if p is None:                      # RFB conv8
            x = _rfb_apply(x, params["rfb8"], scale=1.0)
        else:
            x = L.conv_dw_apply(x, p, spec[2])
        if i in (6, 9, 11):                # after conv8, conv11, conv13
            feats.append(x)
    x = L.relu(L.conv2d(x, params["conv14_a"]["w"],
                        bias=params["conv14_a"]["b"]))
    x = L.relu(_depth_conv2d_apply(x, params["conv14_b"], stride=2,
                                   padding=1))
    feats.append(x)

    loc = jnp.concatenate([
        _head_apply(f, p, lvl, 4)
        for lvl, (f, p) in enumerate(zip(feats, params["loc"]))], 1)
    logits = jnp.concatenate([
        _head_apply(f, p, lvl, 2)
        for lvl, (f, p) in enumerate(zip(feats, params["conf"]))], 1)
    ldm = jnp.concatenate([
        _head_apply(f, p, lvl, 10)
        for lvl, (f, p) in enumerate(zip(feats, params["landm"]))], 1)
    conf = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return loc.astype(jnp.float32), conf, ldm.astype(jnp.float32)
