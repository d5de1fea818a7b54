"""PyTorch state_dict -> facekit pytree conversion.

This is facekit's analog of the reference's offline torch->TensorRT
conversion pipeline (``conversion/retina/torch2trt.py``,
``conversion/arcface/torch2trt.py``): instead of building a serialized
``.engine``, we map the checkpoint tensors into the nested-dict pytrees
consumed by ``facekit.models`` (HWIO convs, NHWC activations) and persist
them with msgpack (facekit.weights.io). The converter operates on plain
numpy arrays so it has no hard torch dependency.

Key maps follow the reference model definitions:
  * ArcFace: ``conversion/arcface/model_irse.py`` (input_layer/body/output_layer
    Sequential indices);
  * RetinaFace: ``conversion/retina/models/retinaface.py`` +
    ``models/net.py`` (body.stageN via IntermediateLayerGetter, fpn, ssh1-3,
    ClassHead/BboxHead/LandmarkHead module lists).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from facekit.models.arcface import _block_specs  # architecture spec source
from facekit.models.retinaface import _STAGE1, _STAGE2, _STAGE3


class ConversionError(KeyError):
    """Checkpoint does not match the requested facekit model mapping."""

    def __str__(self):  # KeyError quotes its arg; keep the message readable
        return self.args[0] if self.args else ""


class _TrackedState:
    """Checkpoint wrapper: strips ``module.`` (DataParallel) prefixes,
    records which keys the conversion consumed, and turns a missing key
    into a loud diagnostic instead of a bare KeyError.

    The facekit analog of the reference's ``check_keys`` + ``remove_prefix``
    guard (``conversion/retina/torch2trt.py:28-64``): conversion must
    refuse silent partial loads — a real-world checkpoint with extra heads,
    renamed layers, or missing tensors fails with the offending key sets,
    not a stack trace or a quietly wrong model."""

    #: torch bookkeeping never used by inference params
    _IGNORED_SUFFIXES = (".num_batches_tracked",)

    def __init__(self, sd: Mapping[str, Any]):
        self.data: Dict[str, Any] = {}
        for k, v in sd.items():
            self.data[k[len("module."):] if k.startswith("module.") else k] = v
        self.consumed: set = set()

    def __contains__(self, key: str) -> bool:
        return key in self.data

    def __getitem__(self, key: str):
        if key not in self.data:
            near = sorted(k for k in self.data
                          if k.split(".")[0] == key.split(".")[0])[:8]
            hint = ("; checkpoint keys under the same module: "
                    + ", ".join(near)) if near else ""
            raise ConversionError(
                f"checkpoint is missing key `{key}` required by this model "
                f"mapping ({len(self.data)} keys present{hint}). Wrong "
                "--network variant, or a differently-structured checkpoint?")
        self.consumed.add(key)
        return self.data[key]

    def check_consumed(self, model: str) -> None:
        """Fail if the checkpoint held tensors the mapping never consumed
        (extra heads, optimizer state, fused training wrappers...)."""
        left = [k for k in self.data
                if k not in self.consumed
                and not k.endswith(self._IGNORED_SUFFIXES)]
        if left:
            shown = ", ".join(sorted(left)[:12])
            more = f" (+{len(left) - 12} more)" if len(left) > 12 else ""
            raise ConversionError(
                f"{len(left)} checkpoint keys were never consumed by the "
                f"{model} mapping: {shown}{more}. Refusing a silent partial "
                "load — strip training-only state or pick the matching "
                "network variant (pass strict=False to convert anyway).")


def _tracked(sd: Mapping[str, Any]) -> "_TrackedState":
    return sd if isinstance(sd, _TrackedState) else _TrackedState(sd)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(sd: Mapping[str, Any], key: str) -> jnp.ndarray:
    """OIHW torch conv weight -> HWIO."""
    return jnp.asarray(_np(sd[key]).transpose(2, 3, 1, 0))


def _bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"])),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
        "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(_np(sd[prefix + ".running_var"])),
    }


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.tar checkpoint into {key: numpy array} (needs torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):  # DataParallel prefix, as the reference
            k = k[len("module."):]   # strips in torch2trt.py:47-52
        out[k] = _np(v)
    return out


# ---------------------------------------------------------------------------
# ArcFace IR / IR-SE
# ---------------------------------------------------------------------------

def convert_arcface_state_dict(sd: Mapping[str, Any],
                               network: str = "ir_50",
                               strict: bool = True) -> Dict[str, Any]:
    sd = _tracked(sd)
    base = network.replace("ir_se", "ir")
    specs = _block_specs(base)
    params: Dict[str, Any] = {
        "input": {
            "conv": _conv(sd, "input_layer.0.weight"),
            "bn": _bn(sd, "input_layer.1"),
            "prelu": jnp.asarray(_np(sd["input_layer.2.weight"])),
        },
        "blocks": [],
        "output": {
            "bn2d": _bn(sd, "output_layer.0"),
            "linear": {
                "w": jnp.asarray(_np(sd["output_layer.3.weight"])),
                "b": jnp.asarray(_np(sd["output_layer.3.bias"])),
            },
            "bn1d": _bn(sd, "output_layer.4"),
        },
    }
    for i, (in_c, depth, stride) in enumerate(specs):
        pre = f"body.{i}"
        blk: Dict[str, Any] = {
            "bn1": _bn(sd, f"{pre}.res_layer.0"),
            "conv1": _conv(sd, f"{pre}.res_layer.1.weight"),
            "prelu": jnp.asarray(_np(sd[f"{pre}.res_layer.2.weight"])),
            "conv2": _conv(sd, f"{pre}.res_layer.3.weight"),
            "bn2": _bn(sd, f"{pre}.res_layer.4"),
        }
        if in_c != depth:
            blk["shortcut"] = {
                "conv": _conv(sd, f"{pre}.shortcut_layer.0.weight"),
                "bn": _bn(sd, f"{pre}.shortcut_layer.1"),
            }
        if f"{pre}.res_layer.5.fc1.weight" in sd:  # IR-SE variant
            blk["se"] = {
                "fc1": _conv(sd, f"{pre}.res_layer.5.fc1.weight"),
                "fc2": _conv(sd, f"{pre}.res_layer.5.fc2.weight"),
            }
        params["blocks"].append(blk)
    if strict:
        sd.check_consumed(f"arcface {network}")
    return params


# ---------------------------------------------------------------------------
# RetinaFace MobileNetV1x0.25
# ---------------------------------------------------------------------------

def _conv_bn_unit(sd, prefix) -> Dict[str, Any]:
    return {"conv": _conv(sd, prefix + ".0.weight"), "bn": _bn(sd, prefix + ".1")}


def _conv_dw_unit(sd, prefix) -> Dict[str, Any]:
    return {
        "dw_conv": _conv(sd, prefix + ".0.weight"),
        "dw_bn": _bn(sd, prefix + ".1"),
        "pw_conv": _conv(sd, prefix + ".3.weight"),
        "pw_bn": _bn(sd, prefix + ".4"),
    }


def _head_unit(sd, prefix) -> Dict[str, Any]:
    return {
        "w": _conv(sd, prefix + ".conv1x1.weight"),
        "b": jnp.asarray(_np(sd[prefix + ".conv1x1.bias"])),
    }


def convert_retinaface_state_dict(sd: Mapping[str, Any],
                                  strict: bool = True) -> Dict[str, Any]:
    sd = _tracked(sd)
    params: Dict[str, Any] = {
        "stem": _conv_bn_unit(sd, "body.stage1.0"),
        "stage1": [_conv_dw_unit(sd, f"body.stage1.{i + 1}")
                   for i in range(len(_STAGE1))],
        "stage2": [_conv_dw_unit(sd, f"body.stage2.{i}")
                   for i in range(len(_STAGE2))],
        "stage3": [_conv_dw_unit(sd, f"body.stage3.{i}")
                   for i in range(len(_STAGE3))],
        "fpn": {
            "output1": _conv_bn_unit(sd, "fpn.output1"),
            "output2": _conv_bn_unit(sd, "fpn.output2"),
            "output3": _conv_bn_unit(sd, "fpn.output3"),
            "merge1": _conv_bn_unit(sd, "fpn.merge1"),
            "merge2": _conv_bn_unit(sd, "fpn.merge2"),
        },
        "class_head": [_head_unit(sd, f"ClassHead.{i}") for i in range(3)],
        "bbox_head": [_head_unit(sd, f"BboxHead.{i}") for i in range(3)],
    }
    for n in (1, 2, 3):
        # note the reference's mixed-case attribute: conv7x7_3 (net.py:53)
        params[f"ssh{n}"] = {
            "conv3x3": _conv_bn_unit(sd, f"ssh{n}.conv3X3"),
            "conv5x5_1": _conv_bn_unit(sd, f"ssh{n}.conv5X5_1"),
            "conv5x5_2": _conv_bn_unit(sd, f"ssh{n}.conv5X5_2"),
            "conv7x7_2": _conv_bn_unit(sd, f"ssh{n}.conv7X7_2"),
            "conv7x7_3": _conv_bn_unit(sd, f"ssh{n}.conv7x7_3"),
        }
    if "LandmarkHead.0.conv1x1.weight" in sd:
        params["ldm_head"] = [_head_unit(sd, f"LandmarkHead.{i}")
                              for i in range(3)]
    if strict:
        sd.check_consumed("retinaface")
    return params


# ---------------------------------------------------------------------------
# Slim / RFB light detectors (conversion/retina/models/net_slim.py, net_rfb.py)
# ---------------------------------------------------------------------------

def _biased_conv(sd, prefix):
    return {"w": _conv(sd, prefix + ".weight"),
            "b": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _depth_conv2d_unit(sd, prefix):
    """depth_conv2d Sequential: .0 biased dw conv, .1 ReLU, .2 biased 1x1."""
    return {
        "dw_w": _conv(sd, prefix + ".0.weight"),
        "dw_b": jnp.asarray(_np(sd[prefix + ".0.bias"])),
        "pw_w": _conv(sd, prefix + ".2.weight"),
        "pw_b": jnp.asarray(_np(sd[prefix + ".2.bias"])),
    }


def _basic_conv_unit(sd, prefix):
    p = {"w": _conv(sd, prefix + ".conv.weight")}
    if prefix + ".bn.weight" in sd:
        p["bn"] = _bn(sd, prefix + ".bn")
    else:
        p["b"] = jnp.asarray(_np(sd[prefix + ".conv.bias"]))
    return p


def convert_lightdet_state_dict(sd: Mapping[str, Any],
                                variant: str = "slim",
                                strict: bool = True) -> Dict[str, Any]:
    from facekit.models.lightdet import _DW_CHAIN

    sd = _tracked(sd)
    params: Dict[str, Any] = {
        "conv1": _conv_bn_unit(sd, "conv1"),
        "dw": [],
        "conv14_a": _biased_conv(sd, "conv14.0"),
        "conv14_b": _depth_conv2d_unit(sd, "conv14.2"),
    }
    for i in range(len(_DW_CHAIN)):            # conv2..conv13
        name = f"conv{i + 2}"
        if variant == "rfb" and i == 6:
            params["dw"].append(None)
            params["rfb8"] = {
                "b0": [_basic_conv_unit(sd, f"conv8.branch0.{j}")
                       for j in range(3)],
                "b1": [_basic_conv_unit(sd, f"conv8.branch1.{j}")
                       for j in range(3)],
                "b2": [_basic_conv_unit(sd, f"conv8.branch2.{j}")
                       for j in range(4)],
                "linear": _basic_conv_unit(sd, "conv8.ConvLinear"),
                "shortcut": _basic_conv_unit(sd, "conv8.shortcut"),
            }
        else:
            params["dw"].append(_conv_dw_unit(sd, name))
    for name in ("loc", "conf", "landm"):
        heads = []
        for lvl in range(4):
            if lvl < 3:
                heads.append(_depth_conv2d_unit(sd, f"{name}.{lvl}"))
            else:
                heads.append(_biased_conv(sd, f"{name}.{lvl}"))
        params[name] = heads
    if strict:
        sd.check_consumed(f"lightdet {variant}")
    return params
