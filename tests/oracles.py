"""Torch oracles for parity tests.

Loads the *reference's own* PyTorch model definitions at test time (the
reference tree is mounted read-only; nothing is copied into this repo) so we
can check the JAX reimplementation against the exact source of truth. The
reference RetinaFace files import torchvision, which is not installed here,
so we register a minimal shim providing the one symbol they use
(``torchvision.models._utils.IntermediateLayerGetter``).
"""

from __future__ import annotations

import importlib.util
import sys
import types
from collections import OrderedDict

import torch
import torch.nn as nn

REF = "/root/reference"


def _install_torchvision_shim() -> None:
    if "torchvision" in sys.modules:
        return

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = {str(k): str(v) for k, v in return_layers.items()}
            remaining = dict(orig)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_utils = types.ModuleType("torchvision.models._utils")
    tv_utils.IntermediateLayerGetter = IntermediateLayerGetter
    tv_det = types.ModuleType("torchvision.models.detection")
    tv_bb = types.ModuleType("torchvision.models.detection.backbone_utils")
    tv.models = tv_models
    tv_models._utils = tv_utils
    tv_models.detection = tv_det
    tv_det.backbone_utils = tv_bb
    for name, mod in [
        ("torchvision", tv),
        ("torchvision.models", tv_models),
        ("torchvision.models._utils", tv_utils),
        ("torchvision.models.detection", tv_det),
        ("torchvision.models.detection.backbone_utils", tv_bb),
    ]:
        sys.modules[name] = mod


def load_arcface_oracle():
    """Reference IR-50 torch model, eval mode."""
    spec = importlib.util.spec_from_file_location(
        "ref_model_irse", f"{REF}/conversion/arcface/model_irse.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_retinaface_oracle():
    """Reference RetinaFace torch model module (with-landmarks variant)."""
    _install_torchvision_shim()
    if f"{REF}/conversion/retina" not in sys.path:
        sys.path.insert(0, f"{REF}/conversion/retina")
    import models.retinaface as ref_retinaface  # noqa: WPS433
    import importlib as _il
    _il.reload(ref_retinaface)
    return ref_retinaface


RETINA_CFG = {
    "name": "mobilenet0.25",
    "min_sizes": [[10, 20], [32, 64], [128, 256]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "pretrain": False,
    "return_layers": {"stage1": 1, "stage2": 2, "stage3": 3},
    "in_channel": 32,
    "out_channel": 64,
}
