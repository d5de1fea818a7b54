"""Slim/RFB detector parity vs the reference net_slim.py / net_rfb.py."""

import importlib.util
import sys

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from facekit.models.lightdet import lightdet_apply  # noqa: E402
from facekit.ops.anchors import (SLIM_RFB_MIN_SIZES, SLIM_RFB_STEPS,  # noqa: E402
                                 generate_anchors, num_anchors)
from facekit.weights.convert import convert_lightdet_state_dict  # noqa: E402
import oracles  # noqa: E402


def _load(reference_dir, fname, clsname):
    oracles._install_torchvision_shim()
    spec = importlib.util.spec_from_file_location(
        f"ref_{clsname}", f"{reference_dir}/conversion/retina/models/{fname}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, clsname)


def _randomize(model, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
            elif isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0, 0.1)
                if m.bias is not None:
                    m.bias.uniform_(-0.1, 0.1)
    return model.eval()


@pytest.mark.parametrize("fname,clsname,variant", [
    ("net_slim.py", "Slim", "slim"),
    ("net_rfb.py", "RFB", "rfb"),
])
def test_lightdet_parity(reference_dir, rng, fname, clsname, variant):
    cls = _load(reference_dir, fname, clsname)
    model = _randomize(cls(cfg=None, phase="test"), seed=3)
    x = rng.normal(0, 1, size=(1, 3, 320, 320)).astype(np.float32)
    with torch.no_grad():
        ref_loc, ref_conf, ref_ldm = model(torch.from_numpy(x))

    params = convert_lightdet_state_dict(model.state_dict(), variant)
    loc, conf, ldm = lightdet_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    variant=variant)
    a = num_anchors((320, 320), SLIM_RFB_STEPS, SLIM_RFB_MIN_SIZES)
    assert loc.shape == (1, a, 4) == tuple(ref_loc.shape)
    np.testing.assert_allclose(np.asarray(loc), ref_loc.numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ldm), ref_ldm.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_slim_rfb_anchor_layout():
    """4-level anchors: per-level count = ceil(H/s)*ceil(W/s)*len(min_sizes)."""
    anchors = generate_anchors((320, 320), SLIM_RFB_STEPS, SLIM_RFB_MIN_SIZES)
    expect = (40 * 40 * 3) + (20 * 20 * 2) + (10 * 10 * 2) + (5 * 5 * 3)
    assert anchors.shape == (expect, 4)
