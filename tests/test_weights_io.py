"""Weight persistence: msgpack round-trip and the converter CLI path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facekit.models import arcface_init, arcface_apply, retinaface_init
from facekit.weights import load_params, save_params


def test_msgpack_roundtrip(tmp_path, rng):
    params = arcface_init(jax.random.PRNGKey(0), network="ir_tiny")
    path = str(tmp_path / "w.msgpack")
    save_params(params, path)
    template = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    loaded = load_params(template, path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, loaded)
    # outputs identical through a forward pass
    x = jnp.asarray(rng.normal(size=(1, 112, 112, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(arcface_apply(params, x, network="ir_tiny")),
        np.asarray(arcface_apply(loaded, x, network="ir_tiny")))


def test_retinaface_roundtrip(tmp_path):
    params = retinaface_init(jax.random.PRNGKey(0))
    path = str(tmp_path / "d.msgpack")
    save_params(params, path)
    loaded = load_params(retinaface_init(jax.random.PRNGKey(1)), path)
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(loaded)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converter_cli_arcface(tmp_path, reference_dir):
    """End-to-end: torch checkpoint file -> CLI -> loadable msgpack."""
    torch = pytest.importorskip("torch")
    import oracles
    mod = oracles.load_arcface_oracle()
    torch.manual_seed(0)
    model = mod.IR_50([112, 112]).eval()
    ckpt = str(tmp_path / "ir50.pth")
    torch.save(model.state_dict(), ckpt)

    out = str(tmp_path / "ir50.msgpack")
    from facekit.weights.__main__ import main
    main(["arcface", ckpt, out, "--network", "ir_50"])

    template = arcface_init(jax.random.PRNGKey(0), network="ir_50")
    loaded = load_params(template, out)
    x = np.zeros((1, 112, 112, 3), np.float32)
    emb = arcface_apply(loaded, jnp.asarray(x), network="ir_50")
    assert emb.shape == (1, 512)
