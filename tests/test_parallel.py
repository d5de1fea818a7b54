"""Multi-device tests on the 8-way virtual CPU mesh: sharded gallery search
and the dp x tp ArcFace training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facekit.parallel import make_mesh, shard_gallery, sharded_cosine_topk
from facekit.ops.similarity import cosine_topk_xla
from facekit.train import make_train_step, train_shardings, train_state_init


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh({"gallery": 8})


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_sharded_search_matches_single_device(mesh8, rng):
    n, d, b = 4096, 512, 4
    gallery = _norm_rows(rng.normal(size=(n, d)).astype(np.float32))
    queries = _norm_rows(rng.normal(size=(b, d)).astype(np.float32))
    count = 3000

    g_sharded = shard_gallery(jnp.asarray(gallery), mesh8)
    v, i = sharded_cosine_topk(g_sharded, jnp.asarray(queries),
                               jnp.int32(count), k=3, mesh=mesh8)
    rv, ri = cosine_topk_xla(jnp.asarray(gallery), jnp.asarray(queries),
                             jnp.int32(count), k=3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-5)


def test_sharded_search_count_at_shard_boundary(mesh8, rng):
    n, b = 4096, 2
    gallery = _norm_rows(rng.normal(size=(n, 512)).astype(np.float32))
    queries = _norm_rows(rng.normal(size=(b, 512)).astype(np.float32))
    for count in (512, 513, 4096, 1):   # shard size is 512
        g = shard_gallery(jnp.asarray(gallery), mesh8)
        v, i = sharded_cosine_topk(g, jnp.asarray(queries),
                                   jnp.int32(count), k=1, mesh=mesh8)
        rv, ri = cosine_topk_xla(jnp.asarray(gallery), jnp.asarray(queries),
                                 jnp.int32(count), k=1)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_train_step_dp_tp():
    """One ArcFace train step over a (data=4, model=2) mesh; loss decreases
    over a few steps on a memorizable batch."""
    local_rng = np.random.default_rng(42)
    mesh = make_mesh({"data": 4, "model": 2})
    num_classes = 64
    state = train_state_init(jax.random.PRNGKey(0), num_classes,
                             network="ir_tiny", lr=0.02)
    state_sh, (img_sh, lbl_sh) = train_shardings(state, mesh)
    state = jax.device_put(state, state_sh)

    images = jnp.asarray(
        local_rng.normal(0, 1, size=(8, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray(local_rng.integers(0, num_classes, size=8),
                         jnp.int32)
    images = jax.device_put(images, img_sh)
    labels = jax.device_put(labels, lbl_sh)

    step = make_train_step(network="ir_tiny", lr=0.02)
    losses = []
    for _ in range(5):
        state, loss = step(state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses
    # head stays sharded over the model axis
    w_sharding = state.head["w"].sharding
    assert "model" in str(w_sharding.spec)


def test_checkpoint_roundtrip(tmp_path):
    from facekit.train.checkpoint import restore_checkpoint, save_checkpoint
    state = train_state_init(jax.random.PRNGKey(0), 16, network="ir_tiny")
    path = str(tmp_path / "ckpt" / "step_1")
    save_checkpoint(path, state)
    template = train_state_init(jax.random.PRNGKey(1), 16, network="ir_tiny")
    restored = restore_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(restored.head["w"]),
                                  np.asarray(state.head["w"]))
    a = jax.tree.leaves(restored.params)
    b = jax.tree.leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gallery_store_mesh_backed(mesh8, rng):
    """GalleryStore with a mesh: rows sharded, search matches single-device."""
    from facekit.gallery import GalleryStore
    store = GalleryStore(dtype="float32", use_pallas=False, mesh=mesh8)
    emb = rng.normal(size=(100, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store.load([f"u{i}" for i in range(100)], emb)
    # capacity divisible by shard count, array actually sharded
    assert store.capacity % 8 == 0
    assert len(store._device_arr.sharding.device_set) == 8
    vals, idx, names = store.search(jnp.asarray(emb[10:13]), k=1)
    assert [names[i] for i in idx[:, 0]] == ["u10", "u11", "u12"]
    np.testing.assert_allclose(vals[:, 0], 1.0, rtol=1e-5)


def test_train_step_remat():
    """Rematerialized train step produces the same loss as the plain one."""
    local_rng = np.random.default_rng(7)
    state = train_state_init(jax.random.PRNGKey(0), 16, network="ir_tiny",
                             lr=0.01)
    images = jnp.asarray(
        local_rng.normal(0, 1, size=(2, 112, 112, 3)).astype(np.float32))
    labels = jnp.asarray([1, 3], jnp.int32)
    step_plain = make_train_step(network="ir_tiny", lr=0.01)
    step_remat = make_train_step(network="ir_tiny", lr=0.01, remat=True)
    _, loss_a = step_plain(state, images, labels)
    _, loss_b = step_remat(state, images, labels)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
