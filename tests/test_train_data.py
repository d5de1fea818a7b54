"""Training data loader: identity-folder scan (the reference's enrollment
layout, src/common.cpp:8-41), prefetched decode, serving-parity
normalization, and the checkpoint -> serving-weights CLI bridge."""

import os

import cv2
import numpy as np
import pytest

from facekit.train.data import FolderDataset, data_loader


@pytest.fixture()
def image_root(tmp_path, rng):
    imgs = {}
    for k, cname in enumerate(["alice", "bob", "carol"]):
        cdir = tmp_path / cname
        cdir.mkdir()
        for i in range(4):
            img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
            cv2.imwrite(str(cdir / f"{i}.jpg"), img)
            imgs[(k, i)] = img
    (tmp_path / "notes.txt").write_text("not an identity")
    (tmp_path / "empty_dir").mkdir()
    return str(tmp_path), imgs


def test_folder_dataset_scan(image_root):
    root, _ = image_root
    ds = FolderDataset(root)
    assert ds.class_names == ["alice", "bob", "carol"]
    assert len(ds) == 12
    assert ds.num_classes == 3
    assert sorted(set(ds.labels)) == [0, 1, 2]


def test_loader_epoch_covers_all_and_normalizes(image_root):
    root, _ = image_root
    ds = FolderDataset(root)
    seen_labels = []
    for images, labels in data_loader(ds, batch_size=4, rec_hw=(112, 112),
                                      shuffle=True, seed=1,
                                      augment_flip=False, num_epochs=1):
        assert images.shape == (4, 112, 112, 3)
        assert images.dtype == np.float32
        # serving-parity normalization range: (x - 127.5) / 128
        assert images.min() >= -1.0 and images.max() <= 1.0
        assert labels.dtype == np.int32
        seen_labels.extend(labels.tolist())
    assert len(seen_labels) == 12          # full epoch, drop_remainder ok
    assert sorted(set(seen_labels)) == [0, 1, 2]


def test_loader_matches_rec_normalize(image_root):
    """Loader output must equal the serving path's rec_normalize on the
    same image (BGR->RGB + scale), or train/serve distributions diverge."""
    import jax.numpy as jnp
    from facekit.ops.preprocess import rec_normalize

    root, imgs = image_root
    ds = FolderDataset(root)
    images, labels = next(iter(data_loader(
        ds, batch_size=1, rec_hw=(64, 48), shuffle=False,
        augment_flip=False, num_epochs=1, drop_remainder=False)))
    raw = cv2.imread(ds.paths[0])
    ref = np.asarray(rec_normalize(jnp.asarray(raw, jnp.float32)))
    np.testing.assert_allclose(images[0], ref, atol=1e-5)


def test_loader_streams_multiple_epochs(image_root):
    root, _ = image_root
    ds = FolderDataset(root)
    it = data_loader(ds, batch_size=6, num_epochs=None, seed=2)
    for _ in range(5):                      # > one epoch worth
        images, labels = next(it)
        assert images.shape[0] == 6
    it.close()


def test_loader_feeds_train_step(image_root):
    """Two real train steps from the loader (ir_tiny)."""
    import jax
    from facekit.train import make_train_step, train_state_init

    root, _ = image_root
    ds = FolderDataset(root)
    state = train_state_init(jax.random.PRNGKey(0), ds.num_classes,
                             network="ir_tiny", lr=0.001)
    step = make_train_step(network="ir_tiny", lr=0.001)
    losses = []
    for images, labels in data_loader(ds, batch_size=4, num_epochs=1,
                                      seed=3):
        state, loss = step(state, images, labels)
        losses.append(float(loss))
    assert len(losses) == 3
    assert np.isfinite(losses).all()


def test_checkpoint_to_serving_weights_cli(tmp_path):
    """orbax train checkpoint -> msgpack serving pytree via the CLI."""
    import jax
    from facekit.train import train_state_init
    from facekit.train.checkpoint import save_checkpoint
    from facekit.weights import __main__ as wcli
    from facekit.weights.io import load_params

    state = train_state_init(jax.random.PRNGKey(3), 5, network="ir_tiny")
    ckpt = str(tmp_path / "ckpt" / "step_7")
    save_checkpoint(ckpt, state)
    out = str(tmp_path / "rec.msgpack")
    wcli.main(["train-checkpoint", ckpt, out,
               "--network", "ir_tiny", "--num-classes", "5"])
    template = train_state_init(jax.random.PRNGKey(9), 5,
                                network="ir_tiny").params
    restored = load_params(template, out)
    np.testing.assert_array_equal(
        np.asarray(restored["input"]["conv"]),
        np.asarray(state.params["input"]["conv"]))


def test_loader_drop_remainder_never_short(image_root):
    """drop_remainder promises fixed-size batches even when the dataset is
    smaller than the batch (no short batch leaking into jitted steps)."""
    root, _ = image_root
    ds = FolderDataset(root)          # 12 images
    batches = list(data_loader(ds, batch_size=32, num_epochs=2,
                               drop_remainder=True))
    assert batches == []
    batches = list(data_loader(ds, batch_size=32, num_epochs=1,
                               drop_remainder=False))
    assert len(batches) == 1 and batches[0][0].shape[0] == 12
