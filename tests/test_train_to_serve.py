"""Train -> checkpoint -> serve roundtrip: the full framework loop.

The reference has no training at all (SURVEY.md §2.9) and ships no weights;
its workflow is offline torch -> TensorRT engines. facekit closes the loop
natively: train an ArcFace backbone (margin head), persist the backbone as
a serving pytree, load it into the serving pipeline, enroll identities into
the gallery, and recognize held-out samples — all inside the framework.
"""

import numpy as np
import jax
import jax.numpy as jnp

from facekit.config import FaceKitConfig
from facekit.gallery import GalleryStore
from facekit.pipeline import FacePipeline
from facekit.train import make_train_step, train_state_init
from facekit.weights.io import load_params, save_params


def test_train_checkpoint_serve_roundtrip(tmp_path):
    # own deterministic rng: the shared session fixture's state depends on
    # which tests ran before, and SGD at tiny batch sizes is sensitive to
    # the data draw
    rng = np.random.default_rng(42)
    n_ids, n_query = 6, 2
    # synthetic identities: distinct base "faces" in pixel space; samples
    # are the base plus small per-sample noise
    base = rng.uniform(40, 215, size=(n_ids, 112, 112, 3))

    def sample(k):
        return np.clip(base[k] + rng.normal(0, 12, base[k].shape),
                       0, 255).astype(np.float32)

    train_imgs = np.stack([sample(k) for k in range(n_ids) for _ in range(2)])
    train_lbls = np.repeat(np.arange(n_ids), 2).astype(np.int32)

    # --- train a few steps; loss must decrease --------------------------
    state = train_state_init(jax.random.PRNGKey(0), n_ids,
                             network="ir_tiny", lr=0.003)
    step = make_train_step(network="ir_tiny", lr=0.003)
    imgs = jnp.asarray((train_imgs - 127.5) / 128.0)  # rec_normalize space
    lbls = jnp.asarray(train_lbls)
    losses = []
    for _ in range(10):
        state, loss = step(state, imgs, lbls)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # --- persist the trained backbone as a serving pytree ---------------
    path = str(tmp_path / "ir_tiny_trained.msgpack")
    save_params(jax.device_get(state.params), path)
    template = train_state_init(jax.random.PRNGKey(1), n_ids,
                                network="ir_tiny").params
    restored = load_params(template, path)

    # --- serve with it: enroll one crop per identity, query held-out ----
    cfg = FaceKitConfig(rec_network="ir_tiny", compute_dtype="float32")
    pipe = FacePipeline(cfg, {"unused": None}, restored)
    enroll = np.stack([sample(k) for k in range(n_ids)])
    store = GalleryStore(dtype="float32", use_pallas=False)
    store.load([f"id{k}" for k in range(n_ids)],
               pipe.embed_cropped_batch(enroll))

    queries = np.stack([sample(k) for k in range(n_ids)
                        for _ in range(n_query)])
    q_lbls = np.repeat(np.arange(n_ids), n_query)
    vals, idx, names = store.search(
        jnp.asarray(pipe.embed_cropped_batch(queries)), k=1)
    pred = np.array([int(names[i][2:]) for i in idx[:, 0]])
    acc = float((pred == q_lbls).mean())
    assert acc >= 0.75, (acc, pred, q_lbls)
    # same-identity similarity should be high
    assert np.median(vals[:, 0]) > 0.5, vals[:, 0]
