"""Batch-enrollment ("gen") mode: folder tree -> DB (reference src/app.cpp:69-99)."""

import cv2
import jax
import numpy as np
import pytest

from facekit.config import FaceKitConfig
from facekit.models import arcface_init, retinaface_init
from facekit.server import FaceServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("gdb") / "gen.db"),
        input_frameWidth=320, input_frameHeight=240,
        det_inputShape=(3, 192, 192), compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False)
    det = retinaface_init(jax.random.PRNGKey(0))
    rec = arcface_init(jax.random.PRNGKey(1))
    return FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)


def test_enroll_folder_cropped(server, tmp_path, rng):
    src = tmp_path / "people"
    for name in ("alice", "bob"):
        d = src / name
        d.mkdir(parents=True)
        for i in range(2):
            img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)
    # a stray file at the top level must be ignored (class dirs only)
    (src / "README.txt").write_text("not an image dir")

    n = server.enroll_folder(str(src), is_cropped=True)
    assert n == 4
    assert server.db.get_num_embeddings() == 4
    assert set(server.db.get_user_dict()) == {"alice", "bob"}

    count = server.reload_gallery()
    assert count == 4
    names, embs = server.db.get_embeddings()
    assert sorted(set(names)) == ["alice", "bob"]
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-4)

    # enrolled rows must match the serving-path embedder on the same
    # crops (the batched gen path pads to server_batchSize; padding must
    # not leak into the stored embeddings)
    paths = sorted((src / "alice").iterdir()) + sorted((src / "bob").iterdir())
    crops = np.stack([cv2.imread(str(p)) for p in paths])
    expect = server.pipeline.embed_cropped_batch(crops)
    cos = np.stack(list(embs)) @ expect.T
    assert (cos.max(axis=1) > 1 - 1e-5).all()


def test_enroll_folder_with_detection_batched(tmp_path_factory, tmp_path,
                                              rng):
    """The uncropped gen path (detector + exactly-one-face rule,
    src/app.cpp:171-177) through the BATCHED pipeline: enrollment count
    equals the number of images the serving detector finds exactly one
    face in, and skipped images leave no DB rows."""
    import jax
    from facekit.models.lightdet import lightdet_init
    cfg = FaceKitConfig(
        database_path=str(tmp_path_factory.mktemp("gdb2") / "gen2.db"),
        input_frameWidth=160, input_frameHeight=120,
        det_inputShape=(3, 64, 64), det_network="slim",
        rec_network="ir_tiny", compute_dtype="float32",
        gallery_dtype="float32", use_pallas_search=False,
        det_threshold_bbox=0.3, extras={"server_batchSize": 4})
    det = lightdet_init(jax.random.PRNGKey(0), variant="slim")
    rec = arcface_init(jax.random.PRNGKey(1), network="ir_tiny")
    server = FaceServer(cfg, det_params=det, rec_params=rec, warmup=False)

    src = tmp_path / "tree"
    paths = []
    for name in ("carol", "dave", "erin"):
        d = src / name
        d.mkdir(parents=True)
        for i in range(2):
            img = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
            p = d / f"{i}.png"
            cv2.imwrite(str(p), img)
            paths.append(p)

    # ground truth from the serving program, batched and padded EXACTLY
    # like enroll_folder (bit-identical inputs -> bit-identical valid
    # flags even for near-threshold scores under random weights)
    srt = sorted(paths)
    bs, expected = 4, 0
    for i in range(0, len(srt), bs):
        chunk = srt[i:i + bs]
        frames = np.zeros((bs, 120, 160, 3), np.uint8)
        for j, p in enumerate(chunk):
            frames[j] = cv2.imread(str(p))
        v = np.asarray(
            server.pipeline.recognize_frames(frames).valid)[:len(chunk)]
        expected += int((v.sum(axis=1) == 1).sum())

    n = server.enroll_folder(str(src), is_cropped=False)
    assert n == expected
    assert server.db.get_num_embeddings() == expected
