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
