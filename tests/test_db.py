"""SQLite layer: schema, BLOB round-trip, and reference bit-compatibility."""

import sqlite3

import numpy as np
import pytest

from facekit.db import Database


@pytest.fixture()
def db(tmp_path):
    d = Database(str(tmp_path / "test.db"))
    yield d
    d.close()


def test_insert_user_and_duplicate(db):
    assert db.insert_user("morty", "Morty Smith") == 1
    assert db.insert_user("morty", "Morty Smith") == -3  # PK violation
    assert db.get_user_dict() == {"morty": "Morty Smith"}


def test_embedding_blob_roundtrip(db, rng):
    emb = rng.normal(size=512).astype(np.float32)
    db.insert_user("u", "U")
    assert db.insert_face("u", "/tmp/img.jpg", emb) == 1
    names, embs = db.get_embeddings()
    assert names == ["u"]
    np.testing.assert_array_equal(embs[0], emb)


def test_blob_is_raw_le_float32(db, tmp_path, rng):
    """The BLOB must be exactly the 2048-byte raw buffer the C++ reads
    (src/db.cpp:146, 338)."""
    emb = rng.normal(size=512).astype(np.float32)
    db.insert_user("u", "U")
    db.insert_face("u", "p", emb)
    raw = sqlite3.connect(str(tmp_path / "test.db")).execute(
        "SELECT EMBEDDING FROM FACE").fetchone()[0]
    assert isinstance(raw, bytes) and len(raw) == 512 * 4
    np.testing.assert_array_equal(np.frombuffer(raw, "<f4"), emb)


def test_schema_matches_reference(db, tmp_path):
    conn = sqlite3.connect(str(tmp_path / "test.db"))
    cols_user = [r[1] for r in conn.execute("PRAGMA table_info(USER)")]
    cols_face = [r[1] for r in conn.execute("PRAGMA table_info(FACE)")]
    assert cols_user == ["USR_ID", "USR_NM"]
    assert cols_face == ["IMG_ID", "USR_ID", "IMG_PATH", "EMBEDDING"]


def test_delete_face_actually_deletes(db, rng):
    """Regression vs the reference bug: its deleteFace targets a nonexistent
    IMAGES_USER table (src/db.cpp:172) and silently no-ops."""
    emb = rng.normal(size=512).astype(np.float32)
    db.insert_user("u", "U")
    db.insert_face("u", "p1", emb)
    db.insert_face("u", "p2", emb)
    assert db.get_num_embeddings() == 2
    db.delete_face(1)
    assert db.get_num_embeddings() == 1


def test_delete_user_cascades(db, rng):
    emb = rng.normal(size=512).astype(np.float32)
    db.insert_user("u", "U")
    db.insert_face("u", "p", emb)
    db.delete_user("u")
    assert db.get_num_embeddings() == 0
    assert db.get_user_dict() == {}


def test_empty_db(db):
    names, embs = db.get_embeddings()
    assert names == [] and embs.shape == (0, 512)
    assert db.get_num_embeddings() == 0
