"""Gallery search: XLA vs Pallas (interpret mode) vs numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from facekit.gallery import GalleryStore
from facekit.ops.similarity import cosine_topk_pallas, cosine_topk_xla


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture()
def data(rng):
    gallery = _norm_rows(rng.normal(size=(1000, 512)).astype(np.float32))
    queries = _norm_rows(rng.normal(size=(5, 512)).astype(np.float32))
    return gallery, queries


def test_xla_topk_matches_numpy(data):
    gallery, queries = data
    sims = queries @ gallery.T
    ref_idx = sims.argmax(1)
    vals, idx = cosine_topk_xla(jnp.asarray(gallery), jnp.asarray(queries),
                                jnp.int32(1000), k=1)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], ref_idx)
    np.testing.assert_allclose(np.asarray(vals)[:, 0],
                               sims[np.arange(5), ref_idx], rtol=1e-5)


def test_xla_count_masks_padding(data):
    gallery, queries = data
    count = 700
    sims = queries @ gallery[:count].T
    vals, idx = cosine_topk_xla(jnp.asarray(gallery), jnp.asarray(queries),
                                jnp.int32(count), k=3)
    ref_idx = np.argsort(-sims, 1)[:, :3]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    assert np.asarray(idx).max() < count


@pytest.mark.parametrize("k", [1, 4])
@pytest.mark.parametrize("count,tile", [(1000, 256), (777, 256), (96, 256)])
def test_pallas_matches_xla(data, k, count, tile):
    gallery, queries = data
    g, q = jnp.asarray(gallery), jnp.asarray(queries)
    ref_v, ref_i = cosine_topk_xla(g, q, jnp.int32(count), k=k)
    vals, idx = cosine_topk_pallas(g, q, jnp.int32(count), k=k,
                                   tile_n=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)


@pytest.mark.parametrize("impl", ["f32", "int8"])
def test_pallas_k_exceeds_live_rows_matches_xla(data, impl):
    """k > live gallery rows: the running top-k must walk the distinct
    padding positions the way lax.top_k does, not re-emit an already
    picked index (r5 review finding — the NEG_INF tie-break used to
    re-select the smallest extracted index)."""
    gallery, queries = data
    g, q = jnp.asarray(gallery), jnp.asarray(queries)
    count, k = 2, 4
    if impl == "f32":
        ref_v, ref_i = cosine_topk_xla(g, q, jnp.int32(count), k=k)
        vals, idx = cosine_topk_pallas(g, q, jnp.int32(count), k=k,
                                       tile_n=256, interpret=True)
    else:
        from facekit.ops.similarity import (cosine_topk_int8,
                                            cosine_topk_int8_pallas,
                                            quantize_rows_int8)
        gq, gs = quantize_rows_int8(g)
        ref_v, ref_i = cosine_topk_int8(gq, gs, q, jnp.int32(count), k=k)
        vals, idx = cosine_topk_int8_pallas(gq, gs, q, jnp.int32(count),
                                            k=k, tile_n=512,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
    # every row's k indices are distinct, like lax.top_k's positions
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == k, row
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v),
                               rtol=1e-5)


def test_pallas_bf16(data):
    gallery, queries = data
    g = jnp.asarray(gallery, jnp.bfloat16)
    q = jnp.asarray(queries, jnp.bfloat16)
    ref_v, ref_i = cosine_topk_xla(g, q, jnp.int32(1000), k=1)
    vals, idx = cosine_topk_pallas(g, q, jnp.int32(1000), k=1,
                                   tile_n=512, interpret=True)
    # bf16 rounding may flip near-tie argmaxes vs f32; compare scores
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v),
                               rtol=1e-2, atol=1e-2)


class TestGalleryStore:
    def test_bucketing(self, rng):
        store = GalleryStore(dtype="float32", use_pallas=False,
                             buckets=(16, 64, 256))
        emb = _norm_rows(rng.normal(size=(20, 512)).astype(np.float32))
        store.load([f"u{i}" for i in range(20)], emb)
        assert store.capacity == 64
        assert store.count == 20

        for i in range(50):
            store.add(f"v{i}", emb[i % 20])
        assert store.count == 70
        assert store.capacity == 256

    def test_search_roundtrip(self, rng):
        store = GalleryStore(dtype="float32", use_pallas=False)
        emb = _norm_rows(rng.normal(size=(10, 512)).astype(np.float32))
        store.load([f"user{i}" for i in range(10)], emb)
        vals, idx, names = store.search(jnp.asarray(emb[3:5]), k=1)
        assert names[idx[0, 0]] == "user3"
        assert names[idx[1, 0]] == "user4"
        np.testing.assert_allclose(vals[:, 0], 1.0, rtol=1e-5)

    def test_search_pallas_interpret(self, rng):
        store = GalleryStore(dtype="float32", use_pallas=True)
        emb = _norm_rows(rng.normal(size=(10, 512)).astype(np.float32))
        store.load([f"user{i}" for i in range(10)], emb)
        vals, idx, names = store.search(jnp.asarray(emb[:2]), k=1,
                                        interpret=True)
        assert names[idx[0, 0]] == "user0"

    def test_empty_gallery_raises(self):
        store = GalleryStore(use_pallas=False)
        with pytest.raises(ValueError, match="No faces in database"):
            store.search(jnp.zeros((1, 512)))

    def test_reset_and_reload(self, rng):
        store = GalleryStore(dtype="float32", use_pallas=False)
        emb = _norm_rows(rng.normal(size=(4, 512)).astype(np.float32))
        store.load(["a", "b", "c", "d"], emb)
        store.reset()
        assert store.count == 0
        store.load(["x"], emb[:1])
        _, idx, names = store.search(jnp.asarray(emb[:1]), k=1)
        assert names[idx[0, 0]] == "x"


def test_int8_quantized_search_ranking(data):
    """int8 gallery: scores within 2e-3 of f32 and top-1 agreement."""
    from facekit.ops.similarity import cosine_topk_int8, quantize_rows_int8
    gallery, queries = data
    gq, gs = quantize_rows_int8(jnp.asarray(gallery))
    assert gq.dtype == jnp.int8
    vals, idx = cosine_topk_int8(gq, gs, jnp.asarray(queries),
                                 jnp.int32(1000), k=1)
    ref_v, ref_i = cosine_topk_xla(jnp.asarray(gallery), jnp.asarray(queries),
                                   jnp.int32(1000), k=1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), atol=5e-3)
    # random gaussian embeddings are well-separated -> top-1 should agree
    assert (np.asarray(idx) == np.asarray(ref_i)).mean() >= 0.8


def test_int8_gallery_store(rng):
    store = GalleryStore(dtype="int8", use_pallas=False)
    emb = _norm_rows(rng.normal(size=(50, 512)).astype(np.float32))
    store.load([f"u{i}" for i in range(50)], emb)
    vals, idx, names = store.search(jnp.asarray(emb[7:9]), k=2)
    assert names[idx[0, 0]] == "u7"
    assert names[idx[1, 0]] == "u8"
    assert vals[0, 0] > 0.99


@pytest.mark.parametrize("k,count,tile", [(1, 1000, 256), (3, 777, 512)])
def test_int8_pallas_matches_int8_xla(data, k, count, tile):
    """Fused int8 Pallas kernel == the XLA int8 path, bit-for-bit ranking."""
    from facekit.ops.similarity import (cosine_topk_int8,
                                        cosine_topk_int8_pallas,
                                        quantize_rows_int8)
    gallery, queries = data
    gq, gs = quantize_rows_int8(jnp.asarray(gallery))
    rv, ri = cosine_topk_int8(gq, gs, jnp.asarray(queries),
                              jnp.int32(count), k=k)
    v, i = cosine_topk_int8_pallas(gq, gs, jnp.asarray(queries),
                                   jnp.int32(count), k=k, tile_n=tile,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-5,
                               atol=1e-6)


def test_int8_store_pallas_interpret(rng):
    store = GalleryStore(dtype="int8", use_pallas=True)
    emb = _norm_rows(rng.normal(size=(30, 512)).astype(np.float32))
    store.load([f"u{i}" for i in range(30)], emb)
    vals, idx, names = store.search(jnp.asarray(emb[4:6]), k=1,
                                    interpret=True)
    assert names[idx[0, 0]] == "u4"
    assert names[idx[1, 0]] == "u5"


class TestIncrementalAppend:
    """add() within capacity must not rebuild/re-upload the gallery
    (VERDICT r1 weak #5): it is a donated single-row update."""

    def test_no_rebuild_within_capacity(self, rng, monkeypatch):
        store = GalleryStore(dtype="float32", use_pallas=False,
                             buckets=(64, 256))
        emb = _norm_rows(rng.normal(size=(80, 512)).astype(np.float32))
        store.load([f"u{i}" for i in range(10)], emb[:10])
        calls = []
        orig = store._rebuild
        monkeypatch.setattr(store, "_rebuild",
                            lambda: (calls.append(1), orig())[1])
        for i in range(10, 64):          # stays inside the 64 bucket
            store.add(f"u{i}", emb[i])
        assert calls == []               # no rebuild happened
        assert store.capacity == 64
        store.add("u64", emb[64])        # bucket growth -> one rebuild
        assert calls == [1]
        assert store.capacity == 256
        vals, idx, names = store.search(jnp.asarray(emb[60:62]), k=1)
        assert [names[i] for i in idx[:, 0]] == ["u60", "u61"]
        np.testing.assert_allclose(vals[:, 0], 1.0, rtol=1e-5)

    def test_append_int8_updates_scales(self, rng):
        store = GalleryStore(dtype="int8", use_pallas=False, buckets=(64,))
        emb = _norm_rows(rng.normal(size=(5, 512)).astype(np.float32))
        store.load(["a"], emb[:1])
        for i in range(1, 5):
            store.add(f"n{i}", emb[i])
        vals, idx, names = store.search(jnp.asarray(emb), k=1)
        assert [names[i] for i in idx[:, 0]] == ["a", "n1", "n2", "n3", "n4"]
        np.testing.assert_allclose(vals[:, 0], 1.0, atol=5e-3)

    def test_append_preserves_mesh_sharding(self, rng):
        import jax
        from facekit.parallel import make_mesh
        mesh = make_mesh({"gallery": 8})
        store = GalleryStore(dtype="float32", use_pallas=False, mesh=mesh,
                             buckets=(1024,))
        emb = _norm_rows(rng.normal(size=(4, 512)).astype(np.float32))
        store.load(["a", "b"], emb[:2])
        before = store._device_arr.sharding
        store.add("c", emb[2])
        assert store._device_arr.sharding == before
        assert len(store._device_arr.sharding.device_set) == 8
        vals, idx, names = store.search(jnp.asarray(emb[2:3]), k=1)
        assert names[idx[0, 0]] == "c"

    def test_snapshot_survives_concurrent_add(self, rng):
        """A snapshot taken before add() must stay USABLE: the in-bucket
        append may NOT donate (delete) the live buffer, and the snapshot's
        VALID region (rows < snap.count) must be byte-stable. Rows at or
        beyond snap.count are padding to every consumer (masked by the
        count) — the runtime is free to reuse that slot in place, so the
        test deliberately does not constrain them."""
        from facekit.ops.similarity import cosine_topk_xla
        store = GalleryStore(dtype="float32", use_pallas=False, buckets=(64,))
        emb = _norm_rows(rng.normal(size=(4, 512)).astype(np.float32))
        store.load(["a", "b", "c"], emb[:3])
        snap = store.snapshot()
        before = np.asarray(snap.arr)[:snap.count].copy()
        v0, i0 = cosine_topk_xla(snap.arr, jnp.asarray(emb[:3]),
                                 jnp.int32(snap.count), k=1)
        v0, i0 = np.asarray(v0), np.asarray(i0)

        store.add("d", emb[3])

        # not deleted (a donated append would raise 'Array has been
        # deleted' here — the r2 regression this test pins)
        old = np.asarray(snap.arr)
        np.testing.assert_array_equal(old[:snap.count], before)
        # searching through the OLD snapshot still answers identically
        v1, i1 = cosine_topk_xla(snap.arr, jnp.asarray(emb[:3]),
                                 jnp.int32(snap.count), k=1)
        np.testing.assert_array_equal(np.asarray(i1), i0)
        np.testing.assert_array_equal(np.asarray(v1), v0)
        # and the live store sees the appended row
        vals, idx, names = store.search(jnp.asarray(emb[3:4]), k=1)
        assert names[idx[0, 0]] == "d"


def test_gallery_thread_stress(rng):
    """Hammer add/search/load/reset from threads: no exceptions, every
    search self-consistent (indices within the count it saw, names match).
    The reference's equivalent state is unsynchronized and races
    (SURVEY §2.12); facekit's must hold under contention by construction."""
    import threading

    store = GalleryStore(dtype="float32", use_pallas=False,
                         buckets=(64, 256))
    base = _norm_rows(rng.normal(size=(128, 512)).astype(np.float32))
    store.load([f"u{i}" for i in range(8)], base[:8])
    errors = []
    stop = threading.Event()

    def adder():
        i = 8
        try:
            while not stop.is_set() and i < 120:
                store.add(f"u{i}", base[i])
                i += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            while not stop.is_set():
                try:
                    vals, idx, names = store.search(
                        jnp.asarray(base[:4]), k=1)
                except ValueError:
                    continue          # reset raced us: empty gallery
                assert idx.max() < len(names)
                assert np.isfinite(vals).all()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reloader():
        try:
            for _ in range(5):
                store.load([f"r{i}" for i in range(16)], base[:16])
                store.reset()
                store.load([f"u{i}" for i in range(8)], base[:8])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=adder),
               threading.Thread(target=searcher),
               threading.Thread(target=searcher),
               threading.Thread(target=reloader)]
    for t in threads:
        t.start()
    threads[3].join()
    threads[0].join()
    stop.set()
    for t in threads[1:3]:
        t.join()
    assert not errors, errors
    # final state searchable and consistent
    vals, idx, names = store.search(jnp.asarray(base[:2]), k=1)
    assert idx.max() < len(names)
