"""HBM-resident embedding gallery with capacity bucketing.

Replaces the reference's host-side gallery management
(``src/arcface.cpp:150-164``: a raw float* ``m_knownEmbeds`` filled row by
row, re-``new``ed on every reload, then copied wholesale to the GPU by
``MatMul::init`` — ``src/matmul.cpp:9-18``). facekit keeps the gallery as a
device array whose capacity is drawn from a fixed bucket ladder so XLA
programs see a small set of static shapes (no recompile per enrolled face),
with a validity count masking the padding rows.

Reload semantics match the reference's ``/reload`` route
(``src/app.cpp:354-365``): build a fresh gallery from the database rows and
atomically swap it in — concurrent searches keep using the old array until
the swap (arrays are immutable), which also fixes the reference's
unsynchronized-shared-state race (SURVEY.md §2.12). ``add`` within the
current capacity is a device-side ``dynamic_update_slice`` (no host
re-upload; the old array stays alive for snapshot holders); only bucket
growth rebuilds.
"""

from __future__ import annotations

import functools
import threading
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facekit.ops.similarity import (cosine_topk_int8, cosine_topk_int8_pallas,
                                    cosine_topk_pallas, cosine_topk_xla,
                                    quantize_rows_int8)


def _bucket_capacity(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the ladder: round up to the next multiple of the largest bucket
    top = buckets[-1]
    return ((n + top - 1) // top) * top


@jax.jit
def _set_row(arr: jax.Array, row: jax.Array, i: jnp.ndarray) -> jax.Array:
    """Single-row update; sharding propagates from arr.

    Deliberately NOT donated: outstanding ``snapshot()`` holders (and any
    fused program mid-flight) must keep reading the previous array — the
    store's whole concurrency story is immutable arrays + atomic swap.
    The cost is one device-side HBM copy of the bucket (no host round
    trip; ~30x cheaper than the r1 full host rebuild + re-upload).
    """
    return jax.lax.dynamic_update_slice(
        arr, row[None].astype(arr.dtype), (i, jnp.int32(0)))


@jax.jit
def _set_scalar(vec: jax.Array, val: jnp.ndarray, i: jnp.ndarray) -> jax.Array:
    return jax.lax.dynamic_update_slice(
        vec, jnp.reshape(val, (1,)).astype(vec.dtype), (i,))


class GallerySnapshot(NamedTuple):
    """Consistent view for callers fusing the search into a larger program."""
    arr: jax.Array
    count: int
    names: List[str]
    scales: Optional[jax.Array]       # per-row int8 scales, None unless int8


class GalleryStore:
    """Names + device-resident L2-normalized embedding matrix + search."""

    def __init__(self, embed_dim: int = 512,
                 buckets: Sequence[int] = (1024, 8192, 65536, 1 << 20),
                 dtype: str = "bfloat16", use_pallas: bool = True,
                 device=None, mesh=None, mesh_axis: str = "gallery"):
        """``mesh``: optional jax Mesh — the gallery is then row-sharded over
        ``mesh_axis`` and searched with the cross-shard kernel
        (facekit.parallel.sharded_search); capacities stay multiples of the
        shard count via the bucket ladder. ``use_pallas`` requests the fused
        Pallas kernels; it is honored only on TPU backends (on CPU the
        XLA path runs instead, unless a caller passes ``interpret=True``
        to ``search``)."""
        self.embed_dim = embed_dim
        self.buckets = tuple(buckets)
        self.quantized = dtype == "int8"
        self.dtype = (jnp.bfloat16 if dtype == "bfloat16"
                      else jnp.float32 if dtype == "float32"
                      else jnp.int8)
        self._pallas_requested = bool(use_pallas)
        self.use_pallas = self._pallas_requested and _pallas_backend()
        self._scales: Optional[jax.Array] = None
        self.device = device
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._lock = threading.Lock()
        self._names: List[str] = []
        # host mirror, preallocated at device capacity (amortized appends)
        self._host_buf = np.zeros((0, embed_dim), np.float32)
        self._device_arr: Optional[jax.Array] = None
        self._rebuild()

    # -- state ---------------------------------------------------------------

    @property
    def count(self) -> int:
        return len(self._names)

    @property
    def names(self) -> List[str]:
        return list(self._names)

    @property
    def capacity(self) -> int:
        return 0 if self._device_arr is None else self._device_arr.shape[0]

    def capacity_for(self, n: int) -> int:
        """Bucket capacity a gallery of ``n`` rows would occupy."""
        return _bucket_capacity(max(n, 1), self.buckets)

    def next_capacity(self) -> int:
        """The capacity the NEXT bucket growth would rebuild at."""
        return _bucket_capacity(self.capacity + 1, self.buckets)

    def dummy_at_capacity(self, cap: int):
        """(arr, scales) zeros shaped/typed/sharded exactly like a real
        gallery at capacity ``cap``.

        For precompiling the serving programs of a FUTURE bucket before
        growth swaps it in: jit caches key on (shape, dtype, sharding), so
        running the fused programs once against this dummy means the first
        real call after a bucket rebuild hits the cache instead of paying
        a 40-120 s TPU compile on the serving path (the reference's
        ``/reload`` never recompiles — ``src/app.cpp:354-365``)."""
        if self.quantized:
            arr = self._place(jnp.zeros((cap, self.embed_dim), jnp.int8))
            scales = self._place(jnp.ones((cap,), jnp.float32), is_rows=True)
            return arr, scales
        return self._place(jnp.zeros((cap, self.embed_dim), self.dtype)), None

    def _place(self, dev: jax.Array, is_rows: bool = False) -> jax.Array:
        if self.mesh is not None:
            from facekit.parallel.sharded_search import (shard_gallery,
                                                         shard_rows)
            return (shard_rows(dev, self.mesh, self.mesh_axis) if is_rows
                    else shard_gallery(dev, self.mesh, self.mesh_axis))
        if self.device is not None:
            return jax.device_put(dev, self.device)
        return dev

    def _rebuild(self) -> None:
        n = len(self._names)
        cap = _bucket_capacity(max(n, 1), self.buckets)
        if self._host_buf.shape[0] != cap:
            buf = np.zeros((cap, self.embed_dim), np.float32)
            buf[:n] = self._host_buf[:n]
            self._host_buf = buf
        if self.quantized:
            # copy for the same reason as below: the jitted quantize reads
            # its input asynchronously, racing later in-place host writes
            dev, scales = quantize_rows_int8(jnp.array(self._host_buf))
            self._scales = self._place(scales, is_rows=True)
        else:
            # jnp.array (copy) rather than jnp.asarray: on CPU a same-dtype
            # asarray can be ZERO-COPY, leaving the device gallery aliased
            # to self._host_buf — which add() then mutates in place,
            # corrupting live snapshots
            dev = jnp.array(self._host_buf, dtype=self.dtype)
        self._device_arr = self._place(dev)

    # -- mutation (mirrors addEmbedding/resetEmbeddings/initMatMul) ----------

    def load(self, names: Sequence[str], embeddings: np.ndarray) -> None:
        """Atomically replace the gallery (the /reload path)."""
        embeddings = np.asarray(embeddings, np.float32).reshape(-1, self.embed_dim)
        assert len(names) == embeddings.shape[0]
        with self._lock:
            self._names = list(names)
            n = embeddings.shape[0]
            cap = _bucket_capacity(max(n, 1), self.buckets)
            self._host_buf = np.zeros((cap, self.embed_dim), np.float32)
            self._host_buf[:n] = embeddings
            self._rebuild()

    def add(self, name: str, embedding: np.ndarray) -> None:
        """Append one row (reference addEmbedding, src/arcface.cpp:150-160).

        Within the current capacity bucket this is a device-side
        ``dynamic_update_slice`` — one HBM-local copy, no host re-upload
        (at 1M rows the r1 rebuild-per-face moved ~1 GB over the host
        link). Crossing a bucket boundary rebuilds at the next capacity.
        Concurrent snapshot holders stay safe: the update is NOT donated
        (their buffer is never deleted) and only touches the row at index
        ``count`` — padding to every consumer, which masks by the count
        it snapshotted. (The runtime may or may not reuse the buffer in
        place for that padding row; rows below the snapshot count are
        guaranteed byte-stable.)
        """
        emb = np.asarray(embedding, np.float32).reshape(1, self.embed_dim)
        with self._lock:
            i = len(self._names)
            # copy-on-write: snapshot() hands out self._names UNCOPIED
            # (an O(capacity) list copy per micro-batch is real host work
            # at the 1M-row target), so mutations must build a new list
            # instead of appending in place under a live snapshot
            self._names = self._names + [name]
            if i >= self.capacity:
                # bucket growth: host buffer + device array rebuild
                buf = np.zeros((_bucket_capacity(i + 1, self.buckets),
                                self.embed_dim), np.float32)
                buf[:i] = self._host_buf[:i]
                buf[i] = emb[0]
                self._host_buf = buf
                self._rebuild()
                return
            self._host_buf[i] = emb[0]
            row = jnp.array(emb[0])   # copy: emb may view the caller's buffer
            if self.quantized:
                q, s = quantize_rows_int8(row[None])
                self._device_arr = _set_row(self._device_arr, q[0],
                                            jnp.int32(i))
                self._scales = _set_scalar(self._scales, s[0], jnp.int32(i))
            else:
                self._device_arr = _set_row(self._device_arr, row,
                                            jnp.int32(i))

    def reset(self) -> None:
        """Clear (reference resetEmbeddings, src/arcface.cpp:233-236)."""
        with self._lock:
            self._names = []
            self._host_buf = np.zeros((0, self.embed_dim), np.float32)
            self._rebuild()

    # -- search ---------------------------------------------------------------

    def snapshot(self) -> GallerySnapshot:
        """Atomic (array, count, names, scales) view, for callers that fuse
        the search into a larger jitted program."""
        with self._lock:
            # the names list is shared, not copied (copy-on-write: every
            # mutation rebinds self._names to a fresh list) — snapshot
            # holders treat it as immutable
            return GallerySnapshot(self._device_arr, len(self._names),
                                   self._names, self._scales)

    def search(self, queries: jnp.ndarray, k: int = 1,
               interpret: bool = False) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        """(B, D) queries -> (scores (B, k), indices (B, k), names).

        ``names`` is the snapshot matching the indices (atomic with the
        array AND the scales used), so a concurrent reload can't skew the
        id mapping or mismatch scale shapes.
        """
        arr, count, names, scales = self.snapshot()
        if count == 0:
            raise ValueError(
                "Feature matching: No faces in database")  # reference msg
        kk = min(k, count)
        use_pallas = self.use_pallas or (interpret and self._pallas_requested)
        if self.mesh is not None:
            from facekit.parallel.sharded_search import sharded_cosine_topk
            q = (queries.astype(jnp.float32) if self.quantized
                 else queries.astype(self.dtype))
            vals, idx = sharded_cosine_topk(
                arr, q, jnp.int32(count), k=kk, mesh=self.mesh,
                axis=self.mesh_axis, scales=scales,
                use_pallas=use_pallas, interpret=interpret)
        elif self.quantized:
            fn = cosine_topk_int8_pallas if use_pallas else cosine_topk_int8
            kw = {"interpret": interpret} if use_pallas else {}
            vals, idx = fn(arr, scales, queries.astype(jnp.float32),
                           jnp.int32(count), k=kk, **kw)
        elif use_pallas:
            vals, idx = cosine_topk_pallas(arr, queries.astype(self.dtype),
                                           jnp.int32(count), k=kk,
                                           interpret=interpret)
        else:
            vals, idx = cosine_topk_xla(arr, queries.astype(self.dtype),
                                        jnp.int32(count), k=kk)
        return np.asarray(vals), np.asarray(idx), names


def _pallas_backend() -> bool:
    """True when the default backend can run the TPU Pallas kernels."""
    from facekit.utils import tpu_default_backend
    return tpu_default_backend()
