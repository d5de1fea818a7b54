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
unsynchronized-shared-state race (SURVEY.md §2.12).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facekit.ops.similarity import (cosine_topk_int8, cosine_topk_pallas,
                                    cosine_topk_xla, quantize_rows_int8)


def _bucket_capacity(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the ladder: round up to the next multiple of the largest bucket
    top = buckets[-1]
    return ((n + top - 1) // top) * top


class GalleryStore:
    """Names + device-resident L2-normalized embedding matrix + search."""

    def __init__(self, embed_dim: int = 512,
                 buckets: Sequence[int] = (1024, 8192, 65536, 1 << 20),
                 dtype: str = "bfloat16", use_pallas: bool = True,
                 device=None, mesh=None, mesh_axis: str = "gallery"):
        """``mesh``: optional jax Mesh — the gallery is then row-sharded over
        ``mesh_axis`` and searched with the cross-shard kernel
        (facekit.parallel.sharded_search); capacities stay multiples of the
        shard count via the bucket ladder."""
        self.embed_dim = embed_dim
        self.buckets = tuple(buckets)
        self.quantized = dtype == "int8"
        self.dtype = (jnp.bfloat16 if dtype == "bfloat16"
                      else jnp.float32 if dtype == "float32"
                      else jnp.int8)
        self.use_pallas = use_pallas and not self.quantized
        self._scales: Optional[jax.Array] = None
        self.device = device
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._lock = threading.Lock()
        self._names: List[str] = []
        self._host = np.zeros((0, embed_dim), np.float32)
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

    def _rebuild(self) -> None:
        n = len(self._names)
        cap = _bucket_capacity(max(n, 1), self.buckets)
        arr = np.zeros((cap, self.embed_dim), np.float32)
        if n:
            arr[:n] = self._host[:n]
        if self.quantized:
            dev, scales = quantize_rows_int8(jnp.asarray(arr))
            self._scales = scales
        else:
            dev = jnp.asarray(arr, dtype=self.dtype)
        if self.mesh is not None:
            from facekit.parallel.sharded_search import shard_gallery
            dev = shard_gallery(dev, self.mesh, self.mesh_axis)
        elif self.device is not None:
            dev = jax.device_put(dev, self.device)
        self._device_arr = dev

    # -- mutation (mirrors addEmbedding/resetEmbeddings/initMatMul) ----------

    def load(self, names: Sequence[str], embeddings: np.ndarray) -> None:
        """Atomically replace the gallery (the /reload path)."""
        embeddings = np.asarray(embeddings, np.float32).reshape(-1, self.embed_dim)
        assert len(names) == embeddings.shape[0]
        with self._lock:
            self._names = list(names)
            self._host = embeddings.copy()
            self._rebuild()

    def add(self, name: str, embedding: np.ndarray) -> None:
        """Append one row (reference addEmbedding, src/arcface.cpp:150-160)."""
        emb = np.asarray(embedding, np.float32).reshape(1, self.embed_dim)
        with self._lock:
            self._names.append(name)
            self._host = np.concatenate([self._host, emb], 0)
            self._rebuild()

    def reset(self) -> None:
        """Clear (reference resetEmbeddings, src/arcface.cpp:233-236)."""
        with self._lock:
            self._names = []
            self._host = np.zeros((0, self.embed_dim), np.float32)
            self._rebuild()

    # -- search ---------------------------------------------------------------

    def snapshot(self):
        """(device_array, count, names) consistent snapshot, for callers
        that fuse the search into a larger jitted program."""
        with self._lock:
            return self._device_arr, len(self._names), list(self._names)

    def search(self, queries: jnp.ndarray, k: int = 1,
               interpret: bool = False) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        """(B, D) queries -> (scores (B, k), indices (B, k), names).

        ``names`` is the snapshot matching the indices (atomic with the
        array used), so a concurrent reload can't skew the id mapping.
        """
        with self._lock:
            arr = self._device_arr
            names = self._names
            count = len(names)
        if count == 0:
            raise ValueError(
                "Feature matching: No faces in database")  # reference msg
        kk = min(k, count)
        if self.quantized:
            vals, idx = cosine_topk_int8(arr, self._scales, queries,
                                         jnp.int32(count), k=kk)
            return np.asarray(vals), np.asarray(idx), names
        queries = queries.astype(self.dtype)
        if self.mesh is not None:
            from facekit.parallel.sharded_search import sharded_cosine_topk
            vals, idx = sharded_cosine_topk(
                arr, queries, jnp.int32(count), k=kk, mesh=self.mesh,
                axis=self.mesh_axis, use_pallas=self.use_pallas,
                interpret=interpret)
        elif self.use_pallas:
            vals, idx = cosine_topk_pallas(arr, queries,
                                           jnp.int32(count), k=kk,
                                           interpret=interpret)
        else:
            vals, idx = cosine_topk_xla(arr, queries, jnp.int32(count), k=kk)
        return np.asarray(vals), np.asarray(idx), names
