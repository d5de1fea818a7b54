"""Gallery search sharded row-wise over the device mesh.

This is the TPU-native replacement for "make the gallery bigger than one
accelerator": the (N, D) embedding matrix is laid out with
``NamedSharding(P("gallery", None))`` so each chip holds N/S rows in its own
HBM. Each shard computes its local top-k with the same fused kernel as the
single-chip path, then an ``all_gather`` of the tiny (B, k) partials over
ICI and a final merge produce the global result. Only O(S*B*k) floats cross
the interconnect — never similarities.

Two composition axes:

  * ``axis`` — the gallery rows (scale axis, SURVEY.md §5.7);
  * ``query_axis`` — optional data-parallel axis for the query batch: each
    data shard carries B/D queries, searches them against every gallery
    shard, and keeps its results local (serving layout: frames sharded over
    "data", gallery rows over "gallery" on one 2-axis mesh).

int8 galleries pass per-row ``scales`` (sharded with the rows) and run the
scale-aware kernels per shard.

Contrast with the reference (``src/matmul.cpp:36-77``): one GPU, full m*n
similarity matrix, full D2H copy per batch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facekit.ops.similarity import (cosine_topk_int8, cosine_topk_int8_pallas,
                                    cosine_topk_pallas, cosine_topk_xla)


def shard_gallery(gallery: jnp.ndarray, mesh: Mesh,
                  axis: str = "gallery") -> jnp.ndarray:
    """Place a (N, D) gallery row-sharded over ``axis`` (N % shards == 0;
    the GalleryStore's bucket ladder guarantees divisibility). On a
    multi-axis mesh the rows replicate over the other axes."""
    return jax.device_put(gallery, NamedSharding(mesh, P(axis, None)))


def shard_rows(x: jnp.ndarray, mesh: Mesh, axis: str = "gallery"
               ) -> jnp.ndarray:
    """Shard a 1-D per-row vector (e.g. int8 scales) along with the rows."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "axis", "query_axis", "use_pallas",
                     "interpret"))
def sharded_cosine_topk(gallery: jnp.ndarray, queries: jnp.ndarray,
                        count: jnp.ndarray, k: int = 1, *, mesh: Mesh,
                        axis: str = "gallery",
                        query_axis: Optional[str] = None,
                        scales: Optional[jnp.ndarray] = None,
                        use_pallas: bool = False,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global top-k over a row-sharded gallery. Returns (B, k) scores+indices.

    ``count`` is the global live-row count; each shard masks its own padding
    slice. Implemented with shard_map so the per-shard kernel is exactly the
    single-chip Pallas/XLA kernel. With ``query_axis`` set, the query batch
    is additionally sharded over that mesh axis (B % shards == 0) and the
    outputs come back with the same sharding; the all_gather runs over the
    gallery axis only, so each data shard merges just its own partials.
    """
    n, d = gallery.shape
    shards = mesh.shape[axis]
    n_local = n // shards
    quantized = scales is not None

    def local_fn(g_local, q, cnt, *rest):
        s_local = rest[0] if rest else None
        idx = jax.lax.axis_index(axis)
        local_count = jnp.clip(cnt[0] - idx * n_local, 0, n_local)
        if quantized:
            if use_pallas:
                v, i = cosine_topk_int8_pallas(g_local, s_local, q,
                                               local_count, k=k,
                                               interpret=interpret)
            else:
                v, i = cosine_topk_int8(g_local, s_local, q, local_count, k=k)
        elif use_pallas:
            v, i = cosine_topk_pallas(g_local, q, local_count, k=k,
                                      interpret=interpret)
        else:
            v, i = cosine_topk_xla(g_local, q, local_count, k=k)
        i = i + idx * n_local
        # (S, B_local, k) partials on every gallery shard; merge locally
        vs = jax.lax.all_gather(v, axis)
        is_ = jax.lax.all_gather(i, axis)
        b_local = q.shape[0]
        vs = jnp.moveaxis(vs, 0, 1).reshape(b_local, shards * k)
        is_ = jnp.moveaxis(is_, 0, 1).reshape(b_local, shards * k)
        vv, pos = jax.lax.top_k(vs, k)
        ii = jnp.take_along_axis(is_, pos, axis=1)
        return vv, ii

    qspec = P(query_axis, None) if query_axis is not None else P()
    # scales ride along only for quantized galleries (sharded with the rows)
    extra_args = (scales,) if quantized else ()
    extra_specs = (P(axis),) if quantized else ()
    # check_vma=False: outputs are value-replicated over the gallery axis
    # via the all_gather+merge, which the static checker can't prove
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), qspec, P()) + extra_specs,
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    return fn(gallery, queries, jnp.reshape(count, (1,)).astype(jnp.int32),
              *extra_args)
