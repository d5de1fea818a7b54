"""Gallery search sharded row-wise over the device mesh.

This is the TPU-native replacement for "make the gallery bigger than one
accelerator": the (N, D) embedding matrix is laid out with
``NamedSharding(P("gallery", None))`` so each chip holds N/S rows in its own
HBM. A query batch is replicated; each shard computes its local top-k with
the same fused kernel as the single-chip path, then an ``all_gather`` of the
tiny (B, k) partials over ICI and a final merge produce the global result.
Only O(S*B*k) floats cross the interconnect — never similarities.

Contrast with the reference (``src/matmul.cpp:36-77``): one GPU, full m*n
similarity matrix, full D2H copy per batch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facekit.ops.similarity import cosine_topk_pallas, cosine_topk_xla


def shard_gallery(gallery: jnp.ndarray, mesh: Mesh,
                  axis: str = "gallery") -> jnp.ndarray:
    """Place a (N, D) gallery row-sharded over ``axis`` (N % shards == 0;
    the GalleryStore's bucket ladder guarantees divisibility)."""
    return jax.device_put(gallery, NamedSharding(mesh, P(axis, None)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "axis", "use_pallas", "interpret"))
def sharded_cosine_topk(gallery: jnp.ndarray, queries: jnp.ndarray,
                        count: jnp.ndarray, k: int = 1, *, mesh: Mesh,
                        axis: str = "gallery", use_pallas: bool = False,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global top-k over a row-sharded gallery. Returns (B, k) scores+indices.

    ``count`` is the global live-row count; each shard masks its own padding
    slice. Implemented with shard_map so the per-shard kernel is exactly the
    single-chip Pallas/XLA kernel.
    """
    n, d = gallery.shape
    shards = mesh.shape[axis]
    n_local = n // shards
    b = queries.shape[0]

    def local_fn(g_local, q, cnt):
        idx = jax.lax.axis_index(axis)
        local_count = jnp.clip(cnt[0] - idx * n_local, 0, n_local)
        if use_pallas:
            v, i = cosine_topk_pallas(g_local, q, local_count, k=k,
                                      interpret=interpret)
        else:
            v, i = cosine_topk_xla(g_local, q, local_count, k=k)
        i = i + idx * n_local
        # (S, B, k) partials on every shard; merge locally (replicated out)
        vs = jax.lax.all_gather(v, axis)
        is_ = jax.lax.all_gather(i, axis)
        vs = jnp.moveaxis(vs, 0, 1).reshape(b, shards * k)
        is_ = jnp.moveaxis(is_, 0, 1).reshape(b, shards * k)
        vv, pos = jax.lax.top_k(vs, k)
        ii = jnp.take_along_axis(is_, pos, axis=1)
        return vv, ii

    # check_vma=False: outputs are value-replicated via the all_gather+merge,
    # which the static replication checker can't prove
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(gallery, queries, jnp.reshape(count, (1,)).astype(jnp.int32))
