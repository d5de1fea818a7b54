"""facekit benchmark harness.

Measures the two BASELINE.json north-star metrics on the available device:

  * end-to-end faces/sec through the fused recognize program
    (detect + 5-pt align + embed, 4 face slots per 640x480 frame);
  * p50 latency of a batch-16 query against a 1M-row bf16 gallery with the
    fused Pallas matmul+top-k.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the driver's north-star target of 2000 faces/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _percentile(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def bench_e2e(pipe, frames, iters: int = 50):
    """Per-frame latency with VARYING inputs (the serving platform caches
    identical remote executions, so same-input loops measure nothing)."""
    res = pipe.recognize_frame(frames[0])   # warmup / compile
    res.embeddings.block_until_ready()
    times = []
    for j in range(iters):
        t0 = time.perf_counter()
        res = pipe.recognize_frame(frames[j % len(frames)])
        res.embeddings.block_until_ready()
        times.append(time.perf_counter() - t0)
    return times


def bench_search(n_rows: int = 1 << 20, batch: int = 16, iters: int = 20,
                 use_pallas: bool = True):
    """Chained, dedup-proof search timing: each iteration's queries depend
    on the previous result, so the device must execute every search."""
    import functools
    import jax
    import jax.numpy as jnp
    from facekit.ops.similarity import cosine_topk_pallas, cosine_topk_xla

    gallery = jax.random.normal(jax.random.PRNGKey(0), (n_rows, 512),
                                jnp.bfloat16)
    qs = [jax.random.normal(jax.random.PRNGKey(10 + i), (batch, 512),
                            jnp.bfloat16) for i in range(6)]
    count = jnp.int32(n_rows)
    inner = cosine_topk_pallas if use_pallas else cosine_topk_xla

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(g, q, iters):
        def body(_, carry):
            q, acc = carry
            v, _i = inner(g, q, count, k=1)
            q = q + (v[:, :1] * 1e-6).astype(q.dtype)
            return q, acc + v.sum()
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))

    # warm both trip counts, then difference (2*iters) - (iters) with fresh
    # queries per measurement to cancel fixed dispatch overhead and defeat
    # the tunnel's identical-execution caching
    jax.block_until_ready(chained(gallery, qs[0], iters))
    jax.block_until_ready(chained(gallery, qs[1], 2 * iters))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(gallery, qs[2], iters))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(chained(gallery, qs[3], 2 * iters))
    d2 = time.perf_counter() - t0
    per_call = max((d2 - d1) / iters, 1e-9)
    return [per_call] * iters


def main():
    import jax
    from facekit.config import FaceKitConfig
    from facekit.models import arcface_init, retinaface_init
    from facekit.pipeline import FacePipeline

    on_tpu = jax.devices()[0].platform != "cpu"

    cfg = FaceKitConfig(compute_dtype="bfloat16" if on_tpu else "float32")
    det = retinaface_init(jax.random.PRNGKey(0), with_landmarks=True)
    rec = arcface_init(jax.random.PRNGKey(1))
    pipe = FacePipeline(cfg, det, rec)
    # alignment on (the flagship path exercises the landmark warp)
    pipe.align = True

    rng_np = np.random.default_rng(0)
    try:
        import cv2
        base = cv2.resize(cv2.imread("/root/reference/imgs/2.jpg"),
                          (cfg.input_frameWidth, cfg.input_frameHeight))
    except Exception:
        base = rng_np.integers(
            0, 256, size=(cfg.input_frameHeight, cfg.input_frameWidth, 3),
            dtype=np.uint8)
    # varied frames (jittered copies) so the tunnel can't cache executions
    frames = [np.clip(base.astype(np.int16)
                      + rng_np.integers(-4, 5, base.shape), 0, 255
                      ).astype(np.uint8) for _ in range(8)]

    e2e_iters = 50 if on_tpu else 5
    times = bench_e2e(pipe, frames, iters=e2e_iters)
    p50_frame = _percentile(times, 50)

    # throughput path: batch-8 frames per dispatch
    fb = np.stack(frames)
    res = pipe.recognize_frames(fb)
    res.embeddings.block_until_ready()
    bt = []
    for j in range(e2e_iters // 2):
        fb2 = np.roll(fb, j + 1, axis=0).copy()
        fb2[0, 0, 0, 0] ^= 1  # perturb so the tunnel can't cache
        t0 = time.perf_counter()
        r = pipe.recognize_frames(fb2)
        r.embeddings.block_until_ready()
        bt.append(time.perf_counter() - t0)
    p50_batch = _percentile(bt, 50)
    faces_per_sec = cfg.det_maxFacesPerScene * len(frames) / p50_batch

    extra = {
        "frame_p50_ms": p50_frame * 1e3,
        "latency_faces_per_sec": cfg.det_maxFacesPerScene / p50_frame,
        "batch8_p50_ms": p50_batch * 1e3,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }

    if on_tpu:
        # 2^20 rows: tile-aligned like the production bucket ladder, so the
        # kernel sees the store's zero-copy layout
        pallas_times = bench_search(1 << 20, 16, 50, use_pallas=True)
        xla_times = bench_search(1 << 20, 16, 50, use_pallas=False)
        extra["search_1M_b16_pallas_ms"] = _percentile(pallas_times, 50) * 1e3
        extra["search_1M_b16_xla_ms"] = _percentile(xla_times, 50) * 1e3
    else:  # CPU smoke: small gallery, xla path
        search_times = bench_search(10_000, 16, 5, use_pallas=False)
        extra["search_10k_b16_p50_ms_cpu"] = _percentile(search_times, 50) * 1e3

    print(json.dumps({
        "metric": "faces/sec end-to-end (detect+align+embed)",
        "value": round(faces_per_sec, 2),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / 2000.0, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
