"""Property-style fuzzing of the numerical hot spots against oracles.

Each case is cheap; many seeds probe the edges the hand-written cases
miss: near-tie scores, degenerate boxes, counts at mask boundaries,
arbitrary rotations. (SURVEY §4: the reference has no tests at all — the
burden of proof is entirely on this suite.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facekit.ops.boxes import (clip_boxes, decode_boxes, nms, select_faces,
                               unletterbox_boxes)


def _nms_oracle(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    boxes, scores = boxes[order].tolist(), scores[order].tolist()
    i = 0
    while i < len(boxes):
        j = i + 1
        while j < len(boxes):
            ax1, ay1, ax2, ay2 = boxes[i]
            bx1, by1, bx2, by2 = boxes[j]
            area_a = (ax2 - ax1 + 1) * (ay2 - ay1 + 1)
            area_b = (bx2 - bx1 + 1) * (by2 - by1 + 1)
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1) + 1)
            ih = max(0.0, min(ay2, by2) - max(ay1, by1) + 1)
            inter = iw * ih
            if inter / (area_a + area_b - inter) >= thresh:
                del boxes[j], scores[j]
            else:
                j += 1
        i += 1
    return np.array(boxes, np.float32), np.array(scores, np.float32)


@pytest.mark.parametrize("seed", range(8))
def test_nms_fuzz_random_overlaps(seed):
    """Random boxes with clustered centers (heavy overlap + near ties)."""
    rng = np.random.default_rng(seed)
    n = 80
    k_clusters = rng.integers(2, 6)
    centers = rng.uniform(60, 420, size=(k_clusters, 2))
    pick = rng.integers(0, k_clusters, size=n)
    c = centers[pick] + rng.normal(0, 15, size=(n, 2))
    sz = rng.uniform(20, 90, size=(n, 2))
    boxes = np.concatenate([c - sz / 2, c + sz / 2], 1).astype(np.float32)
    # near-tie scores stress ordering stability
    scores = (0.5 + rng.integers(0, 50, size=n) * 1e-3).astype(np.float32)
    scores += rng.integers(0, 3, size=n) * 1e-6
    thr = float(rng.uniform(0.25, 0.6))

    ref_boxes, ref_scores = _nms_oracle(boxes, scores, thr)
    tb, ts, keep, _ = nms(jnp.asarray(boxes), jnp.asarray(scores), thr,
                       top_k=n)
    kept = np.asarray(keep)
    np.testing.assert_allclose(np.asarray(ts)[kept], ref_scores, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tb)[kept], ref_boxes, rtol=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_select_faces_fuzz_vs_oracle(seed):
    """Full postprocess on random logits at random thresholds/counts."""
    from facekit.ops.anchors import generate_anchors
    rng = np.random.default_rng(100 + seed)
    input_hw = (288, 320)
    frame_hw = (480, 640)
    anchors = generate_anchors(input_hw)
    A = anchors.shape[0]
    loc = rng.normal(0, 0.25, size=(A, 4)).astype(np.float32)
    conf_face = rng.uniform(0, 1, size=A).astype(np.float32)
    conf = np.stack([1 - conf_face, conf_face], -1)
    thr = float(rng.uniform(0.5, 0.9))
    max_faces = int(rng.integers(1, 9))

    det = select_faces(jnp.asarray(loc), jnp.asarray(conf), anchors,
                       frame_hw, input_hw, max_faces=max_faces,
                       score_threshold=thr, iou_threshold=0.4,
                       nms_top_k=128, nms_exact=True)
    dec = np.asarray(clip_boxes(unletterbox_boxes(
        decode_boxes(jnp.asarray(loc), anchors, input_hw),
        frame_hw, input_hw), frame_hw))
    mask = conf_face > thr
    ref_boxes, ref_scores = _nms_oracle(dec[mask], conf_face[mask], 0.4)
    nv = int(np.asarray(det.valid).sum())
    assert nv == min(max_faces, len(ref_scores)), (seed, nv)
    np.testing.assert_allclose(np.asarray(det.scores)[:nv],
                               ref_scores[:nv], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(det.boxes)[:nv],
                               ref_boxes[:nv], rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("seed", range(8))
def test_nms_streaming_fuzz_vs_oracle(seed):
    """Streaming chunked greedy (the exactness fallback) vs the reference
    oracle across random crowds, chunk sizes, thresholds, and masked
    fractions — crowds sized to cross several chunk boundaries."""
    from facekit.ops.boxes import nms_streaming
    rng = np.random.default_rng(500 + seed)
    n = int(rng.integers(50, 900))
    chunk = int(rng.choice([32, 64, 128, 256]))
    k_clusters = int(rng.integers(1, 7))
    centers = rng.uniform(60, 420, size=(k_clusters, 2))
    c = centers[rng.integers(0, k_clusters, size=n)] + \
        rng.normal(0, 12, size=(n, 2))
    sz = rng.uniform(15, 100, size=(n, 2))
    boxes = np.concatenate([c - sz / 2, c + sz / 2], 1).astype(np.float32)
    scores = (0.5 + rng.integers(0, 200, size=n) * 1e-3).astype(np.float32)
    scores[rng.uniform(size=n) < rng.uniform(0, 0.5)] = -np.inf
    thr = float(rng.uniform(0.25, 0.6))

    valid = scores > -np.inf
    ref_boxes, ref_scores = _nms_oracle(boxes[valid], scores[valid], thr)
    sb, ss, keep, order = nms_streaming(jnp.asarray(boxes),
                                        jnp.asarray(scores), thr,
                                        chunk=chunk)
    kept = np.asarray(keep)
    got_scores = np.asarray(ss)[kept]
    got_boxes = np.asarray(sb)[kept]
    assert len(got_scores) == len(ref_scores), (seed, n, chunk)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-6)
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-5)
    # order indices point at the right anchors
    np.testing.assert_allclose(
        np.asarray(boxes)[np.asarray(order)[kept]], ref_boxes, rtol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_warp_fuzz_random_similarity(seed, reference_dir):
    """Shear warp vs the exact gather warp at arbitrary random rotations,
    scales, and positions (incl. near +-90 deg where the axis swap kicks
    in)."""
    import cv2
    from facekit.ops.align import (ARCFACE_TEMPLATE_112, warp_align_gather,
                                   warp_align_shear)
    rng = np.random.default_rng(200 + seed)
    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    lms = []
    for _ in range(4):
        th = rng.uniform(-np.pi, np.pi)
        s = rng.uniform(0.7, 2.2)
        t = rng.uniform(150, 330, size=2)
        r = s * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
        lm = ARCFACE_TEMPLATE_112 @ r.T + t
        lm += rng.normal(0, 0.8, lm.shape)      # imperfect landmarks
        lms.append(lm.astype(np.float32))
    lms = jnp.asarray(np.stack(lms))
    a = np.asarray(warp_align_gather(frame, lms))
    b = np.asarray(warp_align_shear(frame, lms))
    for i in range(4):
        d = np.abs(a[i, 4:-4, 4:-4] - b[i, 4:-4, 4:-4])
        assert d.mean() < 2.0, (seed, i, d.mean())


@pytest.mark.parametrize("seed", range(5))
def test_crop_resize_fuzz_degenerate_boxes(seed):
    """crop_resize must stay finite on degenerate/out-of-frame boxes
    (x1==x2, inverted, fully outside) — the serving path feeds it raw
    NMS output slots including padding garbage."""
    from facekit.ops.resize import crop_resize
    rng = np.random.default_rng(300 + seed)
    frame = jnp.asarray(rng.uniform(0, 255, size=(120, 160, 3))
                        .astype(np.float32))
    boxes = np.stack([
        [50, 50, 50, 80],          # zero width
        [40, 90, 40, 90],          # zero area
        [130, 100, 90, 60],        # inverted
        [-50, -50, -10, -10],      # fully outside
        rng.uniform(-200, 400, 4),  # arbitrary garbage
    ]).astype(np.float32)
    out = crop_resize(frame, jnp.asarray(boxes), (112, 112), "cubic")
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (5, 112, 112, 3)


@pytest.mark.parametrize("seed", range(4))
def test_search_fuzz_counts_and_k(seed):
    """Pallas search vs XLA across random counts (mask edges) and k."""
    from facekit.ops.similarity import cosine_topk_pallas, cosine_topk_xla
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(40, 1500))
    b = int(rng.integers(1, 20))
    k = int(rng.integers(1, 6))
    count = int(rng.integers(1, n + 1))
    k = min(k, count)
    g = rng.normal(size=(n, 512)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.normal(size=(b, 512)).astype(np.float32)
    rv, ri = cosine_topk_xla(jnp.asarray(g), jnp.asarray(q),
                             jnp.int32(count), k=k)
    v, i = cosine_topk_pallas(jnp.asarray(g), jnp.asarray(q),
                              jnp.int32(count), k=k, tile_n=256,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-5)
