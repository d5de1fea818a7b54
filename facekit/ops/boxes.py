"""Box decode, letterbox un-mapping, and masked in-graph NMS.

TPU-native replacement for the reference's scalar post-processing loop
(``src/retinaface.cpp:154-271``): instead of a dynamic ``vector<Bbox>`` with
erase-based greedy NMS on the host, everything here is fixed-shape and
vectorized — decode all anchors at once, threshold by masking scores to
-inf, run greedy NMS as a fixed-trip-count ``fori_loop`` over the top-K
candidates, and return exactly ``max_faces`` slots with a validity mask. No
recompiles, no host round-trips.

Coordinate convention: (x1, y1, x2, y2) with x horizontal (columns) and y
vertical (rows). The reference swaps these (its Bbox.x is the row axis — see
SURVEY.md §2 quirks); the swap never leaks through its JSON API, so we use
the sane convention internally.

Variances (0.1, 0.2) per ``conversion/retina/config.py:6`` and the decode at
``src/retinaface.cpp:165-174``; the +1 pixel area convention in IoU matches
``src/retinaface.cpp:248-271``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

VARIANCES = (0.1, 0.2)


class Detections(NamedTuple):
    """Fixed-shape detection results (max_faces slots + validity mask)."""
    boxes: jnp.ndarray       # (F, 4) x1, y1, x2, y2 in frame pixels
    scores: jnp.ndarray      # (F,)
    valid: jnp.ndarray       # (F,) bool
    landmarks: Optional[jnp.ndarray] = None  # (F, 5, 2) frame pixels or None


def decode_boxes(loc: jnp.ndarray, anchors: jnp.ndarray,
                 input_hw: Tuple[int, int]) -> jnp.ndarray:
    """(A, 4) regression deltas + (A, 4) anchors -> (A, 4) pixel corner boxes."""
    h, w = input_hw
    v0, v1 = VARIANCES
    cx = anchors[:, 0] + loc[:, 0] * v0 * anchors[:, 2]
    cy = anchors[:, 1] + loc[:, 1] * v0 * anchors[:, 3]
    sx = anchors[:, 2] * jnp.exp(loc[:, 2] * v1)
    sy = anchors[:, 3] * jnp.exp(loc[:, 3] * v1)
    x1 = (cx - sx / 2) * w
    y1 = (cy - sy / 2) * h
    x2 = (cx + sx / 2) * w
    y2 = (cy + sy / 2) * h
    return jnp.stack([x1, y1, x2, y2], -1)


def decode_landmarks(ldm: jnp.ndarray, anchors: jnp.ndarray,
                     input_hw: Tuple[int, int]) -> jnp.ndarray:
    """(A, 10) landmark deltas -> (A, 5, 2) pixel (x, y) points.

    Standard RetinaFace landmark decode (the reference repo carries the
    landmark head in ``conversion/retina/models/retinaface.py:37-46`` but
    strips it from the served engine; facekit restores it for 5-point
    alignment).
    """
    h, w = input_hw
    v0 = VARIANCES[0]
    ldm = ldm.reshape(*ldm.shape[:-1], 5, 2)
    px = anchors[:, None, 0] + ldm[..., 0] * v0 * anchors[:, None, 2]
    py = anchors[:, None, 1] + ldm[..., 1] * v0 * anchors[:, None, 3]
    return jnp.stack([px * w, py * h], -1)


def _unletterbox_geometry(frame_hw, input_hw):
    """(scale, pad_x, pad_y) of the reference's float-offset decode
    (``src/retinaface.cpp:177-187``), which differs sub-pixel from the
    integer paste offsets of letterbox_geometry — reproduced deliberately
    for parity, and shared by the box AND point un-mappings so the quirk
    can never desynchronize between them."""
    fh, fw = frame_hw
    th, tw = input_hw
    scale_h, scale_w = th / fh, tw / fw
    scale = min(scale_h, scale_w)
    # when scale_h > scale_w: width fills the input, the vertical is padded
    if scale_h > scale_w:
        return scale, 0.0, (th - scale * fh) / 2
    return scale, (tw - scale * fw) / 2, 0.0


def unletterbox_boxes(boxes: jnp.ndarray, frame_hw: Tuple[int, int],
                      input_hw: Tuple[int, int]) -> jnp.ndarray:
    """Map boxes from detector-input pixels back to frame pixels.

    Uses the float pad offsets of the reference's decode (see
    ``_unletterbox_geometry``).
    """
    scale, pad_x, pad_y = _unletterbox_geometry(frame_hw, input_hw)
    shift = jnp.asarray([pad_x, pad_y, pad_x, pad_y], dtype=boxes.dtype)
    return (boxes - shift) / scale


def unletterbox_points(points: jnp.ndarray, frame_hw: Tuple[int, int],
                       input_hw: Tuple[int, int]) -> jnp.ndarray:
    """Same un-mapping for (..., 2) (x, y) landmark points."""
    scale, pad_x, pad_y = _unletterbox_geometry(frame_hw, input_hw)
    pad = jnp.asarray([pad_x, pad_y], dtype=points.dtype)
    return (points - pad) / scale


def clip_boxes(boxes: jnp.ndarray, frame_hw: Tuple[int, int]) -> jnp.ndarray:
    """Clip to [0, dim-1] as the reference does (src/retinaface.cpp:190-193)."""
    fh, fw = frame_hw
    lim = jnp.asarray([fw - 1, fh - 1, fw - 1, fh - 1], dtype=boxes.dtype)
    return jnp.clip(boxes, 0.0, lim)


def iou_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) x (N, 4) -> (M, N) IoU with the reference's +1 area convention."""
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    xx1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    yy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    xx2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    yy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the reference's +1 area convention."""
    return iou_pairs(boxes, boxes)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        top_k: int = 128
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS as a fixed-iteration masked loop.

    Semantics match the reference's erase-based O(n^2) loop
    (``src/retinaface.cpp:248-271``): process candidates in descending score
    order; a candidate suppresses every lower-scored survivor with
    IoU >= threshold. Candidates with score == -inf are padding.

    Returns (boxes, scores, keep_mask, candidate_idx), each of length
    ``min(top_k, len(scores))`` in descending score order;
    ``candidate_idx`` maps each slot back to its index in the input
    arrays (the anchor id).
    """
    k = min(top_k, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    iou = iou_matrix(top_boxes)
    valid = top_scores > -jnp.inf

    def body(i, keep):
        # candidate i (in score order) suppresses later survivors
        suppress = (iou[i] >= iou_threshold) & keep[i] & valid[i]
        later = jnp.arange(k) > i
        return keep & ~(suppress & later)

    keep = jax.lax.fori_loop(0, k, body, valid)
    return top_boxes, top_scores, keep, idx


def nms_streaming(boxes: jnp.ndarray, scores: jnp.ndarray,
                  iou_threshold: float, chunk: int = 256
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Exact greedy NMS over ALL candidates without an O(A^2) IoU matrix.

    Matches the reference's all-anchor erase loop
    (``src/retinaface.cpp:248-271``) at ANY geometry: candidates are sorted
    by descending score and processed in ``chunk``-sized blocks. Each block
    first resolves its own greedy pass (a ``fori_loop``, already masked by
    suppression from earlier blocks), then forward-suppresses every later
    candidate block-by-block — so the working set is O(chunk^2) (two
    (chunk, chunk) IoU tiles) instead of the A^2 matrix that made 640x640
    (16,800 anchors ~= 1.1 GB f32) uncompilable. Only blocks holding
    above-threshold candidates run: both loops bound their trip counts by
    ``ceil(n_above / chunk)``, so the device cost scales with the crowd,
    not the anchor count.

    Returns ``(sorted_boxes, sorted_scores, keep, order)``, each padded to
    a multiple of ``chunk`` and in descending score order; padding slots
    have score ``-inf``, ``keep`` False, and ``order`` clamped into range.
    """
    a = scores.shape[0]
    a_pad = -(-a // chunk) * chunk
    scores = jnp.pad(scores, (0, a_pad - a), constant_values=-jnp.inf)
    boxes = jnp.pad(boxes, ((0, a_pad - a), (0, 0)))
    sorted_scores, order = jax.lax.top_k(scores, a_pad)
    order = jnp.minimum(order, a - 1)          # padding slots: safe gathers
    sorted_boxes = boxes[order]
    valid = sorted_scores > -jnp.inf
    n_live = (jnp.sum(valid) + chunk - 1) // chunk   # blocks with candidates

    def forward(cj, state):
        cb, ck, keep = state
        cstart = cj * chunk
        colb = jax.lax.dynamic_slice(sorted_boxes, (cstart, 0), (chunk, 4))
        overl = jnp.any((iou_pairs(cb, colb) >= iou_threshold) & ck[:, None],
                        axis=0)
        colk = jax.lax.dynamic_slice(keep, (cstart,), (chunk,)) & ~overl
        return cb, ck, jax.lax.dynamic_update_slice(keep, colk, (cstart,))

    def block(state):
        j, keep = state
        start = j * chunk
        cb = jax.lax.dynamic_slice(sorted_boxes, (start, 0), (chunk, 4))
        ck = jax.lax.dynamic_slice(keep, (start,), (chunk,))
        iou_cc = iou_pairs(cb, cb)
        later = jnp.arange(chunk)[None, :] > jnp.arange(chunk)[:, None]

        def greedy(i, k):
            return k & ~((iou_cc[i] >= iou_threshold) & k[i] & later[i])

        ck = jax.lax.fori_loop(0, chunk, greedy, ck)
        keep = jax.lax.dynamic_update_slice(keep, ck, (start,))
        _, _, keep = jax.lax.fori_loop(j + 1, n_live, forward, (cb, ck, keep))
        return j + 1, keep

    _, keep = jax.lax.while_loop(lambda s: s[0] < n_live, block, (0, valid))
    return sorted_boxes, sorted_scores, keep, order


def _nms_select_streaming(boxes: jnp.ndarray, masked: jnp.ndarray,
                          iou_threshold: float, max_faces: int,
                          chunk: int = 256):
    """All-candidate exact NMS reduced to the final ``max_faces`` slots.

    Drop-in replacement for ``_nms_select(..., top_k=n_anchors)`` in the
    exactness fallback, with O(chunk^2) temporaries."""
    sorted_boxes, sorted_scores, keep, order = nms_streaming(
        boxes, masked, iou_threshold, chunk)
    kept_scores = jnp.where(keep, sorted_scores, -jnp.inf)
    final_scores, sel = jax.lax.top_k(kept_scores, max_faces)
    return sorted_boxes[sel], final_scores, order[sel]


def _decode_all(loc, conf, anchors, frame_hw, input_hw, score_threshold,
                ldm=None):
    """Threshold + decode + unletterbox + clip for one frame."""
    face_scores = conf[:, 1]
    masked = jnp.where(face_scores > score_threshold, face_scores, -jnp.inf)
    boxes = decode_boxes(loc, anchors, input_hw)
    boxes = unletterbox_boxes(boxes, frame_hw, input_hw)
    boxes = clip_boxes(boxes, frame_hw)
    points = None
    if ldm is not None:
        points = decode_landmarks(ldm, anchors, input_hw)
        points = unletterbox_points(points, frame_hw, input_hw)
    return masked, boxes, points


def _nms_select(boxes: jnp.ndarray, masked: jnp.ndarray,
                iou_threshold: float, top_k: int, max_faces: int):
    """NMS over the ``top_k`` highest-scored candidates, reduced to the
    final ``max_faces`` slots. Returns (boxes (F,4), scores (F,),
    anchor_idx (F,), n_survivors_in_window)."""
    k = min(top_k, masked.shape[0])
    # cand_idx comes from nms()'s own sort: re-running top_k here would
    # duplicate the (A,)-sized sort and silently assume identical
    # tie-breaking between the two calls (r4 review finding)
    top_boxes, top_scores, keep, cand_idx = nms(boxes, masked,
                                                iou_threshold, k)
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)
    final_scores, sel = jax.lax.top_k(kept_scores, max_faces)
    return (top_boxes[sel], final_scores, cand_idx[sel],
            jnp.sum(kept_scores > -jnp.inf))


@functools.partial(
    jax.jit,
    static_argnames=("frame_hw", "input_hw", "max_faces", "score_threshold",
                     "iou_threshold", "nms_top_k", "nms_exact"))
def select_faces(loc: jnp.ndarray, conf: jnp.ndarray, anchors: jnp.ndarray,
                 frame_hw: Tuple[int, int], input_hw: Tuple[int, int],
                 max_faces: int = 4, score_threshold: float = 0.6,
                 iou_threshold: float = 0.4, nms_top_k: int = 128,
                 nms_exact: bool = True,
                 ldm: Optional[jnp.ndarray] = None) -> Detections:
    """Full post-processing: threshold -> decode -> unletterbox -> clip -> NMS.

    One fused fixed-shape program replacing ``postprocessing`` at
    ``src/retinaface.cpp:154-208``. ``conf`` is the softmaxed (A, 2) output;
    face probability is channel 1 (``src/retinaface.cpp:160``).

    Full-candidate parity: the reference greedy-NMSes *every*
    above-threshold anchor (``src/retinaface.cpp:248-271``, up to 3,780),
    while the fast path here processes the ``nms_top_k`` highest-scored.
    Under greedy NMS a lower-scored candidate can never suppress a
    higher-scored one, so survivors inside the window are exact, and the
    truncation can only matter when MORE than ``nms_top_k`` candidates
    clear the threshold AND fewer than ``max_faces`` of the windowed ones
    survive (>= top_k - max_faces suppressions — a dense stack of
    overlapping boxes). With ``nms_exact`` (default) that condition is
    detected in-graph and a ``lax.cond`` falls back to NMS over all
    anchors, making the output equal to the reference's for every input
    while the hot path stays O(top_k^2).
    """
    masked, boxes, points = _decode_all(loc, conf, anchors, frame_hw,
                                        input_hw, score_threshold, ldm)
    n_anchors = masked.shape[0]
    final_boxes, final_scores, anchor_sel, n_surv = _nms_select(
        boxes, masked, iou_threshold, nms_top_k, max_faces)

    if nms_exact and n_anchors > nms_top_k:
        n_above = jnp.sum(masked > -jnp.inf)
        need_full = (n_above > nms_top_k) & (n_surv < max_faces)

        def full(_):
            return _nms_select_streaming(boxes, masked, iou_threshold,
                                         max_faces)

        final_boxes, final_scores, anchor_sel = jax.lax.cond(
            need_full, full,
            lambda _: (final_boxes, final_scores, anchor_sel), None)

    valid = final_scores > -jnp.inf
    out_lm = points[anchor_sel] if ldm is not None else None
    final_scores = jnp.where(valid, final_scores, 0.0)
    return Detections(boxes=final_boxes, scores=final_scores, valid=valid,
                      landmarks=out_lm)


@functools.partial(
    jax.jit,
    static_argnames=("frame_hw", "input_hw", "max_faces", "score_threshold",
                     "iou_threshold", "nms_top_k", "nms_exact"))
def select_faces_batch(loc: jnp.ndarray, conf: jnp.ndarray,
                       anchors: jnp.ndarray,
                       frame_hw: Tuple[int, int], input_hw: Tuple[int, int],
                       max_faces: int = 4, score_threshold: float = 0.6,
                       iou_threshold: float = 0.4, nms_top_k: int = 128,
                       nms_exact: bool = True,
                       ldm: Optional[jnp.ndarray] = None) -> Detections:
    """Batched ``select_faces`` over (N, A, ...) detector outputs.

    The exactness fallback CANNOT live inside the per-frame vmap: vmap
    lowers ``lax.cond`` to ``select``, executing the full-anchor NMS for
    every frame unconditionally (measured 7x the whole pipeline's device
    time). Here the fast windowed NMS runs vmapped, and ONE scalar
    ``lax.cond`` over the whole batch dispatches the full-anchor pass only
    when some frame actually needs it (then per-frame where-selects).
    """
    dec = functools.partial(_decode_all, anchors=anchors, frame_hw=frame_hw,
                            input_hw=input_hw,
                            score_threshold=score_threshold)
    if ldm is not None:
        masked, boxes, points = jax.vmap(
            lambda l, c, d: dec(l, c, ldm=d))(loc, conf, ldm)
    else:
        masked, boxes, points = jax.vmap(dec)(loc, conf)

    n_anchors = masked.shape[1]
    sel = functools.partial(_nms_select, iou_threshold=iou_threshold,
                            top_k=nms_top_k, max_faces=max_faces)
    fb, fs, fi, n_surv = jax.vmap(sel)(boxes, masked)

    if nms_exact and n_anchors > nms_top_k:
        n_above = jnp.sum(masked > -jnp.inf, axis=1)
        need = (n_above > nms_top_k) & (n_surv < max_faces)      # (N,)

        def full(_):
            sel_f = functools.partial(_nms_select_streaming,
                                      iou_threshold=iou_threshold,
                                      max_faces=max_faces)
            fb2, fs2, fi2 = jax.vmap(sel_f)(boxes, masked)
            w1 = need[:, None]
            return (jnp.where(w1[..., None], fb2, fb),
                    jnp.where(w1, fs2, fs),
                    jnp.where(w1, fi2, fi))

        fb, fs, fi = jax.lax.cond(jnp.any(need), full,
                                  lambda _: (fb, fs, fi), None)

    valid = fs > -jnp.inf
    out_lm = None
    if ldm is not None:
        out_lm = jnp.take_along_axis(points, fi[..., None, None], axis=1)
    fs = jnp.where(valid, fs, 0.0)
    return Detections(boxes=fb, scores=fs, valid=valid, landmarks=out_lm)
