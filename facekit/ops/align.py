"""5-point similarity-transform face alignment (facekit extension).

The served reference crops axis-aligned bboxes only — its landmark head is
stripped (``conversion/retina/models/retinaface_trim.py:87,121``) and
``src/retinaface.cpp:58-60`` notes "Does not make landmark head as we do not
use face alignment". The full model in the same repo keeps the head
(``conversion/retina/models/retinaface.py:87``), and ArcFace-style pipelines
canonically align faces to the 112x112 ArcFace template before embedding.
facekit restores that: Umeyama similarity estimation + affine warp, fully
in-graph (traced landmarks, static shapes).

The warp is a gather-based bilinear sample (constant-0 border like
cv2.warpAffine's default) — 112*112 samples per face is tiny next to the
IR-50 forward, and XLA vectorizes the gathers fine outside Pallas.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Canonical ArcFace 112x112 5-point template (insightface norm_crop).
ARCFACE_TEMPLATE_112 = np.array([
    [38.2946, 51.6963],
    [73.5318, 51.5014],
    [56.0252, 71.7366],
    [41.5493, 92.3655],
    [70.7299, 92.2041],
], dtype=np.float32)


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform (Umeyama 1991) src -> dst.

    src, dst: (P, 2). Returns a (2, 3) matrix M with dst ~= src @ M[:, :2].T
    + M[:, 2].

    2-D closed form, no SVD: for cov = [[a, b], [c, d]], Umeyama's
    ``U diag(1, sign det) V^T`` is exactly the orthogonal-Procrustes
    rotation ``R(atan2(c - b, a + d))``, and the corrected singular-value
    sum ``s1 + sign(det)*s2`` is exactly ``sqrt((a+d)^2 + (c-b)^2)``
    (since s1,2 = P +- N with P^2 - N^2 = det and 2P = that sqrt). The
    general-SVD formulation lowered to a cholesky/householder/eigh chain
    costing ~0.46 ms/call at batch-64 (2.3% of the pipeline, r3 xplane);
    the closed form is a handful of VPU ops. Degenerate cov (pure point
    collapse, P ~ 0) is clamped — identical in effect to the arbitrary
    U/V the SVD returns there.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[0]
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n                       # (2, 2)
    t1 = cov[0, 0] + cov[1, 1]
    t2 = cov[1, 0] - cov[0, 1]
    p2 = jnp.maximum(jnp.sqrt(t1 * t1 + t2 * t2), 1e-12)
    # degenerate cov (coincident landmarks — garbage landmark-head
    # output): t1/p2, t2/p2 would build a ZERO matrix whose affine
    # inverse divides by det 0, sending NaN through the warp into that
    # slot's crop and embedding. Fall back to identity rotation + unit
    # scale (the transform becomes a pure centroid translation — finite,
    # and as arbitrary as the SVD's U/V are there).
    degenerate = (t1 * t1 + t2 * t2) < 1e-20
    cos_t = jnp.where(degenerate, 1.0, t1 / p2)
    sin_t = jnp.where(degenerate, 0.0, t2 / p2)
    r = jnp.stack([jnp.stack([cos_t, -sin_t]),
                   jnp.stack([sin_t, cos_t])])
    var_s = jnp.maximum((sc ** 2).sum(1).mean(), 1e-12)
    scale = jnp.where(degenerate, 1.0, p2 / var_s)
    t = mu_d - scale * (r @ mu_s)
    return jnp.concatenate([scale * r, t[:, None]], axis=1)


def _invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    a = m[:, :2]
    t = m[:, 2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv = jnp.asarray([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det
    return jnp.concatenate([inv, (-inv @ t)[:, None]], axis=1)


def _bilinear_sample(frame: jnp.ndarray, xs: jnp.ndarray,
                     ys: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) frame at float coords; constant-0 outside.

    Uses single-axis gathers on the flattened frame (y*W + x): profiled
    ~35% faster on TPU than 2-D advanced indexing, which lowers to a
    two-index-vector gather. (This op is the pipeline's one gather; a
    future two-pass-shear matmul formulation is tracked in docs/ROADMAP.md.)
    """
    h, w, c = frame.shape
    flat = frame.reshape(h * w, c)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(-1)
        vals = jnp.take(flat, idx, axis=0).reshape(*yi.shape, c)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _linear_axis_weights(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """(..., out) float sample positions -> (..., out, size) 2-tap linear
    interpolation weights with zero weight outside [0, size) (constant-0
    border, cv2.warpAffine default).

    Hat form ``max(0, 1 - |grid - pos|)``: identical values to the
    floor/compare construction (grid==floor(pos) gets 1-frac, the next
    cell frac, else 0) in 3 VPU ops instead of 6 — this weight build is
    fused into the pass einsums and dominates their device time at
    batch-64 (r3 xplane: the einsums run "HBM-bound" at 11 TF/s because
    the VPU is busy building weights, plus a separate 0.19 ms floor op
    that this form eliminates)."""
    grid = jnp.arange(size, dtype=jnp.float32)
    shape = (1,) * pos.ndim + (size,)
    grid = grid.reshape(shape)
    return jnp.maximum(0.0, 1.0 - jnp.abs(grid - pos[..., None]))


def _default_window(out_hw) -> int:
    """Intermediate crop-window resolution for a given output size: it
    must scale with the output (a fixed 160 would resample a 224x224
    request through a LOWER-res intermediate and soften it vs the exact
    gather path); floor 160, rounded up to a multiple of 8."""
    base = -(-max(out_hw) * 10 // 7)        # ceil(out * 10/7)
    return max(160, (base + 7) // 8 * 8)


def _window_box(lm, template, oh, ow):
    """Axis-aligned square window (x1, y1, x2, y2) covering the warp's
    source quad for one face, +2 px margin."""
    m = umeyama(lm, template)
    mi = _invert_affine(m)
    corners = jnp.asarray([[0.0, 0.0], [ow, 0.0], [0.0, oh], [ow, oh]],
                          jnp.float32)
    src = corners @ mi[:, :2].T + mi[:, 2]
    lo = src.min(0) - 2.0
    hi = src.max(0) + 2.0
    side = jnp.max(hi - lo)
    return jnp.concatenate([lo, lo + side])


def _shear_passes(win, lm, box, template, c_win, oh, ow, dtype):
    """Two-pass shear warp of one face's (c_win, c_win, 3) window to
    (oh, ow, 3); see warp_align_shear for the math + degeneracy guard."""
    # landmark/window coordinate mapping must match crop_resize's
    # sampling: src = lo + (u + 0.5) * scale - 0.5
    lox, loy = jnp.floor(box[0]), jnp.floor(box[1])
    hix = jnp.maximum(jnp.floor(box[2]), lox + 1.0)
    hiy = jnp.maximum(jnp.floor(box[3]), loy + 1.0)
    scx = (hix - lox) / c_win
    scy = (hiy - loy) / c_win
    lw = jnp.stack([(lm[:, 0] - lox + 0.5) / scx - 0.5,
                    (lm[:, 1] - loy + 0.5) / scy - 0.5], axis=1)
    m = umeyama(lw, template)
    mi = _invert_affine(m)
    # Degeneracy guard, valid for EVERY in-plane rotation: pass B's
    # coefficient d = mi[1,1] ~ cos(theta)/s vanishes near +-90 deg.
    # There, swap the roles of the window axes instead — transpose the
    # window (one layout op) and swap the rows of the inverse map,
    # after which the coefficient is mi[0,1] ~ sin(theta)/s. One of
    # |cos|, |sin| is always >= cos 45 deg, so whichever branch is
    # selected is well-conditioned (the sign is irrelevant; theta near
    # 180 deg needs no handling at all). r1 merely clamped d and
    # degraded beyond ~60 deg — VERDICT item 6.
    swap = jnp.abs(mi[1, 1]) < jnp.abs(mi[0, 1])
    mi = jnp.where(swap, mi[::-1], mi)
    win = jnp.where(swap, jnp.transpose(win, (1, 0, 2)), win)
    a, b, e = mi[0, 0], mi[0, 1], mi[0, 2]
    c, d, f = mi[1, 0], mi[1, 1], mi[1, 2]
    d = jnp.where(jnp.abs(d) < 1e-3, 1e-3, d)  # unreachable belt+braces
    beta = b / d
    alpha = a - beta * c
    gamma = e - beta * f

    ys = jnp.arange(c_win, dtype=jnp.float32)
    us = jnp.arange(ow, dtype=jnp.float32)
    # pass A: H[y, u] = win[y, alpha*u + beta*y + gamma]
    pos_a = alpha * us[None, :] + beta * ys[:, None] + gamma  # (C, ow)
    wa = _linear_axis_weights(pos_a, c_win)                   # (C, ow, C)
    ha = jnp.einsum("yux,yxc->yuc", wa.astype(dtype),
                    win.astype(dtype),
                    preferred_element_type=jnp.float32)       # (C, ow, 3)
    # pass B: O[yo, xo] = H[c*xo + d*yo + f, xo]
    xo = jnp.arange(ow, dtype=jnp.float32)
    yo = jnp.arange(oh, dtype=jnp.float32)
    pos_b = c * xo[None, :] + d * yo[:, None] + f             # (oh, ow)
    pos_b_t = pos_b.T                                          # (ow, oh)
    wb = _linear_axis_weights(pos_b_t, c_win)                  # (ow, oh, C)
    ht = jnp.transpose(ha, (1, 0, 2))                          # (ow, C, 3)
    ot = jnp.einsum("uoy,uyc->uoc", wb.astype(dtype),
                    ht.astype(dtype),
                    preferred_element_type=jnp.float32)        # (ow, oh, 3)
    return jnp.transpose(ot, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("out_hw", "window", "dtype"))
def warp_align_shear(frame: jnp.ndarray, landmarks: jnp.ndarray,
                     out_hw: Tuple[int, int] = (112, 112),
                     window: Optional[int] = None,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Gather-free 5-point alignment: crop window + two-pass shear matmuls.

    The affine warp decomposes into two 1-D resampling passes (see
    docs/ROADMAP.md): pass A resamples each window row horizontally at
    ``alpha*u + beta*y + gamma``; pass B resamples columns vertically at
    ``c*xo + d*yo + f`` — both banded weight matrices built in-graph and
    applied as batched MXU matmuls. Profiled ~6x faster than the gather
    formulation on TPU.

    Valid for ALL in-plane rotations: the decomposition degenerates as the
    rotation approaches +-90 deg (pass B's coefficient ~ cos(theta) -> 0);
    per face, when |cos| < |sin| the window is transposed (one layout op)
    and the inverse map's rows swapped, making the coefficient ~ sin(theta)
    instead — whichever branch is selected is well-conditioned
    (|coefficient| >= cos 45 / scale). r1 merely clamped the coefficient
    and degraded beyond ~60 deg — VERDICT item 6.

    ``dtype`` is the precision of the two pass matmuls only (positions and
    weights are still built in f32, accumulation is f32 via
    preferred_element_type). Crop error vs f32 is <=2 uint8 LSBs worst
    case (one bf16 rounding per pass), <0.25 LSB mean; the serving
    pipeline passes its compute dtype. Measured perf-neutral at 112x112
    (XLA keeps the banded matrices fused, docs/ROADMAP.md) — the bf16
    option matters at larger output resolutions where they materialize.
    """
    oh, ow = out_hw
    if window is None:
        window = _default_window(out_hw)
    c_win = window
    h, w, _ = frame.shape
    frame = frame.astype(jnp.float32)
    template = jnp.asarray(ARCFACE_TEMPLATE_112)
    if (oh, ow) != (112, 112):
        template = template * jnp.asarray([ow / 112.0, oh / 112.0])

    lms = landmarks.astype(jnp.float32)
    boxes = jax.vmap(lambda lm: _window_box(lm, template, oh, ow))(lms)

    from facekit.ops.resize import crop_resize
    wins = crop_resize(frame, boxes, (c_win, c_win), "linear",
                       saturate=False)                      # (F, C, C, 3)

    return jax.vmap(lambda win, lm, box: _shear_passes(
        win, lm, box, template, c_win, oh, ow, dtype))(wins, lms, boxes)


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "window", "dtype",
                                    "slice_win"))
def warp_align_frames(frames: jnp.ndarray, landmarks: jnp.ndarray,
                      out_hw: Tuple[int, int] = (112, 112),
                      window: Optional[int] = None,
                      dtype=jnp.float32,
                      slice_win: Optional[int] = None) -> jnp.ndarray:
    """Batched-frames alignment, with an optional WINDOWED crop-resize.

    frames (N, H, W, 3) — pass the raw uint8 frames; landmarks
    (N, F, 5, 2) -> (N, F, oh, ow, 3). The default (slice_win=None) is
    the full-frame path: measured identical to the r3 per-frame-vmap
    construction (26.165 vs 26.166 ms batch-64 bf16).

    ``slice_win=S``: when EVERY face's window box fits in S x S, each
    window is dynamic-sliced from the UINT8 frame (1 B/px) at a clamped
    integer origin, cutting the crop-dot FLOPs by (H*W)/(S*S); sampling
    positions stay in full-frame coordinates with an integer tap-index
    shift, so the result is BIT-identical to the full-frame path
    (test-pinned). One oversized face anywhere falls back for the whole
    batch via a top-level lax.cond — hoisted ABOVE both vmaps, where it
    is a real branch (inside either vmap it would lower to select and
    run both paths: the select_faces_batch lesson).

    MEASURED NEGATIVE as the default (r4, full fused batch-64 bf16
    pipeline, v5e, S=320): 26.852 ms windowed vs 26.165 ms full-frame
    (0.97x) — the vmapped dynamic_slice lowers to a gather whose cost
    exceeds the ~0.5 ms of saved compute-bound crop-dot FLOPs, exactly
    the materialization trap docs/ROADMAP.md r3 item 5 flagged. Kept as
    an opt-in (exact, tested) for geometries where the frame/window
    ratio is much larger; the serving pipeline uses the default.
    """
    from facekit.ops.resize import crop_resize

    oh, ow = out_hw
    if window is None:
        window = _default_window(out_hw)
    c_win = window
    n, h, w, _ = frames.shape
    template = jnp.asarray(ARCFACE_TEMPLATE_112)
    if (oh, ow) != (112, 112):
        template = template * jnp.asarray([ow / 112.0, oh / 112.0])

    lms = landmarks.astype(jnp.float32)
    boxes = jax.vmap(jax.vmap(
        lambda lm: _window_box(lm, template, oh, ow)))(lms)  # (N, F, 4)

    def full_path(_):
        return jax.vmap(lambda f, bs: crop_resize(
            f.astype(jnp.float32), bs, (c_win, c_win), "linear",
            saturate=False))(frames, boxes)

    use_slice = (slice_win is not None and slice_win < max(h, w)
                 and slice_win <= h and slice_win <= w)
    if not use_slice:
        wins = full_path(None)
    else:
        s = slice_win

        def sliced_path(_):
            def per_face(frame, box):
                ox = jnp.clip(jnp.floor(box[0]) - 1, 0, w - s
                              ).astype(jnp.int32)
                oy = jnp.clip(jnp.floor(box[1]) - 1, 0, h - s
                              ).astype(jnp.int32)
                win = jax.lax.dynamic_slice(frame, (oy, ox, 0), (s, s, 3))
                # boxes stay in FULL-frame coordinates; crop_resize shifts
                # the integer tap indices by the origin (bit-identical to
                # the full-frame path — see _dynamic_axis_matrix)
                return crop_resize(win.astype(jnp.float32)[None],
                                   box[None], (c_win, c_win), "linear",
                                   saturate=False,
                                   origins=jnp.stack([ox, oy])[None])[0]
            return jax.vmap(lambda f, bs: jax.vmap(
                lambda b: per_face(f, b))(bs))(frames, boxes)

        sides = boxes[..., 2] - boxes[..., 0]
        fits = jnp.all(sides <= s - 4)
        wins = jax.lax.cond(fits, sliced_path, full_path, None)

    def one_face(win, lm, box):
        return _shear_passes(win, lm, box, template, c_win, oh, ow, dtype)

    return jax.vmap(jax.vmap(one_face))(wins, lms, boxes)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_align_gather(frame: jnp.ndarray, landmarks: jnp.ndarray,
                      out_hw: Tuple[int, int] = (112, 112)) -> jnp.ndarray:
    """Align faces by 5-point landmarks. frame (H, W, C), landmarks (F, 5, 2)
    in (x, y) frame pixels -> (F, out_h, out_w, C)."""
    oh, ow = out_hw
    frame = frame.astype(jnp.float32)
    template = jnp.asarray(ARCFACE_TEMPLATE_112)
    if (oh, ow) != (112, 112):
        template = template * jnp.asarray([ow / 112.0, oh / 112.0])

    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                 # (oh, ow)

    def one(lm):
        m = umeyama(lm, template)
        mi = _invert_affine(m)
        sx = mi[0, 0] * gx + mi[0, 1] * gy + mi[0, 2]
        sy = mi[1, 0] * gx + mi[1, 1] * gy + mi[1, 2]
        return _bilinear_sample(frame, sx, sy)

    return jax.vmap(one)(landmarks.astype(jnp.float32))


# Default alignment path: the gather-free shear formulation.
warp_align = warp_align_shear
