"""Image resampling as MXU matmuls, with OpenCV-compatible semantics.

The reference preprocesses on the host with OpenCV: an INTER_LINEAR letterbox
to the detector input (reference ``src/retinaface.cpp:106-136``) and an
INTER_CUBIC face-crop resize to 112x112 (``src/arcface.cpp:3-17``). A
TPU-native design keeps the image on device and expresses 2-D separable
resampling as two dense matrix multiplications

    out = W_rows @ img @ W_cols^T        (per channel)

where ``W_rows`` is ``(out_h, in_h)`` and ``W_cols`` is ``(out_w, in_w)``.
For static geometry (the letterbox) the weight matrices are compile-time
constants folded by XLA; for dynamic face crops they are computed in-graph
from the (traced) box coordinates — still dense matmuls, no gathers, so
everything rides the MXU.

OpenCV semantics reproduced here:
  * half-pixel source mapping: ``src = (dst + 0.5) * in/out - 0.5``
  * INTER_LINEAR: 2-tap triangle kernel
  * INTER_CUBIC: 4-tap Keys bicubic with ``A = -0.75``
  * border replication via index clamping
OpenCV runs uint8 images through a fixed-point path (11-bit coefficients);
we compute in float, which differs by <1 LSB and is well inside the 1e-3
cosine parity budget (see tests/test_resize.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CUBIC_A = -0.75  # OpenCV's bicubic kernel coefficient


def _cubic_kernel(x, xp=jnp):
    """Keys cubic convolution kernel with a=-0.75 (OpenCV INTER_CUBIC)."""
    x = xp.abs(x)
    a = _CUBIC_A
    near = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    far = ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a
    return xp.where(x <= 1.0, near, xp.where(x < 2.0, far, 0.0))


def _linear_kernel(x, xp=jnp):
    x = xp.abs(x)
    return xp.maximum(1.0 - x, 0.0)


_KERNELS = {"linear": (_linear_kernel, 2), "cubic": (_cubic_kernel, 4)}


def _tap_offsets(support: int) -> np.ndarray:
    # 2 taps -> [0, 1]; 4 taps -> [-1, 0, 1, 2] around floor(src).
    start = -(support // 2 - 1)
    return np.arange(start, start + support)


def resize_matrix(in_size: int, out_size: int, method: str = "linear",
                  dtype=jnp.float32) -> jnp.ndarray:
    """Dense (out_size, in_size) interpolation matrix for one axis."""
    kernel, support = _KERNELS[method]
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src)
    frac = src - base
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for t in _tap_offsets(support):
        idx = np.clip(base + t, 0, in_size - 1).astype(np.int64)
        wt = kernel(t - frac, xp=np)
        np.add.at(w, (np.arange(out_size), idx), wt)
    return jnp.asarray(w, dtype=dtype)


def saturate_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """Emulate OpenCV's uint8 output: round + clamp to [0, 255].

    The reference resizes CV_8UC3 Mats, so interpolation results saturate
    (cubic overshoot clips at 255/0) and round to integers before the float
    conversion that follows. Pipeline-facing ops apply this for parity.
    """
    return jnp.clip(jnp.round(x), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("out_hw", "method", "saturate"))
def resize_image(img: jnp.ndarray, out_hw: Tuple[int, int],
                 method: str = "linear", saturate: bool = False) -> jnp.ndarray:
    """Resize an (H, W, C) or (N, H, W, C) image with OpenCV semantics."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, h, w, c = img.shape
    oh, ow = out_hw
    wr = resize_matrix(h, oh, method)
    wc = resize_matrix(w, ow, method)
    out = jnp.einsum("oh,nhwc->nowc", wr, img.astype(jnp.float32))
    out = jnp.einsum("pw,nowc->nopc", wc, out)
    if saturate:
        out = saturate_uint8(out)
    return out[0] if squeeze else out


def letterbox_geometry(frame_hw: Tuple[int, int],
                       target_hw: Tuple[int, int]):
    """Integer letterbox placement exactly as the reference computes it.

    Mirrors ``src/retinaface.cpp:111-122``: float scales, truncating int
    conversion for the scaled extent, and integer-division centering.
    Returns (resized_h, resized_w, offset_y, offset_x, scale).
    """
    fh, fw = frame_hw
    th, tw = target_hw
    scale_h = th / fh
    scale_w = tw / fw
    if scale_h > scale_w:
        w, h = tw, int(scale_w * fh)
        x, y = 0, (th - h) // 2
        scale = scale_w
    else:
        w, h = int(scale_h * fw), th
        x, y = (tw - w) // 2, 0
        scale = scale_h
    return h, w, y, x, scale


@functools.partial(
    jax.jit, static_argnames=("target_hw", "pad_value", "saturate"))
def letterbox(img: jnp.ndarray, target_hw: Tuple[int, int],
              pad_value: float = 128.0, saturate: bool = True) -> jnp.ndarray:
    """Aspect-preserving INTER_LINEAR resize + center pad (reference letterbox).

    ``img`` is (H, W, C) or (N, H, W, C) in the frame geometry; output is the
    detector input geometry filled with ``pad_value`` outside the image.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, fh, fw, c = img.shape
    h, w, y, x, _ = letterbox_geometry((fh, fw), target_hw)
    resized = resize_image(img, (h, w), "linear", saturate=saturate)
    th, tw = target_hw
    out = jnp.full((n, th, tw, c), pad_value, dtype=jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (0, y, x, 0))
    return out[0] if squeeze else out


def _dynamic_axis_matrix(lo: jnp.ndarray, hi: jnp.ndarray, in_size: int,
                         out_size: int, method: str,
                         origin=None) -> jnp.ndarray:
    """In-graph (out_size, in_size) matrix resampling the [lo, hi) crop.

    ``lo``/``hi`` are traced scalars (already floor-truncated to integers by
    the caller, mirroring the reference's float->cv::Point truncation at
    ``src/arcface.cpp:6``). Sampling coordinates are clamped to the crop, so
    border replication matches cropping-then-resizing.

    ``origin`` (integral scalar): the source array is a WINDOW cut from a
    larger image at this offset; lo/hi stay in the original coordinates.
    Positions and weights are computed in full coordinates and only the
    integer tap indices are shifted — shifting ``lo`` instead would change
    f32 rounding of the positions and break bit-parity with the
    full-frame path (measured: ~1e-5 relative weight drift).
    """
    kernel, support = _KERNELS[method]
    lo = lo.astype(jnp.float32)
    hi = jnp.maximum(hi.astype(jnp.float32), lo + 1.0)
    scale = (hi - lo) / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = lo + (dst + 0.5) * scale - 0.5
    base = jnp.floor(src)
    frac = src - base
    w = jnp.zeros((out_size, in_size), dtype=jnp.float32)
    cols = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    shift = 0.0 if origin is None else origin.astype(jnp.float32)
    for t in _tap_offsets(support):
        idx = jnp.clip(base + t, lo, hi - 1.0) - shift
        wt = kernel(jnp.asarray(float(t)) - frac)
        w = w + wt[:, None] * (cols == idx[:, None]).astype(jnp.float32)
    return w


@functools.partial(
    jax.jit, static_argnames=("out_hw", "method", "saturate"))
def crop_resize(frame: jnp.ndarray, boxes: jnp.ndarray,
                out_hw: Tuple[int, int] = (112, 112),
                method: str = "cubic", saturate: bool = True,
                origins: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Crop each box from ``frame`` and resize, fused as two matmuls per face.

    ``frame``: (H, W, C) float; ``boxes``: (F, 4) as (x1, y1, x2, y2) in
    column/row pixel units (x horizontal, y vertical — note this is the sane
    convention, not the reference's swapped one; see SURVEY.md §2 quirks).
    Returns (F, out_h, out_w, C). Equivalent to OpenCV INTER_CUBIC resize of
    ``frame[y1:y2, x1:x2]`` (reference ``src/arcface.cpp:3-17``).

    ``origins`` (F, 2) integral (x, y): ``frame`` is a per-face WINDOW cut
    from a larger image at these offsets, while ``boxes`` stay in the
    original coordinates — the windowed-align path; results are
    bit-identical to cropping from the full image (see
    _dynamic_axis_matrix's origin note). With origins, ``frame`` must be
    (F, H, W, C) (one window per face).
    """
    h, w, c = frame.shape[-3:]
    oh, ow = out_hw
    frame = frame.astype(jnp.float32)

    def one(box, frame, origin):
        x1, y1, x2, y2 = jnp.floor(box)
        oxy = (None, None) if origin is None else (origin[0], origin[1])
        wr = _dynamic_axis_matrix(y1, y2, h, oh, method,
                                  origin=oxy[1])          # (oh, H)
        wc = _dynamic_axis_matrix(x1, x2, w, ow, method,
                                  origin=oxy[0])          # (ow, W)
        tmp = jnp.einsum("oh,hwc->owc", wr, frame)
        out = jnp.einsum("pw,owc->opc", wc, tmp)
        return saturate_uint8(out) if saturate else out

    boxes = boxes.astype(jnp.float32)
    if origins is None:
        return jax.vmap(lambda b: one(b, frame, None))(boxes)
    return jax.vmap(one)(boxes, frame, origins.astype(jnp.float32))
