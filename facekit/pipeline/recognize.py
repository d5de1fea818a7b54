"""The fused detect -> crop/align -> embed pipeline.

Replaces the reference's hot path (``src/app.cpp:293-352``: findFace ->
getCroppedFaces -> preprocessFaces -> per-face batch-1 doInference ->
featureMatching), which bounces every stage through host memory and runs
faces one at a time. facekit compiles the whole thing into ONE XLA program
per frame with static shapes:

    letterbox+normalize -> RetinaFace -> decode+NMS (max_faces slots)
        -> crop-resize (or 5-pt align) all faces batched -> ArcFace

The only host<->device transfers are the JPEG-decoded frame in and
(boxes, scores, valid, embeddings) out. Variable face counts are handled by
padding to ``det_maxFacesPerScene`` with a validity mask (invalid slots cost
compute but keep shapes static — maxFaces is 4, the MXU doesn't notice).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facekit.config import FaceKitConfig
from facekit.models.arcface import arcface_apply
from facekit.models.lightdet import lightdet_apply
from facekit.models.retinaface import retinaface_apply
from facekit.ops.align import warp_align, warp_align_frames
from facekit.ops.anchors import (RETINAFACE_MIN_SIZES, RETINAFACE_STEPS,
                                 SLIM_RFB_MIN_SIZES, SLIM_RFB_STEPS,
                                 generate_anchors)
from facekit.ops.boxes import select_faces, select_faces_batch
from facekit.ops.preprocess import det_normalize, rec_normalize
from facekit.ops.resize import crop_resize, letterbox, resize_image

#: default int8-calibration headroom, shared by EVERY entry point
#: (FacePipeline.calibrate_embedder, server calibrate_from_config, engine
#: export) so direct API callers calibrate identically to the server
#: (r2 advisor finding: a silent 1.0-vs-1.25 split raised saturation risk)
CALIBRATION_HEADROOM = 1.25


def _own_frames(arr) -> jnp.ndarray:
    """Device array from a possibly CALLER-OWNED host buffer.

    On the CPU backend, ``jnp.asarray`` of a matching-dtype numpy array
    can be ZERO-COPY (CLAUDE.md): the device array would alias a buffer
    the caller may overwrite (the classic ``cv2.VideoCapture.read(buf)``
    reuse pattern) while the async dispatch still reads it — silently
    torn frames. Copy there; accelerator backends copy in the transfer
    anyway, so this costs nothing on TPU."""
    if isinstance(arr, np.ndarray) and jax.default_backend() == "cpu":
        return jnp.array(arr)            # forced copy
    return jnp.asarray(arr)


def _detector_forward(det_params, x, det_network: str, dtype):
    """Dispatch on the detector family; returns (loc, conf, ldm_or_None) and
    the anchor layout for the input geometry."""
    if det_network in ("slim", "rfb"):
        loc, conf, ldm = lightdet_apply(det_params, x, variant=det_network,
                                        dtype=dtype)
        return loc, conf, ldm
    out = retinaface_apply(det_params, x, dtype=dtype)
    if len(out) == 3:
        return out
    loc, conf = out
    return loc, conf, None


def _detector_anchors(det_hw, det_network: str):
    if det_network in ("slim", "rfb"):
        return generate_anchors(det_hw, SLIM_RFB_STEPS, SLIM_RFB_MIN_SIZES)
    return generate_anchors(det_hw, RETINAFACE_STEPS, RETINAFACE_MIN_SIZES)


class FrameResult(NamedTuple):
    boxes: jnp.ndarray        # (F, 4) frame pixels
    scores: jnp.ndarray       # (F,)
    valid: jnp.ndarray        # (F,) bool
    embeddings: jnp.ndarray   # (F, 512) L2-normalized (garbage where invalid)
    landmarks: Optional[jnp.ndarray] = None   # (F, 5, 2) or None
    crops: Optional[jnp.ndarray] = None       # (F, 112, 112, 3) BGR uint8-ish


@functools.partial(
    jax.jit,
    static_argnames=("frame_hw", "det_hw", "rec_hw", "max_faces",
                     "score_thr", "iou_thr", "use_landmarks", "align",
                     "rec_network", "dtype", "return_crops", "det_network",
                     "nms_top_k", "nms_exact"))
def _recognize_frame(det_params, rec_params, frame, *, frame_hw, det_hw,
                     rec_hw, max_faces, score_thr, iou_thr, use_landmarks,
                     align, rec_network, dtype, return_crops,
                     det_network="mobilenet0.25", nms_top_k=128,
                     nms_exact=True):
    frame = frame.astype(jnp.float32)
    x = letterbox(frame, det_hw)
    x = det_normalize(x)[None]
    loc, conf, ldm = _detector_forward(det_params, x, det_network, dtype)
    ldm0 = ldm[0] if (use_landmarks and ldm is not None) else None
    anchors = _detector_anchors(det_hw, det_network)
    det = select_faces(loc[0], conf[0], anchors, frame_hw, det_hw,
                       max_faces=max_faces, score_threshold=score_thr,
                       iou_threshold=iou_thr, nms_top_k=nms_top_k,
                       nms_exact=nms_exact, ldm=ldm0)
    if align and use_landmarks:
        faces = warp_align(frame, det.landmarks, rec_hw, dtype=dtype)
    else:
        faces = crop_resize(frame, det.boxes, rec_hw, "cubic")
    emb = arcface_apply(rec_params, rec_normalize(faces), network=rec_network,
                        dtype=dtype)
    return FrameResult(det.boxes, det.scores, det.valid, emb, det.landmarks,
                       faces if return_crops else None)


@functools.partial(
    jax.jit,
    static_argnames=("frame_hw", "det_hw", "rec_hw", "max_faces",
                     "score_thr", "iou_thr", "use_landmarks", "align",
                     "rec_network", "dtype", "return_crops", "det_network",
                     "nms_top_k", "nms_exact"))
def _recognize_frames(det_params, rec_params, frames, *, frame_hw, det_hw,
                      rec_hw, max_faces, score_thr, iou_thr, use_landmarks,
                      align, rec_network, dtype, return_crops=False,
                      det_network="mobilenet0.25", nms_top_k=128,
                      nms_exact=True):
    """Batched variant: (N, H, W, 3) frames -> FrameResult with leading N.

    The throughput path: detector runs batch-N, all N*max_faces crops embed
    in ONE ArcFace call. Replaces the reference's batch path
    (src/arcface.cpp:174-186, which loops host-side and has the offset bug
    noted in SURVEY.md §2).
    """
    n = frames.shape[0]
    raw = frames          # uint8 pass-through for the align path (the
    #                       opt-in windowed variant slices it at 1 B/px)
    frames = frames.astype(jnp.float32)
    x = det_normalize(letterbox(frames, det_hw))
    loc, conf, ldm = _detector_forward(det_params, x, det_network, dtype)
    if not use_landmarks:
        ldm = None
    anchors = _detector_anchors(det_hw, det_network)
    # batched NMS with the exactness fallback hoisted OUT of the per-frame
    # vmap (vmap would lower its lax.cond to select and run the full-anchor
    # NMS unconditionally — see select_faces_batch)
    det = select_faces_batch(loc, conf, anchors, frame_hw, det_hw,
                             max_faces=max_faces, score_threshold=score_thr,
                             iou_threshold=iou_thr, nms_top_k=nms_top_k,
                             nms_exact=nms_exact, ldm=ldm)

    if align and use_landmarks:
        faces = warp_align_frames(raw, det.landmarks, rec_hw, dtype=dtype)
    else:
        faces = jax.vmap(lambda f, b: crop_resize(f, b, rec_hw, "cubic"))(
            frames, det.boxes)
    flat = faces.reshape(n * max_faces, *faces.shape[2:])
    emb = arcface_apply(rec_params, rec_normalize(flat), network=rec_network,
                        dtype=dtype)
    emb = emb.reshape(n, max_faces, -1)
    return FrameResult(det.boxes, det.scores, det.valid, emb, det.landmarks,
                       faces if return_crops else None)


@functools.partial(
    jax.jit,
    static_argnames=("frame_hw", "det_hw", "max_faces", "score_thr",
                     "iou_thr", "use_landmarks", "dtype", "det_network",
                     "nms_top_k", "nms_exact"))
def _detect_frames(det_params, frames, *, frame_hw, det_hw, max_faces,
                   score_thr, iou_thr, use_landmarks, dtype,
                   det_network="mobilenet0.25", nms_top_k=128,
                   nms_exact=True):
    """Detection only: (N, H, W, 3) frames -> DetResult (boxes, scores,
    valid, landmarks) in frame pixels. The standalone findFace analog
    (src/retinaface.h:23) for callers that don't need embeddings."""
    frames = frames.astype(jnp.float32)
    x = det_normalize(letterbox(frames, det_hw))
    loc, conf, ldm = _detector_forward(det_params, x, det_network, dtype)
    if not use_landmarks:
        ldm = None
    anchors = _detector_anchors(det_hw, det_network)
    return select_faces_batch(loc, conf, anchors, frame_hw, det_hw,
                              max_faces=max_faces, score_threshold=score_thr,
                              iou_threshold=iou_thr, nms_top_k=nms_top_k,
                              nms_exact=nms_exact, ldm=ldm)


def _match_queries(gallery, gallery_scale, flat, count, *, k, use_pallas,
                   mesh, gallery_axis, data_axis, interpret=False):
    """Route a (B, D) f32 query batch to the right search kernel.

    Handles all four {single-chip, mesh} x {float, int8} combinations so
    every fused serving program shares one search path. On a mesh the
    row-sharded kernel (facekit.parallel.sharded_search) runs — a raw
    pallas_call on a sharded gallery would either fail to partition or
    silently all-gather the full gallery per batch. ``data_axis`` (when
    present in the mesh and it divides B) keeps the queries sharded so each
    data shard merges only its own partials.
    """
    from facekit.ops.similarity import (cosine_topk_int8,
                                        cosine_topk_int8_pallas,
                                        cosine_topk_pallas, cosine_topk_xla)

    quantized = gallery.dtype == jnp.int8
    if mesh is not None:
        from facekit.parallel.sharded_search import sharded_cosine_topk
        qaxis = _mesh_data_axis(mesh, data_axis, flat.shape[0])
        q = flat if quantized else flat.astype(gallery.dtype)
        return sharded_cosine_topk(
            gallery, q, count, k=k, mesh=mesh, axis=gallery_axis,
            query_axis=qaxis, scales=gallery_scale, use_pallas=use_pallas,
            interpret=interpret)
    if quantized:
        if use_pallas:
            return cosine_topk_int8_pallas(gallery, gallery_scale, flat,
                                           count, k=k, interpret=interpret)
        return cosine_topk_int8(gallery, gallery_scale, flat, count, k=k)
    q = flat.astype(gallery.dtype)
    if use_pallas:
        return cosine_topk_pallas(gallery, q, count, k=k, interpret=interpret)
    return cosine_topk_xla(gallery, q, count, k=k)


def _mesh_data_axis(mesh, data_axis, batch: int):
    """The effective mesh data axis for a leading dim of ``batch``, or
    None when the mesh/axis is absent, trivial, or doesn't divide it.

    ONE predicate for both the frame-batch constraint and the query
    sharding (r5 review: two hand-rolled copies of this check could
    drift apart on an edit and silently force a GSPMD reshard between
    the embed and match stages). The two call sites intentionally pass
    different batches (N frames vs N*max_faces queries): queries can
    still shard when a small frame batch cannot."""
    if (mesh is None or data_axis is None or data_axis not in mesh.shape
            or mesh.shape[data_axis] <= 1
            or batch % mesh.shape[data_axis] != 0):
        return None
    return data_axis


def _constrain_batch(x, mesh, data_axis):
    """Shard a leading-batch array over the mesh data axis (GSPMD then
    partitions the whole batch-parallel program across chips)."""
    if _mesh_data_axis(mesh, data_axis, x.shape[0]) is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P(data_axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


@functools.partial(
    jax.jit,
    static_argnames=("frame_hw", "det_hw", "rec_hw", "max_faces",
                     "score_thr", "iou_thr", "use_landmarks", "align",
                     "rec_network", "dtype", "return_crops", "k",
                     "use_pallas", "det_network", "mesh", "gallery_axis",
                     "data_axis", "interpret", "nms_top_k", "nms_exact"))
def _recognize_and_match(det_params, rec_params, gallery, count, frames, *,
                         frame_hw, det_hw, rec_hw, max_faces, score_thr,
                         iou_thr, use_landmarks, align, rec_network, dtype,
                         return_crops, k, use_pallas,
                         det_network="mobilenet0.25", gallery_scale=None,
                         mesh=None, gallery_axis="gallery",
                         data_axis="data", interpret=False, nms_top_k=128,
                         nms_exact=True):
    """Single-dispatch serving program: frames -> detections + identities.

    Fuses the gallery search into the recognize program so embeddings never
    round-trip to the host between stages (the reference bounces
    m_embeds through host memory between forward() and featureMatching(),
    src/arcface.cpp:166-201). Returns (FrameResult, sims (N, F, k),
    indices (N, F, k)).

    With ``mesh`` set this is the multi-chip serving program: frames are
    batch-sharded over ``data_axis`` (params replicated — GSPMD partitions
    detector + embedder data-parallel) and the gallery stays row-sharded
    over ``gallery_axis``; the reference's hot path (src/app.cpp:293-352)
    at target-hardware scale.
    """
    frames = _constrain_batch(frames, mesh, data_axis)
    res = _recognize_frames(
        det_params, rec_params, frames, frame_hw=frame_hw, det_hw=det_hw,
        rec_hw=rec_hw, max_faces=max_faces, score_thr=score_thr,
        iou_thr=iou_thr, use_landmarks=use_landmarks, align=align,
        rec_network=rec_network, dtype=dtype, return_crops=return_crops,
        det_network=det_network, nms_top_k=nms_top_k, nms_exact=nms_exact)
    n, f, d = res.embeddings.shape
    flat = res.embeddings.reshape(n * f, d)
    vals, idx = _match_queries(gallery, gallery_scale, flat, count, k=k,
                               use_pallas=use_pallas, mesh=mesh,
                               gallery_axis=gallery_axis,
                               data_axis=data_axis, interpret=interpret)
    return res, vals.reshape(n, f, k), idx.reshape(n, f, k)


@functools.partial(
    jax.jit,
    static_argnames=("rec_network", "dtype", "k", "use_pallas", "mesh",
                     "gallery_axis", "data_axis", "interpret"))
def _embed_and_match(rec_params, gallery, count, imgs, *, rec_network,
                     dtype, k, use_pallas, gallery_scale=None, mesh=None,
                     gallery_axis="gallery", data_axis="data",
                     interpret=False):
    """Single-dispatch /recognize batch: pre-resized crops -> identities."""
    imgs = _constrain_batch(imgs, mesh, data_axis)
    emb = arcface_apply(rec_params, rec_normalize(imgs.astype(jnp.float32)),
                        network=rec_network, dtype=dtype)
    vals, idx = _match_queries(gallery, gallery_scale, emb, count, k=k,
                               use_pallas=use_pallas, mesh=mesh,
                               gallery_axis=gallery_axis,
                               data_axis=data_axis, interpret=interpret)
    return emb, vals, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "use_pallas", "mesh", "gallery_axis",
                     "data_axis", "interpret"))
def _match_flat(gallery, count, flat, *, k, use_pallas, gallery_scale=None,
                mesh=None, gallery_axis="gallery", data_axis="data",
                interpret=False):
    """Standalone jitted gallery match: (..., D) f32 queries -> (vals, idx)
    with the same leading dims + (k,).

    The engine-served path's second dispatch: exported ``recognize``/
    ``embed`` engines produce embeddings (the reference's engines also
    stop there — featureMatching is app code, src/arcface.cpp:188-201);
    this program completes the identification without the embeddings ever
    leaving the device (the engine's outputs feed straight in as jax
    Arrays, and the (B, F, D) -> (B*F, D) flatten happens in-program)."""
    lead = flat.shape[:-1]
    q = flat.reshape(-1, flat.shape[-1])
    vals, idx = _match_queries(gallery, gallery_scale, q, count, k=k,
                               use_pallas=use_pallas, mesh=mesh,
                               gallery_axis=gallery_axis, data_axis=data_axis,
                               interpret=interpret)
    return vals.reshape(*lead, -1), idx.reshape(*lead, -1)


@functools.partial(
    jax.jit, static_argnames=("rec_hw", "rec_network", "dtype"))
def _embed_cropped(rec_params, img, *, rec_hw, rec_network, dtype):
    """(H, W, 3) BGR already-cropped face -> (512,). Resizes if needed on
    device (the /insert/face api_imgIsCropped path, src/app.cpp:148-162)."""
    img = img.astype(jnp.float32)
    if img.shape[:2] != rec_hw:
        img = resize_image(img, rec_hw, "linear", saturate=True)
    emb = arcface_apply(rec_params, rec_normalize(img)[None],
                        network=rec_network, dtype=dtype)
    return emb[0]


class FacePipeline:
    """Owns model params + the jitted programs for one config.

    The facekit analog of the reference's (detector, recognizer) object pair
    wired in ``src/app.cpp:52-57`` — but stateless per request: no shared
    mutable buffers, so concurrent callers can't race (fixes SURVEY.md
    §2.12's thread-safety hazard by construction).
    """

    def __init__(self, config: FaceKitConfig, det_params: Dict[str, Any],
                 rec_params: Dict[str, Any]):
        self.config = config
        if getattr(config, "det_quantize", False):
            from facekit.models.retinaface import quantize_detector_params
            det_params = quantize_detector_params(det_params)
        self.det_params = det_params
        self._rec_params_float = None
        if getattr(config, "rec_quantize", False):
            from facekit.models.arcface import quantize_arcface_params
            # host-side copy for later calibrate_embedder: keeping the
            # float backbone as device arrays would pin hundreds of MB of
            # HBM next to the int8 copy for the process lifetime
            self._rec_params_float = jax.tree.map(np.asarray, rec_params)
            rec_params = quantize_arcface_params(rec_params)
        self.rec_params = rec_params
        self.det_network = config.det_network
        self.use_landmarks = ("ldm_head" in det_params
                              or "landm" in det_params)
        self.align = self.use_landmarks and bool(
            config.extras.get("rec_useAlignment", False))
        self.dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                      else jnp.float32)

    def calibrate_embedder(self, crop_batches,
                           headroom: float = CALIBRATION_HEADROOM) -> None:
        """Switch the int8 embedder from dynamic to CALIBRATED static
        activation scales (requires ``rec_quantize``).

        ``crop_batches``: iterable of (N, rec_h, rec_w, 3) BGR uint8-range
        face-crop batches (e.g. a sample of the enrollment gallery). Each
        is normalized exactly like the serving path, activation maxima are
        folded across all batches, and the quantized params are rebuilt
        with static scales — removing one full reduction pass per conv
        input from every subsequent embed (facekit.models.layers.conv2d_int8).
        Jitted serving programs pick the new params up on the next call
        (same pytree structure + one extra scalar leaf per conv, so the
        first post-calibration call recompiles once per program).
        """
        if not getattr(self.config, "rec_quantize", False):
            raise ValueError("calibrate_embedder requires rec_quantize")
        from facekit.models.arcface import calibrate_arcface_int8
        batches = (rec_normalize(jnp.asarray(b, jnp.float32))
                   for b in crop_batches)
        self.rec_params = calibrate_arcface_int8(
            self._rec_params_float, batches,
            network=self.config.rec_network, headroom=headroom,
            # s8-resident inter-block activations (calibrated-only mode;
            # drift + device numbers in docs/ROADMAP.md round 4)
            int8_residual=bool(
                self.config.extras.get("rec_int8Residual", False)))

    # -- device programs -----------------------------------------------------

    def recognize_frame(self, frame_bgr: np.ndarray,
                        return_crops: bool = False) -> FrameResult:
        """Full fused pipeline on one (frameH, frameW, 3) BGR frame."""
        cfg = self.config
        return _recognize_frame(
            self.det_params, self.rec_params, _own_frames(frame_bgr),
            frame_hw=cfg.frame_hw, det_hw=cfg.det_hw, rec_hw=cfg.rec_hw,
            max_faces=cfg.det_maxFacesPerScene,
            score_thr=cfg.det_threshold_bbox, iou_thr=cfg.det_threshold_nms,
            use_landmarks=self.use_landmarks, align=self.align,
            rec_network=cfg.rec_network, dtype=self.dtype,
            return_crops=return_crops, det_network=self.det_network,
            nms_top_k=cfg.det_nmsTopK, nms_exact=cfg.det_nmsExact)

    def recognize_frames(self, frames_bgr: np.ndarray,
                         return_crops: bool = False) -> FrameResult:
        """Batched throughput path: (N, frameH, frameW, 3) BGR frames."""
        cfg = self.config
        return _recognize_frames(
            self.det_params, self.rec_params, _own_frames(frames_bgr),
            frame_hw=cfg.frame_hw, det_hw=cfg.det_hw, rec_hw=cfg.rec_hw,
            max_faces=cfg.det_maxFacesPerScene,
            score_thr=cfg.det_threshold_bbox, iou_thr=cfg.det_threshold_nms,
            use_landmarks=self.use_landmarks, align=self.align,
            rec_network=cfg.rec_network, dtype=self.dtype,
            return_crops=return_crops, det_network=self.det_network,
            nms_top_k=cfg.det_nmsTopK, nms_exact=cfg.det_nmsExact)

    def detect_frames(self, frames_bgr: np.ndarray):
        """Detection only: (N, H, W, 3) BGR frames -> (boxes, scores,
        valid, landmarks) with max_faces slots per frame (findFace analog,
        src/retinaface.h:23; the reference exposes no public
        detection-only endpoint but the C++ API has this split)."""
        cfg = self.config
        return _detect_frames(
            self.det_params, _own_frames(frames_bgr),
            frame_hw=cfg.frame_hw, det_hw=cfg.det_hw,
            max_faces=cfg.det_maxFacesPerScene,
            score_thr=cfg.det_threshold_bbox,
            iou_thr=cfg.det_threshold_nms,
            use_landmarks=self.use_landmarks, dtype=self.dtype,
            det_network=self.det_network, nms_top_k=cfg.det_nmsTopK,
            nms_exact=cfg.det_nmsExact)

    def recognize_and_match(self, frames_bgr: np.ndarray, gallery_arr,
                            count: int, k: int = 1, use_pallas: bool = False,
                            return_crops: bool = False, gallery_scale=None,
                            mesh=None, gallery_axis: str = "gallery",
                            data_axis: str = "data",
                            interpret: bool = False):
        """One dispatch: batched frames -> (FrameResult, sims, gallery idx).

        Pass the fields of a ``GalleryStore.snapshot()`` (array, count,
        scales) plus the store's mesh for sharded serving; int8 galleries
        need ``gallery_scale``.
        """
        cfg = self.config
        return _recognize_and_match(
            self.det_params, self.rec_params, gallery_arr,
            jnp.int32(count), _own_frames(frames_bgr),
            frame_hw=cfg.frame_hw, det_hw=cfg.det_hw, rec_hw=cfg.rec_hw,
            max_faces=cfg.det_maxFacesPerScene,
            score_thr=cfg.det_threshold_bbox, iou_thr=cfg.det_threshold_nms,
            use_landmarks=self.use_landmarks, align=self.align,
            rec_network=cfg.rec_network, dtype=self.dtype,
            return_crops=return_crops, k=k, use_pallas=use_pallas,
            det_network=self.det_network, gallery_scale=gallery_scale,
            mesh=mesh, gallery_axis=gallery_axis, data_axis=data_axis,
            interpret=interpret, nms_top_k=cfg.det_nmsTopK,
            nms_exact=cfg.det_nmsExact)

    def embed_and_match(self, imgs_bgr: np.ndarray, gallery_arr, count: int,
                        k: int = 1, use_pallas: bool = False,
                        gallery_scale=None, mesh=None,
                        gallery_axis: str = "gallery",
                        data_axis: str = "data", interpret: bool = False):
        """One dispatch: (N, rec_h, rec_w, 3) crops -> (emb, sims, idx)."""
        return _embed_and_match(
            self.rec_params, gallery_arr, jnp.int32(count),
            _own_frames(imgs_bgr), rec_network=self.config.rec_network,
            dtype=self.dtype, k=k, use_pallas=use_pallas,
            gallery_scale=gallery_scale, mesh=mesh,
            gallery_axis=gallery_axis, data_axis=data_axis,
            interpret=interpret)

    def match_flat(self, flat_embeddings, gallery_arr, count: int,
                   k: int = 1, use_pallas: bool = False, gallery_scale=None,
                   mesh=None, gallery_axis: str = "gallery",
                   data_axis: str = "data", interpret: bool = False):
        """Gallery match only: (..., D) embeddings -> (sims (..., k), idx).

        Completes an engine-served identification (the engines produce
        embeddings; this is the featureMatching stage, kept on-device)."""
        return _match_flat(
            gallery_arr, jnp.int32(count), flat_embeddings, k=k,
            use_pallas=use_pallas, gallery_scale=gallery_scale, mesh=mesh,
            gallery_axis=gallery_axis, data_axis=data_axis,
            interpret=interpret)

    def embed_cropped(self, img_bgr: np.ndarray) -> np.ndarray:
        """Embed an already-cropped face image (any size; device-resized)."""
        emb = _embed_cropped(self.rec_params, _own_frames(img_bgr),
                             rec_hw=self.config.rec_hw,
                             rec_network=self.config.rec_network,
                             dtype=self.dtype)
        return np.asarray(emb)

    def embed_cropped_batch(self, imgs_bgr: np.ndarray) -> np.ndarray:
        """(N, rec_h, rec_w, 3) BGR pre-resized crops -> (N, 512)."""
        emb = arcface_apply(self.rec_params,
                            rec_normalize(jnp.asarray(imgs_bgr,
                                                      jnp.float32)),
                            network=self.config.rec_network,
                            dtype=self.dtype)
        return np.asarray(emb)

    def warmup(self) -> None:
        """Compile the SINGLE-FRAME programs up front: recognize_frame
        (both crops variants) and embed_cropped — the direct-API
        latency path. Batched programs (recognize_frames,
        recognize_and_match) compile on first use at their batch shape;
        the server warms those itself per its bucket ladder
        (FaceServer._warm_serving_programs)."""
        fh, fw = self.config.frame_hw
        dummy = np.zeros((fh, fw, 3), np.uint8)
        self.recognize_frame(dummy, return_crops=True)
        self.recognize_frame(dummy, return_crops=False)
        rh, rw = self.config.rec_hw
        self.embed_cropped(np.zeros((rh, rw, 3), np.uint8))
