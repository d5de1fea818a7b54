"""Serialized serving programs ("engines").

The reference ships its models as prebuilt TensorRT ``.engine`` blobs,
deserialized at startup (``src/arcface.cpp:45-69``, ``src/retinaface.cpp:
31-55``) — an ahead-of-time compiled, config-frozen serving program. The
facekit analog is a ``jax.export`` StableHLO artifact of the fused serving
program: config geometry and thresholds are frozen in, shapes are static,
and the file can be loaded and called without the model-building Python
code. Unlike TRT engines the weights stay external (the msgpack pytree
from facekit.weights) and the artifact is portable across JAX versions and
platforms per jax.export's compatibility guarantees.

Three programs are exportable (the first two match the two engines the
reference loads):

  * ``recognize``: (det_params, rec_params, frames (B, H, W, 3) u8)
      -> (boxes, scores, valid, embeddings)  — the WS /inference hot path;
  * ``embed``: (rec_params, crops (B, rec_h, rec_w, 3) u8) -> (B, 512)
      — the POST /recognize hot path;
  * ``identify``: the complete fused transaction incl. the gallery match,
      optionally SHARDED over a TPU topology mesh (frames over "data",
      gallery rows over "gallery") — a deployable multi-chip artifact the
      reference has no analog for.

CLI:  python -m facekit.engine export -c config.json -o engines/ [-b 8]
        [--identify-mesh data=2,gallery=4 --topology v5e:2x4]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from facekit.config import FaceKitConfig
from facekit.utils import tpu_default_backend

_MAGIC = "facekit-engine-v1"


def _sds_tree(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype),
        tree)


def _quant_meta(pipeline) -> Dict[str, Any]:
    """Quantization/calibration state for engine metadata.

    The rec_params pytree SIGNATURE differs between float, dynamic-int8,
    and calibrated-int8 pipelines ('ascale' leaves); without this a loader
    can't tell why a params tree mismatches until an opaque pytree
    structure error (r2 advisor finding)."""
    quantized = bool(getattr(pipeline.config, "rec_quantize", False))
    conv = pipeline.rec_params.get("input", {}).get("conv", None)
    calibrated = quantized and isinstance(conv, dict) and "ascale" in conv
    residual = quantized and "oscale" in pipeline.rec_params.get("input", {})
    return {"rec_quantize": quantized, "rec_calibrated": calibrated,
            "rec_int8_residual": residual,
            "det_quantize": bool(getattr(pipeline.config, "det_quantize",
                                         False))}


def export_recognize_engine(pipeline, batch_size: int,
                            platforms: Optional[Sequence[str]] = None,
                            return_crops: bool = False):
    """Export the fused detect->align->embed program at a fixed batch.

    Returns (serialized bytes, metadata dict). ``pipeline`` is a
    FacePipeline; its static config (shapes, thresholds, network choices)
    is frozen into the artifact, exactly like engine-build-time flags in
    the reference's conversion step (conversion/*/torch2trt.py).

    ``return_crops`` adds the aligned per-face crops as a fifth output —
    the WS /inference reply needs them (the base64 "image" field), so
    server-consumable engines are exported with crops (the CLI default).
    """
    from facekit.pipeline.recognize import _recognize_frames

    cfg = pipeline.config
    fh, fw = cfg.frame_hw

    def fn(det_params, rec_params, frames):
        res = _recognize_frames(
            det_params, rec_params, frames,
            frame_hw=cfg.frame_hw, det_hw=cfg.det_hw, rec_hw=cfg.rec_hw,
            max_faces=cfg.det_maxFacesPerScene,
            score_thr=cfg.det_threshold_bbox,
            iou_thr=cfg.det_threshold_nms,
            use_landmarks=pipeline.use_landmarks, align=pipeline.align,
            rec_network=cfg.rec_network, dtype=pipeline.dtype,
            return_crops=return_crops, det_network=pipeline.det_network,
            nms_top_k=cfg.det_nmsTopK, nms_exact=cfg.det_nmsExact)
        out = (res.boxes, res.scores, res.valid, res.embeddings)
        return out + ((res.crops,) if return_crops else ())

    args = (_sds_tree(pipeline.det_params), _sds_tree(pipeline.rec_params),
            jax.ShapeDtypeStruct((batch_size, fh, fw, 3), jnp.uint8))
    kw = {"platforms": list(platforms)} if platforms else {}
    exp = jax_export.export(jax.jit(fn), **kw)(*args)
    meta = {
        "magic": _MAGIC,
        "program": "recognize",
        "batch_size": batch_size,
        "frame_hw": list(cfg.frame_hw),
        "max_faces": cfg.det_maxFacesPerScene,
        "det_network": pipeline.det_network,
        "rec_network": cfg.rec_network,
        "compute_dtype": cfg.compute_dtype,
        "return_crops": bool(return_crops),
        "platforms": list(exp.platforms),
        # detection statics are frozen into the traced program just like
        # the geometry — without them in meta a stale-threshold artifact
        # would load silently and detect at the OLD threshold while the
        # in-process jit paths use the new one (r4 review finding)
        "det_hw": list(cfg.det_hw),
        "det_threshold_bbox": cfg.det_threshold_bbox,
        "det_threshold_nms": cfg.det_threshold_nms,
        "det_nms_top_k": cfg.det_nmsTopK,
        "det_nms_exact": bool(cfg.det_nmsExact),
        "align": bool(pipeline.align),
        "with_landmarks": bool(pipeline.use_landmarks),
        **_quant_meta(pipeline),
    }
    return exp.serialize(), meta


def export_embed_engine(pipeline, batch_size: int,
                        platforms: Optional[Sequence[str]] = None):
    """Export the crop->embedding program (the /recognize path)."""
    from facekit.models.arcface import arcface_apply
    from facekit.ops.preprocess import rec_normalize

    cfg = pipeline.config
    rh, rw = cfg.rec_hw

    def fn(rec_params, crops):
        return arcface_apply(rec_params,
                             rec_normalize(crops.astype(jnp.float32)),
                             network=cfg.rec_network, dtype=pipeline.dtype)

    args = (_sds_tree(pipeline.rec_params),
            jax.ShapeDtypeStruct((batch_size, rh, rw, 3), jnp.uint8))
    kw = {"platforms": list(platforms)} if platforms else {}
    exp = jax_export.export(jax.jit(fn), **kw)(*args)
    meta = {
        "magic": _MAGIC,
        "program": "embed",
        "batch_size": batch_size,
        "rec_hw": list(cfg.rec_hw),
        "rec_network": cfg.rec_network,
        "compute_dtype": cfg.compute_dtype,
        "platforms": list(exp.platforms),
        **_quant_meta(pipeline),
    }
    return exp.serialize(), meta


def topology_mesh(mesh_shape: Dict[str, int], topology: str = "v5e:2x4"):
    """A jax Mesh over a REAL TPU topology description (no devices
    attached): compile/export targets the actual hardware toolchain
    (GSPMD + Mosaic). mesh_shape values must multiply to the topology's
    device count (v5e:2x4 = 8)."""
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh
    topo = topologies.get_topology_desc(topology)
    # like the server (app.py), a missing serving axis means size 1 —
    # 'data=8' (pure dp) and 'gallery=8' (pure row-sharding) are both
    # valid; custom axis sets (e.g. training's data x model) pass through
    mesh_shape = dict(mesh_shape)
    if set(mesh_shape) <= {"data", "gallery"}:
        mesh_shape.setdefault("data", 1)
        mesh_shape.setdefault("gallery", 1)
    names = tuple(mesh_shape)
    shape = tuple(mesh_shape[n] for n in names)
    n = int(np.prod(shape))
    if n != len(topo.devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices; topology "
                         f"{topology} has {len(topo.devices)}")
    return Mesh(np.array(topo.devices).reshape(shape), names)


def export_identify_engine(pipeline, batch_size: int, gallery_rows: int,
                           mesh=None,
                           platforms: Optional[Sequence[str]] = ("tpu",),
                           use_pallas: Optional[bool] = None,
                           return_crops: bool = False):
    """Export the COMPLETE identification transaction — detect -> align ->
    embed -> gallery match, one program — optionally sharded over a
    multi-chip mesh (frames over "data", gallery rows over "gallery";
    the v5e-8 serving layout). With a topology mesh the artifact embeds
    the sharding annotations and deploys on a real slice of that shape —
    facekit's answer to shipping per-target TensorRT engines. Loaded and
    served by :class:`IdentifyEngine` (standalone) or a ``FaceServer``
    with a matching ``mesh_shape`` + ``--engines``.

    ``platforms=["cpu"]`` with ``use_pallas=False`` exports the XLA-search
    variant, runnable on a virtual CPU mesh — the CI-testable shape of the
    same artifact. ``return_crops`` appends the aligned per-face crops as
    a seventh output (required by the server's WS reply, like the
    recognize engines).
    """
    from jax.sharding import PartitionSpec as P
    from facekit.pipeline import recognize as R

    cfg = pipeline.config
    fh, fw = cfg.frame_hw
    dim = cfg.rec_outputDim
    int8_gallery = getattr(cfg, "gallery_dtype", "") == "int8"
    gal_dtype = jnp.int8 if int8_gallery \
        else (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
              else jnp.float32)
    if use_pallas is None:
        # the fused Pallas search lowers for TPU only, so ANY non-tpu
        # platform in the artifact (cpu-only or multi-platform tpu,cpu)
        # must take the XLA search path (1.51 vs 1.42 ms at 1M rows)
        use_pallas = (all(p == "tpu" for p in platforms) if platforms
                      else (mesh is not None or tpu_default_backend()))

    if mesh is not None:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        d, g = axes.get("data", 1), axes.get("gallery", 1)
        if batch_size % d:
            raise ValueError(f"batch_size {batch_size} must divide over "
                             f"the data axis ({d})")
        if gallery_rows % g:
            raise ValueError(f"gallery_rows {gallery_rows} must divide "
                             f"over the gallery axis ({g})")

    def _sh(spec):
        from jax.sharding import NamedSharding
        return ({"sharding": NamedSharding(mesh, spec)}
                if mesh is not None else {})

    frames = jax.ShapeDtypeStruct((batch_size, fh, fw, 3), jnp.uint8,
                                  **_sh(P("data", None, None, None)))
    gal = jax.ShapeDtypeStruct((gallery_rows, dim), gal_dtype,
                               **_sh(P("gallery", None)))
    scale = (jax.ShapeDtypeStruct((gallery_rows,), jnp.float32,
                                  **_sh(P("gallery")))
             if int8_gallery else None)
    count = jax.ShapeDtypeStruct((), jnp.int32)

    def fn(det_p, rec_p, gallery, count, frames, *rest):
        res, sims, idx = R._recognize_and_match(
            det_p, rec_p, gallery, count, frames,
            frame_hw=cfg.frame_hw, det_hw=cfg.det_hw, rec_hw=cfg.rec_hw,
            max_faces=cfg.det_maxFacesPerScene,
            score_thr=cfg.det_threshold_bbox,
            iou_thr=cfg.det_threshold_nms,
            use_landmarks=pipeline.use_landmarks, align=pipeline.align,
            rec_network=cfg.rec_network, dtype=pipeline.dtype,
            return_crops=return_crops, k=cfg.gallery_topk,
            use_pallas=use_pallas,
            det_network=pipeline.det_network,
            gallery_scale=rest[0] if rest else None,
            mesh=mesh, gallery_axis="gallery", data_axis="data",
            nms_top_k=cfg.det_nmsTopK, nms_exact=cfg.det_nmsExact)
        out = (res.boxes, res.scores, res.valid, res.embeddings, sims, idx)
        return out + ((res.crops,) if return_crops else ())

    args = (_sds_tree(pipeline.det_params), _sds_tree(pipeline.rec_params),
            gal, count, frames) + ((scale,) if scale is not None else ())
    kw = {"platforms": list(platforms)} if platforms else {}
    exp = jax_export.export(jax.jit(fn), **kw)(*args)
    meta = {
        "magic": _MAGIC,
        "program": "identify",
        "batch_size": batch_size,
        "gallery_rows": gallery_rows,
        "embed_dim": dim,
        "gallery_dtype": str(np.dtype(gal_dtype)),
        "gallery_topk": cfg.gallery_topk,
        "use_pallas": bool(use_pallas),
        "return_crops": bool(return_crops),
        "frame_hw": list(cfg.frame_hw),
        "max_faces": cfg.det_maxFacesPerScene,
        "det_network": pipeline.det_network,
        "rec_network": cfg.rec_network,
        "compute_dtype": cfg.compute_dtype,
        "nr_devices": exp.nr_devices,
        "mesh_shape": (dict(zip(mesh.axis_names, mesh.devices.shape))
                       if mesh is not None else None),
        "platforms": list(exp.platforms),
        # detection statics frozen into the traced program (same contract
        # as recognize engines: a stale artifact refuses at load, never
        # silently serves old thresholds)
        "det_hw": list(cfg.det_hw),
        "det_threshold_bbox": cfg.det_threshold_bbox,
        "det_threshold_nms": cfg.det_threshold_nms,
        "det_nms_top_k": cfg.det_nmsTopK,
        "det_nms_exact": bool(cfg.det_nmsExact),
        "align": bool(pipeline.align),
        "with_landmarks": bool(pipeline.use_landmarks),
        **_quant_meta(pipeline),
    }
    return exp.serialize(), meta


def save_engine(path: str, blob: bytes, meta: Dict[str, Any]) -> None:
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)


def load_engine(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Deserialize an engine; returns (callable, metadata).

    The callable takes the same arguments the export closed over
    (see meta["program"]). Tracing is skipped entirely; XLA compilation
    for the local device happens once on first call (and hits the
    persistent compilation cache, matching the reference's instant
    deserializeCudaEngine startup).
    """
    with open(path, "rb") as f:
        blob = f.read()
    if not os.path.exists(path + ".json"):
        raise ValueError(f"{path}: missing {path}.json sidecar "
                         "(not a facekit engine?)")
    with open(path + ".json") as f:
        meta = json.load(f)
    if meta.get("magic") != _MAGIC:
        raise ValueError(f"{path}: not a facekit engine")
    exported = jax_export.deserialize(blob)
    return exported.call, meta


class IdentifyEngine:
    """Loaded ``identify.fke`` — the deployable sharded identification
    transaction, ready to dispatch.

    The reference's UX is "the serving process boots from its compiled
    artifacts" (``src/arcface.cpp:45-69``); for the multi-chip identify
    artifact this class is that boot path: deserialize, bind to a live
    device mesh matching the frozen ``mesh_shape``, and serve the complete
    detect+align+embed+match transaction with correct input placement —
    frames sharded over "data", gallery rows (and int8 scales) over
    "gallery", params replicated. No model-building Python runs.

    ``mesh=None`` builds a mesh of the frozen shape from the local
    devices (``facekit.parallel.make_mesh``); a server passes its own
    mesh so the engine shares the gallery store's placement (the store's
    row-sharded buckets feed the call zero-copy).
    """

    def __init__(self, path: str, mesh=None):
        import jax

        call, meta = load_engine(path)
        if meta.get("program") != "identify":
            raise ValueError(f"{path}: not an identify engine "
                             f"(program={meta.get('program')!r})")
        backend = jax.default_backend()
        plats = meta.get("platforms")
        if plats and backend not in plats:
            raise ValueError(
                f"{path}: identify engine was exported for platforms "
                f"{plats} but this process runs on {backend!r}")
        frozen = meta.get("mesh_shape")
        if frozen:
            if mesh is None:
                from facekit.parallel import make_mesh
                mesh = make_mesh(dict(frozen))
            got = dict(zip(mesh.axis_names, mesh.devices.shape))
            if got != dict(frozen):
                raise ValueError(
                    f"{path}: engine is sharded for mesh {frozen} but the "
                    f"serving mesh is {got}; re-export with "
                    f"--identify-mesh "
                    f"{','.join(f'{k}={v}' for k, v in got.items())}")
        self.path = path
        self.meta = meta
        self.mesh = mesh
        self.batch_size = int(meta["batch_size"])
        self.gallery_rows = int(meta["gallery_rows"])
        self.return_crops = bool(meta.get("return_crops"))
        self.int8_gallery = meta.get("gallery_dtype") == "int8"
        self._call = jax.jit(call)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._frames_sharding = NamedSharding(
                mesh, P("data", None, None, None))
        else:
            self._frames_sharding = None

    def __call__(self, det_params, rec_params, gallery, count, frames,
                 gallery_scale=None):
        """Dispatch one padded batch. Returns (boxes, scores, valid,
        embeddings, sims, idx[, crops]) exactly like the jit serving path.

        ``gallery`` (and int8 ``gallery_scale``) should already be
        row-sharded over the mesh's "gallery" axis (a mesh-backed
        GalleryStore snapshot is); ``frames`` is a host (B, H, W, 3) u8
        array, placed over "data" here."""
        import jax

        if frames.shape[0] != self.batch_size:
            raise ValueError(
                f"{self.path}: engine frozen at batch {self.batch_size}, "
                f"got {frames.shape[0]}")
        if gallery.shape[0] != self.gallery_rows:
            raise ValueError(
                f"{self.path}: engine frozen at gallery capacity "
                f"{self.gallery_rows}, got {gallery.shape[0]} — the "
                f"gallery grew past the artifact; re-export identify.fke "
                f"with --gallery-rows >= {gallery.shape[0]}")
        if self.int8_gallery and gallery_scale is None:
            raise ValueError(f"{self.path}: int8 identify engine needs "
                             "the per-row gallery_scale")
        if self._frames_sharding is not None:
            frames = jax.device_put(np.ascontiguousarray(frames),
                                    self._frames_sharding)
        extra = ((gallery_scale,) if self.int8_gallery else ())
        return self._call(det_params, rec_params, gallery,
                          jnp.int32(count), frames, *extra)


def load_identify_engines(engines_dir: str, config, pipeline, mesh
                          ) -> Dict[int, IdentifyEngine]:
    """Load + validate every ``identify*.fke`` in ``engines_dir`` for a
    mesh-sharded server.

    The multi-chip analog of :func:`load_serving_engines`: each artifact's
    frozen statics (geometry, thresholds, networks, quantization, mesh
    shape, gallery capacity, top-k) are checked against the serving
    config, refusing loudly on any drift. Returns ``{batch:
    IdentifyEngine}``; all artifacts must agree on the frozen gallery
    capacity (the server pins its gallery bucket ladder to it).
    """
    quant = _quant_meta(pipeline)
    cfg = config
    found: Dict[int, IdentifyEngine] = {}
    for fname in sorted(os.listdir(engines_dir)):
        if not fname.endswith(".fke"):
            continue
        path = os.path.join(engines_dir, fname)
        if not os.path.exists(path + ".json"):
            raise ValueError(f"{path}: missing {path}.json sidecar "
                             "(not a facekit engine?)")
        with open(path + ".json") as f:
            program = json.load(f).get("program")
        if program != "identify":
            continue      # single-device artifacts, not mesh-server food
        eng = IdentifyEngine(path, mesh=mesh)
        meta = eng.meta
        _check_pipeline_statics(path, meta, cfg, pipeline, quant,
                                "identify")
        _check_meta(path, meta, "gallery_topk", cfg.gallery_topk)
        want_gal = ("int8" if cfg.gallery_dtype == "int8"
                    else ("bfloat16" if cfg.compute_dtype == "bfloat16"
                          else "float32"))
        _check_meta(path, meta, "gallery_dtype", want_gal)
        b = eng.batch_size
        if b in found:
            raise ValueError(f"{path}: duplicate identify engine for "
                             f"batch {b} in {engines_dir}")
        if found and eng.gallery_rows != next(
                iter(found.values())).gallery_rows:
            raise ValueError(
                f"{path}: identify engines in {engines_dir} disagree on "
                f"the frozen gallery capacity; re-export the full ladder "
                f"in one `facekit.engine export` run")
        found[b] = eng
    return found


def _check_meta(path: str, meta: Dict[str, Any], field: str,
                expect: Any) -> None:
    got = meta.get(field)
    if got != expect:
        raise ValueError(
            f"{path}: engine was built with {field}={got!r} but the serving "
            f"config needs {expect!r}; re-export with `python -m "
            f"facekit.engine export` from this config")


def _check_pipeline_statics(path: str, meta: Dict[str, Any], cfg,
                            pipeline, quant: Dict[str, Any],
                            kind: str) -> None:
    """The full-pipeline frozen statics shared by recognize and identify
    artifacts — ONE place, so a new static added here refuses drift in
    both artifact families (they diverged silently once, r5 review)."""
    _check_meta(path, meta, "rec_network", cfg.rec_network)
    _check_meta(path, meta, "compute_dtype", cfg.compute_dtype)
    _check_meta(path, meta, "rec_quantize", quant["rec_quantize"])
    _check_meta(path, meta, "rec_calibrated", quant["rec_calibrated"])
    if meta.get("rec_int8_residual") is not None:   # absent pre-r4
        _check_meta(path, meta, "rec_int8_residual",
                    quant["rec_int8_residual"])
    if meta.get("det_quantize") is not None:        # absent pre-r5
        _check_meta(path, meta, "det_quantize", quant["det_quantize"])
    _check_meta(path, meta, "frame_hw", list(cfg.frame_hw))
    _check_meta(path, meta, "max_faces", cfg.det_maxFacesPerScene)
    _check_meta(path, meta, "det_network", pipeline.det_network)
    # detection statics frozen into the program (r4): a stale artifact
    # must refuse, not silently detect at old settings
    _check_meta(path, meta, "det_hw", list(cfg.det_hw))
    _check_meta(path, meta, "det_threshold_bbox", cfg.det_threshold_bbox)
    _check_meta(path, meta, "det_threshold_nms", cfg.det_threshold_nms)
    _check_meta(path, meta, "det_nms_top_k", cfg.det_nmsTopK)
    _check_meta(path, meta, "det_nms_exact", bool(cfg.det_nmsExact))
    _check_meta(path, meta, "align", bool(pipeline.align))
    _check_meta(path, meta, "with_landmarks", bool(pipeline.use_landmarks))
    if not meta.get("return_crops"):
        raise ValueError(
            f"{path}: {kind} engine was exported without the crops "
            "output (--no-crops); the server's WS /inference reply "
            "needs the aligned crop — re-export without --no-crops")


def load_serving_engines(engines_dir: str, config,
                         pipeline) -> Dict[str, Dict[int, Any]]:
    """Load + validate a directory of exported engines for the server.

    The reference's startup model: the serving process boots FROM the
    offline toolchain's artifacts (``deserializeCudaEngine``,
    ``src/arcface.cpp:45-69`` / ``src/retinaface.cpp:31-55``) — seconds to
    serving, no in-process model (re)building. This is the facekit analog:
    every ``recognize*.fke`` / ``embed*.fke`` in ``engines_dir`` is
    checked against the serving config's frozen geometry, network choices
    and quantization state, and a mismatched artifact refuses loudly at
    startup instead of surfacing as garbage outputs later (the reference
    has NO such check — a stale .engine silently serves wrong shapes).

    Returns ``{"recognize": {batch: callable}, "embed": {batch: callable}}``
    keyed by the batch sizes found; callables are jit-wrapped so repeat
    calls hit the executable cache. Identify engines (multi-chip
    deployment artifacts) are skipped. Whether the found batches cover the
    server's ladder is the caller's policy.
    """
    quant = _quant_meta(pipeline)
    cfg = config
    backend = jax.default_backend()
    found: Dict[str, Dict[int, Any]] = {"recognize": {}, "embed": {}}
    for fname in sorted(os.listdir(engines_dir)):
        if not fname.endswith(".fke"):
            continue
        path = os.path.join(engines_dir, fname)
        call, meta = load_engine(path)
        program = meta.get("program")
        if program == "identify":
            continue      # multi-chip deployment artifact, not server food
        if program not in ("recognize", "embed"):
            raise ValueError(f"{path}: unknown engine program {program!r}")
        plats = meta.get("platforms")
        if plats and backend not in plats:
            raise ValueError(
                f"{path}: engine was exported for platforms {plats} but "
                f"this server runs on {backend!r}; re-export with "
                f"--platforms {backend} (or tpu,cpu)")
        if program == "recognize":
            _check_pipeline_statics(path, meta, cfg, pipeline, quant,
                                    "recognize")
        else:
            _check_meta(path, meta, "rec_network", cfg.rec_network)
            _check_meta(path, meta, "compute_dtype", cfg.compute_dtype)
            _check_meta(path, meta, "rec_quantize", quant["rec_quantize"])
            _check_meta(path, meta, "rec_calibrated",
                        quant["rec_calibrated"])
            if meta.get("rec_int8_residual") is not None:  # absent pre-r4
                _check_meta(path, meta, "rec_int8_residual",
                            quant["rec_int8_residual"])
            _check_meta(path, meta, "rec_hw", list(cfg.rec_hw))
        b = int(meta["batch_size"])
        if b in found[program]:
            raise ValueError(
                f"{path}: duplicate {program} engine for batch {b} in "
                f"{engines_dir}")
        found[program][b] = jax.jit(call)
    return found


def main(argv=None) -> None:
    import argparse

    # honor JAX_PLATFORMS from the environment (same fix as the server
    # CLI): some hosts force-register an accelerator plugin in
    # sitecustomize and override the env var programmatically — an
    # export for `--platforms cpu` must not hang initializing a dead
    # accelerator tunnel it never needs
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms",
                              os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from facekit.config import load_config
    from facekit.models import init_model_params
    from facekit.pipeline import FacePipeline

    ap = argparse.ArgumentParser(
        "facekit.engine", description="export serving engines")
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export")
    ex.add_argument("-c", "--config", default=None)
    ex.add_argument("-o", "--out-dir", default="engines")
    ex.add_argument("-b", "--batch-size", default=None,
                    help="batch size, or comma list matching the server's "
                         "server_batchBuckets ladder (e.g. '1,8,64'): one "
                         "recognize/embed engine pair per bucket. Default: "
                         "the config's own server_batchBuckets (else "
                         "server_batchSize, else 8), i.e. exactly the "
                         "ladder the server will demand at --engines load")
    ex.add_argument("--no-crops", action="store_true",
                    help="recognize engines omit the per-face crops output "
                         "(smaller transfers; NOT loadable by the server's "
                         "WS path, which needs the crop for its reply)")
    ex.add_argument("--platforms", default="tpu,cpu",
                    help="comma list (default tpu,cpu: one artifact "
                         "deploys on either; 'native' = current platform "
                         "only)")
    ex.add_argument("--identify-mesh", default=None,
                    help="also export identify.fke — the complete fused "
                         "detect+align+embed+match program — sharded over "
                         "a TPU topology mesh, e.g. 'data=2,gallery=4' "
                         "(the v5e-8 serving layout)")
    ex.add_argument("--topology", default="v5e:2x4",
                    help="TPU topology for --identify-mesh")
    ex.add_argument("--gallery-rows", type=int, default=1 << 20,
                    help="gallery capacity frozen into identify.fke")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else load_config({})
    det, rec = init_model_params(cfg)
    pipe = FacePipeline(cfg, det, rec)
    # same int8 calibration the server applies for this config — an
    # exported engine must embed with the scales the server serves with
    from facekit.server.app import calibrate_from_config
    calibrated = calibrate_from_config(pipe, cfg)
    if (cfg.extras.get("rec_calibrationDir")
            and getattr(cfg, "rec_quantize", False) and not calibrated):
        # a server would degrade to dynamic scales with a warning; an
        # EXPORT must not bake the wrong params signature into a frozen
        # artifact (r2 advisor finding) — fail loudly instead
        raise SystemExit(
            "engine export: rec_calibrationDir is configured but unusable "
            f"({cfg.extras.get('rec_calibrationDir')}); refusing to export "
            "an uncalibrated artifact for a calibrated config")
    plats = (None if args.platforms == "native"
             else args.platforms.split(","))

    os.makedirs(args.out_dir, exist_ok=True)
    if args.batch_size is None:
        # mirror FaceServer's ladder resolution so the exported set is
        # exactly what `--engines` validation will require for this config
        raw = (cfg.extras.get("server_batchBuckets")
               or [cfg.extras.get("server_batchSize", 8)])
        batches = sorted({int(b) for b in raw})
    else:
        batches = sorted({int(b) for b in str(args.batch_size).split(",")})
    for b in batches:
        # one engine pair per batch bucket; the bare name (single-batch
        # export) stays the documented artifact name
        sfx = "" if len(batches) == 1 else f".b{b}"
        blob, meta = export_recognize_engine(
            pipe, b, plats, return_crops=not args.no_crops)
        save_engine(os.path.join(args.out_dir, f"recognize{sfx}.fke"),
                    blob, meta)
        print(f"recognize{sfx}.fke: {len(blob)} bytes {meta}")
        blob, meta = export_embed_engine(pipe, b, plats)
        save_engine(os.path.join(args.out_dir, f"embed{sfx}.fke"),
                    blob, meta)
        print(f"embed{sfx}.fke: {len(blob)} bytes {meta}")
    if args.identify_mesh:
        shape = {k: int(v) for k, v in
                 (kv.split("=") for kv in args.identify_mesh.split(","))}
        mesh = topology_mesh(shape, args.topology)
        for b in batches:
            # one identify engine per batch bucket (like recognize/embed):
            # a mesh-sharded server consumes the full ladder. Crops ride
            # along by default — the WS reply needs them.
            sfx = "" if len(batches) == 1 else f".b{b}"
            blob, meta = export_identify_engine(
                pipe, b, args.gallery_rows, mesh=mesh, platforms=plats,
                return_crops=not args.no_crops)
            save_engine(os.path.join(args.out_dir, f"identify{sfx}.fke"),
                        blob, meta)
            print(f"identify{sfx}.fke: {len(blob)} bytes {meta}")


if __name__ == "__main__":
    main()
