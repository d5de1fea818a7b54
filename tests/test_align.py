"""Umeyama similarity transform + warp parity vs cv2/numpy oracles.

Two warp implementations: ``warp_align_gather`` (direct bilinear sampling,
matches cv2.warpAffine closely) and ``warp_align_shear`` (the default —
gather-free two-pass matmuls, ~9x faster on TPU, double-interpolation
softening bounded at the embedding level)."""

import cv2
import numpy as np
import jax.numpy as jnp

from facekit.ops.align import (ARCFACE_TEMPLATE_112, umeyama,
                               warp_align_gather, warp_align_shear)


def _umeyama_oracle(src, dst):
    """Independent numpy transcription (Umeyama 1991, estimate_scale=True)."""
    n = src.shape[0]
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / n
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    diag = np.array([1.0, d])
    r = (u * diag) @ vt
    scale = (s * diag).sum() / (sc ** 2).sum(1).mean()
    t = mu_d - scale * r @ mu_s
    return np.concatenate([scale * r, t[:, None]], 1)


def _mk_lm(theta, s, tx, ty):
    r = s * np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
    return (ARCFACE_TEMPLATE_112 @ r.T + np.array([tx, ty])).astype(np.float32)


def test_umeyama_recovers_known_transform(rng):
    angle, scale = 0.3, 1.7
    r = scale * np.array([[np.cos(angle), -np.sin(angle)],
                          [np.sin(angle), np.cos(angle)]])
    t = np.array([10.0, -5.0])
    src = rng.normal(0, 50, size=(5, 2)).astype(np.float32)
    dst = src @ r.T + t
    m = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(m[:, :2], r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(m[:, 2], t, rtol=1e-3, atol=1e-3)


def test_umeyama_coincident_landmarks_stays_finite(rng):
    """All-coincident source points (degenerate landmark-head output on a
    garbage region) must yield a FINITE transform and a finite crop, not
    Inf/NaN flowing into the slot's embedding (r4 review finding: var_s
    was unclamped)."""
    from facekit.ops.align import warp_align_shear
    src = np.full((5, 2), 37.0, np.float32)           # pure point collapse
    m = np.asarray(umeyama(jnp.asarray(src),
                           jnp.asarray(ARCFACE_TEMPLATE_112)))
    assert np.all(np.isfinite(m)), m
    frame = rng.integers(0, 256, (120, 160, 3), np.uint8).astype(np.float32)
    crops = np.asarray(warp_align_shear(jnp.asarray(frame),
                                        jnp.asarray(src)[None]))
    assert np.all(np.isfinite(crops))


def test_umeyama_matches_numpy_oracle(rng):
    src = (ARCFACE_TEMPLATE_112 +
           rng.normal(0, 5, size=(5, 2))).astype(np.float32) * 2 + 30
    m = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_TEMPLATE_112)))
    ref = _umeyama_oracle(src, ARCFACE_TEMPLATE_112)
    np.testing.assert_allclose(m, ref, rtol=1e-4, atol=1e-4)


def test_umeyama_reflection_case_matches_oracle(rng):
    """det(cov) < 0 (mirrored correspondence): the closed-form rotation
    must reproduce the SVD formulation's sign-corrected R — still a
    PROPER rotation (det +1), never a reflection."""
    src = (ARCFACE_TEMPLATE_112 +
           rng.normal(0, 3, size=(5, 2))).astype(np.float32)
    mirrored = ARCFACE_TEMPLATE_112 * np.array([-1.0, 1.0]) + [112.0, 0.0]
    m = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(
        mirrored.astype(np.float32))))
    ref = _umeyama_oracle(src, mirrored.astype(np.float32))
    np.testing.assert_allclose(m, ref, rtol=1e-4, atol=1e-4)
    r = m[:, :2]
    assert np.linalg.det(r) > 0


def test_warp_gather_matches_cv2(rng):
    frame = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    lm = (ARCFACE_TEMPLATE_112 * 2.0 + np.array([150.0, 80.0])).astype(np.float32)
    ours = np.asarray(warp_align_gather(jnp.asarray(frame),
                                        jnp.asarray(lm[None])))[0]
    m = _umeyama_oracle(lm, ARCFACE_TEMPLATE_112)
    ref = cv2.warpAffine(frame, m, (112, 112))
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2],
                               atol=0.5, rtol=0)


def test_warp_shear_close_to_gather_on_natural_image(reference_dir):
    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    lms = jnp.asarray(np.stack([
        _mk_lm(0.0, 2.0, 150, 80), _mk_lm(0.3, 1.5, 300, 200),
        _mk_lm(-0.5, 2.5, 200, 150), _mk_lm(0.1, 0.8, 100, 100)]))
    a = np.asarray(warp_align_gather(frame, lms))
    b = np.asarray(warp_align_shear(frame, lms))
    # double interpolation softens; mean interior divergence stays tiny
    for i in range(4):
        d = np.abs(a[i, 4:-4, 4:-4] - b[i, 4:-4, 4:-4])
        assert d.mean() < 1.5, (i, d.mean())


def test_warp_shear_embedding_impact(reference_dir):
    """The shear path moves embeddings <1e-3 cosine vs exact warping."""
    import jax
    from facekit.models import arcface_init, arcface_apply
    from facekit.ops.preprocess import rec_normalize

    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    lms = jnp.asarray(np.stack([
        _mk_lm(0.0, 2.0, 150, 80), _mk_lm(0.3, 1.5, 300, 200),
        _mk_lm(-0.5, 2.5, 200, 150), _mk_lm(0.1, 0.8, 100, 100)]))
    a = warp_align_gather(frame, lms)
    b = warp_align_shear(frame, lms)
    p = arcface_init(jax.random.PRNGKey(1))
    ea = np.asarray(arcface_apply(p, rec_normalize(a)))
    eb = np.asarray(arcface_apply(p, rec_normalize(b)))
    cos_dist = 1 - (ea * eb).sum(-1)
    assert cos_dist.max() < 1e-3, cos_dist


def test_warp_shear_bf16_matmuls_close_to_f32(reference_dir):
    """dtype=bfloat16 runs the two pass matmuls in bf16 (halves the banded
    weight matrices' HBM traffic — the warp's dominant cost; positions and
    accumulation stay f32). Crop error vs the f32 path stays within 2
    uint8 LSBs worst-case (one bf16 rounding per pass) and well under
    1/4 LSB on average."""
    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    lms = jnp.asarray(np.stack([
        _mk_lm(0.0, 2.0, 150, 80), _mk_lm(0.3, 1.5, 300, 200),
        _mk_lm(-0.5, 2.5, 200, 150), _mk_lm(0.1, 0.8, 100, 100)]))
    a = np.asarray(warp_align_shear(frame, lms))
    b = np.asarray(warp_align_shear(frame, lms, dtype=jnp.bfloat16))
    d = np.abs(a - b)
    assert d.max() < 2.5 and d.mean() < 0.25, (d.max(), d.mean())


def test_warp_batch_shapes(rng):
    frame = rng.uniform(0, 255, size=(240, 320, 3)).astype(np.float32)
    lms = np.stack([ARCFACE_TEMPLATE_112 + 10, ARCFACE_TEMPLATE_112 * 1.5])
    for fn in (warp_align_gather, warp_align_shear):
        out = fn(jnp.asarray(frame), jnp.asarray(lms))
        assert out.shape == (2, 112, 112, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_warp_shear_large_rotations(reference_dir):
    """75/90/135/180-deg in-plane rotations: the quadrant-factored shear
    path must match the exact gather warp (r1 degraded beyond ~60 deg —
    VERDICT item 6). No manual path switching."""
    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    degs = [75, 90, 105, 135, 180, -90, -120]
    lms = jnp.asarray(np.stack([
        _mk_lm(np.deg2rad(d), 1.6, 300, 220) for d in degs]))
    a = np.asarray(warp_align_gather(frame, lms))
    b = np.asarray(warp_align_shear(frame, lms))
    for i, d in enumerate(degs):
        diff = np.abs(a[i, 4:-4, 4:-4] - b[i, 4:-4, 4:-4])
        assert diff.mean() < 1.5, (d, diff.mean())


def test_warp_shear_large_rotation_embedding_impact(reference_dir):
    """Embedding-level acceptance at 75 and 90 deg (<1e-3 cosine)."""
    import jax
    from facekit.models import arcface_init, arcface_apply
    from facekit.ops.preprocess import rec_normalize

    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    lms = jnp.asarray(np.stack([
        _mk_lm(np.deg2rad(75), 1.6, 300, 220),
        _mk_lm(np.deg2rad(90), 1.6, 300, 220)]))
    ea = np.asarray(arcface_apply(
        arcface_init(jax.random.PRNGKey(1)),
        rec_normalize(warp_align_gather(frame, lms))))
    eb = np.asarray(arcface_apply(
        arcface_init(jax.random.PRNGKey(1)),
        rec_normalize(warp_align_shear(frame, lms))))
    cos_dist = 1 - (ea * eb).sum(-1)
    assert cos_dist.max() < 1e-3, cos_dist


def test_warp_shear_large_output_resolution(reference_dir):
    """224x224 alignment must not resample through a low-res intermediate
    (the window scales with out_hw); parity with the gather path holds."""
    frame = jnp.asarray(cv2.resize(
        cv2.imread(f"{reference_dir}/imgs/2.jpg"), (640, 480)
    ).astype(np.float32))
    lm = _mk_lm(0.4, 2.2, 300, 220)
    # template scaling in both paths maps 112-space landmarks to 224 out
    a = np.asarray(warp_align_gather(frame, jnp.asarray(lm[None]),
                                     out_hw=(224, 224)))[0]
    b = np.asarray(warp_align_shear(frame, jnp.asarray(lm[None]),
                                    out_hw=(224, 224)))[0]
    d = np.abs(a[8:-8, 8:-8] - b[8:-8, 8:-8])
    assert d.mean() < 2.0, d.mean()


def test_warp_align_frames_windowed_bit_identical(rng):
    """The windowed batched path (uint8 dynamic-slice + S x S crop-resize)
    must be BIT-identical to the full-frame path: crop_resize clamps taps
    to the box, origins are integral, and zero-weight columns contribute
    exact zeros. Covers interior faces, frame-edge faces (origin clamp),
    and the oversize fallback."""
    import jax
    from facekit.ops.align import warp_align_frames

    frames = rng.integers(0, 256, size=(2, 480, 640, 3), dtype=np.uint8)
    lms = np.stack([
        np.stack([_mk_lm(0.3, 1.2, 320, 240),     # interior
                  _mk_lm(-0.6, 0.8, 20, 30)]),    # upper-left edge
        np.stack([_mk_lm(1.2, 1.5, 620, 460),     # lower-right edge
                  # NOT an exact-integer translation: identity-transform
                  # landmarks put the window box exactly on integer
                  # boundaries, where a 1e-5 umeyama rounding difference
                  # between the batched and single-frame compilations
                  # flips crop_resize's floor() and shifts the window a
                  # pixel (pre-existing batch-vs-single nondeterminism,
                  # orthogonal to windowing — the windowed-vs-full
                  # assertions below share one compilation and are exact)
                  _mk_lm(0.1, 1.07, 100.37, 400.61)]),
    ]).astype(np.float32)                          # (2, 2, 5, 2)

    full = np.asarray(warp_align_frames(jnp.asarray(frames),
                                        jnp.asarray(lms), slice_win=None))
    win = np.asarray(warp_align_frames(jnp.asarray(frames),
                                       jnp.asarray(lms), slice_win=320))
    np.testing.assert_array_equal(win, full)

    # one oversized face (scale 4 -> window side > 320) anywhere must take
    # the full-frame fallback and still produce the full-path result
    lms_big = lms.copy()
    lms_big[0, 0] = _mk_lm(0.3, 4.0, 320, 240)
    full_b = np.asarray(warp_align_frames(jnp.asarray(frames),
                                          jnp.asarray(lms_big),
                                          slice_win=None))
    win_b = np.asarray(warp_align_frames(jnp.asarray(frames),
                                         jnp.asarray(lms_big),
                                         slice_win=320))
    np.testing.assert_array_equal(win_b, full_b)

    # and the batched-frames full path equals the single-frame reference
    # (separate compilations: f32-rounding-level tolerance, not exactness)
    singles = np.stack([np.asarray(warp_align_shear(
        jnp.asarray(frames[i], jnp.float32), jnp.asarray(lms[i])))
        for i in range(2)])
    np.testing.assert_allclose(full, singles, atol=0.05)
