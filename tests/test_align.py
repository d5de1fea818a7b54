"""Umeyama similarity transform + warp parity vs cv2/numpy oracles."""

import cv2
import numpy as np
import jax.numpy as jnp

from facekit.ops.align import (ARCFACE_TEMPLATE_112, umeyama, warp_align)


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


def test_umeyama_matches_numpy_oracle(rng):
    src = (ARCFACE_TEMPLATE_112 +
           rng.normal(0, 5, size=(5, 2))).astype(np.float32) * 2 + 30
    m = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_TEMPLATE_112)))
    ref = _umeyama_oracle(src, ARCFACE_TEMPLATE_112)
    np.testing.assert_allclose(m, ref, rtol=1e-4, atol=1e-4)


def test_warp_align_matches_cv2(rng):
    frame = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    # a plausible face: template scaled 2x and shifted
    lm = (ARCFACE_TEMPLATE_112 * 2.0 + np.array([150.0, 80.0])).astype(np.float32)
    ours = np.asarray(warp_align(jnp.asarray(frame), jnp.asarray(lm[None])))[0]

    m = _umeyama_oracle(lm, ARCFACE_TEMPLATE_112)
    ref = cv2.warpAffine(frame, m, (112, 112))
    # interior agrees; borders differ at most by interpolation edge handling
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2],
                               atol=0.5, rtol=0)


def test_warp_align_batch_shape(rng):
    frame = rng.uniform(0, 255, size=(240, 320, 3)).astype(np.float32)
    lms = np.stack([ARCFACE_TEMPLATE_112 + 10, ARCFACE_TEMPLATE_112 * 1.5])
    out = warp_align(jnp.asarray(frame), jnp.asarray(lms))
    assert out.shape == (2, 112, 112, 3)
    assert np.isfinite(np.asarray(out)).all()
