"""ArcFace additive-angular-margin classification head.

A facekit extension: the reference serves frozen embeddings only (its IR-50
was trained offline with exactly this head — ArcFace, Deng et al. 2019,
s*cos(theta + m) on L2-normalized features and class centers). Restoring the
training capability makes the framework able to fine-tune/retrain galleries'
embedding spaces on TPU. The class-center matrix (C, D) is the natural
tensor-parallel axis: shard classes over the mesh and let XLA handle the
cross-shard softmax reductions.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def head_init(key, num_classes: int, embed_dim: int = 512) -> Dict:
    w = jax.random.normal(key, (num_classes, embed_dim), jnp.float32) * 0.01
    return {"w": w}


def arc_margin_logits(head: Dict, embeddings: jnp.ndarray,
                      labels: jnp.ndarray, margin: float = 0.5,
                      scale: float = 64.0) -> jnp.ndarray:
    """(B, D) L2-normed embeddings + (B,) labels -> (B, C) margined logits.

    cos(theta + m) applied to the target class only, with the standard
    easy-margin stabilization for theta + m > pi.
    """
    w = head["w"]
    wn = w / jnp.linalg.norm(w, axis=1, keepdims=True)
    cos = embeddings @ wn.T                                 # (B, C)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    sin = jnp.sqrt(1.0 - cos ** 2)
    cos_m = jnp.cos(margin)
    sin_m = jnp.sin(margin)
    phi = cos * cos_m - sin * sin_m                          # cos(theta + m)
    # when theta + m exceeds pi, fall back to a linear penalty
    th = jnp.cos(jnp.pi - margin)
    mm = jnp.sin(jnp.pi - margin) * margin
    phi = jnp.where(cos > th, phi, cos - mm)
    onehot = jax.nn.one_hot(labels, w.shape[0], dtype=cos.dtype)
    return scale * (onehot * phi + (1.0 - onehot) * cos)


def combined_margin_logits(head: Dict, embeddings: jnp.ndarray,
                           labels: jnp.ndarray, m1: float = 1.0,
                           m2: float = 0.5, m3: float = 0.0,
                           scale: float = 64.0) -> jnp.ndarray:
    """Generalized insightface margin: target logit = cos(m1*theta + m2) - m3.

    (1, m, 0) = ArcFace, (1, 0, m) = CosFace (Wang et al. 2018),
    (m, 0, 0) = SphereFace (Liu et al. 2017); intermediate triples are the
    "combined margin" of the insightface training recipes.

    Degenerate region (m1*theta + m2 > pi, i.e. hard examples near the
    antipode): for additive-angle triples (m1 == 1), instead of clipping
    the angle — which makes the target logit the CONSTANT -1 - m3 with
    zero gradient — apply the same linear penalty ``cos - sin(m2)*m2``
    that ``arc_margin_logits`` uses, so hard examples keep a training
    signal; at (1, m, 0) this is gradient-equivalent to
    ``arc_margin_logits`` (r2 advisor finding). For multiplicative
    triples (m1 != 1) that penalty would REMOVE the margin and break the
    target logit's monotonicity in theta (it jumps up at the boundary),
    so the standard angle clip is kept there — monotone, at the cost of
    a flat gradient past theta = (pi - m2)/m1.
    """
    w = head["w"]
    wn = w / jnp.linalg.norm(w, axis=1, keepdims=True)
    cos = embeddings @ wn.T                                 # (B, C)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    if m1 == 1.0:
        phi = jnp.cos(theta + m2) - m3
        # threshold in cos space: theta + m2 > pi <=> cos < cos(pi - m2)
        th = math.cos(math.pi - m2)
        mm = math.sin(m2) * m2
        phi = jnp.where(cos > th, phi, cos - mm - m3)
    else:
        phi = jnp.cos(jnp.clip(m1 * theta + m2, 0.0, math.pi)) - m3
    onehot = jax.nn.one_hot(labels, w.shape[0], dtype=cos.dtype)
    return scale * (onehot * phi + (1.0 - onehot) * cos)
