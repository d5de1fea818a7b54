"""Margin-head math: ArcFace additive angular margin and the generalized
combined margin (SphereFace m1 / ArcFace m2 / CosFace m3).

The reference has no training at all (SURVEY.md §2.9); this facekit
extension restores the training recipe its IR-50 checkpoint came from
(ArcFace, conversion/arcface/model_irse.py provenance) plus the other
standard insightface margins.
"""

import numpy as np
import jax
import jax.numpy as jnp

from facekit.train import (arc_margin_logits, combined_margin_logits,
                           head_init)


def _setup(rng, b=6, c=16, d=32):
    head = head_init(jax.random.PRNGKey(0), c, d)
    emb = rng.normal(0, 1, size=(b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = (rng.integers(0, c, size=(b,))).astype(np.int32)
    return head, jnp.asarray(emb), jnp.asarray(labels)


def _plain_cos(head, emb):
    w = np.asarray(head["w"])
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    return np.asarray(emb) @ wn.T


def test_cosface_is_additive_on_target(rng):
    """(1, 0, m3): target logit = s*(cos - m3) exactly; others untouched."""
    head, emb, labels = _setup(rng)
    s, m3 = 64.0, 0.35
    out = np.asarray(combined_margin_logits(head, emb, labels,
                                            1.0, 0.0, m3, s))
    cos = _plain_cos(head, emb)
    expect = s * cos.copy()
    expect[np.arange(len(labels)), np.asarray(labels)] = (
        s * (cos[np.arange(len(labels)), np.asarray(labels)] - m3))
    np.testing.assert_allclose(out, expect, atol=2e-4)


def test_combined_m2_matches_arcface(rng):
    """(1, m, 0) reproduces the classic additive angular margin head in
    the non-degenerate region (theta + m < pi)."""
    head, emb, labels = _setup(rng)
    a = np.asarray(arc_margin_logits(head, emb, labels, 0.5, 64.0))
    b = np.asarray(combined_margin_logits(head, emb, labels,
                                          1.0, 0.5, 0.0, 64.0))
    cos = _plain_cos(head, emb)
    tgt = cos[np.arange(len(np.asarray(labels))), np.asarray(labels)]
    ok = tgt > np.cos(np.pi - 0.5)   # arc's easy-margin region
    np.testing.assert_allclose(a[ok], b[ok], atol=5e-4)


def test_combined_margin_degenerate_region_keeps_gradient(rng):
    """theta + m > pi (hard example near the antipode): r2's angle clip
    made the target logit the constant -1 - m3 with ZERO gradient; the
    arc-style linear fallback must keep (1, m, 0) gradient-equivalent to
    arc_margin_logits there (r2 advisor finding)."""
    head, _, _ = _setup(rng)
    w = np.asarray(head["w"])
    # embedding pointed almost exactly away from its class center
    target = 3
    e = -w[target] / np.linalg.norm(w[target])
    e = e + 0.01 * rng.normal(size=e.shape)
    e = (e / np.linalg.norm(e)).astype(np.float32)[None]
    labels = jnp.asarray([target], jnp.int32)
    emb = jnp.asarray(e)

    a = np.asarray(arc_margin_logits(head, emb, labels, 0.5, 64.0))
    b = np.asarray(combined_margin_logits(head, emb, labels,
                                          1.0, 0.5, 0.0, 64.0))
    np.testing.assert_allclose(a, b, atol=5e-4)

    def tgt_logit(fn):
        def f(x):
            return fn(head, x, labels)[0, target]
        return np.asarray(jax.grad(f)(emb))

    ga = tgt_logit(lambda h, x, l: arc_margin_logits(h, x, l, 0.5, 64.0))
    gb = tgt_logit(lambda h, x, l: combined_margin_logits(h, x, l,
                                                          1.0, 0.5, 0.0,
                                                          64.0))
    assert np.abs(gb).max() > 1e-3, "degenerate region lost its gradient"
    np.testing.assert_allclose(ga, gb, atol=1e-3)


def test_sphereface_target_logit_monotone_in_theta():
    """m1 > 1: the target logit must stay MONOTONE non-increasing in theta
    through the clip boundary — the r3 review caught that applying the
    arc-style linear fallback there would jump the logit UP (rewarding
    harder examples); multiplicative triples keep the angle clip."""
    from facekit.train.arcface_head import combined_margin_logits
    m1 = 1.5
    w = np.zeros((4, 8), np.float32)
    w[0, 0] = 1.0
    w[1:, 1:4] = np.eye(3)
    head = {"w": jnp.asarray(w)}
    thetas = np.linspace(0.01, np.pi - 0.01, 80)
    logits = []
    for t in thetas:
        e = np.zeros((1, 8), np.float32)
        e[0, 0] = np.cos(t)
        e[0, 4] = np.sin(t)          # off-center direction
        out = combined_margin_logits(head, jnp.asarray(e),
                                     jnp.asarray([0], jnp.int32),
                                     m1, 0.0, 0.0, 64.0)
        logits.append(float(np.asarray(out)[0, 0]))
    diffs = np.diff(logits)
    assert (diffs <= 1e-4).all(), diffs.max()


def test_train_step_cosine_schedule_and_weight_decay():
    """The insightface-recipe extras: warmup-cosine LR + masked weight
    decay. The schedule must actually move (warmup then decay to ~0 at
    total_steps), decay must touch only rank>=2 leaves, and the full
    train step stays finite."""
    import optax
    from facekit.train import make_optimizer, make_train_step, \
        train_state_init

    kw = dict(weight_decay=5e-4, schedule="cosine", warmup_steps=2,
              total_steps=8)
    state = train_state_init(jax.random.PRNGKey(0), 8, network="ir_tiny",
                             lr=0.1, **kw)
    step = make_train_step(network="ir_tiny", lr=0.1, **kw)
    local = np.random.default_rng(3)
    imgs = jnp.asarray(local.normal(0, 1, (2, 112, 112, 3)).astype(np.float32))
    lbls = jnp.asarray([1, 2], jnp.int32)
    losses = []
    for _ in range(8):
        state, loss = step(state, imgs, lbls)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 8

    # the schedule itself: warmup then cosine to 0
    sched = optax.warmup_cosine_decay_schedule(0.0, 0.1, 2, 8)
    assert float(sched(0)) < float(sched(2))          # warmup rises
    assert float(sched(8)) < 1e-6                      # decayed to ~0

    # decay mask: BN/PReLU (rank 1) excluded, conv kernels (rank 4) in
    # (constant lr here: the cosine schedule's step-0 lr is 0, which
    # would zero every update and hide the mask)
    tx = make_optimizer(0.1, weight_decay=5e-4)
    params = (state.params, state.head)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    opt_state = tx.init(params)
    updates, _ = tx.update(zero_grads, opt_state, params)
    upd_backbone, _ = updates
    conv_upd = np.asarray(upd_backbone["input"]["conv"])
    prelu_upd = np.asarray(upd_backbone["input"]["prelu"])
    assert np.abs(conv_upd).max() > 0          # decayed (nonzero update)
    assert np.abs(prelu_upd).max() == 0        # masked out


def test_sphereface_margin_reduces_target(rng):
    """(m1, 0, 0): multiplicative angular margin lowers the target logit,
    leaves the rest, and keeps gradients finite."""
    head, emb, labels = _setup(rng)
    out = np.asarray(combined_margin_logits(head, emb, labels,
                                            1.35, 0.0, 0.0, 64.0))
    cos = _plain_cos(head, emb) * 64.0
    idx = np.arange(len(np.asarray(labels))), np.asarray(labels)
    assert (out[idx] <= cos[idx] + 1e-3).all()
    mask = np.ones_like(cos, bool)
    mask[idx] = False
    np.testing.assert_allclose(out[mask], cos[mask], atol=2e-4)

    def loss(e):
        return combined_margin_logits(head, e, labels,
                                      1.35, 0.0, 0.0, 64.0).sum()
    g = jax.grad(loss)(emb)
    assert np.isfinite(np.asarray(g)).all()


def test_train_step_with_combined_margins(rng):
    """make_train_step(margins=...) runs end-to-end on the tiny backbone:
    finite losses, params actually update, and a small-lr step sequence
    improves on the fixed batch."""
    from facekit.train import make_train_step, train_state_init
    state = train_state_init(jax.random.PRNGKey(0), num_classes=8,
                             network="ir_tiny", lr=0.01)
    step = make_train_step(network="ir_tiny", lr=0.01,
                           margins=(1.0, 0.3, 0.2))
    x = jnp.asarray(rng.normal(0, 1, size=(8, 112, 112, 3))
                    .astype(np.float32))
    y = jnp.arange(8, dtype=jnp.int32) % 8
    w0 = np.asarray(state.head["w"])
    state, l0 = step(state, x, y)
    losses = [float(l0)]
    for _ in range(5):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert not np.array_equal(w0, np.asarray(state.head["w"]))
    assert min(losses[1:]) < losses[0], losses

def test_train_step_bf16_compute(rng):
    """compute_dtype=bf16 (the TPU mixed-precision recipe: bf16 conv
    compute, f32 master weights/head/loss) trains: finite decreasing
    losses, f32 param dtypes preserved, and the loss trajectory tracks
    the f32 run to bf16 tolerance."""
    from facekit.train import make_train_step, train_state_init
    x = jnp.asarray(rng.normal(0, 1, size=(8, 112, 112, 3))
                    .astype(np.float32))
    y = jnp.arange(8, dtype=jnp.int32) % 8

    losses = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        state = train_state_init(jax.random.PRNGKey(0), num_classes=8,
                                 network="ir_tiny", lr=0.01)
        step = make_train_step(network="ir_tiny", lr=0.01,
                               compute_dtype=dt)
        ls = []
        for _ in range(4):
            state, loss = step(state, x, y)
            ls.append(float(loss))
        losses[name] = ls
        # master weights stay f32 regardless of compute dtype
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.dtype == jnp.float32, leaf.dtype
    assert np.isfinite(losses["bf16"]).all(), losses
    assert losses["bf16"][-1] < losses["bf16"][0], losses
    # early steps track f32 tightly; later steps drift as rounding
    # compounds through the optimizer (expected for mixed precision)
    np.testing.assert_allclose(losses["bf16"][:2], losses["f32"][:2],
                               rtol=0.05, atol=0.05)
