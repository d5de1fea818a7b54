"""Sharded ArcFace training step (data-parallel batch x class-parallel head).

Idiomatic jit-with-shardings: the mesh has a "data" axis (batch) and a
"model" axis (the (C, D) class-center matrix sharded over classes). The
backbone is replicated; the softmax cross-entropy over sharded classes
compiles to psum-style collectives inserted by GSPMD — no hand-written
communication. This is the dryrun_multichip target program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facekit.models.arcface import arcface_apply, arcface_init
from facekit.train.arcface_head import (arc_margin_logits,
                                        combined_margin_logits, head_init)


class TrainState(NamedTuple):
    params: Dict[str, Any]        # backbone pytree
    head: Dict[str, Any]          # {"w": (C, D)}
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 0.1, momentum: float = 0.9,
                   weight_decay: float = 0.0, schedule=None,
                   warmup_steps: int = 0, total_steps: int = 0):
    """SGD+momentum with the standard ArcFace-recipe extras.

    ``schedule``: None = constant ``lr``; ``"cosine"`` = linear warmup
    over ``warmup_steps`` then cosine decay to 0 at ``total_steps`` (the
    insightface fine-tune recipe); or any optax schedule callable.
    ``weight_decay`` applies only to rank>=2 leaves (conv/linear/head
    kernels) — BN scales/biases and PReLU slopes are excluded, the
    conventional mask.
    """
    if callable(schedule):
        sched = schedule
    elif schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine schedule needs total_steps > 0")
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, max(warmup_steps, 1), total_steps)
    elif schedule is None:
        sched = lr
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    tx = optax.sgd(sched, momentum=momentum)
    if weight_decay:
        mask = lambda tree: jax.tree.map(lambda p: jnp.ndim(p) >= 2, tree)
        tx = optax.chain(optax.add_decayed_weights(weight_decay, mask), tx)
    return tx


def train_state_init(key, num_classes: int, network: str = "ir_50",
                     lr: float = 0.1, **opt_kwargs) -> TrainState:
    """``opt_kwargs`` (weight_decay/schedule/warmup_steps/total_steps)
    must match the ones given to ``make_train_step`` — both construct the
    same optimizer, state here, update rule there."""
    k1, k2 = jax.random.split(key)
    params = arcface_init(k1, network=network)
    head = head_init(k2, num_classes)
    tx = make_optimizer(lr, **opt_kwargs)
    opt_state = tx.init((params, head))
    return TrainState(params, head, opt_state, jnp.zeros((), jnp.int32))


def train_shardings(state: TrainState, mesh: Mesh,
                    data_axis: str = "data", model_axis: str = "model"):
    """(state_shardings, batch_shardings): head sharded over classes,
    backbone + opt replicated, batch over data."""
    repl = NamedSharding(mesh, P())
    head_sh = NamedSharding(mesh, P(model_axis, None))

    params_sh = jax.tree.map(lambda _: repl, state.params)
    head_shs = {"w": head_sh}
    # Optimizer state starts replicated; after the first jitted step GSPMD
    # propagates the head sharding into its momentum buffer automatically.
    # (Matching leaves by dict key is unreliable — the backbone's linear
    # layer also uses a "w" key.)
    opt_sh = jax.tree.map(lambda _: repl, state.opt_state)
    state_sh = TrainState(params_sh, head_shs, opt_sh, repl)
    batch_sh = (NamedSharding(mesh, P(data_axis, None, None, None)),
                NamedSharding(mesh, P(data_axis)))
    return state_sh, batch_sh


def make_train_step(network: str = "ir_50", lr: float = 0.1,
                    margin: float = 0.5, scale: float = 64.0,
                    remat: bool = False, margins=None,
                    compute_dtype=jnp.float32, **opt_kwargs):
    """``remat=True`` rematerializes the backbone forward in the backward
    pass (jax.checkpoint), trading ~1.3x FLOPs for activation memory —
    needed for large batches of IR-101/152 on one chip.

    ``margins``: optional (m1, m2, m3) triple selecting the generalized
    combined margin (SphereFace/ArcFace/CosFace — see
    combined_margin_logits); default None keeps the classic additive
    angular margin head with ``margin``.

    ``compute_dtype``: backbone forward/backward precision.
    ``jnp.bfloat16`` is the TPU-native mixed-precision recipe — params,
    optimizer state, margin head, and loss stay float32 (master weights);
    only the conv/matmul compute drops to bf16, which is what the MXU
    wants. Default float32.

    ``opt_kwargs``: forwarded to ``make_optimizer`` (weight_decay,
    schedule="cosine", warmup_steps, total_steps) — pass the SAME values
    to ``train_state_init`` so the opt state matches the update rule.
    """
    tx = make_optimizer(lr, **opt_kwargs)

    backbone = functools.partial(arcface_apply, network=network,
                                 dtype=compute_dtype)
    if remat:
        backbone = jax.checkpoint(backbone, static_argnums=())

    def loss_fn(params, head, images, labels):
        # the margin head's trig is precision-sensitive: always f32
        emb = backbone(params, images).astype(jnp.float32)
        if margins is not None:
            m1, m2, m3 = margins
            logits = combined_margin_logits(head, emb, labels, m1, m2, m3,
                                            scale)
        else:
            logits = arc_margin_logits(head, emb, labels, margin, scale)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        return losses.mean()

    @jax.jit
    def train_step(state: TrainState, images: jnp.ndarray,
                   labels: jnp.ndarray) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.params, state.head, images, labels)
        updates, new_opt = tx.update(grads, state.opt_state,
                                     (state.params, state.head))
        new_params, new_head = optax.apply_updates(
            (state.params, state.head), updates)
        return TrainState(new_params, new_head, new_opt,
                          state.step + 1), loss

    return train_step
