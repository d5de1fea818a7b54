"""ARCHIVED EXPERIMENT — fused IR residual block as one Pallas kernel.

Measured 2026-08-16 on v5e (see docs/ROADMAP.md): exact parity with the
XLA block path (interpret diff 3e-6 f32; 0.03 bf16 rounding) but 0.98x
its speed (0.586 vs 0.576 ms for a 2-block chain at (32, 56, 56, 64),
both ~50 TF/s) — the in-kernel im2col materialization (9 shifted copies
per conv) costs what XLA's inter-conv HBM boundaries cost. Kept here as
the negative-result artifact; NOT part of the serving path.

Implementation notes that took real debugging, preserved for the next
attempt:
 - Mosaic cannot slice a 64-lane array along its minor dim (min tile
   128), so row-tiled manual halo DMA is inexpressible at C=64; the
   kernel therefore holds the whole padded image per grid step (~0.4 MB).
 - conv2 consumes prelu(conv1(...)) ZERO-padded at the image border: the
   u rows at virtual positions outside the image must be masked to zero,
   not fed through as evaluated activations.
 - bn1 likewise applies only to valid rows; the halo must stay zero.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facekit.models.layers import BN_EPS


def _shift_patches(src, rows_out: int, w: int, c: int):
    cols = []
    for dy in range(3):
        sl = src[dy:dy + rows_out]
        for dx in range(3):
            if dx == 0:
                sh = jnp.pad(sl[:, :w - 1], ((0, 0), (1, 0), (0, 0)))
            elif dx == 1:
                sh = sl
            else:
                sh = jnp.pad(sl[:, 1:], ((0, 0), (0, 1), (0, 0)))
            cols.append(sh.reshape(rows_out * w, c))
    return jnp.concatenate(cols, axis=1)


def _ir_block_kernel(x_ref, w1_ref, w2_ref, p_ref, out_ref, *,
                     h: int, w: int, c: int):
    xr = x_ref[0]
    s1, b1, alpha, s2, b2 = (p_ref[0], p_ref[1], p_ref[2], p_ref[3],
                             p_ref[4])
    row = jax.lax.broadcasted_iota(jnp.int32, (h + 4, 1, 1), 0)
    rmask = (row >= 2) & (row < 2 + h)
    t = jnp.where(rmask, xr.astype(jnp.float32) * s1 + b1,
                  0.0).astype(xr.dtype)
    p1 = _shift_patches(t, h + 2, w, c)
    m1 = jax.lax.dot_general(p1, w1_ref[:],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    u = jnp.where(m1 > 0, m1, m1 * alpha).astype(xr.dtype)
    u = u.reshape(h + 2, w, c)
    urow = jax.lax.broadcasted_iota(jnp.int32, (h + 2, 1, 1), 0) + 1
    u = jnp.where((urow >= 2) & (urow < 2 + h), u, 0)
    p2 = _shift_patches(u, h, w, c)
    m2 = jax.lax.dot_general(p2, w2_ref[:],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    r = m2 * s2 + b2
    res = xr[2:2 + h].reshape(h * w, c).astype(jnp.float32)
    out_ref[0] = (r + res).astype(out_ref.dtype).reshape(h, w, c)


def _affine(bn: Dict[str, jnp.ndarray]):
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + BN_EPS)
    scale = bn["scale"].astype(jnp.float32) * inv
    shift = (bn["bias"].astype(jnp.float32)
             - bn["mean"].astype(jnp.float32) * scale)
    return scale, shift


@functools.partial(jax.jit, static_argnames=("interpret",))
def ir_block_fused(x, p: Dict, interpret: bool = False):
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    w1 = p["conv1"].reshape(9 * c, c).astype(x.dtype)
    w2 = p["conv2"].reshape(9 * c, c).astype(x.dtype)
    s1, b1 = _affine(p["bn1"])
    s2, b2 = _affine(p["bn2"])
    par = jnp.zeros((8, c), jnp.float32)
    par = par.at[0].set(s1).at[1].set(b1)
    par = par.at[2].set(p["prelu"].astype(jnp.float32))
    par = par.at[3].set(s2).at[4].set(b2)
    kernel = functools.partial(_ir_block_kernel, h=h, w=w, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 4, w, c), lambda ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ni: (ni, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w1, w2, par)
