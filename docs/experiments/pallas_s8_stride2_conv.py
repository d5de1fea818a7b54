"""ARCHIVED measured-negative Pallas s8 kernel probe (r3, 2026-08-17).

The VERDICT r2 item-3 ask: attempt a Pallas s8 im2col-matmul kernel for
the lane-starved stage-1/2 conv shapes, measure, and record either way.
Target: the stride-2 3x3 s8 conv at C=64 (b0.conv2's shape, the worst
fusion in the batch-64 int8 profile).

Design: Mosaic cannot express strided spatial loads or <128-lane
minor-dim slices at C=64, so the kernel reshapes column pairs into lanes
OUTSIDE the kernel ((N,112,112,64) -> (N,56,2,56,128), free in XLA),
reads row parities by static ref indexing, builds the 9-tap patch tensor
with zero-concats on major/sublane axes only, and contracts with
ZERO-PADDED selector weights (K = 768 lanes, 576 useful) in one s8 dot
per image.

MEASURED on one v5e chip, n=256 images, unique inputs per call
(device-side xplane time):

    XLA s8 stride-2 conv:   0.857 ms  (69 TOPS)
    this kernel (bit-exact): 2.621 ms  (23 TOPS)   -> 0.33x XLA

The patch-tensor build (3x the input bytes in VMEM concat/copy work)
dominates; the dot itself is minor. Together with the two in-pipeline
XLA restructurings (bf16-skip: flat; space-to-depth: -1.8 ms regression,
s2d_stride2_conv.py) and r2's bf16 fused-block kernel (0.98x), this
closes the int8-conv headroom question on every axis: the stride-2
small-C loss is in XLA's/the hardware's strided window handling, and no
reformulation expressible in Pallas or XLA graph surgery beats the
fusion XLA already picks. See docs/ROADMAP.md "Round 3".

Kept importable for reference; not in the package import graph.
"""

import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 112
C = 64
OH = OW = 56


def _kernel(x_ref, w_ref, o_ref):
    # x_ref block: (1, 56, 2, 56, 2C) — the (row-pair, parity, col-pair,
    # lanes) view, reshaped OUTSIDE the kernel (free in XLA); static ref
    # indexing on the parity dim avoids the unsupported vector shape cast
    ve = x_ref[0, :, 0]                           # even rows (56, 56, 128)
    vo = x_ref[0, :, 1]                           # odd rows
    zrow = jnp.zeros((1, W // 2, 2 * C), jnp.int8)
    rows = [
        jnp.concatenate([zrow, vo[:-1]], 0),      # ky=0: row 2i-1
        ve,                                       # ky=1: row 2i
        vo,                                       # ky=2: row 2i+1
    ]
    zcol = jnp.zeros((OH, 1, 2 * C), jnp.int8)
    blocks = []
    for r in rows:
        left = jnp.concatenate([zcol, r[:, :-1]], 1)   # pair j-1
        blocks.append(jnp.concatenate([left, r], 2))   # (56, 56, 4C)
    p = jnp.concatenate(blocks, 2)                # (56, 56, 12C=768)
    acc = jax.lax.dot_general(
        p.reshape(OH * OW, 12 * C), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[0] = acc.reshape(OH, OW, C)


def pack_weights(wq):
    """(3, 3, C, O) s8 -> (12C, O) with zero selector rows.

    Lane layout per ky block of 4C: [0:C] col 2j-2 (unused, zero),
    [C:2C] col 2j-1 (kx=0), [2C:3C] col 2j (kx=1), [3C:4C] col 2j+1
    (kx=2)."""
    o = wq.shape[-1]
    wp = np.zeros((3, 4, C, o), np.int8)
    for ky in range(3):
        for kx in range(3):
            wp[ky, kx + 1] = np.asarray(wq[ky, kx])
    return jnp.asarray(wp.reshape(12 * C, o))


@jax.jit
def conv_s8_s2_pallas(x, wp):
    n = x.shape[0]
    x = x.reshape(n, H // 2, 2, W // 2, 2 * C)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, OH, OW, C), jnp.int32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, H // 2, 2, W // 2, 2 * C),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12 * C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OH, OW, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wp)


@jax.jit
def conv_s8_s2_xla(x, wq):
    return jax.lax.conv_general_dilated(
        x, wq, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    interpret = "--interpret" in sys.argv
    rng = np.random.default_rng(0)
    n = 4 if interpret else 256
    x = jnp.asarray(rng.integers(-127, 128, (n, H, W, C)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)
    wp = pack_weights(wq)

    if interpret:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        got = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((n, OH, OW, C), jnp.int32),
            grid=(n,),
            in_specs=[pl.BlockSpec((1, H // 2, 2, W // 2, 2 * C),
                                   lambda i: (i, 0, 0, 0, 0)),
                      pl.BlockSpec((12 * C, C), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, OH, OW, C), lambda i: (i, 0, 0, 0)),
            interpret=True)(x.reshape(n, H // 2, 2, W // 2, 2 * C), wp)
        ref = conv_s8_s2_xla(x, wq)
        exact = bool((np.asarray(got) == np.asarray(ref)).all())
        print("interpret exact:", exact)
        assert exact
        return

    # TPU timing: unique inputs per call (tunnel caches identical runs)
    ref = conv_s8_s2_xla(x, wq)
    got = conv_s8_s2_pallas(x, wp)
    exact = bool((np.asarray(got) == np.asarray(ref)).all())
    print("tpu exact:", exact)

    sys.path.insert(0, "/root/repo")
    from bench import device_time_per_call
    xs = [jnp.asarray(rng.integers(-127, 128, (n, H, W, C)), jnp.int8)
          for _ in range(5)]
    jax.block_until_ready(conv_s8_s2_xla(xs[0], wq))
    t_xla = device_time_per_call(lambda j: conv_s8_s2_xla(xs[j], wq), 5)
    jax.block_until_ready(conv_s8_s2_pallas(xs[0], wp))
    t_pal = device_time_per_call(lambda j: conv_s8_s2_pallas(xs[j], wp), 5)
    gflop = 2 * n * OH * OW * C * 9 * C / 1e9
    print(f"XLA s8 stride-2 conv: {t_xla*1e3:.3f} ms "
          f"({gflop/t_xla/1e3:.0f} TOPS)")
    print(f"Pallas lane-packed:   {t_pal*1e3:.3f} ms "
          f"({gflop/t_pal/1e3:.0f} TOPS)")
    print(f"ratio (xla/pallas): {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
