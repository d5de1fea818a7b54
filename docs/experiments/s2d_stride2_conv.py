"""ARCHIVED negative result (r3, 2026-08-17): space-to-depth stride-2 s8 conv.

Motivation: the r3 batch-64 hlo profile showed the conv-pair fusions
containing the stride-2 convs at C<=128 (b0.conv2, b3.conv2) running at
90-112 TOPS vs 250 for identically-shaped stride-1 s8 fusions — and the
same convs in bf16 measured just as slow (bf16-skip experiment: 19.696 ->
19.64 ms, noise), so the pathology is the strided window extraction, not
the dtype.

This reformulation packs 2x2 input cells into channels and convolves
stride-1 with a (2, 2, 4C, O) kernel (7/16 structural zeros). It is
INTEGER-EXACT vs the direct conv (verified on (112,112,64,64),
(56,56,128,128), (16,16,3,5)) — but measured IN THE FULL batch-64
calibrated-int8 pipeline it REGRESSED 19.167 -> 20.988 ms: the packing
transpose materialized as a 0.90 ms relayout (it did not fuse into the
producer fusion's output write), the conv row grew +0.64 ms, and a new
0.32 ms gather appeared. Eighth data point for "profile the real fused
pipeline": XLA's conv-pair fusions (conv + requant + double-dtype output)
are load-bearing, and any reformulation that breaks them pays more in
relayout than it wins in MXU rate.

Kept importable for reference; not in the package import graph.
"""

import jax
import jax.numpy as jnp


def _conv_s8_s2_space_to_depth(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 s8 conv as a stride-1 2x2 conv on 2x2-packed input.

    XLA's s8 stride-2 lowering at C <= 128 runs at ~1/3 of its own
    stride-1 rate, and the same convs in bf16 are just as slow (both
    measured, r3 hlo profile; docs/ROADMAP.md) — the pathology is the
    strided window extraction at small channel counts, not the dtype.
    Space-to-depth moves the stride into the layout: pack each 2x2 input
    cell into channels (C -> 4C) and convolve stride-1 with a (2, 2, 4C, O)
    kernel holding the 3x3 taps at their packed positions (7/16 slots are
    structural zeros — 1.78x the MACs, at the ~2.8x faster stride-1 rate).
    Integer-exact: same taps, same s32 accumulation order class.

    Derivation: out[i, j] reads input rows 2i-1..2i+1; in packed cells
    that is rows {i-1, i} with in-cell parity py, ky = 2a + py - 1 for
    cell offset a in {0, 1} (pad (1, 0) supplies the i-1 edge), and the
    same along the width axis.
    """
    n, h, w, c = xq.shape
    xp = xq.reshape(n, h // 2, 2, w // 2, 2, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
    o = wq.shape[-1]
    wp = jnp.zeros((2, 2, 2, 2, c, o), wq.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    ky, kx = 2 * a + py - 1, 2 * b + px - 1
                    if 0 <= ky < 3 and 0 <= kx < 3:
                        wp = wp.at[a, b, py, px].set(wq[ky, kx])
    wp = wp.reshape(2, 2, 4 * c, o)
    return jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)

