"""Crossing-matrix depth: masked depth + uniq as one MXU pass.

The run-level index (device.py) densified over (path, segment) is a
matrix ``A[p, n] = number of steps of segment n on path p`` — the
graph's crossing histogram. With it, the masked depth query is linear
algebra, not data movement:

    depth = mask @ A          (bp crossings per segment)
    uniq  = mask @ (A > 0)    (distinct selected paths per segment)

No gathers, no scatters, no scan: one streamed read of A feeding the
MXU, with outputs landing directly at segment granularity (the
boundary-diff stage of the scan pipeline — XLA's slow TPU gather —
disappears entirely). Batched queries become a real matmul,
``masks @ A``, amortizing the single read of A across Q masks.

Exactness: A is stored bf16 with counts clipped at 256 (integers
0..256 are exact in bf16); the rare (path, segment) pairs crossing
more than 256 times carry their remainder in an int32 COO fixup
applied after the matmul. Products are 0/1 x count and accumulation
is f32 (exact below 2^24 = 16M crossings per segment).

Reference semantics: flatgfa/src/ops/depth.rs:15-39. The dense form
trades HBM capacity (2 bytes per (path, segment) cell) for a
gather-free query; device.py builds it only under a size budget.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

LANES = 128
# Segments per grid step (lane-dim tile of A). Tuned on v5e: 512 ->
# 330 GB/s, 2048 -> 674, 4096 -> 717 (87% of the 819 GB/s HBM peak);
# larger tiles plateau.
SEG_BLOCK = 4096
CLIP = 256  # largest count stored in bf16 exactly


def _kernel(mask_ref, a_ref, depth_ref, uniq_ref):
    a = a_ref[:]  # (P_pad, SEG_BLOCK) bf16
    m = mask_ref[:]  # (8, P_pad) bf16; row 0 is the mask
    depth = jax.lax.dot_general(
        m,
        a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Indicator without a comparison: counts are integers >= 0, so
    # min(a, 1) is exact — and Mosaic (this build) rejects bf16
    # compares outright.
    ind = jnp.minimum(a, jnp.bfloat16(1))
    uniq = jax.lax.dot_general(
        m,
        ind,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Only lane-row 0 of the (8, SEG_BLOCK) dot carries the mask's
    # result; writing just that row saves 7/8ths of the output traffic.
    depth_ref[:] = depth[:1, :].astype(jnp.int32)
    uniq_ref[:] = uniq[:1, :].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_cross_depth(
    cross: jax.Array,  # bf16[P_pad, N_pad], N_pad % SEG_BLOCK == 0
    mask: jax.Array,  # int32/bool[P_pad] (0/1)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[N_pad] — single fused pass over ``cross``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_pad, n_pad = cross.shape
    assert n_pad % SEG_BLOCK == 0 and p_pad % 8 == 0
    m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
        mask.astype(jnp.bfloat16)
    )

    a_block = pl.BlockSpec(
        (p_pad, SEG_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (1, SEG_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    # Trace with x64 off: int64 grid literals break Mosaic lowering.
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            _kernel,
            grid=(n_pad // SEG_BLOCK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), a_block],
            out_specs=(o_block, o_block),
            out_shape=(
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ),
            interpret=interpret,
        )(m, cross)
    return depth[0], uniq[0]


@jax.jit
def masked_cross_depth_xla(
    cross: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Portable two-dot fallback (CPU, or shapes the kernel rejects)."""
    m = mask.astype(jnp.float32)
    a = cross.astype(jnp.float32)
    depth = jnp.dot(m, a, preferred_element_type=jnp.float32)
    uniq = jnp.dot(
        m, (a > 0).astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return depth.astype(jnp.int32), uniq.astype(jnp.int32)


@jax.jit
def batched_cross_depth(
    cross: jax.Array, masks: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[Q, N_pad] for Q masks at once: two MXU
    matmuls reading A once each — the serving shape (one resident
    graph, a stream of subset queries)."""
    m = masks.astype(jnp.bfloat16)
    depth = jnp.dot(m, cross, preferred_element_type=jnp.float32)
    ind = (cross > 0).astype(jnp.bfloat16)
    uniq = jnp.dot(m, ind, preferred_element_type=jnp.float32)
    return depth.astype(jnp.int32), uniq.astype(jnp.int32)
