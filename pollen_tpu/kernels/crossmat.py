"""Crossing-matrix depth: masked depth + uniq as one MXU pass.

The run-level index (device.py) densified over (path, segment) is a
matrix ``A[p, n] = number of steps of segment n on path p`` — the
graph's crossing histogram. With it, the masked depth query is linear
algebra, not data movement:

    depth = mask @ A          (crossings per segment)
    uniq  = mask @ min(A, 1)  (distinct selected paths per segment)

No gathers, no scatters, no scan: one streamed read of A feeding the
MXU, with outputs landing directly at segment granularity (the
boundary-diff stage of the scan pipeline — XLA's slow TPU gather —
disappears entirely). Batched queries become a real matmul,
``masks @ A``, amortizing the single read of A across Q masks.

Exactness: A is stored **int8** — 1 byte per cell of HBM traffic —
with counts clipped at 127; the rare (path, segment) pairs crossing
more often carry their remainder in an int32 COO fixup applied after
the matmul. Mosaic (this build) cannot lower int8 dots, so the kernel
upcasts each VMEM tile to bf16 (integers <= 127 are exact) and
accumulates in f32 (exact below 2^24 crossings per segment); HBM only
ever sees the int8 bytes. Measured on v5e: 53 us for a 128 x 2^18
matrix (627 GB/s of int8 cells) vs 94 us stored bf16.

Reference semantics: flatgfa/src/ops/depth.rs:15-39. The dense form
trades HBM capacity (1 byte per (path, segment) cell) for a
gather-free query; device.py builds it only under a size budget.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

LANES = 128
# Widest lane-dim tile of A per grid step; narrowed when the path
# dimension is large so a tile stays within the VMEM budget. Tuned on
# v5e (int8, P=128): 4096 -> 62 us, 8192 -> 53 us per query.
SEG_BLOCK = 8192
# Elements per VMEM tile cap (int8 bytes): p_pad * tile <= this.
_TILE_ELEMS = 8 * 2**20
CLIP = 127  # largest count stored in int8


def pick_seg_block(p_pad: int, n_pad: int) -> int:
    """Largest tile width (power-of-two divisor of SEG_BLOCK) whose
    (p_pad, width) int8 tile fits the VMEM budget."""
    width = SEG_BLOCK
    while width > LANES and (p_pad * width > _TILE_ELEMS or n_pad % width):
        width //= 2
    return width


def _kernel(mask_ref, a_ref, depth_ref, uniq_ref):
    # Upcast the int8 tile to bf16 in VMEM (Mosaic rejects int8 dots);
    # integers <= 127 are exact in bf16.
    a = a_ref[:].astype(jnp.bfloat16)  # (P_pad, width)
    m = mask_ref[:]  # (8, P_pad) bf16; row 0 = mask
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
    # Only lane-row 0 of the dot carries the mask's result; writing
    # just that row saves 7/8ths of the output traffic.
    depth_ref[:] = depth[:1, :].astype(jnp.int32)
    uniq_ref[:] = uniq[:1, :].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_cross_depth(
    cross: jax.Array,  # int8[P_pad, N_pad], N_pad % 128 == 0
    mask: jax.Array,  # int32/bool[P_pad] (0/1)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[N_pad] — single fused pass over ``cross``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_pad, n_pad = cross.shape
    width = pick_seg_block(p_pad, n_pad)
    assert n_pad % width == 0 and p_pad % 8 == 0
    # The mask stays bf16: an (8, P) int8 block breaks the sublane
    # tiling (int8 wants 32 sublanes) and reads garbage on hardware.
    m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
        mask.astype(jnp.bfloat16)
    )

    a_block = pl.BlockSpec(
        (p_pad, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (1, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    # Trace with x64 off: int64 grid literals break Mosaic lowering.
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            _kernel,
            grid=(n_pad // width,),
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
        m, jnp.minimum(a, 1.0), preferred_element_type=jnp.float32
    )
    return depth.astype(jnp.int32), uniq.astype(jnp.int32)


@jax.jit
def batched_cross_depth(
    cross: jax.Array, masks: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[Q, N_pad] for Q masks at once: two MXU
    matmuls reading A once each — the serving shape (one resident
    graph, a stream of subset queries).

    Portable XLA form; note XLA materializes a full bf16 copy of the
    int8 matrix, so on TPU prefer ``batched_cross_depth_pallas``,
    which upcasts tile-by-tile in VMEM and keeps HBM traffic at
    1 byte/cell."""
    m = masks.astype(jnp.bfloat16)
    a = cross.astype(jnp.bfloat16)
    depth = jnp.dot(m, a, preferred_element_type=jnp.float32)
    uniq = jnp.dot(
        m, jnp.minimum(a, jnp.bfloat16(1)), preferred_element_type=jnp.float32
    )
    return depth.astype(jnp.int32), uniq.astype(jnp.int32)


def pick_batched_width(q_pad: int, p_pad: int, n_pad: int) -> int:
    """Widest power-of-two tile (divisor of N_pad) whose per-step VMEM
    footprint — int8 A tile + its bf16 upcast (3 B/cell) plus the f32
    dot results and int32 outputs (16 B/cell over Q rows) — stays
    under a conservative budget."""
    width = SEG_BLOCK
    while width > LANES and (
        (3 * p_pad + 16 * q_pad) * width > 48 * 2**20 or n_pad % width
    ):
        width //= 2
    return width


def _batched_kernel(mask_ref, a_ref, depth_ref, uniq_ref):
    a = a_ref[:].astype(jnp.bfloat16)  # (P_pad, width)
    m = mask_ref[:]  # (Q_pad, P_pad) bf16
    depth = jax.lax.dot_general(
        m,
        a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ind = jnp.minimum(a, jnp.bfloat16(1))
    uniq = jax.lax.dot_general(
        m,
        ind,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    depth_ref[:] = depth.astype(jnp.int32)
    uniq_ref[:] = uniq.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_cross_depth_pallas(
    cross: jax.Array,  # int8[P_pad, N_pad], N_pad % 128 == 0
    masks: jax.Array,  # int32/bool[Q, P_pad]
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[Q, N_pad]: the Q-mask generalization of
    ``masked_cross_depth`` — one streamed int8 read of A feeds both
    dots for all Q queries."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_pad, n_pad = cross.shape
    q = masks.shape[0]
    q_pad = -(-max(q, 8) // 8) * 8
    width = pick_batched_width(q_pad, p_pad, n_pad)
    assert n_pad % width == 0 and p_pad % 8 == 0
    m = (
        jnp.zeros((q_pad, p_pad), jnp.bfloat16)
        .at[:q]
        .set(masks.astype(jnp.bfloat16))
    )

    a_block = pl.BlockSpec(
        (p_pad, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (q_pad, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            _batched_kernel,
            grid=(n_pad // width,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), a_block],
            out_specs=(o_block, o_block),
            out_shape=(
                jax.ShapeDtypeStruct((q_pad, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((q_pad, n_pad), jnp.int32),
            ),
            interpret=interpret,
        )(m, cross)
    return depth[:q], uniq[:q]
