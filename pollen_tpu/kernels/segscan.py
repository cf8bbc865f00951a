"""Fused masked segment-scan: the depth query's hot loop as one Pallas
pass.

Computes, in a single sequential sweep over the (segment, path)-sorted
step list, the two inclusive cumulative sums the depth query needs:

* ``csum_w``     — running count of mask-selected steps, and
* ``csum_first`` — running count of *first* mask-selected steps per
  (segment, path) group (for distinct-path depth).

Design notes (why this shape):

* The mask lookup ``w = mask[path_id]`` is a gather XLA lowers poorly on
  TPU. For graphs up to ``32 * MAX_SELECT_WORDS`` paths it becomes
  bitwise word selection — the mask packed into P/32 int32 SMEM words,
  each step extracting its path's bit with a log-depth select chain
  plus one variable shift (the ellscan trick; a handful of VPU ops per
  step). Larger path counts fall back to a one-hot x mask matvec on the
  MXU (~P MACs per step — the MACs are free, but *building* the 3-D
  one-hot costs ~2 VPU ops per step per 128 paths, which measured ~10x
  the bit select's cumsum-stage cost at P=128: 9.7 ms per 2^22 steps
  for the one-hot kernel vs ~1 ms with the bit select — the r3 scanb
  probe's 2.1 ms/query is the bit-select kernel plus its planned
  boundary stage; probes/RESULTS.txt).
* "First selected step in my group" normally needs a segmented scan with
  a gather at each group start. Because groups are contiguous and the
  cumsum is non-decreasing, the gather is replaced by a *prefix max*:
  at each group-start position we expose the exclusive cumsum, elsewhere
  -1; a running max then carries "cumsum at my group's start" to every
  position. within = csum - prefix_max; first = (w > 0) & (within == 1).
* Cross-block state (total count, open group's selected count) lives in
  SMEM scratch; TPU grid steps run sequentially on a core, so the
  scratch acts as the loop carry of a decoupled-lookback scan.

HBM traffic: read 8 B/step (path ids + group starts), write 8 B/step
(the two cumsums) — 16 B/step, vs ~40+ for the unfused XLA pipeline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

LANES = 128
ROWS = 128  # steps per block = ROWS * LANES (tuned on v5e; see BLOCK)
BLOCK = ROWS * LANES
# Bit-select mask mode is used up to this many packed mask words; the
# select chain unrolls n_words-1 full-block selects, so past this the
# Mosaic compile (and the VPU work) outgrows the one-hot matvec.
MAX_SELECT_WORDS = 64


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def _tri_cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis 1 (lanes) via a triangular matmul on
    the MXU (Mosaic has no cumsum primitive; values stay < 2**24 so f32
    accumulation is exact)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = (k <= j).astype(jnp.float32)
    return jnp.dot(
        x.astype(jnp.float32), tri, preferred_element_type=jnp.float32
    )


def _tri_cumsum_rows(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis 0 (sublanes) via triangular matmul."""
    rows = x.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tri = (r <= i).astype(jnp.float32)
    return jnp.dot(
        tri, x.astype(jnp.float32), preferred_element_type=jnp.float32
    )


def _flat_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive cumsum of a (R, 128) int block in row-major order."""
    rows = _tri_cumsum_lanes(x)
    tot = rows[:, LANES - 1 :]
    prefix = _tri_cumsum_rows(tot) - tot
    return (rows + prefix).astype(jnp.int32)


def _shift(x: jax.Array, d: int, axis: int) -> jax.Array:
    """Shift ``x`` by ``d`` along ``axis``, filling with -1 (the cummax
    identity here: every scanned value is >= 0). concat+slice because
    this Mosaic build rejects ``pltpu.roll`` on int blocks."""
    if axis == 1:
        pad = jnp.full((x.shape[0], d), -1, x.dtype)
        return jnp.concatenate([pad, x[:, :-d]], axis=1)
    pad = jnp.full((d, x.shape[1]), -1, x.dtype)
    return jnp.concatenate([pad, x[:-d, :]], axis=0)


def _cummax_axis(x: jax.Array, axis: int) -> jax.Array:
    """Inclusive running max along an axis via log-step shifts."""
    size = x.shape[axis]
    d = 1
    while d < size:
        x = jnp.maximum(x, _shift(x, d, axis))
        d *= 2
    return x


def _flat_cummax(x: jax.Array) -> jax.Array:
    """Inclusive cummax of a (R, 128) int block in row-major order.
    All values must be >= -1."""
    rows = _cummax_axis(x, 1)
    # Broadcast the per-row totals to full lane width before the row
    # scan: Mosaic rejects concats on (R, 1)-narrow vectors.
    tot = jnp.broadcast_to(rows[:, LANES - 1 :], x.shape)
    prefix = _shift(_cummax_axis(tot, 0), 1, 0)  # exclusive over rows
    return jnp.maximum(rows, prefix)


def _kernel(
    hc_ref, ids_ref, rs_ref, mask_ref, csw_ref, csf_ref, carry, *, n_words
):
    from jax.experimental import pallas as pl

    block = pl.program_id(0)
    block_start = block * jnp.int32(ROWS * LANES)

    @pl.when(block == 0)
    def _init():
        carry[0] = jnp.int32(0)  # total selected steps so far
        # Selected steps in the open group: nonzero when the caller is
        # a shard whose leading group began on a device to its left
        # (sharded_seg_depth_fused_fn's decoupled lookback carry).
        carry[1] = hc_ref[0]
        carry[2] = jnp.int32(0)  # total first-flags so far

    carry_w = carry[0]
    carry_masked = carry[1]
    carry_f = carry[2]

    ids = ids_ref[:]  # (ROWS, LANES) int32 path ids
    rs = rs_ref[:]  # (ROWS, LANES) int32 global group starts

    if n_words is not None:
        # w = mask[ids] by bit extraction from packed SMEM mask words
        # (log-depth tournament select + one variable shift; see
        # kernels/ellscan.py for the pattern).
        from .ellscan import _select_word

        words = [mask_ref[j] for j in range(n_words)]
        w32 = _select_word(ids >> 5, words)
        w = (w32 >> (ids & 31)) & 1
    else:
        # w = mask[ids] via one-hot matmul against the mask table (rows
        # of 128 paths at a time) — the wide-P fallback: MACs ride the
        # MXU, and the 3-D one-hot build is amortized over many paths.
        # The one-hot is built over 64-row slices to bound its VMEM
        # footprint at the (64, 128, 128) f32 = 4 MB the kernel was
        # proven at before ROWS doubled to 128.
        n_chunks = mask_ref.shape[0]
        rc = min(ROWS, 64)
        w_slices = []
        for r0 in range(0, ROWS, rc):
            ids_r = ids[r0 : r0 + rc]
            w_r = jnp.zeros((rc, LANES), jnp.int32)
            for c in range(n_chunks):
                chunk = mask_ref[c, :]  # float32 row of 128 mask entries
                onehot = (
                    ids_r[:, :, None]
                    == (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (1, 1, LANES), 2
                        )
                        + c * LANES
                    )
                ).astype(jnp.float32)
                part = jax.lax.dot_general(
                    onehot,
                    chunk,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # Accumulate in int32: Mosaic only supports constant
                # matmul accumulators, so keep the adds off the MXU.
                w_r = w_r + part.astype(jnp.int32)
            w_slices.append(w_r)
        w = (
            jnp.concatenate(w_slices, axis=0)
            if len(w_slices) > 1
            else w_slices[0]
        )

    # Global inclusive cumsum of w.
    cs_local = _flat_cumsum(w)
    cs_g = cs_local + carry_w

    # Position index and group-start detection.
    pos = (
        block_start
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    )
    is_start = rs == pos

    # Prefix-max trick: expose the exclusive cumsum at group starts.
    neg = jnp.int32(-1)
    y = jnp.where(is_start, cs_g - w, neg)
    # Carry-in: the open group's start had exclusive cumsum
    # carry_w - carry_masked. Splice it in at position 0.
    init = jnp.where(
        jnp.logical_and(pos == block_start, ~is_start),
        carry_w - carry_masked,
        neg,
    )
    y = jnp.maximum(y, init)
    base = _flat_cummax(y)

    within = cs_g - base
    first = jnp.where(
        (w > 0) & (within == 1), jnp.int32(1), jnp.int32(0)
    )
    csf_local = _flat_cumsum(first)

    csw_ref[:] = cs_g
    csf_ref[:] = csf_local + carry_f

    carry[0] = cs_g[ROWS - 1, LANES - 1]
    carry[1] = within[ROWS - 1, LANES - 1]
    carry[2] = carry_f + csf_local[ROWS - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_depth_cumsums(
    path_sorted: jax.Array,  # int32[S_pad], S_pad % (ROWS*LANES) == 0
    run_start: jax.Array,  # int32[S_pad] group-start positions
    mask: jax.Array,  # int32[P_pad], P_pad % 128 == 0, 0/1 entries
    interpret: bool = False,
    head_carry: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """(csum_w, csum_first), both inclusive int32[S_pad].

    ``head_carry`` (scalar int32, default 0) is the number of selected
    steps of position 0's group that live BEFORE this array — sharded
    callers pass their cross-chunk lookback carry so a straddling
    group's first-selected flag fires on exactly one device. With a
    nonzero carry, ``run_start`` must be local positions (entries of
    left-started groups negative, never matching any position)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = path_sorted.shape[0]
    t = ROWS * LANES
    assert s % t == 0, f"pad the step list to a multiple of {BLOCK}"
    assert mask.shape[0] % LANES == 0, "pad the mask to a multiple of 128"
    shape2d = (s // LANES, LANES)

    n_words = mask.shape[0] // 32
    if n_words <= MAX_SELECT_WORDS:
        from .ellscan import pack_mask_words

        mask_arg = pack_mask_words(mask, n_words)
        mask_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        n_words = None
        mask_arg = mask.astype(jnp.float32).reshape(-1, LANES)
        mask_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    block = pl.BlockSpec(
        (ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # Trace the kernel with x64 disabled: under jax_enable_x64 the grid
    # indices and index-map literals become int64, which Mosaic cannot
    # lower. Every dtype in the kernel is explicit, so semantics are
    # unchanged.
    with jax.enable_x64(False):
        hc = (
            jnp.zeros(1, jnp.int32)
            if head_carry is None
            else jnp.reshape(head_carry, (1,)).astype(jnp.int32)
        )
        csw, csf = pl.pallas_call(
            functools.partial(_kernel, n_words=n_words),
            grid=(s // t,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                block,
                block,
                mask_spec,
            ],
            out_specs=(block, block),
            out_shape=(
                jax.ShapeDtypeStruct(shape2d, jnp.int32),
                jax.ShapeDtypeStruct(shape2d, jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
            interpret=interpret,
        )(
            hc,
            path_sorted.reshape(shape2d),
            run_start.reshape(shape2d),
            mask_arg,
        )
    return csw.reshape(s), csf.reshape(s)


def depth_uniq_from_cumsums(
    csw: jax.Array, csf: jax.Array, seg_bounds: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Boundary-difference stage: per-segment (depth, uniq)."""
    from ..device import boundary_diff

    return boundary_diff(csw, seg_bounds), boundary_diff(csf, seg_bounds)
