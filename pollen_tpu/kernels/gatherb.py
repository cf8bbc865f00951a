"""Boundary gather: ``csum[bounds]`` as windowed one-hot MXU matmuls.

The scan family's last stage — boundary differences over per-segment
cumsums — is a 1-D gather of N+1 sorted positions, and XLA's TPU
gather runs it at ~94 M elem/s (the 50x cliff documented in
docs/benchmarks.md). This kernel exploits two facts the generic gather
cannot: the bounds are SORTED, and they are known at ingest.

Plan (host, once per graph): split the bounds into tiles of 128; each
tile's values live in a contiguous window of the cumsum array whose
start row is precomputed (``row_start``), along with each bound's
offset inside its window (``loc``). Tiles whose span overflows the
fixed window width (rare: segments with huge depth ranges) fall back
to the XLA gather for just their rows.

Kernel (per tile): DMA the (W_ROWS, 128) cumsum window into VMEM —
the window start is a *scalar-prefetch* block index, so the DMA is a
plain blocked load — then extract the tile's 128 values with two
one-hot contractions on the MXU:

    tmp[a, :] = sum_r onehot(row[a] == r) * win[r, :]   (row select)
    out[a]    = sum_c tmp[a, c] * onehot(col[a] == c)   (lane select)

All f32 (exact for values < 2^24 — cumsums of 0/1 step weights are
bounded by the step count; callers gate larger graphs to the XLA
path). Streams ~W_ROWS*512 B per 128 bounds instead of issuing 128
serial gathers.

Reference analogue: the depth loop's per-segment counter reads
(flatgfa/src/ops/depth.rs:25-36), restructured for a machine with no
fast random access.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
# Default window: rows of 128 elements DMA'd per tile. 32 rows = 4096
# elements covers a 128-bound tile up to an average segment depth of
# 32; the plan widens (power of two) until >= 99% of tiles fit.
MIN_WINDOW_ROWS = 8
MAX_WINDOW_ROWS = 512


@dataclasses.dataclass
class BoundaryPlan:
    """Ingest-time plan for gathering ``csum[bounds]``.

    ``over_tiles`` is a plain tuple (STATIC under jit): the overflow
    fixup unrolls into per-tile dynamic_update_slices — XLA's TPU
    scatter emitter aborts (jellyfish SortedScatterEmitter check
    failure) on a scatter-set fed by a gather, so no scatter op may
    appear here at all."""

    row_start: np.ndarray  # int32[n_tiles] window BLOCK index per tile
    loc: np.ndarray  # int32[n_tiles, 128] offset within window
    over_tiles: tuple  # tile indices that overflow the window (static)
    over_bounds: np.ndarray  # int32[T', 128] their raw bound positions
    w_rows: int  # window rows (static)
    n_bounds: int  # true bounds count (result length)
    s_rows: int  # cumsum rows (csum length / 128)


def plan_boundary(bounds: np.ndarray, s_pad: int) -> BoundaryPlan:
    """Build the gather plan for a sorted bounds array against cumsum
    arrays of (padded) length ``s_pad`` (a multiple of 128).

    Windows are BLOCK-ALIGNED (Pallas block index maps count in block
    units): each tile reads cumsum blocks ``b`` and ``b + 1`` of
    ``w_rows`` rows each, so any tile whose bounds span at most one
    block boundary fits; wider tiles go to the XLA-fallback list."""
    assert s_pad % LANES == 0
    nb = int(bounds.shape[0])
    n_tiles = max(1, -(-nb // LANES))
    nb_pad = n_tiles * LANES
    b = np.concatenate(
        [
            bounds.astype(np.int64),
            np.full(nb_pad - nb, int(bounds[-1]) if nb else 0, np.int64),
        ]
    )
    tiles = b.reshape(n_tiles, LANES)
    first_row = tiles[:, 0] // LANES
    last_row = tiles[:, -1] // LANES
    span = last_row - first_row + 1

    # One extra row holds the exclusive-shift tail (a bound equal to
    # s_pad indexes exclusive_csum[s_pad], one past the padded data).
    s_rows = s_pad // LANES + 1
    w_rows = MIN_WINDOW_ROWS
    target = max(1, int(np.percentile(span, 90))) if nb else 1
    while w_rows < min(target, MAX_WINDOW_ROWS):
        w_rows *= 2
    w_rows = min(w_rows, MAX_WINDOW_ROWS)

    blk = (first_row // w_rows).astype(np.int32)
    over = np.flatnonzero(last_row // w_rows > blk + 1).astype(np.int32)
    over_bounds = tiles[over].astype(np.int32) if over.size else np.zeros(
        (0, LANES), np.int32
    )
    loc = tiles - blk[:, None].astype(np.int64) * (w_rows * LANES)
    # Clamp overflow tiles' in-window offsets so the kernel stays in
    # bounds (their outputs are replaced by the XLA fallback).
    loc = np.clip(loc, 0, 2 * w_rows * LANES - 1).astype(np.int32)
    return BoundaryPlan(
        row_start=blk,
        loc=loc,
        over_tiles=tuple(int(t) for t in over),
        over_bounds=over_bounds,
        w_rows=int(w_rows),
        n_bounds=nb,
        s_rows=s_rows,
    )


def _kernel(rs_ref, win_a_ref, win_b_ref, loc_ref, out_ref):
    loc = loc_ref[:]  # (1, 128) int32
    row = (loc // LANES).reshape(LANES, 1)
    col = (loc % LANES).reshape(LANES, 1)
    win = jnp.concatenate(
        [win_a_ref[:], win_b_ref[:]], axis=0
    ).astype(jnp.float32)  # (2 * w_rows, 128)
    w2 = win.shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (LANES, w2), 1)
    rowsel = (riota == row).astype(jnp.float32)
    tmp = jax.lax.dot_general(
        rowsel,
        win,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (128, 128): tmp[a, :] = win[row[a], :]
    ciota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    colsel = (ciota == col).astype(jnp.float32)
    out = jnp.sum(tmp * colsel, axis=1)
    out_ref[:] = out.reshape(1, LANES).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("w_rows", "interpret")
)
def _gather_tiles(
    csum2d: jax.Array,  # int32[rows_pad, 128], rows_pad % w_rows == 0
    row_start: jax.Array,  # int32[n_tiles] window BLOCK index per tile
    loc: jax.Array,  # int32[n_tiles, 128]
    w_rows: int,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = loc.shape[0]
    assert csum2d.shape[0] % w_rows == 0
    # Mosaic requires block sublane dims divisible by 8 OR equal to the
    # array's — so loc/out ride as (1, n_tiles*128) row vectors with
    # (1, 128) blocks (the crossmat output pattern), not (n_tiles, 128).
    loc_row = loc.reshape(1, n_tiles * LANES)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((w_rows, LANES), lambda i, rs: (rs[i], 0)),
            pl.BlockSpec((w_rows, LANES), lambda i, rs: (rs[i] + 1, 0)),
            pl.BlockSpec((1, LANES), lambda i, rs: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i, rs: (0, i)),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct(
                (1, n_tiles * LANES), jnp.int32
            ),
            interpret=interpret,
        )(row_start, csum2d, csum2d, loc_row)
    return out.reshape(n_tiles, LANES)


def gather_boundary(
    csum: jax.Array,  # int32[S_pad] inclusive cumsum (padded to 128)
    row_start: jax.Array,  # int32[n_tiles]
    loc: jax.Array,  # int32[n_tiles, 128]
    over_tiles: tuple,  # static tile indices (ingest-known)
    over_bounds: jax.Array,  # int32[T', 128]
    w_rows: int,
    n_bounds: int,
    interpret: bool = False,
) -> jax.Array:
    """``exclusive_csum[bounds]`` (i.e. csum shifted by one, bounds
    semantics matching device.boundary_values): int32[n_bounds].

    The plan's arrays are passed as device arrays so they upload once
    at ingest and flow through jit; ``w_rows``/``n_bounds``/
    ``over_tiles`` are the plan's static parameters.
    """
    # Exclusive shift: prepend 0; pad the tail so (a) a bound equal to
    # the padded length indexes one past the data and (b) the row count
    # is a whole number of windows PLUS one spare window (the kernel
    # always reads blocks rs and rs + 1).
    rows = csum.shape[0] // LANES + 1
    rows_pad = (-(-rows // w_rows) + 1) * w_rows
    ex = jnp.concatenate(
        [
            jnp.zeros(1, csum.dtype),
            csum,
            jnp.zeros(rows_pad * LANES - csum.shape[0] - 1, csum.dtype),
        ]
    )
    csum2d = ex.reshape(rows_pad, LANES)
    out = _gather_tiles(
        csum2d, row_start, loc, w_rows=w_rows, interpret=interpret
    )
    if over_tiles:
        # Overflow tiles: 2D-reshaped gather on just their bounds (the
        # form XLA's TPU backend lowers reliably), placed with UNROLLED
        # static-index row updates — scatter ops abort this libtpu's
        # fusion emitter when fed by a gather.
        fix = csum2d[over_bounds // LANES, over_bounds % LANES]
        for j, t in enumerate(over_tiles):
            out = jax.lax.dynamic_update_slice_in_dim(
                out, fix[j : j + 1], t, axis=0
            )
    return out.reshape(-1)[:n_bounds]


def boundary_diff_planned(
    csum: jax.Array,
    row_start: jax.Array,
    loc: jax.Array,
    over_tiles: tuple,
    over_bounds: jax.Array,
    w_rows: int,
    n_bounds: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-range sums for the planned (sorted, ingest-known) bounds."""
    v = gather_boundary(
        csum,
        row_start,
        loc,
        over_tiles,
        over_bounds,
        w_rows=w_rows,
        n_bounds=n_bounds,
        interpret=interpret,
    )
    return v[1:] - v[:-1]
