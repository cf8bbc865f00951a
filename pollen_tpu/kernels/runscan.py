"""Fused run-level masked depth: one Pallas pass over the run index.

The run index (one entry per distinct (segment, path) pair) already
collapsed duplicate crossings at ingest, so a masked depth query needs
only two cumulative sums over R <= S elements:

* ``csum_wc`` — running sum of ``mask[run_path] * run_count`` (depth),
* ``csum_w``  — running sum of ``mask[run_path]`` (distinct paths).

No first-occurrence logic, no prefix-max — just the mask lookup
(packed-word bit select for small path counts, one-hot MXU matvec for
wide ones: see kernels/segscan.py) and exact int32 shift-add cumsums,
with two scalars of SMEM carry. Pays off over segscan's S-level kernel
when the run index is much smaller than the step list (heavily
repeated crossings); the op layer picks per-graph.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .segscan import LANES

# Block height: the bit-select mask mode freed the VMEM the 3-D
# one-hot used to occupy (this was 32 rows then); taller blocks
# amortize the measured ~1.5 us fixed per-grid-step cost (the segscan
# ROWS=64 -> 128 A/B bought 15%).
ROWS = 128
BLOCK = ROWS * LANES


def _shift0(x: jax.Array, d: int, axis: int) -> jax.Array:
    """Shift by ``d`` along ``axis``, filling with 0 (cumsum identity)."""
    if axis == 1:
        pad = jnp.zeros((x.shape[0], d), x.dtype)
        return jnp.concatenate([pad, x[:, :-d]], axis=1)
    pad = jnp.zeros((d, x.shape[1]), x.dtype)
    return jnp.concatenate([pad, x[:-d, :]], axis=0)


def _int_cumsum_axis(x: jax.Array, axis: int) -> jax.Array:
    """Inclusive int32 cumsum via log-step shift-adds — exact for any
    int32 values (the segscan triangular matmul is f32-exact only below
    2**24, which weighted run counts can exceed)."""
    size = x.shape[axis]
    d = 1
    while d < size:
        x = x + _shift0(x, d, axis)
        d *= 2
    return x


def _flat_int_cumsum(x: jax.Array) -> jax.Array:
    """Exact inclusive int32 cumsum of a (R, 128) block, row-major."""
    rows = _int_cumsum_axis(x, 1)
    tot = jnp.broadcast_to(rows[:, LANES - 1 :], x.shape)
    prefix = _shift0(_int_cumsum_axis(tot, 0), 1, 0)
    return rows + prefix


def _kernel(ids_ref, counts_ref, mask_ref, cswc_ref, csw_ref, carry, *,
            n_words):
    from jax.experimental import pallas as pl

    block = pl.program_id(0)

    @pl.when(block == 0)
    def _init():
        carry[0] = jnp.int32(0)  # running weighted total
        carry[1] = jnp.int32(0)  # running mask total

    ids = ids_ref[:]
    counts = counts_ref[:]

    if n_words is not None:
        from .ellscan import _select_word

        words = [mask_ref[j] for j in range(n_words)]
        w32 = _select_word(ids >> 5, words)
        w = (w32 >> (ids & 31)) & 1
    else:
        # Wide-P one-hot fallback, built over 32-row slices to bound
        # the 3-D one-hot's VMEM at the (32, 128, 128) f32 footprint
        # this kernel was proven at before ROWS grew to 128.
        n_chunks = mask_ref.shape[0]
        rc = min(ROWS, 32)
        w_slices = []
        for r0 in range(0, ROWS, rc):
            ids_r = ids[r0 : r0 + rc]
            w_r = jnp.zeros((rc, LANES), jnp.int32)
            for c in range(n_chunks):
                chunk = mask_ref[c, :]
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
                w_r = w_r + part.astype(jnp.int32)
            w_slices.append(w_r)
        w = (
            jnp.concatenate(w_slices, axis=0)
            if len(w_slices) > 1
            else w_slices[0]
        )

    cswc_ref[:] = _flat_int_cumsum(w * counts) + carry[0]
    csw_ref[:] = _flat_int_cumsum(w) + carry[1]
    carry[0] = cswc_ref[ROWS - 1, LANES - 1]
    carry[1] = csw_ref[ROWS - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_run_cumsums(
    run_path: jax.Array,  # int32[R_pad], R_pad % BLOCK == 0
    run_count: jax.Array,  # int32[R_pad] (0 on padding)
    mask: jax.Array,  # int32[P_pad], P_pad % 128 == 0
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(weighted cumsum, mask cumsum), both inclusive int32[R_pad]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = run_path.shape[0]
    assert r % BLOCK == 0, f"pad the run index to a multiple of {BLOCK}"
    assert mask.shape[0] % LANES == 0
    shape2d = (r // LANES, LANES)

    from .segscan import MAX_SELECT_WORDS

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
    with jax.enable_x64(False):
        cswc, csw = pl.pallas_call(
            functools.partial(_kernel, n_words=n_words),
            grid=(r // BLOCK,),
            in_specs=[block, block, mask_spec],
            out_specs=(block, block),
            out_shape=(
                jax.ShapeDtypeStruct(shape2d, jnp.int32),
                jax.ShapeDtypeStruct(shape2d, jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            interpret=interpret,
        )(
            run_path.reshape(shape2d),
            run_count.reshape(shape2d),
            mask_arg,
        )
    return cswc.reshape(r), csw.reshape(r)
