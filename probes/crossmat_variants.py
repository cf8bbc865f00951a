"""Measure crossing-matrix kernel variants on the real TPU.

Round-2 optimization probe. The round-1 kernel (kernels/crossmat.py)
is VPU-bound at ~47 us/query on the bench shape (DMA floor ~25.6 us at
the measured 657 GB/s roofline): the uniq indicator (`minimum`) is
~16 us and the nibble unpack's concat+cast another chunk. Variants:

  v0      current masked_cross_depth (concat unpack + bf16 minimum)
  v1      no-concat: two half-plane dots per output (lo/hi nibble
          planes stay (P/2, w); the (P, w) concat copy disappears)
  v2      v1 + per-tile uniq skip: a scalar-prefetched flag marks
          tiles containing any count >= 2; simple tiles copy depth
          into uniq (Zipf graphs: most tiles are simple)
  v2z     v2 with flags forced to 0 — the floor of the approach

Run: POLLEN_BENCH_* env knobs as bench.py; prints one line per
variant. Usage: timeout 600 python probes/crossmat_variants.py v0 v1
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _time_chain_raw, synth_device_graph  # noqa: E402

from pollen_tpu.kernels.crossmat import (  # noqa: E402
    fold_mask,
    masked_cross_depth,
    pick_seg_block,
)


def _dot(m, a):
    return jax.lax.dot_general(
        m,
        a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_v1(mask_ref, a_ref, depth_ref, uniq_ref):
    t32 = a_ref[:].astype(jnp.int32)
    lo = (t32 & 15).astype(jnp.bfloat16)
    hi = (t32 >> 4).astype(jnp.bfloat16)
    m = mask_ref[:]
    half = lo.shape[0]
    me, mo = m[:, :half], m[:, half:]
    depth = _dot(me, lo) + _dot(mo, hi)
    uniq = _dot(me, jnp.minimum(lo, jnp.bfloat16(1))) + _dot(
        mo, jnp.minimum(hi, jnp.bfloat16(1))
    )
    depth_ref[:] = depth[:1, :].astype(jnp.int32)
    uniq_ref[:] = uniq[:1, :].astype(jnp.int32)


def _kernel_v2(flags_ref, mask_ref, a_ref, depth_ref, uniq_ref):
    import jax.experimental.pallas as pl

    t32 = a_ref[:].astype(jnp.int32)
    lo = (t32 & 15).astype(jnp.bfloat16)
    hi = (t32 >> 4).astype(jnp.bfloat16)
    m = mask_ref[:]
    half = lo.shape[0]
    me, mo = m[:, :half], m[:, half:]
    depth = _dot(me, lo) + _dot(mo, hi)
    d32 = depth[:1, :].astype(jnp.int32)
    depth_ref[:] = d32

    @pl.when(flags_ref[pl.program_id(0)] != 0)
    def _complex():
        uniq = _dot(me, jnp.minimum(lo, jnp.bfloat16(1))) + _dot(
            mo, jnp.minimum(hi, jnp.bfloat16(1))
        )
        uniq_ref[:] = uniq[:1, :].astype(jnp.int32)

    @pl.when(flags_ref[pl.program_id(0)] == 0)
    def _simple():
        uniq_ref[:] = d32


@functools.partial(jax.jit, static_argnames=())
def cross_depth_v1(cross, mask):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n_pad = cross.shape
    p_pad = rows * 2
    width = pick_seg_block(p_pad, n_pad)
    mask = fold_mask(mask)
    m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
        mask.astype(jnp.bfloat16)
    )
    a_block = pl.BlockSpec(
        (rows, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (1, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            _kernel_v1,
            grid=(n_pad // width,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), a_block],
            out_specs=(o_block, o_block),
            out_shape=(
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ),
        )(m, cross)
    return depth[0], uniq[0]


@jax.jit
def cross_depth_v2(cross, mask, flags):
    """flags: int32[n_pad // width] nonzero where the tile needs uniq."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n_pad = cross.shape
    p_pad = rows * 2
    width = pick_seg_block(p_pad, n_pad)
    mask = fold_mask(mask)
    m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
        mask.astype(jnp.bfloat16)
    )
    a_block = pl.BlockSpec(
        (rows, width), lambda i, flags: (0, i), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (1, width), lambda i, flags: (0, i), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // width,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            a_block,
        ],
        out_specs=(o_block, o_block),
    )
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            _kernel_v2,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ),
        )(flags, m, cross)
    return depth[0], uniq[0]


def tile_flags(dg, width: int) -> np.ndarray:
    """Nonzero where a width-column tile holds any cell >= 2."""
    cross = np.asarray(jax.device_get(dg.cross_matrix))
    n_pad = cross.shape[1]
    big = (cross & 15) >= 2
    big |= (cross >> 4) >= 2
    col_any = big.any(axis=0)
    return (
        col_any.reshape(n_pad // width, width).any(axis=1).astype(np.int32)
    )


def time_variant(fn, args, dg, reps, chain):
    p_pad = args[1].shape[0]

    @jax.jit
    def chained(cross, mask, extra, k):
        def body(i, carry):
            mask, acc = carry
            if extra is None:
                depth, uniq = fn(cross, mask)
            else:
                depth, uniq = fn(cross, mask, extra)
            mask = jnp.roll(mask, 1).at[0].set(depth[0] % 2)
            return mask, acc + depth[-1] + uniq[-1]

        _, acc = jax.lax.fori_loop(0, k, body, (mask, jnp.int32(0)))
        return acc

    cross, mask = args[0], args[1]
    extra = args[2] if len(args) > 2 else None
    k = 6
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (cross, mask, extra, jnp.int32(k)), reps, k
        )
        if raw >= 0.29 or k >= 65536:
            return per_iter
        k *= 8


def main():
    import os

    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    which = sys.argv[1:] or ["v0", "v1", "v2", "v2z"]

    t0 = time.perf_counter()
    _, dg = synth_device_graph(n_steps, n_segs, n_paths)
    assert dg.cross_nibble
    cross = dg.cross_matrix
    rows, n_pad = cross.shape
    p_pad = rows * 2
    width = pick_seg_block(p_pad, n_pad)
    flags = tile_flags(dg, width)
    print(
        f"# ingest {time.perf_counter() - t0:.1f}s; "
        f"{flags.sum()}/{flags.size} complex tiles (width {width})",
        flush=True,
    )

    mask = jnp.zeros(p_pad, jnp.int32).at[: dg.num_paths].set(1)
    fj = jnp.asarray(flags)
    fz = jnp.zeros_like(fj)

    # Correctness cross-check on small output slices first.
    ref_d, ref_u = masked_cross_depth(cross, mask, nibble=True)
    ref_d = np.asarray(jax.device_get(ref_d))
    ref_u = np.asarray(jax.device_get(ref_u))
    variants = {
        "v0": (lambda c, m: masked_cross_depth(c, m, nibble=True), (cross, mask)),
        "v1": (cross_depth_v1, (cross, mask)),
        "v2": (cross_depth_v2, (cross, mask, fj)),
        "v2z": (cross_depth_v2, (cross, mask, fz)),
    }
    for name in which:
        fn, args = variants[name]
        t0 = time.perf_counter()
        d, u = fn(*args)
        d = np.asarray(jax.device_get(d))
        u = np.asarray(jax.device_get(u))
        ok_d = bool((d == ref_d).all())
        ok_u = bool((u == ref_u).all()) if name != "v2z" else "skipped"
        per = time_variant(fn, args, dg, reps=2, chain=6)
        print(
            f"{name}: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.1f} G steps/s) "
            f"depth_ok={ok_d} uniq_ok={ok_u} "
            f"(compile+check {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
