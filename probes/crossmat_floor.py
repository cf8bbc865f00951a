"""Isolate the crossing-matrix kernel's cost structure on the TPU.

Round-2 probe #2: probe #1 (crossmat_variants.py) showed dropping the
uniq indicator entirely only buys ~10 us of the 49 us query (DMA floor
25.6 us), so the floor lives elsewhere. Variants strip the kernel down
one stage at a time:

  raw    read tile, one bf16 cast of the raw bytes, one dot, one output
         -> the pipeline floor (DMA + minimal VPU + MXU + grid)
  widen  raw + the uint8->int32 widen before the cast
  vd     v0-form unpack (widen, &15, >>4, concat, cast), one dot, both
         outputs written from it (no minimum) -> v0 minus the uniq work
  v0     the production kernel, for reference

All variants write (1, w) outputs per tile. Timing: chained fori_loop
with a data dependency, best-of-reps, dispatch overhead subtracted.
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
    _unpack_tile,
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


def _kernel_raw(mask_ref, a_ref, depth_ref, uniq_ref):
    a = a_ref[:].astype(jnp.int32).astype(jnp.bfloat16)  # (P/2, w)
    m = mask_ref[:]  # (8, P)
    half = a.shape[0]
    depth = _dot(m[:, :half], a)
    depth_ref[:] = depth[:1, :].astype(jnp.int32)
    uniq_ref[:] = depth_ref[:]


def _kernel_vd(mask_ref, a_ref, depth_ref, uniq_ref):
    a = _unpack_tile(a_ref[:])  # (P, w) bf16 via concat
    m = mask_ref[:]
    depth = _dot(m, a)
    d32 = depth[:1, :].astype(jnp.int32)
    depth_ref[:] = d32
    uniq_ref[:] = d32


def _make(kernel):
    @jax.jit
    def fn(cross, mask):
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
                kernel,
                grid=(n_pad // width,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), a_block],
                out_specs=(o_block, o_block),
                out_shape=(
                    jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                    jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                ),
            )(m, cross)
        return depth[0], uniq[0]

    return fn


def time_variant(fn, cross, mask, reps=2):
    @jax.jit
    def chained(cross, mask, k):
        def body(i, carry):
            mask, acc = carry
            depth, uniq = fn(cross, mask)
            mask = jnp.roll(mask, 1).at[0].set(depth[0] % 2)
            return mask, acc + depth[-1] + uniq[-1]

        _, acc = jax.lax.fori_loop(0, k, body, (mask, jnp.int32(0)))
        return acc

    k = 6
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (cross, mask, jnp.int32(k)), reps, k
        )
        if raw >= 0.29 or k >= 65536:
            return per_iter


def main():
    import os

    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    which = sys.argv[1:] or ["raw", "vd", "v0"]

    t0 = time.perf_counter()
    _, dg = synth_device_graph(n_steps, n_segs, n_paths)
    cross = dg.cross_matrix
    print(f"# ingest {time.perf_counter() - t0:.1f}s", flush=True)
    p_pad = cross.shape[0] * 2
    mask = jnp.zeros(p_pad, jnp.int32).at[: dg.num_paths].set(1)

    variants = {
        "raw": _make(_kernel_raw),
        "vd": _make(_kernel_vd),
        "v0": lambda c, m: masked_cross_depth(c, m, nibble=True),
    }
    for name in which:
        fn = variants[name]
        t0 = time.perf_counter()
        d, u = fn(cross, mask)
        np.asarray(jax.device_get(d))
        per = time_variant(fn, cross, mask)
        print(
            f"{name}: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.1f} G steps/s) "
            f"(compile {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
