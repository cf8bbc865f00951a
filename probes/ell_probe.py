"""Time the ELL run-index depth kernel + XLA scatter-add on the TPU.

Round-2 probe #3. Questions:
  1. What does the ELL kernel cost at the bench shape (K slots/seg,
     bitwise mask-word select, int32 VPU reduction)?
  2. What does ``depth.at[ids].add(vals, mode="drop")`` cost for K2 in
     {256, 4k, 16k, 32k} sorted ids into an N=2^18 vector? (Decides
     whether heavy columns can ride a scatter-fixed sidecar or must
     stay in the dense matrix.)

Usage: python probes/ell_probe.py [ell] [scatter]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _time_chain_raw, synth_device_graph  # noqa: E402


def time_chained(fn, args, reps=2):
    """args = (mask, *rest); rest flows through jit as REAL arguments —
    closing over device arrays bakes them into the program as constants
    that re-upload through the slow tunnel on every compile."""

    @jax.jit
    def chained(mask, k, *rest):
        def body(i, carry):
            mask, acc = carry
            depth, uniq = fn(mask, *rest)
            mask = jnp.roll(mask, 1).at[0].set(depth[0] % 2)
            return mask, acc + depth[-1] + uniq[-1]

        _, acc = jax.lax.fori_loop(0, k, body, (mask, jnp.int32(0)))
        return acc

    mask, rest = args[0], args[1:]
    k = 6
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (mask, jnp.int32(k), *rest), reps, k
        )
        if raw >= 0.29 or k >= 65536:
            return per_iter


def main():
    import os

    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    which = sys.argv[1:] or ["ell", "scatter"]

    t0 = time.perf_counter()
    _, dg = synth_device_graph(n_steps, n_segs, n_paths)
    print(
        f"# ingest {time.perf_counter() - t0:.1f}s; "
        f"ell {dg.cross_ell.shape} heavy "
        f"{int((np.asarray(jax.device_get(dg.ell_res_seg)) < 2**30).sum()) if dg.ell_res_seg.size else 0}",
        flush=True,
    )

    if "ell" in which:
        from pollen_tpu.ops.depth import seg_depth_with_uniq_ell

        mask = jnp.ones(dg.num_paths, jnp.int32)

        def q(mask, dg):
            return seg_depth_with_uniq_ell(dg, mask, pallas=True)

        t0 = time.perf_counter()
        d, u = q(mask, dg)
        np.asarray(jax.device_get(d))
        # Cross-check against the crossing-matrix path on device.
        from pollen_tpu.ops.depth import seg_depth_with_uniq_cross

        d2, u2 = seg_depth_with_uniq_cross(dg, mask, pallas=True)
        ok = bool(
            (np.asarray(jax.device_get(d)) == np.asarray(jax.device_get(d2))).all()
        ) and bool(
            (np.asarray(jax.device_get(u)) == np.asarray(jax.device_get(u2))).all()
        )
        per = time_chained(q, (mask, dg))
        print(
            f"ell: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.1f} G steps/s) ok={ok} "
            f"(compile {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    if "scatter" in which:
        rng = np.random.default_rng(5)
        base = jnp.zeros(n_segs, jnp.int32)
        for k2 in (256, 4096, 16384, 32768):
            ids = jnp.asarray(
                np.sort(rng.choice(n_segs, size=k2, replace=False)).astype(
                    np.int32
                )
            )
            vals = jnp.asarray(
                rng.integers(1, 100, k2).astype(np.int32)
            )

            def sc(mask, ids=ids, vals=vals):
                out = base.at[ids].add(vals * mask[0], mode="drop")
                return out, out

            t0 = time.perf_counter()
            per = time_chained(sc, (jnp.ones(128, jnp.int32),))
            print(
                f"scatter k2={k2}: {per * 1e6:.1f} us "
                f"(compile {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
