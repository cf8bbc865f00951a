"""Flagship benchmark: masked depth (+ unique depth) steps/s.

Times the subset-paths segment-depth query (odgi ``depth -d -s``
semantics): given a path mask that changes per query, produce
per-segment depth and distinct-path counts. The production engine
picks the cheapest resident index per graph — the dense crossing
matrix (MXU mat-vecs, kernels/crossmat.py), the fused Pallas segmented
scan over the sorted step list, or the run-level kernel — and so does
this benchmark (POLLEN_BENCH_IMPL=cross|scan|xla overrides). The
all-paths variant is answered from the ingest-time index in O(N).

Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

``vs_baseline``: achieved HBM traffic (16 B/step for the fused Pallas
kernel: read sorted path ids + group starts, write two cumsums; 24 for
the XLA pipeline) as a fraction of the device's *measured* streaming
roofline, falling back to the chip's nominal HBM peak when the
environment is too degraded to calibrate. The reference publishes no
absolute numbers (SURVEY.md §6); the driver-set target is "segment-sum
loop at HBM speed-of-light", and roofline fraction is the faithful
proxy — this environment's TPU tunnel runs far below hardware spec, so
peak-BW fractions would measure the tunnel, not the kernel.

Timing notes: each measurement chains K kernel iterations inside one jit
with a true data dependency between iterations (the mask is derived from
the previous output), defeating both dispatch-latency artifacts (~30 ms
per call through the tunnel) and XLA folding of unused results.

Env knobs: POLLEN_BENCH_STEPS (default 2**22), POLLEN_BENCH_SEGS,
POLLEN_BENCH_PATHS, POLLEN_BENCH_REPS, POLLEN_BENCH_CHAIN,
POLLEN_BENCH_ROOFLINE_BUDGET (seconds).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BYTES_PER_STEP = 24.0
CALL_OVERHEAD_S = 0.030  # measured fixed dispatch latency per jit call


def synth_device_graph(n_steps: int, n_segs: int, n_paths: int):
    """Build a DeviceGraph directly from synthetic arrays (no GFA text)."""
    from pollen_tpu.device import build_device_graph
    from pollen_tpu.flatgfa import GraphArrays

    rng = np.random.default_rng(8)
    # Zipf-ish segment popularity, like real pangenomes.
    pop = rng.zipf(1.3, size=n_steps).astype(np.int64)
    segs = (pop - 1) % n_segs
    rev = rng.random(n_steps) < 0.1
    steps = (segs.astype(np.uint32) << np.uint32(1)) | rev.astype(np.uint32)

    bounds = np.linspace(0, n_steps, n_paths + 1).astype(np.uint32)
    path_steps = np.stack([bounds[:-1], bounds[1:]], axis=1)

    seg_lens = rng.integers(1, 32, size=n_segs).astype(np.uint32)
    seq_bounds = np.concatenate(([0], np.cumsum(seg_lens))).astype(np.uint32)
    seg_seq = np.stack([seq_bounds[:-1], seq_bounds[1:]], axis=1)

    g = GraphArrays(
        header=np.zeros(0, np.uint8),
        seg_name=np.arange(1, n_segs + 1, dtype=np.int64),
        seg_seq=seg_seq,
        seg_optional=np.zeros((n_segs, 2), np.uint32),
        path_name=np.zeros((n_paths, 2), np.uint32),
        path_steps=path_steps,
        path_overlaps=np.zeros((n_paths, 2), np.uint32),
        link_from=np.zeros(0, np.uint32),
        link_to=np.zeros(0, np.uint32),
        link_overlap=np.zeros((0, 2), np.uint32),
        steps=steps,
        seq_data=np.zeros(int(seq_bounds[-1]), np.uint8),
        overlaps=np.zeros((0, 2), np.uint32),
        alignment=np.zeros(0, np.uint32),
        name_data=np.zeros(0, np.uint8),
        optional_data=np.zeros(0, np.uint8),
        line_order=np.zeros(0, np.uint8),
    )
    return g, build_device_graph(g, minimal=True)


def _time_chain(jitted, args, reps: int, chain: int) -> float:
    """Best per-iteration wall time of a K-chained jitted function."""
    per_iter, _ = _time_chain_raw(jitted, args, reps, chain)
    return per_iter


def _time_chain_raw(jitted, args, reps: int, chain: int):
    """(per-iteration time, best raw wall time) of a K-chained call."""
    import jax

    out = jitted(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return max(best - CALL_OVERHEAD_S, 1e-9) / chain, best


def measure_stream_roofline(n_steps: int, reps: int, chain: int) -> float:
    """Device streaming bandwidth (B/s): chained elementwise update.

    The xor in the loop body keeps the reduction from being factored
    through the chain; the scalar sum keeps the host sync tiny
    (device->host through this environment's tunnel runs at ~30 MB/s).
    The chain grows adaptively (dynamic loop bound, one compile) until
    the streamed work clearly dominates the fixed dispatch overhead.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.ones(n_steps, dtype=jnp.int32)

    @jax.jit
    def chained(x, k):
        out = jax.lax.fori_loop(
            0, k, lambda i, x: (x * 3 + 1) ^ (x >> 1), x
        )
        return jnp.sum(out)

    k = chain
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (x, jnp.int32(k)), reps, k
        )
        if raw >= CALL_OVERHEAD_S * 3 + 0.2 or k >= 2**21:
            break
        k *= 8
    if raw < CALL_OVERHEAD_S * 2:
        return 0.0  # still indistinguishable from dispatch overhead
    return n_steps * 8 / per_iter  # 4B read + 4B write per element


def _roofline_cache_path() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "pollen-tpu", "roofline.json"
    )


def _device_kind() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


def _roofline_cache_load() -> float | None:
    """Last successful streaming-roofline measurement on this same
    device kind, if any. The calibration is a device property, not a
    workload property, so reusing a prior measurement when the flaky
    tunnel makes a fresh one impossible is honest — and far more
    faithful than falling back to the chip's nominal peak."""
    try:
        with open(_roofline_cache_path()) as f:
            rec = json.load(f)
        age_s = time.time() - float(rec.get("ts", 0))
        if (
            rec.get("device") == _device_kind()
            and rec.get("roofline", 0) > 0
            and 0 <= age_s < 48 * 3600  # tunnel bandwidth drifts; re-measure
        ):
            return float(rec["roofline"])
    except Exception:
        pass
    return None


def _roofline_cache_store(roofline: float) -> None:
    try:
        path = _roofline_cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {
                    "device": _device_kind(),
                    "roofline": roofline,
                    "ts": time.time(),
                },
                f,
            )
    except Exception:
        pass


def _roofline_subprocess(n_steps: int, reps: int, chain: int, budget_s: int):
    """Run the roofline calibration in a time-boxed child process.

    Through a degraded device tunnel a single remote compile can take
    minutes; the roofline only feeds vs_baseline, so it must never sink
    the whole benchmark. Successful measurements are cached per device
    kind; on timeout/failure the cached value (if any) is returned,
    else None.
    """
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import pollen_tpu.device  # enable the persistent compile cache\n"
        "from bench import measure_stream_roofline\n"
        "print(measure_stream_roofline(%d, %d, %d))\n"
        % (os.path.dirname(os.path.abspath(__file__)), n_steps, reps, chain)
    )
    try:
        result = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=budget_s,
        )
        roofline = float(result.stdout.strip().splitlines()[-1])
    except Exception:
        roofline = None
    import math

    if roofline and math.isfinite(roofline) and roofline > 0:
        _roofline_cache_store(roofline)
        return roofline
    cached = _roofline_cache_load()
    if cached:
        print("# roofline from cache (fresh calibration unavailable)",
              file=sys.stderr)
    return cached


def measure_depth(dg, reps: int, chain: int, impl: str = "scan") -> float:
    """Best per-query time for the masked depth+uniq query.

    ``impl``: "cross" = crossing-matrix MXU kernel (gather-free),
    "scan" = fused Pallas segmented scan + boundary diffs (TPU),
    "xla" = portable XLA pipeline.
    """
    import jax
    import jax.numpy as jnp

    from pollen_tpu.device import bounded_segment_sum, first_in_group_mask
    from pollen_tpu.kernels.segscan import (
        depth_uniq_from_cumsums,
        masked_depth_cumsums,
    )
    from pollen_tpu.ops.depth import (
        seg_depth_with_uniq_cross,
        seg_depth_with_uniq_ell,
    )

    p_pad = -(-(dg.num_paths + 1) // 128) * 128
    on_tpu = jax.default_backend() != "cpu"

    @jax.jit
    def chained(dg, mask, k):
        def body(i, carry):
            mask, acc = carry
            if impl == "ell":
                depth, uniq = seg_depth_with_uniq_ell(
                    dg, mask, pallas=on_tpu
                )
            elif impl == "cross":
                depth, uniq = seg_depth_with_uniq_cross(
                    dg, mask, pallas=on_tpu
                )
            elif impl == "scan":
                csw, csf = masked_depth_cumsums(
                    dg.step_path_sorted, dg.run_start, mask
                )
                depth, uniq = depth_uniq_from_cumsums(
                    csw, csf, dg.seg_bounds
                )
            else:
                w = mask[dg.step_path_sorted]
                depth = bounded_segment_sum(w, dg.seg_bounds)
                first = first_in_group_mask(w, dg.run_start)
                uniq = bounded_segment_sum(first, dg.seg_bounds)
            # True dependency: next mask derives from this output.
            mask = jnp.roll(mask, 1).at[0].set(depth[0] % 2)
            return mask, acc + depth[-1] + uniq[-1]

        _, acc = jax.lax.fori_loop(
            0, k, body, (mask, jnp.int32(0))
        )
        return acc

    mask = jnp.zeros(p_pad, dtype=jnp.int32).at[: dg.num_paths].set(1)
    # Adaptive chain length: grow K (a dynamic loop bound — one
    # compile) until the chained work clearly dominates the fixed
    # dispatch overhead; fast kernels (the crossing matrix runs ~100x
    # quicker than the scan) would otherwise vanish under it.
    import sys

    k = chain
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (dg, mask, jnp.int32(k)), reps, k
        )
        if raw >= CALL_OVERHEAD_S * 3 + 0.2 or k >= 65536:
            print(f"# chain {k} (raw {raw:.3f}s)", file=sys.stderr)
            return per_iter
        k *= 8


def main() -> None:
    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    reps = int(os.environ.get("POLLEN_BENCH_REPS", 2))
    chain = int(os.environ.get("POLLEN_BENCH_CHAIN", 6))

    import sys

    import jax

    t0 = time.perf_counter()
    _, dg = synth_device_graph(n_steps, n_segs, n_paths)
    print(f"# ingest {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    from pollen_tpu.ops.depth import _best_masked_impl

    on_tpu = jax.default_backend() != "cpu"
    impl = os.environ.get("POLLEN_BENCH_IMPL")
    if impl is None:
        impl = _best_masked_impl(dg)
        if impl not in ("ell", "cross"):
            impl = "scan" if on_tpu else "xla"
    if impl == "ell":
        bytes_per_step = (
            4.0 * (int(dg.cross_ell.size) + int(dg.ell_res.size)) / n_steps
        )
    elif impl == "cross":
        bytes_per_step = float(int(dg.cross_matrix.size)) / n_steps
    elif impl == "scan":
        bytes_per_step = 16.0
    else:
        bytes_per_step = BYTES_PER_STEP
    print(f"# impl {impl} ({bytes_per_step:.1f} B/step)", file=sys.stderr)

    # The headline measurement first; the roofline calibration is
    # best-effort and time-boxed (a flaky tunnel must not sink the run).
    t0 = time.perf_counter()
    per_query = measure_depth(dg, reps, chain, impl=impl)
    print(f"# depth {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    steps_per_s = n_steps / per_query

    t0 = time.perf_counter()
    # The streamed array must exceed VMEM (~128 MB on v5e) or XLA keeps
    # the loop-carried value on-chip and the "roofline" reads 4+ TB/s;
    # 2^25 int32 (128 MB moved twice per iteration) measures real HBM.
    roofline = _roofline_subprocess(
        2**25,
        reps,
        64,
        budget_s=int(os.environ.get("POLLEN_BENCH_ROOFLINE_BUDGET", 150)),
    )
    print(
        f"# roofline {roofline and roofline / 1e9} GB/s"
        f" ({time.perf_counter() - t0:.1f}s)",
        file=sys.stderr,
    )
    achieved_bytes = steps_per_s * bytes_per_step
    if roofline:
        vs_baseline = achieved_bytes / roofline
    else:
        # Calibration unavailable (flaky tunnel): report the fraction of
        # the chip's nominal HBM peak instead (v5e: 819 GB/s). Honest
        # but pessimistic — the tunnel runs far below chip spec.
        vs_baseline = achieved_bytes / 819e9
        print("# roofline unavailable; vs_baseline uses nominal HBM peak",
              file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "masked_depth_steps_per_s",
                "value": round(steps_per_s),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
