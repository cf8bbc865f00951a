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

``vs_baseline``: speed-of-light time / achieved time, with a fixed
denominator independent of the index that answered: the irreducible
streaming formulation of masked depth reads each step's path id once
(4 B/step), so its speed-of-light time is ``n_steps * 4`` bytes over
the device's *measured* streaming roofline (nominal HBM peak only when
the degraded tunnel makes calibration impossible). 1.0 == as fast as a
perfect single pass over the step list; > 1.0 == the resident index
beats dense streaming outright. The reference publishes no absolute
numbers (SURVEY.md §6); the driver-set target is "segment-sum loop at
HBM speed-of-light", and this ratio is that target made measurable —
this environment's tunnel degrades only dispatch/transfers, not
on-device compute, so the ratio measures the kernel, not the tunnel.

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
# Fixed dispatch latency per jit call, subtracted from every raw chain
# time. The default is the historically measured tunnel latency; every
# measuring process re-measures it from a null dispatch at startup
# (measure_call_overhead) — if the tunnel drifts, the subtraction
# follows the measurement instead of silently mis-centering.
CALL_OVERHEAD_S = 0.030


def measure_call_overhead(reps: int = 3) -> float:
    """Time a null jit dispatch round trip and set CALL_OVERHEAD_S.

    The min over ``reps`` is robust to a death-window outlier hitting
    one call; the result is clamped to [0.1 ms, 2 s] so a fully wedged
    tunnel cannot turn the subtraction into nonsense.
    """
    global CALL_OVERHEAD_S
    import jax
    import jax.numpy as jnp

    @jax.jit
    def null(k):
        return k + 1

    np.asarray(jax.device_get(null(jnp.int32(0))))  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(null(jnp.int32(i))))
        times.append(time.perf_counter() - t0)
    CALL_OVERHEAD_S = min(max(min(times), 1e-4), 2.0)
    return CALL_OVERHEAD_S


def _apply_platform() -> None:
    """Honor POLLEN_BENCH_PLATFORM (e.g. ``cpu`` for smoke runs): the
    interpreter's sitecustomize pre-imports jax with the axon TPU
    platform, so env vars alone don't switch backends — jax.config does,
    as long as no backend is initialized yet."""
    plat = os.environ.get("POLLEN_BENCH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def synth_device_graph(
    n_steps: int, n_segs: int, n_paths: int, device=None
):
    """Build a DeviceGraph directly from synthetic arrays (no GFA text).

    ``device="host"`` keeps every tensor in host numpy (see
    build_device_graph) so the caller can choose an impl first and ship
    only that impl's tensors (project_for_impl)."""
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
    return g, build_device_graph(g, minimal=True, device=device)


# Data fields each masked-depth impl actually reads inside the chained
# jit (ops/depth.py); everything else is replaced by a zero-size leaf
# so the benchmark never uploads an index it is not measuring (the
# unused crossing matrix alone is ~16.7 MB — minutes through a
# degraded tunnel, and the round-3 driver bench died exactly there).
_IMPL_FIELDS = {
    "ell": (
        "cross_ell",
        "cross_ell2",
        "cross_ell3",
        "ell_heavy",
        "ell_heavy_res",
        "ell_heavy_res_col",
    ),
    "cross": ("cross_matrix", "cross_res", "cross_res_seg"),
    "scan": ("step_path_sorted", "run_start", "seg_bounds"),
    "xla": ("step_path_sorted", "run_start", "seg_bounds"),
}


def project_host(dg, impl: str):
    """Zero-size every field ``impl`` does not read, staying in numpy.

    Returns a host DeviceGraph whose kept arrays are the originals and
    whose dropped arrays are empty (shape ``(0,) * ndim``, same dtype —
    the impl branches in ops/depth.py key on ``.size``/meta, never on
    dropped contents)."""
    import dataclasses

    keep = set(_IMPL_FIELDS[impl])
    out = {}
    for f in dataclasses.fields(dg):
        v = getattr(dg, f.name)
        if not hasattr(v, "ndim"):
            out[f.name] = v  # meta field
        elif f.name in keep:
            out[f.name] = np.asarray(v)
        else:
            out[f.name] = np.zeros((0,) * v.ndim, v.dtype)
    return type(dg)(**out)


def ship(dg, on_field=None):
    """device_put every array leaf; ``on_field(name, mb)`` is called
    after each transferred array is FORCED onto the device (a tiny jit
    reduction paid per array — device_put alone is lazy through the
    tunnel), so a stall pinpoints the exact array in the stderr log."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    @jax.jit
    def touch(a):
        return jnp.sum(a.astype(jnp.int32)) if a.size else jnp.int32(0)

    out = {}
    for f in dataclasses.fields(dg):
        v = getattr(dg, f.name)
        if not hasattr(v, "ndim"):
            out[f.name] = v
            continue
        arr = jax.device_put(jnp_asarray(v))
        if v.size and on_field is not None:
            np.asarray(jax.device_get(touch(arr)))
            on_field(f.name, v.nbytes / 2**20)
        out[f.name] = arr
    return type(dg)(**out)


def project_for_impl(dg, impl: str):
    """Ship ONLY the fields ``impl`` reads; zero-size the rest."""
    return ship(project_host(dg, impl))


_INGEST_CACHE_VERSION = 2  # v2: pack16 tall tiers


def _ingest_cache_dir() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "pollen-tpu", "bench-ingest"
    )


def _ingest_cache_glob(n_steps: int, n_segs: int, n_paths: int) -> str:
    return (
        f"ingest-v{_INGEST_CACHE_VERSION}"
        f"-{n_steps}-{n_segs}-{n_paths}-*.npz"
    )


def ingest_cache_store(dg_host, impl: str, shape) -> None:
    """Persist a projected host graph so a retry after a stranded
    attempt skips the synth + tier-planning work (atomic rename — a
    killed writer must not leave a torn file)."""
    import dataclasses

    n_steps, n_segs, n_paths = shape
    try:
        d = _ingest_cache_dir()
        os.makedirs(d, exist_ok=True)
        path = os.path.join(
            d,
            f"ingest-v{_INGEST_CACHE_VERSION}"
            f"-{n_steps}-{n_segs}-{n_paths}-{impl}.npz",
        )
        arrays, meta = {}, {}
        for f in dataclasses.fields(dg_host):
            v = getattr(dg_host, f.name)
            if hasattr(v, "ndim"):
                arrays[f.name] = np.asarray(v)
            elif isinstance(v, tuple):
                meta[f.name] = {"__tuple__": list(v)}
            else:
                meta[f.name] = v
        tmp = path + ".tmp"
        np.savez(tmp, _meta_json=json.dumps({"impl": impl, "meta": meta}),
                 **arrays)
        # np.savez appends .npz when missing; the tmp name keeps it.
        os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)
    except Exception:
        pass


def ingest_cache_load(n_steps: int, n_segs: int, n_paths: int):
    """(impl, host DeviceGraph) from the newest matching cache entry,
    or None."""
    import glob

    from pollen_tpu.device import DeviceGraph

    paths = glob.glob(
        os.path.join(
            _ingest_cache_dir(),
            _ingest_cache_glob(n_steps, n_segs, n_paths),
        )
    )
    if not paths:
        return None
    try:
        with np.load(max(paths, key=os.path.getmtime)) as z:
            rec = json.loads(str(z["_meta_json"][()]))
            fields = dict(rec["meta"])
            for k, v in fields.items():
                if isinstance(v, dict) and "__tuple__" in v:
                    fields[k] = tuple(v["__tuple__"])
            for name in z.files:
                if name != "_meta_json":
                    fields[name] = z[name]
        return rec["impl"], DeviceGraph(**fields)
    except Exception:
        return None


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


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
    _apply_platform()
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


def _roofline_cache_read() -> dict:
    """The cache file: {device_kind: {"roofline": B/s, "ts": epoch}}.
    (Older single-entry files are migrated on read.)"""
    try:
        with open(_roofline_cache_path()) as f:
            rec = json.load(f)
    except Exception:
        return {}
    if "device" in rec:  # legacy single-entry layout
        return {
            str(rec["device"]): {
                "roofline": rec.get("roofline", 0),
                "ts": rec.get("ts", 0),
            }
        }
    return rec if isinstance(rec, dict) else {}


def _roofline_cache_entry_ok(ent) -> bool:
    try:
        age_s = time.time() - float(ent.get("ts", 0))
        return ent.get("roofline", 0) > 0 and 0 <= age_s < 48 * 3600
    except Exception:
        return False


def _roofline_cache_load() -> float | None:
    """Last successful streaming-roofline measurement on this same
    device kind, if fresh enough (48 h — tunnel bandwidth drifts). The
    calibration is a device property, not a workload property, so
    reusing a prior measurement when the flaky tunnel makes a fresh one
    impossible is honest — and far more faithful than falling back to
    the chip's nominal peak."""
    ent = _roofline_cache_read().get(_device_kind())
    if ent and _roofline_cache_entry_ok(ent):
        return float(ent["roofline"])
    return None


def _roofline_cache_store(roofline: float) -> None:
    try:
        path = _roofline_cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cache = _roofline_cache_read()
        cache[_device_kind()] = {"roofline": roofline, "ts": time.time()}
        with open(path, "w") as f:
            json.dump(cache, f)
    except Exception:
        pass


def roofline_child(n_steps: int, reps: int, chain: int) -> None:
    """In-process calibration entry (run via _roofline_subprocess): use
    the fresh-enough cached measurement for this device kind, else
    measure and cache. All cache I/O happens HERE, in the process that
    owns the backend — the orchestrating parent never imports jax, so it
    can neither hang on a dead tunnel nor mislabel a measurement with
    the wrong device kind."""
    import math

    _apply_platform()
    import pollen_tpu.device  # noqa: F401  (persistent compile cache)

    cached = _roofline_cache_load()
    if cached:
        print(f"ROOFLINE {cached} cached", flush=True)
        return
    measure_call_overhead()
    r = measure_stream_roofline(n_steps, reps, chain)
    if r and math.isfinite(r) and r > 0:
        _roofline_cache_store(r)
        print(f"ROOFLINE {r} measured", flush=True)
    else:
        print("ROOFLINE none", flush=True)


def _roofline_subprocess(n_steps: int, reps: int, chain: int, budget_s: int):
    """Run the roofline calibration in a time-boxed child process.

    Through a degraded device tunnel a single remote compile can take
    minutes; the roofline only feeds vs_baseline, so it must never sink
    the whole benchmark. On timeout/failure, fall back to the cache
    file directly — accepting only TPU-kind entries, since this parent
    has no backend of its own to compare against.
    """
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench.roofline_child(%d, %d, %d)\n"
        % (os.path.dirname(os.path.abspath(__file__)), n_steps, reps, chain)
    )
    roofline = None
    try:
        result = subprocess.run(
            [sys.executable, "-u", "-c", code],
            capture_output=True,
            text=True,
            timeout=budget_s,
        )
        for line in result.stdout.splitlines():
            if line.startswith("ROOFLINE ") and "none" not in line:
                roofline = float(line.split()[1])
    except Exception:
        roofline = None
    if roofline:
        return roofline
    for device, ent in _roofline_cache_read().items():
        if device.startswith("tpu") and _roofline_cache_entry_ok(ent):
            print("# roofline from cache (fresh calibration unavailable)",
                  file=sys.stderr)
            return float(ent["roofline"])
    return None


def measure_depth(
    dg,
    reps: int,
    chain: int,
    impl: str = "scan",
    budget_s: float | None = None,
    on_progress=None,
) -> float:
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
        seg_depth_with_uniq_ell_parts,
    )

    p_pad = -(-(dg.num_paths + 1) // 128) * 128
    on_tpu = jax.default_backend() != "cpu"

    @jax.jit
    def chained(dg, mask, k):
        def body(i, carry):
            mask, acc = carry
            if impl == "ell":
                # The parts form (the production serving shape); fold
                # the tier-2/heavy parts into u1[-1] — the element the
                # chain READS — an update at an unread index is a dead
                # store XLA may eliminate with the kernels feeding it.
                d1, u1, d2, u2, dh, uh = seg_depth_with_uniq_ell_parts(
                    dg, mask, pallas=on_tpu
                )
                depth = d1
                uniq = u1
                extra = jnp.int32(0)
                if d2 is not None:
                    extra = extra + d2[-1] + u2[-1]
                if dh is not None:
                    extra = extra + dh[-1] + uh[-1]
                if d2 is not None or dh is not None:
                    uniq = uniq.at[-1].add(extra)
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
    t_start = time.perf_counter()
    per_iter = None
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (dg, mask, jnp.int32(k)), reps, k
        )
        if on_progress is not None:
            on_progress(per_iter, k)
        elapsed = time.perf_counter() - t_start
        over_budget = budget_s is not None and elapsed > budget_s
        if raw >= CALL_OVERHEAD_S * 3 + 0.2 or k >= 65536 or over_budget:
            print(
                f"# chain {k} (raw {raw:.3f}s, {elapsed:.1f}s"
                f"{' BUDGET' if over_budget else ''})",
                file=sys.stderr,
            )
            return per_iter
        k *= 8


def _emit_result(steps_per_s: float, n_steps: int, roofline) -> None:
    """Print the one-line JSON contract.

    ``vs_baseline`` = speed-of-light time / achieved time, with a FIXED
    denominator independent of which index answered the query: the
    irreducible streaming formulation of masked depth reads each step's
    path id once — ``n_steps * 4`` bytes — so its speed-of-light time
    on this device is ``n_steps * 4 / measured_roofline``. A value of
    1.0 means the query runs as fast as a perfect single pass over the
    step list; values above 1.0 mean the resident index beats dense
    streaming outright (it touches less than 4 B per step — the point
    of building an index). The reference publishes no absolute numbers
    (SURVEY.md §6); the driver-set target is "segment-sum loop at HBM
    speed-of-light", and this ratio is that target made measurable.
    """
    import sys

    if not roofline:
        # Calibration unavailable (flaky tunnel): use the chip's
        # nominal HBM peak (v5e: 819 GB/s). Honest but pessimistic —
        # the nominal peak exceeds any achievable stream.
        roofline = 819e9
        print("# roofline unavailable; vs_baseline uses nominal HBM peak",
              file=sys.stderr)
    sol_time = n_steps * 4.0 / roofline
    per_query = n_steps / steps_per_s if steps_per_s else float("inf")
    vs_baseline = sol_time / per_query
    print(
        json.dumps(
            {
                "metric": "masked_depth_steps_per_s",
                "value": round(steps_per_s),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        ),
        flush=True,
    )


def _bench_bytes_per_step(dg, impl: str, n_steps: int) -> float:
    if impl == "ell":
        return (
            4.0 * int(
                dg.cross_ell.size + dg.cross_ell2.size + dg.cross_ell3.size
            )
            + int(dg.ell_heavy.size)
            + 4.0 * int(dg.ell_heavy_res.size)
        ) / n_steps
    if impl == "cross":
        return float(int(dg.cross_matrix.size)) / n_steps
    if impl == "scan":
        return 16.0
    return BYTES_PER_STEP


def child_main() -> None:
    """Ingest + headline measurement, writing best-so-far progress to
    POLLEN_BENCH_PARTIAL after every chained timing so the parent can
    still report a measured number if a tunnel death window strands this
    process mid-phase. Every stage prints a flushed marker first, so a
    stall is attributable from the stderr transcript alone."""
    import sys

    # Test hook: fake a wedged tunnel for the fault-injection contract
    # test (a stall here stands in for a hung first dispatch).
    stall_attempts = int(os.environ.get("POLLEN_BENCH_TEST_STALL", 0))
    attempt_no = int(os.environ.get("POLLEN_BENCH_ATTEMPT", 1))
    if attempt_no <= stall_attempts:
        print("# test stall", file=sys.stderr, flush=True)
        time.sleep(3600)

    _apply_platform()
    import jax

    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    reps = int(os.environ.get("POLLEN_BENCH_REPS", 2))
    chain = int(os.environ.get("POLLEN_BENCH_CHAIN", 6))
    budget = float(os.environ.get("POLLEN_BENCH_DEPTH_BUDGET", 180))
    partial_path = os.environ.get("POLLEN_BENCH_PARTIAL")
    want_impl = os.environ.get("POLLEN_BENCH_IMPL")
    on_tpu = jax.default_backend() != "cpu"

    t0 = time.perf_counter()
    # Ingest host-side: nothing is uploaded until the impl is chosen.
    # A prior (possibly killed) attempt's disk cache skips the synth +
    # tier planning entirely — retries must spend their short budget on
    # the tunnel, not on host work.
    cached = ingest_cache_load(n_steps, n_segs, n_paths)
    if cached is not None and (want_impl is None or cached[0] == want_impl):
        impl, dg_host = cached
        print(
            f"# ingest {time.perf_counter() - t0:.1f}s (disk cache)",
            file=sys.stderr, flush=True,
        )
    else:
        _, dg_full = synth_device_graph(
            n_steps, n_segs, n_paths, device="host"
        )
        from pollen_tpu.ops.depth import _best_masked_impl

        impl = want_impl
        if impl is None:
            impl = _best_masked_impl(dg_full)
            if impl not in ("ell", "cross"):
                impl = "scan" if on_tpu else "xla"
        dg_host = project_host(dg_full, impl)
        ingest_cache_store(dg_host, impl, (n_steps, n_segs, n_paths))
        print(
            f"# ingest {time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )

    bytes_per_step = _bench_bytes_per_step(dg_host, impl, n_steps)
    upload_mb = sum(
        getattr(dg_host, f).nbytes for f in _IMPL_FIELDS[impl]
    ) / 2**20
    print(
        f"# impl {impl} ({bytes_per_step:.1f} B/step, "
        f"{upload_mb:.1f} MB to ship)",
        file=sys.stderr, flush=True,
    )

    # First backend dispatch — the r4 death-window stall point. It runs
    # before the uploads so a hang here is unambiguous in the log.
    print("# first dispatch...", file=sys.stderr, flush=True)
    overhead = measure_call_overhead()
    print(f"# call overhead {overhead * 1e3:.1f} ms", file=sys.stderr,
          flush=True)

    t0 = time.perf_counter()
    dg = ship(
        dg_host,
        on_field=lambda name, mb: print(
            f"# uploaded {name} ({mb:.1f} MB,"
            f" {time.perf_counter() - t0:.1f}s)",
            file=sys.stderr, flush=True,
        ),
    )

    def on_progress(per_iter: float, k: int) -> None:
        if not partial_path:
            return
        try:
            # Atomic replace: the parent's timeout SIGKILL landing
            # mid-write must not destroy the previously banked partial.
            tmp = partial_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "per_query": per_iter,
                        "chain": k,
                        "impl": impl,
                        "bytes_per_step": bytes_per_step,
                        "n_steps": n_steps,
                    },
                    f,
                )
            os.replace(tmp, partial_path)
        except Exception:
            pass

    t0 = time.perf_counter()
    per_query = measure_depth(
        dg, reps, chain, impl=impl, budget_s=budget, on_progress=on_progress
    )
    print(f"# depth {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # Parent parses this marker line; the JSON contract line is the
    # parent's to print (after the roofline phase).
    print(
        json.dumps(
            {
                "done": True,
                "per_query": per_query,
                "impl": impl,
                "bytes_per_step": bytes_per_step,
                "n_steps": n_steps,
            }
        ),
        flush=True,
    )


def main() -> None:
    """Orchestrator: run the measurement in time-boxed child processes
    (a tunnel death window must never sink the run or blow the <8 min
    contract) and print the JSON line — always, even when phases are
    cut short.

    Delivery design (the r3/r4 driver captures both recorded 0; this
    is the fix, see docs/benchmarks.md):
    - MANY SHORT ATTEMPTS, not few long ones. Death windows run
      60-110 s and a wedged dispatch can hang 30+ min ignoring
      SIGTERM; each attempt is a fresh process (the tunnel recovers
      per-process), so four ~100 s dice rolls dominate two ~200 s
      ones. Budgets are fair-shared over the attempts left, with the
      first attempt weighted up to cover a cold Mosaic compile.
    - BANK EVERYTHING. Full results, and best-so-far partials written
      by stranded children after every chained timing, all land in
      one pool; the best banked steps/s is reported. A 'done' result
      on the headline impl ends the hunt.
    - FALLBACK SHAPE. If nothing is banked by the last attempt, it
      runs at a 4x-smaller graph (cheaper upload + compile) — a
      smaller measured number beats a zero.
    """
    import subprocess
    import sys
    import tempfile

    deadline = float(os.environ.get("POLLEN_BENCH_DEADLINE", 420))
    max_tries = int(os.environ.get("POLLEN_BENCH_TRIES", 4))
    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    t_start = time.perf_counter()

    def remaining() -> float:
        return deadline - (time.perf_counter() - t_start)

    partial = tempfile.NamedTemporaryFile(
        mode="w", suffix=".json", prefix="pollen-bench-", delete=False
    )
    partial.close()

    env = dict(os.environ)
    env["POLLEN_BENCH_CHILD"] = "1"
    env["POLLEN_BENCH_PARTIAL"] = partial.name

    # Phase 0: roofline from the 48 h per-device cache — near-instant
    # when a fresh entry exists. A cold calibration waits until after
    # the measurement so it can never starve the headline number.
    roofline_cap = int(os.environ.get("POLLEN_BENCH_ROOFLINE_BUDGET", 150))
    t0 = time.perf_counter()
    roofline = _roofline_subprocess(
        2**25, 2, 64, budget_s=min(40, roofline_cap, remaining() / 4)
    )
    print(
        f"# roofline phase0 {roofline and round(roofline / 1e9, 1)} GB/s"
        f" ({time.perf_counter() - t0:.1f}s)",
        file=sys.stderr,
    )

    results = []  # every banked measurement: full or partial

    def bank(rec, label):
        if rec and rec.get("per_query") and rec.get("n_steps"):
            results.append(rec)
            print(
                f"# banked {label}: {rec['n_steps'] / rec['per_query'] / 1e9:.1f}"
                f" G steps/s (impl {rec.get('impl')}, chain"
                f" {rec.get('chain', 'full')})",
                file=sys.stderr,
            )

    done = False
    for attempt in range(1, max_tries + 1):
        reserve = 15 if roofline else 50
        attempts_left = max_tries - attempt + 1
        # Fair share of what's left, with the first attempt weighted
        # 1.5x (a cold Mosaic compile through the remote helper can eat
        # ~75 s; retries hit the persistent compile cache).
        w = 1.5 if attempt == 1 and max_tries > 1 else 1.0
        budget = (remaining() - reserve) * w / (w + attempts_left - 1)
        if budget < 40:
            break
        env["POLLEN_BENCH_ATTEMPT"] = str(attempt)
        is_fallback = attempt == max_tries and not results and max_tries > 1
        if is_fallback:
            env["POLLEN_BENCH_STEPS"] = os.environ.get(
                "POLLEN_BENCH_FALLBACK_STEPS", str(max(n_steps // 4, 1024))
            )
            env["POLLEN_BENCH_SEGS"] = os.environ.get(
                "POLLEN_BENCH_FALLBACK_SEGS", str(max(n_segs // 4, 256))
            )
            print("# fallback shape for last attempt", file=sys.stderr)
        env["POLLEN_BENCH_DEPTH_BUDGET"] = os.environ.get(
            "POLLEN_BENCH_DEPTH_BUDGET", str(max(30, int(budget) - 60))
        )
        try:
            open(partial.name, "w").close()  # drop stale progress
        except OSError:
            pass
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env,
                timeout=budget,
                capture_output=True,
                text=True,
            )
            sys.stderr.write(proc.stderr)
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
                    if rec.get("done"):
                        bank(rec, f"attempt {attempt}")
                        done = True
        except subprocess.TimeoutExpired as e:
            err = e.stderr or b""
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
            sys.stderr.write(err)
            print(
                f"# measurement child timed out (attempt {attempt},"
                f" budget {budget:.0f}s)",
                file=sys.stderr,
            )
        if done:
            break
        # A stranded child may still have written best-so-far progress
        # after its first short chain — a real (if noisier) measurement.
        try:
            with open(partial.name) as f:
                rec = json.load(f)
            bank(rec, f"partial of attempt {attempt}")
        except Exception:
            pass
        if attempt < max_tries:
            print("# retrying measurement child", file=sys.stderr)
    try:
        os.unlink(partial.name)
    except OSError:
        pass

    if roofline is None:
        # The streamed array must exceed VMEM (~128 MB on v5e) or XLA
        # keeps the loop-carried value on-chip and the "roofline" reads
        # 4+ TB/s; 2^25 int32 (128 MB moved twice per iteration)
        # measures real HBM.
        t0 = time.perf_counter()
        roofline = _roofline_subprocess(
            2**25, 2, 64,
            budget_s=min(roofline_cap, max(20, int(remaining() - 10))),
        )
        print(
            f"# roofline {roofline and roofline / 1e9} GB/s"
            f" ({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
        )

    if not results:
        print("# no measurement completed; reporting zero", file=sys.stderr)
        _emit_result(0.0, 1, roofline)
        return
    best = max(results, key=lambda r: r["n_steps"] / r["per_query"])
    _emit_result(best["n_steps"] / best["per_query"], best["n_steps"],
                 roofline)


if __name__ == "__main__":
    if os.environ.get("POLLEN_BENCH_CHILD"):
        child_main()
    else:
        main()
