"""Sharded depth/degree: the step list split across a device mesh.

Design (per BASELINE.json's north star): the (segment, path)-sorted step
index is sharded into contiguous chunks over every device in a
``Mesh(hosts, chips)``; segment-indexed tables (N-sized boundaries) are
replicated; each device computes a partial histogram over its chunk with
the same scatter-free cumsum trick as the single-chip path; partials
merge with ``psum`` riding ICI.

The subtle part is ``depth.uniq`` (distinct paths per segment): a
(segment, path) group can straddle chunk boundaries, so "first masked
step of the group" needs cross-chunk information. We use a decoupled
lookback: every group is identified by its *global start position*; each
device all-gathers one (tail-group id, tail-group masked count) pair and
adds the carry from devices to its left before testing "am I first".
One tiny all-gather + one psum per query — no scatter, no host sync.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..device import DeviceGraph

STEP_AXES = ("host", "chip")  # step chunks are sharded over both axes


def make_mesh(
    devices=None, hosts: Optional[int] = None
) -> Mesh:
    """A (host, chip) mesh over the given (or all) devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if hosts is None:
        # Default: a single host row unless the device count factors.
        hosts = 2 if n % 2 == 0 and n > 1 else 1
    assert n % hosts == 0
    arr = np.array(devices).reshape(hosts, n // hosts)
    return Mesh(arr, STEP_AXES)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "step_path_sorted",
        "run_start",
        "seg_bounds",
        "chunk_starts",
    ],
    meta_fields=["num_segments", "num_paths", "num_steps", "chunk"],
)
@dataclasses.dataclass
class ShardedGraph:
    """Step-sharded view of a graph for mesh execution.

    ``step_path_sorted`` and ``run_start`` are padded to a multiple of
    the device count and sharded by contiguous chunk; ``seg_bounds`` is
    replicated. Padding uses a sentinel path id (= num_paths) whose mask
    entry is always 0.
    """

    step_path_sorted: jax.Array  # int32[S_pad] sharded
    run_start: jax.Array  # int32[S_pad] sharded (global positions)
    seg_bounds: jax.Array  # int32[N+1] replicated
    chunk_starts: jax.Array  # int32[D] replicated: global start of chunk d

    num_segments: int
    num_paths: int
    num_steps: int
    chunk: int


def shard_device_graph(
    dg: DeviceGraph, mesh: Mesh, block: int = 1
) -> ShardedGraph:
    """Lay a DeviceGraph's sorted index out across a mesh.

    ``block``: pad each device's chunk to a multiple of this (the fused
    per-shard Pallas scan needs chunks divisible by its BLOCK)."""
    n_dev = mesh.size
    path_sorted = np.asarray(dg.step_path_sorted)  # already block-padded
    run_start = np.asarray(dg.run_start)
    s = path_sorted.shape[0]
    chunk = -(-max(s, 1) // (n_dev * block)) * block
    s_pad = chunk * n_dev
    pad = s_pad - s
    # Sentinel padding: fake path (mask 0), each pad step its own group.
    path_sorted = np.concatenate(
        [path_sorted, np.full(pad, dg.num_paths, np.int32)]
    )
    run_start = np.concatenate(
        [run_start, np.arange(s, s_pad, dtype=np.int32)]
    )

    step_sharding = NamedSharding(mesh, P(STEP_AXES))
    repl = NamedSharding(mesh, P())
    chunk = s_pad // n_dev
    return ShardedGraph(
        step_path_sorted=jax.device_put(jnp.asarray(path_sorted), step_sharding),
        run_start=jax.device_put(jnp.asarray(run_start), step_sharding),
        seg_bounds=jax.device_put(dg.seg_bounds, repl),
        chunk_starts=jax.device_put(
            jnp.arange(n_dev, dtype=jnp.int32) * chunk, repl
        ),
        num_segments=dg.num_segments,
        num_paths=dg.num_paths,
        num_steps=s,
        chunk=chunk,
    )


def _local_depth_uniq(
    path_chunk: jax.Array,  # int32[C] local sorted step -> path
    run_start: jax.Array,  # int32[C] global group starts
    seg_bounds: jax.Array,  # int32[N+1] global
    chunk_start: jax.Array,  # int32[] global offset of this chunk
    mask_ext: jax.Array,  # int32[P+1] path mask with sentinel 0
    axis_names: Tuple[str, ...],
) -> Tuple[jax.Array, jax.Array]:
    """Per-device partial (depth, uniq) histograms; caller psums."""
    c_size = path_chunk.shape[0]
    w = mask_ext[path_chunk]

    csum = jnp.cumsum(w)
    padded = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum])

    # Partial plain depth: clip each segment's global range to the chunk.
    lo = jnp.clip(seg_bounds[:-1] - chunk_start, 0, c_size)
    hi = jnp.clip(seg_bounds[1:] - chunk_start, 0, c_size)
    depth_partial = padded[hi] - padded[lo]

    # Uniq: masked count within each group, with cross-chunk carry.
    local_start = jnp.clip(run_start - chunk_start, 0, c_size - 1)
    excl = csum - w
    within_local = csum - excl[local_start]

    # Tail-group summary for the lookback: the last group's global id
    # and how many masked steps of it live in this chunk.
    tail_key = run_start[-1]
    tail_count = csum[-1] - excl[local_start[-1]]

    keys = jax.lax.all_gather(tail_key, axis_names, tiled=False)
    counts = jax.lax.all_gather(tail_count, axis_names, tiled=False)
    keys = keys.reshape(-1)
    counts = counts.reshape(-1)

    my_index = chunk_start // c_size
    head_key = run_start[0]
    from_left = jnp.arange(keys.shape[0]) < my_index
    carry = jnp.sum(jnp.where(from_left & (keys == head_key), counts, 0))

    # Only positions whose group began before this chunk get the carry.
    started_before = run_start < chunk_start
    within = within_local + jnp.where(started_before, carry, 0)
    first = w * (within == 1).astype(w.dtype)

    fsum = jnp.cumsum(first)
    fpadded = jnp.concatenate([jnp.zeros((1,), fsum.dtype), fsum])
    uniq_partial = fpadded[hi] - fpadded[lo]
    return depth_partial, uniq_partial


def sharded_seg_depth_fn(
    mesh: Mesh,
) -> Callable[[ShardedGraph, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Build the jitted mesh-wide (depth, uniq) query.

    The returned function takes a ShardedGraph and a bool/int mask of
    shape [P+1] (last entry 0: the padding sentinel) and returns
    replicated int32[N] depth and uniq vectors.
    """

    @jax.jit
    def query(sg: ShardedGraph, mask_ext: jax.Array):
        def worker(path_chunk, run_start, seg_bounds, chunk_starts, mask):
            idx = jax.lax.axis_index(STEP_AXES)
            chunk_start = chunk_starts[idx]
            d, u = _local_depth_uniq(
                path_chunk,
                run_start,
                seg_bounds,
                chunk_start,
                mask,
                STEP_AXES,
            )
            return (
                jax.lax.psum(d, STEP_AXES),
                jax.lax.psum(u, STEP_AXES),
            )

        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=(P(STEP_AXES), P(STEP_AXES), P(), P(), P()),
            out_specs=(P(), P()),
        )(
            sg.step_path_sorted,
            sg.run_start,
            sg.seg_bounds,
            sg.chunk_starts,
            mask_ext,
        )

    return query


def sharded_seg_depth_scatter_fn(mesh: Mesh):
    """Mesh-wide (depth, uniq) with the *output* sharded too.

    Like :func:`sharded_seg_depth_fn`, but partials merge with
    ``psum_scatter`` over the chip axis: each device keeps only its
    slice of the N-sized result (the tensor-parallel analogue for
    segment-indexed outputs — for graphs whose segment tables are too
    large to replicate). Requires (N + 1) padded to a multiple of the
    chip-axis size times 1; callers slice the valid prefix.
    """

    @jax.jit
    def query(sg: ShardedGraph, mask_ext: jax.Array):
        def worker(path_chunk, run_start, seg_bounds, chunk_starts, mask):
            idx = jax.lax.axis_index(STEP_AXES)
            chunk_start = chunk_starts[idx]
            d, u = _local_depth_uniq(
                path_chunk,
                run_start,
                seg_bounds,
                chunk_start,
                mask,
                STEP_AXES,
            )
            # Sum over hosts (replicated result per host row), then
            # scatter the segment axis across chips.
            d = jax.lax.psum(d, "host")
            u = jax.lax.psum(u, "host")
            chips = jax.lax.axis_size("chip")
            pad = (-d.shape[0]) % chips
            d = jnp.concatenate([d, jnp.zeros(pad, d.dtype)])
            u = jnp.concatenate([u, jnp.zeros(pad, u.dtype)])
            d = jax.lax.psum_scatter(d, "chip", scatter_dimension=0, tiled=True)
            u = jax.lax.psum_scatter(u, "chip", scatter_dimension=0, tiled=True)
            return d, u

        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=(P(STEP_AXES), P(STEP_AXES), P(), P(), P()),
            out_specs=(P("chip"), P("chip")),
        )(
            sg.step_path_sorted,
            sg.run_start,
            sg.seg_bounds,
            sg.chunk_starts,
            mask_ext,
        )

    return query


def sharded_seg_depth_fused_fn(mesh: Mesh, interpret: bool = False):
    """Mesh-wide (depth, uniq) with the fused Pallas segmented scan
    running per shard — the production sharded form of the scan-family
    fallback (the only index once P and the ELL/crossing budgets are
    all exceeded). Structure:

    1. each device computes its tail-group masked count with one cheap
       XLA reduction (no cumsum),
    2. one tiny all-gather of (tail-group id, count) pairs gives every
       device its head-group lookback carry,
    3. the fused kernel (kernels/segscan.py) runs over the local chunk
       with that carry as its open-group initializer — bit-select mask
       lookup, triangular-matmul cumsums, first-flag prefix-max — so a
       straddling group's first-selected flag fires on exactly one
       device,
    4. local boundary differences, merged with psum over ICI.

    Requires chunks padded to the kernel block
    (``shard_device_graph(dg, mesh, block=segscan.BLOCK)``).
    ``interpret=True`` for CPU meshes (tests, dry runs).
    """
    from ..kernels.segscan import BLOCK, masked_depth_cumsums

    @jax.jit
    def query(sg: ShardedGraph, mask_ext: jax.Array):
        def worker(path_chunk, run_start, seg_bounds, chunk_starts, mask):
            idx = jax.lax.axis_index(STEP_AXES)
            chunk_start = chunk_starts[idx]
            c_size = path_chunk.shape[0]
            assert c_size % BLOCK == 0, (
                "shard with shard_device_graph(..., block=segscan.BLOCK)"
            )
            w = mask[path_chunk]
            head_key = run_start[0]
            tail_key = run_start[-1]
            tail_count = jnp.sum(w * (run_start == tail_key))
            keys = jax.lax.all_gather(
                tail_key, STEP_AXES, tiled=False
            ).reshape(-1)
            counts = jax.lax.all_gather(
                tail_count, STEP_AXES, tiled=False
            ).reshape(-1)
            my_index = chunk_start // c_size
            from_left = jnp.arange(keys.shape[0]) < my_index
            carry = jnp.sum(
                jnp.where(from_left & (keys == head_key), counts, 0)
            )
            # Kernel inputs are local: left-started groups get negative
            # start positions (never matching a local position).
            local_rs = (run_start - chunk_start).astype(jnp.int32)
            p_pad = -(-mask.shape[0] // 128) * 128
            mask128 = (
                jnp.zeros(p_pad, jnp.int32)
                .at[: mask.shape[0]]
                .set(mask.astype(jnp.int32))
            )
            csw, csf = masked_depth_cumsums(
                path_chunk.astype(jnp.int32),
                local_rs,
                mask128,
                interpret=interpret,
                head_carry=carry,
            )
            padded_w = jnp.concatenate([jnp.zeros(1, csw.dtype), csw])
            padded_f = jnp.concatenate([jnp.zeros(1, csf.dtype), csf])
            lo = jnp.clip(seg_bounds[:-1] - chunk_start, 0, c_size)
            hi = jnp.clip(seg_bounds[1:] - chunk_start, 0, c_size)
            d = padded_w[hi] - padded_w[lo]
            u = padded_f[hi] - padded_f[lo]
            return (
                jax.lax.psum(d, STEP_AXES),
                jax.lax.psum(u, STEP_AXES),
            )

        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=(P(STEP_AXES), P(STEP_AXES), P(), P(), P()),
            out_specs=(P(), P()),
            # pallas_call outputs carry no varying-mesh-axes metadata;
            # the collectives here are explicit, so skip vma checking.
            check_vma=False,
        )(
            sg.step_path_sorted,
            sg.run_start,
            sg.seg_bounds,
            sg.chunk_starts,
            mask_ext,
        )

    return query


def sharded_degree_fn(mesh: Mesh):
    """Mesh-wide degree: link-endpoint chunks sharded, boundary table
    replicated, partial histograms merged with psum."""

    @jax.jit
    def query(weights: jax.Array, chunk_starts: jax.Array, bounds: jax.Array):
        def worker(w, chunk_starts, bounds):
            idx = jax.lax.axis_index(STEP_AXES)
            chunk_start = chunk_starts[idx]
            c_size = w.shape[0]
            csum = jnp.cumsum(w)
            padded = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum])
            lo = jnp.clip(bounds[:-1] - chunk_start, 0, c_size)
            hi = jnp.clip(bounds[1:] - chunk_start, 0, c_size)
            return jax.lax.psum(padded[hi] - padded[lo], STEP_AXES)

        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=(P(STEP_AXES), P(), P()),
            out_specs=P(),
        )(weights, chunk_starts, bounds)

    return query


def shard_degree_inputs(dg: DeviceGraph, mesh: Mesh):
    """(sharded endpoint weights, chunk starts, replicated bounds)."""
    n_dev = mesh.size
    total = int(dg.link_seg_bounds[-1])
    pad = -(-max(total, 1) // n_dev) * n_dev - total
    weights = np.concatenate(
        [np.ones(total, np.int32), np.zeros(pad, np.int32)]
    )
    chunk = weights.shape[0] // n_dev
    step_sharding = NamedSharding(mesh, P(STEP_AXES))
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(jnp.asarray(weights), step_sharding),
        jax.device_put(
            jnp.arange(n_dev, dtype=jnp.int32) * chunk, repl
        ),
        jax.device_put(dg.link_seg_bounds, repl),
    )


# ---------------------------------------------------------------------------
# Sharded crossing-matrix depth (tensor-parallel over the segment axis)
# ---------------------------------------------------------------------------


class ShardedCross(NamedTuple):
    """Crossing matrix laid out over a mesh: packed columns (segments)
    sharded across every device, residual sidecar replicated."""

    cross: jax.Array  # packed rows x (col_width * n_dev), column-sharded
    res: jax.Array  # int32[P_pad, K_pad], replicated
    res_seg: jax.Array  # int32[K_pad], replicated (sentinel-padded)
    col_width: int  # segment columns per device
    num_paths_padded: int  # mask length the query expects
    nibble: bool  # two path rows per matrix byte?


def shard_cross_inputs(dg: DeviceGraph, mesh: Mesh):
    """Lay the crossing matrix out over the mesh (see ShardedCross);
    returns None when the graph has no crossing matrix. Column counts
    are padded so every device gets an equal, 128-aligned slice."""
    if dg.cross_matrix.size == 0:
        return None
    a = np.asarray(dg.cross_matrix)
    n_dev = mesh.size
    rows, n_pad = a.shape
    p_pad = rows * 2 if dg.cross_nibble else rows
    width = -(-n_pad // (n_dev * 128)) * 128
    total = width * n_dev
    if total > n_pad:
        a = np.concatenate(
            [a, np.zeros((rows, total - n_pad), a.dtype)], axis=1
        )
    col_shard = NamedSharding(mesh, P(None, STEP_AXES))
    repl = NamedSharding(mesh, P())
    return ShardedCross(
        cross=jax.device_put(jnp.asarray(a), col_shard),
        res=jax.device_put(dg.cross_res, repl),
        res_seg=jax.device_put(dg.cross_res_seg, repl),
        col_width=width,
        num_paths_padded=p_pad,
        nibble=dg.cross_nibble,
    )


def sharded_cross_depth_fn(mesh: Mesh, nibble: bool = False):
    """Mesh-wide masked (depth, uniq) over the sharded crossing matrix.

    Tensor parallelism in its purest form: each device computes the
    mat-vec for its own segment columns; outputs stay segment-sharded
    and NO collective runs at all (the mask is replicated, the residual
    fixup is range-filtered locally with dropped out-of-range scatters).
    Scaling is linear by construction — ICI carries nothing.
    """
    from ..kernels.crossmat import fold_mask, unpack_cross

    @jax.jit
    def query(cross, res, res_seg, mask):
        def worker(a, res, res_seg, mask):
            idx = jax.lax.axis_index(STEP_AXES)
            width = a.shape[1]
            # bf16 operands (exact: mask is 0/1, counts clip small)
            # with f32 accumulation keep the dots on the MXU.
            if nibble:
                af = unpack_cross(a).astype(jnp.bfloat16)
                m = fold_mask(mask).astype(jnp.bfloat16)
            else:
                af = a.astype(jnp.bfloat16)
                m = mask.astype(jnp.bfloat16)
            depth = jnp.dot(m, af, preferred_element_type=jnp.float32)
            uniq = jnp.dot(
                m,
                jnp.minimum(af, jnp.bfloat16(1)),
                preferred_element_type=jnp.float32,
            )
            depth = depth.astype(jnp.int32)
            uniq = uniq.astype(jnp.int32)
            # Residual remainders for my column range only. mode="drop"
            # only drops indices PAST the end — negative shifted
            # indices wrap around (numpy semantics) and would land
            # other devices' residuals in my first columns — so remap
            # every out-of-range index to `width` (one past the end).
            if res_seg.shape[0]:
                fix = jnp.sum(res * mask[:, None], axis=0, dtype=jnp.int32)
                local = res_seg - idx * width
                local = jnp.where(
                    (local >= 0) & (local < width), local, width
                )
                depth = depth.at[local].add(fix, mode="drop")
            return depth, uniq

        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=(P(None, STEP_AXES), P(), P(), P()),
            out_specs=(P(STEP_AXES), P(STEP_AXES)),
        )(cross, res, res_seg, mask)

    return query


class ShardedEll(NamedTuple):
    """Tiered split ELL run index laid out over a mesh: tier-1 and
    tier-2 slot columns AND heavy nibble columns each sharded across
    every device; the tiny clip residual replicated. Query outputs
    come back as segment-sharded part vectors in the index's permuted
    order (``dg.ell_order`` = [tier1, tier2, heavy, empty]; the empty
    class needs no device part at all)."""

    ell: jax.Array  # int32[K1, light_width * n_dev], column-sharded
    ell2: jax.Array | None  # int32[K2, mid_width * n_dev] or None
    ell3: jax.Array | None  # int32[K3, mid2_width * n_dev] or None
    heavy: jax.Array | None  # uint8[P_pad/2, heavy_width * n_dev] or None
    heavy_res: jax.Array  # int32[P_pad, K3_pad], replicated
    heavy_res_col: jax.Array  # int32[K3_pad], replicated (sentinel-padded)
    light_width: int  # tier-1 columns per device
    mid_width: int  # tier-2 columns per device
    mid2_width: int  # tier-3 columns per device
    heavy_width: int  # heavy columns per device
    num_paths: int
    nibble_rows: int  # ell_heavy row count (P_pad / 2)


def _pad_cols(a: np.ndarray, n_dev: int) -> Tuple[np.ndarray, int]:
    """Pad a 2-D array's columns so every device gets an equal,
    128-aligned slice; returns (padded, width-per-device)."""
    rows, n_pad = a.shape
    width = -(-n_pad // (n_dev * 128)) * 128
    total = width * n_dev
    if total > n_pad:
        a = np.concatenate(
            [a, np.zeros((rows, total - n_pad), a.dtype)], axis=1
        )
    return a, width


def shard_ell_inputs(dg: DeviceGraph, mesh: Mesh):
    """Lay the split ELL run index out over the mesh (see ShardedEll);
    returns None when the graph has no ELL index."""
    if dg.cross_ell.size == 0:
        return None
    from ..kernels.ellscan import unfold_ell_tall, unpair_ell16

    n_dev = mesh.size

    def _flat(tall, k):
        # The resident layout is tall (sublane-folded); unfold to flat
        # (K, N) slots so columns shard contiguously — and un-pair
        # pack16 storage back to standard slots, so the sharded XLA
        # workers stay layout-agnostic.
        f = unfold_ell_tall(np.asarray(tall), k)
        return unpair_ell16(f) if dg.ell_pack16 else f

    flat = _flat(dg.cross_ell, dg.ell_k)
    e, lw = _pad_cols(np.ascontiguousarray(flat), n_dev)
    col_shard = NamedSharding(mesh, P(None, STEP_AXES))
    repl = NamedSharding(mesh, P())
    ell2 = None
    mw = 0
    if dg.cross_ell2.size:
        flat2 = _flat(dg.cross_ell2, dg.ell_k2)
        e2, mw = _pad_cols(np.ascontiguousarray(flat2), n_dev)
        ell2 = jax.device_put(jnp.asarray(e2), col_shard)
    ell3 = None
    m2w = 0
    if dg.cross_ell3.size:
        flat3 = _flat(dg.cross_ell3, dg.ell_k3)
        e3, m2w = _pad_cols(np.ascontiguousarray(flat3), n_dev)
        ell3 = jax.device_put(jnp.asarray(e3), col_shard)
    heavy = None
    hw = 0
    rows = 0
    if dg.ell_heavy.size:
        h, hw = _pad_cols(np.asarray(dg.ell_heavy), n_dev)
        heavy = jax.device_put(jnp.asarray(h), col_shard)
        rows = h.shape[0]
    return ShardedEll(
        ell=jax.device_put(jnp.asarray(e), col_shard),
        ell2=ell2,
        ell3=ell3,
        heavy=heavy,
        heavy_res=jax.device_put(dg.ell_heavy_res, repl),
        heavy_res_col=jax.device_put(dg.ell_heavy_res_col, repl),
        light_width=lw,
        mid_width=mw,
        mid2_width=m2w,
        heavy_width=hw,
        num_paths=dg.num_paths,
        nibble_rows=rows,
    )


def sharded_ell_depth_fn(
    mesh: Mesh,
    has_heavy: bool = False,
    has_mid: bool = False,
    has_mid2: bool = False,
):
    """Mesh-wide masked (depth, uniq) over the tiered split ELL run
    index — the same zero-collective tensor parallelism as the sharded
    crossing matrix: every device reduces its own tier-1 (and tier-2)
    slot columns and (when present) its own heavy nibble columns; the
    replicated clip residual is range-filtered locally. Outputs stay
    segment-sharded, one (depth, uniq) pair per present class in
    ``ell_order`` order: (d1, u1[, d2, u2][, dh, uh])."""
    from ..kernels.crossmat import fold_mask, unpack_cross
    from ..kernels.ellscan import COUNT_BITS, COUNT_MAX

    def _tier(e, mask):
        pid = (e >> COUNT_BITS) & 0xFFFF  # zero-extend the path id
        cnt = e & COUNT_MAX
        m = jnp.zeros(1 << 16, jnp.int32).at[: mask.shape[0]].set(
            mask.astype(jnp.int32)
        )
        bit = m[pid]
        depth = jnp.sum(bit * cnt, axis=0)
        uniq = jnp.sum(bit * (e != 0).astype(jnp.int32), axis=0)
        return depth, uniq

    @jax.jit
    def query(*args):
        def worker(*wargs):
            mask = wargs[-1]
            i = 0
            outs = list(_tier(wargs[i], mask))
            i += 1
            if has_mid:
                outs += list(_tier(wargs[i], mask))
                i += 1
            if has_mid2:
                outs += list(_tier(wargs[i], mask))
                i += 1
            if has_heavy:
                h, res, res_col = wargs[i : i + 3]
                idx = jax.lax.axis_index(STEP_AXES)
                # Heavy nibble columns: bf16 dots, exact (counts <= 15).
                p_pad = h.shape[0] * 2
                mp = jnp.zeros(p_pad, jnp.int32).at[
                    : mask.shape[0]
                ].set(mask.astype(jnp.int32))
                af = unpack_cross(h).astype(jnp.bfloat16)
                mf = fold_mask(mp).astype(jnp.bfloat16)
                depth_h = jnp.dot(
                    mf, af, preferred_element_type=jnp.float32
                ).astype(jnp.int32)
                uniq_h = jnp.dot(
                    mf,
                    jnp.minimum(af, jnp.bfloat16(1)),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                if res_col.shape[0]:
                    fix = jnp.sum(
                        res * mp[:, None], axis=0, dtype=jnp.int32
                    )
                    # Remap out-of-range (incl. negative — they would
                    # WRAP, not drop) indices past the end.
                    w_h = h.shape[1]
                    local = res_col - idx * w_h
                    local = jnp.where(
                        (local >= 0) & (local < w_h), local, w_h
                    )
                    depth_h = depth_h.at[local].add(fix, mode="drop")
                outs += [depth_h, uniq_h]
            return tuple(outs)

        shard = P(None, STEP_AXES)
        in_specs = (
            [shard]
            + ([shard] if has_mid else [])
            + ([shard] if has_mid2 else [])
            + ([shard, P(), P()] if has_heavy else [])
            + [P()]
        )
        n_out = 2 + 2 * has_mid + 2 * has_mid2 + 2 * has_heavy
        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=tuple([P(STEP_AXES)] * n_out),
        )(*args)

    return query


def sharded_ell_depth_batch_fn(
    mesh: Mesh,
    has_heavy: bool = False,
    has_mid: bool = False,
    has_mid2: bool = False,
):
    """Mesh-wide BATCHED masked (depth, uniq) over the tiered split
    ELL index: ``masks`` is int[Q, P] (replicated); every device
    reduces its own tier slot columns for all Q queries at once and
    (when present) turns the heavy nibble columns into one
    (Q, P) x (P, local_NH) matmul — still zero collectives, outputs
    segment-sharded per class with a leading Q axis. The multi-chip
    form of production batch serving (single-chip: the fused
    masked_ell_splitn_depth_batch kernel)."""
    from ..kernels.crossmat import fold_mask, unpack_cross
    from ..kernels.ellscan import COUNT_BITS, COUNT_MAX

    def _tier_b(e, masks):
        pid = (e >> COUNT_BITS) & 0xFFFF
        cnt = e & COUNT_MAX
        m = (
            jnp.zeros((masks.shape[0], 1 << 16), jnp.int32)
            .at[:, : masks.shape[1]]
            .set(masks.astype(jnp.int32))
        )
        bit = jnp.take(m, pid, axis=1)  # (Q, K, W)
        depth = jnp.einsum("qkw,kw->qw", bit, cnt)
        uniq = jnp.einsum(
            "qkw,kw->qw", bit, (e != 0).astype(jnp.int32)
        )
        return depth, uniq

    @jax.jit
    def query(*args):
        def worker(*wargs):
            masks = wargs[-1]
            q = masks.shape[0]
            i = 0
            outs = list(_tier_b(wargs[i], masks))
            i += 1
            if has_mid:
                outs += list(_tier_b(wargs[i], masks))
                i += 1
            if has_mid2:
                outs += list(_tier_b(wargs[i], masks))
                i += 1
            if has_heavy:
                h, res, res_col = wargs[i : i + 3]
                idx = jax.lax.axis_index(STEP_AXES)
                p_pad = h.shape[0] * 2
                mp = (
                    jnp.zeros((q, p_pad), jnp.int32)
                    .at[:, : masks.shape[1]]
                    .set(masks.astype(jnp.int32))
                )
                af = unpack_cross(h).astype(jnp.bfloat16)
                mf = fold_mask(mp, axis=1).astype(jnp.bfloat16)
                depth_h = jnp.dot(
                    mf, af, preferred_element_type=jnp.float32
                ).astype(jnp.int32)
                uniq_h = jnp.dot(
                    mf,
                    jnp.minimum(af, jnp.bfloat16(1)),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                if res_col.shape[0]:
                    fix = jnp.einsum(
                        "qp,pk->qk",
                        mp,
                        res,
                        preferred_element_type=jnp.int32,
                    )
                    w_h = h.shape[1]
                    local = res_col - idx * w_h
                    local = jnp.where(
                        (local >= 0) & (local < w_h), local, w_h
                    )
                    depth_h = depth_h.at[:, local].add(fix, mode="drop")
                outs += [depth_h, uniq_h]
            return tuple(outs)

        shard = P(None, STEP_AXES)
        in_specs = (
            [shard]
            + ([shard] if has_mid else [])
            + ([shard] if has_mid2 else [])
            + ([shard, P(), P()] if has_heavy else [])
            + [P()]
        )
        n_out = 2 + 2 * has_mid + 2 * has_mid2 + 2 * has_heavy
        return jax.shard_map(
            worker,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=tuple([P(None, STEP_AXES)] * n_out),
        )(*args)

    return query


def compose_ell_parts_natural(
    dg: DeviceGraph,
    parts,
    has_mid: bool,
    has_heavy: bool,
    has_mid2: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reassemble a sharded (or single-device) tiered-ELL query's
    per-class part vectors into natural segment order on the host:
    slice each present class to its true size, append the empty
    class's zeros, and invert the ingest permutation ``ell_order``.
    ``parts`` is the flat (d, u) interleaving the sharded query
    returns: (d1, u1[, d2, u2][, d3, u3][, dh, uh])."""
    n = dg.num_segments
    counts = [dg.ell_num_light]
    if has_mid:
        counts.append(dg.ell_num_mid)
    if has_mid2:
        counts.append(dg.ell_num_mid2)
    if has_heavy:
        counts.append(dg.ell_num_heavy)
    d_parts = [np.asarray(parts[2 * i])[:c] for i, c in enumerate(counts)]
    u_parts = [
        np.asarray(parts[2 * i + 1])[:c] for i, c in enumerate(counts)
    ]
    ne = n - sum(counts)
    d_parts.append(np.zeros(ne, np.int64))
    u_parts.append(np.zeros(ne, np.int64))
    d = np.concatenate(d_parts)
    u = np.concatenate(u_parts)
    if not dg.ell_order.shape[0]:
        return d[:n], u[:n]
    order = np.asarray(dg.ell_order)
    d_nat = np.empty(n, np.int64)
    u_nat = np.empty(n, np.int64)
    d_nat[order] = d
    u_nat[order] = u
    return d_nat, u_nat


def full_mask(num_paths: int) -> jax.Array:
    """An all-paths mask (with the padding sentinel zeroed)."""
    return jnp.concatenate(
        [
            jnp.ones(num_paths, dtype=jnp.int32),
            jnp.zeros(1, dtype=jnp.int32),
        ]
    )
