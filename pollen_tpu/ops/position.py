"""Position lookup: bp offset along a path -> (segment, in-segment offset).

Reference semantics: flatgfa/src/ops/position.rs (linear walk). TPU
design: the walk becomes a prefix sum of step lengths plus a
``searchsorted`` — and the kernel is batched, answering many offsets in
one pass (the reference answers one per process run).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..device import DeviceGraph
from ..flatgfa import GraphArrays


@jax.jit
def positions_in_path(
    dg: DeviceGraph, path_id: jax.Array, offsets: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For each query offset along one path, the step's packed handle,
    the offset within that segment, and a validity flag.

    Returns (handles uint32[Q], seg_offsets int64[Q], valid bool[Q]).
    """
    lo = dg.path_bounds[path_id]
    hi = dg.path_bounds[path_id + 1]
    pos = jnp.arange(dg.num_steps, dtype=jnp.int32)
    in_path = (pos >= lo) & (pos < hi)
    step_seg = (dg.steps >> 1).astype(jnp.int32)
    lens = jnp.where(in_path, dg.seg_len[step_seg], 0).astype(jnp.int64)
    ends = jnp.cumsum(lens)  # cumulative bp along this path (global array)
    base = jnp.where(lo > 0, ends[jnp.maximum(lo - 1, 0)], 0)
    rel_ends = ends - base  # bp end of each step relative to path start

    total = jnp.where(hi > 0, ends[jnp.maximum(hi - 1, 0)], 0) - base
    valid = offsets < total

    # First step whose relative end exceeds the offset.
    idx = jnp.searchsorted(rel_ends, offsets, side="right")
    idx = jnp.clip(idx, lo, jnp.maximum(hi - 1, lo))
    starts = rel_ends[idx] - lens[idx]
    return dg.steps[idx], offsets - starts, valid


def run_position(
    g: GraphArrays, dg: DeviceGraph, path_name: str, offset: int
) -> Optional[str]:
    """CLI-style single lookup (reference: cli/cmds.rs position)."""
    pid = g.path_id_by_name(path_name.encode())
    if pid is None:
        raise KeyError(f"path not found: {path_name}")
    handles, seg_offs, valid = positions_in_path(
        dg,
        jnp.asarray(pid, dtype=jnp.int32),
        jnp.asarray([offset], dtype=jnp.int64),
    )
    if not bool(np.asarray(valid)[0]):
        return None
    handle = int(np.asarray(handles)[0])
    seg_off = int(np.asarray(seg_offs)[0])
    name = int(g.seg_name[handle >> 1])
    ori = "-" if handle & 1 else "+"
    return (
        "#source.path.pos\ttarget.graph.pos\n"
        f"{path_name},{offset},+\t{name},{seg_off},{ori}\n"
    )
