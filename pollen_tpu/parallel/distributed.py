"""Multi-host orchestration: distributed init + host-sharded ingest.

The multi-host execution model (SURVEY.md §5, BASELINE north star):

1. ``jax.distributed.initialize`` connects the hosts.
2. Every host computes the same newline-aligned byte ranges from the
   GFA's *size* (size-only seeks — no host reads the whole file) and
   parses only its own range into range-local pools
   (``loader.parse_range_file``): O(file / n_hosts) parse work each.
3. One small exchange shares the per-range segment-name tables; every
   host resolves its own links/steps against the global name index
   (O(local)), then a second exchange shares the resolved pools — the
   hosts never exchange or re-parse raw GFA text.
4. Each host assembles the same arena by array concatenation
   (``flatgfa.merge_resolved``) and lays its shard of the sorted step
   index onto its devices; queries run under ``shard_map`` with psum
   over ICI (sharded.py).

Reference analogue: flatgfa/src/memfile.rs:65-117's rayon split-parse,
generalized to hosts. On a single host this degenerates to
:func:`loader.load_gfa_sharded`.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from ..device import build_device_graph
from ..flatgfa import NameIndex
from . import loader
from .sharded import ShardedGraph, make_mesh, shard_device_graph


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this host to the job (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def exchange_blobs(blob: bytes, n_proc: int) -> List[bytes]:
    """All-gather one byte blob per process (padded uint8 allgather —
    jax's multihost utilities exchange arrays, not bytes)."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    arr = np.frombuffer(blob, np.uint8)
    sizes = multihost_utils.process_allgather(
        jnp.asarray([arr.shape[0]])
    ).reshape(-1)
    pad = int(sizes.max())
    padded = np.zeros(pad, np.uint8)
    padded[: arr.shape[0]] = arr
    all_blobs = multihost_utils.process_allgather(jnp.asarray(padded))
    return [
        bytes(np.asarray(all_blobs[i])[: int(sizes[i])])
        for i in range(n_proc)
    ]


def ingest_arena(filename: str):
    """Distributed phase-1/2 load: returns the merged GraphArrays
    (identical on every host; each host parsed only its own range)."""
    n_proc = jax.process_count()
    pid = jax.process_index()

    if n_proc == 1:
        return loader.load_gfa_sharded(
            filename, max(1, jax.device_count())
        )

    ranges = loader.split_ranges_file(filename, n_proc)
    mine = loader.parse_range_file(filename, *ranges[pid])

    # Exchange 1: segment-name tables (small — the resolution input).
    name_blobs = exchange_blobs(mine.seg_name.tobytes(), n_proc)
    all_names = np.concatenate(
        [np.frombuffer(b, np.int64) for b in name_blobs]
    )
    names = NameIndex(all_names)
    resolved = loader.resolve_deferred(mine, names)

    # Exchange 2: resolved pools (binary arrays, not GFA text).
    pool_blobs = exchange_blobs(loader.resolved_to_blob(resolved), n_proc)
    pieces = [loader.resolved_from_blob(b) for b in pool_blobs]
    return loader.merge_resolved(pieces)


def ingest(filename: str, mesh=None) -> ShardedGraph:
    """Load a GFA across the job and lay it out on the mesh.

    Each process parses its own byte range; pools are exchanged so
    every process holds the same arena, and the step index is sharded
    over the mesh (device_put places only the local shard on this
    host's devices).
    """
    arena = ingest_arena(filename)
    mesh = mesh or make_mesh()
    dg = build_device_graph(arena)
    return shard_device_graph(dg, mesh)
