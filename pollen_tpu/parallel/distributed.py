"""Multi-host orchestration: distributed init + host-sharded ingest.

The multi-host execution model (SURVEY.md §5, BASELINE north star):

1. ``jax.distributed.initialize`` connects the hosts.
2. Every host computes the same byte ranges of the GFA file and scans
   only its own (``loader.load_range``).
3. Hosts exchange their classified line blocks (small relative to the
   file: the exchange is the segment table + deferred L/P text) via the
   process-allgather utility, then each host materializes the same
   merged arena and its own shard of the sorted step index.
4. Queries run under ``shard_map`` with psum over ICI (sharded.py).

On a single host this degenerates to :func:`loader.load_gfa_sharded`.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..device import build_device_graph
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


def ingest(filename: str, mesh=None) -> ShardedGraph:
    """Load a GFA across the job and lay it out on the mesh.

    Each process scans its own byte range; the classified line blocks
    are exchanged so every process holds the same arena, and the step
    index is sharded over the mesh (device_put places only the local
    shard on this host's devices).
    """
    n_proc = jax.process_count()
    pid = jax.process_index()

    with open(filename, "rb") as f:
        f.seek(0, 2)
        size = f.tell()

    if n_proc == 1:
        arena = loader.load_gfa_sharded(filename, max(1, jax.device_count()))
    else:
        with open(filename, "rb") as f:
            data = f.read()
        ranges = loader.split_ranges(size, n_proc, data)
        mine = loader.load_range(filename, *ranges[pid])
        # Exchange the classified blocks; every host then merges the
        # same arena deterministically.
        from jax.experimental import multihost_utils

        gathered = multihost_utils.broadcast_one_to_all  # noqa: F841
        # NOTE: jax's utilities exchange arrays; the line blocks are
        # bytes, so they ride a uint8 allgather.
        import numpy as np

        def exchange(blob: bytes):
            import jax.numpy as jnp

            arr = np.frombuffer(blob, np.uint8)
            sizes = multihost_utils.process_allgather(
                jnp.asarray([arr.shape[0]])
            ).reshape(-1)
            pad = int(sizes.max())
            padded = np.zeros(pad, np.uint8)
            padded[: arr.shape[0]] = arr
            all_blobs = multihost_utils.process_allgather(
                jnp.asarray(padded)
            )
            return [
                bytes(np.asarray(all_blobs[i])[: int(sizes[i])])
                for i in range(n_proc)
            ]

        headers = exchange(mine.header)
        s_blocks = exchange(mine.s_lines)
        lp_blocks = exchange(mine.lp_lines)
        pieces = [
            loader.RangeLines(h, s, lp)
            for h, s, lp in zip(headers, s_blocks, lp_blocks)
        ]
        arena = loader.merge_ranges(pieces)

    mesh = mesh or make_mesh()
    dg = build_device_graph(arena)
    return shard_device_graph(dg, mesh)
