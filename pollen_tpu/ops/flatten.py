"""Flatten: linearize the graph into FASTA + BED (reference semantics:
slow_odgi/flatten.py; odgi flatten).

Device kernel: an exclusive scan of segment lengths gives every
segment's place in the linear FASTA space, and a gather maps each step
to its (start, end) interval. FASTA text is the seq_data pool itself
(segment sequences are already concatenated in id order after a parse).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..device import DeviceGraph
from ..flatgfa import GraphArrays


@jax.jit
def step_intervals(dg: DeviceGraph) -> Tuple[jax.Array, jax.Array]:
    """(start, end) of each step's segment in linear FASTA space."""
    lens = dg.seg_len.astype(jnp.int64)
    ends = jnp.cumsum(lens)
    starts = ends - lens
    step_seg = (dg.steps >> 1).astype(jnp.int32)
    return starts[step_seg], ends[step_seg]


def run_flatten(g: GraphArrays, dg: DeviceGraph, fasta_name: str) -> str:
    starts, ends = step_intervals(dg)
    starts, ends = np.asarray(starts), np.asarray(ends)

    # FASTA: all segment sequences glued in id order, wrapped at 80 cols.
    seq = b"".join(g.seq_data[lo:hi].tobytes() for lo, hi in g.seg_seq)
    out = [f">{fasta_name}"]
    text = seq.decode("ascii")
    out.extend(text[i : i + 80] for i in range(0, len(text), 80))

    out.append("#name\tstart\tend\tpath.name\tstrand\tstep.rank")
    rev = np.asarray(g.step_reverse).astype(bool)
    for p in range(g.num_paths):
        lo, hi = g.path_steps[p]
        pname = g.path_name_bytes(p).decode()
        for rank, s in enumerate(range(lo, hi)):
            ori = "-" if rev[s] else "+"
            out.append(
                f"{fasta_name}\t{starts[s]}\t{ends[s]}\t{pname}\t{ori}\t{rank}"
            )
    return "\n".join(out) + "\n"
