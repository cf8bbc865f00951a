"""Byte-range-sharded GFA loading for multi-host ingest.

Reference analogue: the rayon ``MemchrSplit`` newline splitter
(flatgfa/src/memfile.rs:33-117) generalized to per-host byte ranges, as
SURVEY.md §5 prescribes: each host parses its own slice of the file, and
the two-pass defer trick (segments first, then links/paths against the
complete name table) is done *across* shards — phase 1 concatenates
every shard's S lines, phase 2 resolves each shard's L/P lines against
the merged segment table.

In a real multi-host job each host calls :func:`load_range` for its own
range (the ranges are computed identically everywhere from the file
size) and exchanges segment tables; in this repo the same code paths
are exercised single-process over all ranges (see
:func:`load_gfa_sharded`).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..flatgfa import GraphArrays, parse_gfa


def split_ranges(size: int, n: int, data: bytes) -> List[Tuple[int, int]]:
    """Split [0, size) into n ranges aligned to newline boundaries.

    Every host computes the same ranges from the same inputs; boundaries
    snap forward to the next newline so no line straddles two ranges.
    """
    if size == 0:
        return [(0, 0)] * n
    bounds = [0]
    for i in range(1, n):
        target = (size * i) // n
        nl = data.find(b"\n", target)
        bounds.append(size if nl < 0 else nl + 1)
    bounds.append(size)
    # Snapping can make ranges empty near the end; that's fine.
    return list(zip(bounds[:-1], bounds[1:]))


@dataclasses.dataclass
class RangeLines:
    """One byte range's lines, classified by kind."""

    header: bytes
    s_lines: bytes
    lp_lines: bytes  # links and paths, in range order


def scan_range(data: bytes) -> RangeLines:
    """Classify the lines of one byte range (vectorized)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    newlines = np.flatnonzero(buf == 10)
    starts = np.concatenate(([0], newlines + 1))
    ends = np.concatenate((newlines, [buf.shape[0]]))
    keep = ends > starts
    starts, ends = starts[keep], ends[keep]
    kinds = buf[starts] if starts.size else np.zeros(0, np.uint8)

    def gather(mask):
        from ..flatgfa import ragged_gather

        lens = ends[mask] - starts[mask] + 1  # keep the newline
        lens = np.minimum(lens, buf.shape[0] - starts[mask])
        out = ragged_gather(buf, starts[mask], lens)
        text = out.tobytes()
        if text and not text.endswith(b"\n"):
            text += b"\n"
        return text

    return RangeLines(
        header=gather(kinds == ord("H")),
        s_lines=gather(kinds == ord("S")),
        lp_lines=gather((kinds == ord("L")) | (kinds == ord("P"))),
    )


def merge_ranges(ranges: List[RangeLines]) -> GraphArrays:
    """Two-pass merge: all shards' segments first, then links/paths."""
    header = next((r.header for r in ranges if r.header), b"")
    text = (
        header
        + b"".join(r.s_lines for r in ranges)
        + b"".join(r.lp_lines for r in ranges)
    )
    return parse_gfa(text)


def load_range(filename: str, lo: int, hi: int) -> RangeLines:
    """Scan one byte range of a file (a single host's phase-1 work)."""
    with open(filename, "rb") as f:
        f.seek(lo)
        return scan_range(f.read(hi - lo))


def load_gfa_sharded(filename: str, n_ranges: int) -> GraphArrays:
    """Load a GFA by splitting it into n byte ranges and merging.

    Single-process driver for the multi-host flow; each range's scan is
    independent work (one host each in a distributed job).
    """
    with open(filename, "rb") as f:
        data = f.read()
    ranges = split_ranges(len(data), n_ranges, data)
    scanned = [scan_range(data[lo:hi]) for lo, hi in ranges]
    return merge_ranges(scanned)
