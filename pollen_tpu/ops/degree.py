"""Degree query: incident link endpoints per segment.

Semantics follow the spec (reference: slow_odgi/degree.py): each link
contributes one out-endpoint and one in-endpoint, and a segment's degree
counts both of its orientations — so degree[s] = #(from-endpoints on s)
+ #(to-endpoints on s). Device side this is a histogram over the
endpoint-sorted index built at ingest.
"""

from __future__ import annotations

import jax
import numpy as np

from ..device import DeviceGraph
from ..flatgfa import GraphArrays


@jax.jit
def seg_degree(dg: DeviceGraph) -> jax.Array:
    """Degree per segment: int32[N] — a boundary difference over the
    endpoint histogram built at ingest."""
    return dg.link_seg_bounds[1:] - dg.link_seg_bounds[:-1]


def degree_table(g: GraphArrays, degrees: np.ndarray) -> str:
    names = g.seg_name.astype("U20")
    body = [f"{n}\t{d}" for n, d in zip(names, np.asarray(degrees))]
    return "\n".join(["#node.id\tnode.degree"] + body) + "\n"


def run_degree(g: GraphArrays, dg: DeviceGraph) -> str:
    return degree_table(g, np.asarray(seg_degree(dg)))
