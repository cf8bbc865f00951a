"""Depth over the clarity-first spec data model, reading GFA from
stdin (reference: mygfa/example.py)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pollen_tpu.spec.model import Graph  # noqa: E402


def print_depth(graph: Graph) -> None:
    # Count the crossings of every path through every segment.
    seg_depths = {name: 0 for name in graph.segments}
    for path in graph.paths.values():
        for step in path.steps:
            seg_depths[step.name] += 1

    print("seg\tdepth")
    for name, depth in seg_depths.items():
        print(f"{name}\t{depth}")


if __name__ == "__main__":
    print_depth(Graph.parse(sys.stdin))
