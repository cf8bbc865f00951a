"""Node depth with the object API — the "pure Python over the
bindings" style (reference: flatgfa-py/examples/depth.py)."""

import os
import sys
from collections import Counter

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # run from a bare checkout

import pollen_tpu  # noqa: E402


def main(path: str) -> None:
    graph = pollen_tpu.parse(path)
    depths = Counter()
    for p in graph.paths:
        for step in p:
            depths[step.seg_id] += 1

    print("#node.id\tdepth")
    for seg in graph.segments:
        print("{}\t{}".format(seg.name, depths[seg.id]))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.path.join(HERE, "example.gfa"))
