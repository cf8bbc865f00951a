"""Iterate a GAF file's reads and their per-segment chunk events
(reference: flatgfa-py/examples/gaf.py)."""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # run from a bare checkout

import pollen_tpu  # noqa: E402


def main(gfa: str, gaf: str) -> None:
    graph = pollen_tpu.parse(gfa)
    for line in graph.all_reads(gaf):
        print(line.name)
        print(line.sequence())
        print(line.segment_ranges())
        for element in line:
            print(element.handle)
            print(element.range)


if __name__ == "__main__":
    if len(sys.argv) == 3:
        main(sys.argv[1], sys.argv[2])
    else:
        main(os.path.join(HERE, "example.gfa"),
             os.path.join(HERE, "example.gaf"))
