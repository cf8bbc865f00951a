"""Pangenotype matrix for a graph plus a directory of GAF files
(reference: flatgfa-py/examples/matrix.py)."""

import pathlib
import sys
from itertools import islice

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pollen_tpu  # noqa: E402

FIRST_N = 100


def matrix_demo(gfa_path: str, gaf_dir: str) -> None:
    graph = pollen_tpu.parse(gfa_path)
    gaf = sorted(str(p) for p in pathlib.Path(gaf_dir).glob("*.gaf"))
    pangenotype_matrix = graph.make_pangenotype_matrix(gaf)

    assert len(pangenotype_matrix) == len(gaf)

    for gaf_path, row in zip(gaf, pangenotype_matrix):
        first_bits = islice(row, FIRST_N)
        print(pathlib.Path(gaf_path).name, *map(int, first_bits))


if __name__ == "__main__":
    if len(sys.argv) != 3:
        here = pathlib.Path(__file__).parent
        matrix_demo(str(here / "example.gfa"), str(here))
    else:
        matrix_demo(*sys.argv[1:])
