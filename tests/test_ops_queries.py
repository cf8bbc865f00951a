"""Phase-2 query ops (flatten, matrix, overlap, validate, position,
stats) vs goldens and the spec."""

import numpy as np
import pytest

from conftest import GOLDEN_DIR
from pollen_tpu.device import build_device_graph
from pollen_tpu.flatgfa import parse_gfa, parse_gfa_file
from pollen_tpu.ops.flatten import run_flatten
from pollen_tpu.ops.matrix import run_matrix
from pollen_tpu.ops.overlap import run_overlap
from pollen_tpu.ops.position import run_position
from pollen_tpu.ops.validate import run_stats, run_validate
from pollen_tpu.spec.model import Graph, step_seq


@pytest.fixture()
def arena(graph_path):
    g = parse_gfa_file(str(graph_path))
    return g, build_device_graph(g)


def test_flatten_matches_golden(graph_path, arena):
    g, dg = arena
    golden = (GOLDEN_DIR / f"{graph_path.stem}.flatten").read_text()
    assert run_flatten(g, dg, f"tests/graphs/{graph_path.stem}.og") == golden


def test_matrix_matches_golden(graph_path, arena):
    g, _ = arena
    golden = (GOLDEN_DIR / f"{graph_path.stem}.matrix").read_text()
    assert run_matrix(g) == golden


def test_overlap_matches_golden(graph_path, arena):
    g, dg = arena
    golden = (GOLDEN_DIR / f"{graph_path.stem}.overlap").read_text()
    all_paths = [g.path_name_bytes(i).decode() for i in range(g.num_paths)]
    assert run_overlap(g, dg, all_paths) == golden


def test_validate_matches_golden(graph_path, arena):
    g, dg = arena
    golden = (GOLDEN_DIR / f"{graph_path.stem}.validate").read_text()
    assert run_validate(g) == golden


def test_validate_broken_matches_golden(graph_path):
    golden = (GOLDEN_DIR / f"{graph_path.stem}.validate_broken").read_text()
    broken = (GOLDEN_DIR / f"{graph_path.stem}.validate_setup").read_text()
    g = parse_gfa(broken.encode())
    assert run_validate(g) == golden


def test_stats(arena):
    g, _ = arena
    table = run_stats(g)
    header, row = table.strip().split("\n")
    assert header == "#length\tnodes\tedges\tpaths\tsteps"
    vals = [int(v) for v in row.split("\t")]
    assert vals == [
        g.seq_data.shape[0],
        g.num_segments,
        g.num_links,
        g.num_paths,
        g.num_steps,
    ]


def test_stats_self_loops():
    g = parse_gfa(
        b"S\t1\tA\nS\t2\tC\nL\t1\t+\t1\t+\t0M\nL\t1\t+\t1\t-\t0M\nL\t1\t+\t2\t+\t0M\n"
    )
    assert run_stats(g, self_loops=True) == "#type\tnum\ntotal\t2\nunique\t1\n"


def test_position_against_spec(graph_path, arena):
    """Every valid offset of every path maps to the segment the spec's
    linear walk reaches."""
    g, dg = arena
    spec = Graph.parse_file(str(graph_path))
    for pname, path in list(spec.paths.items())[:3]:
        walk = 0
        spots = {}  # offset -> (segment name, in-seg offset)
        for h in path.steps:
            length = len(spec.segments[h.name].seq)
            for k in range(length):
                spots[walk + k] = (h.name, k)
            walk += length
        for offset in list(spots)[:: max(1, len(spots) // 7)]:
            res = run_position(g, dg, pname, offset)
            assert res is not None
            tgt = res.strip().split("\n")[1].split("\t")[1]
            seg_name, seg_off, _ = tgt.split(",")
            assert (seg_name, int(seg_off)) == spots[offset]
        assert run_position(g, dg, pname, walk) is None  # one past the end
