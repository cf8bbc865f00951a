"""Fixed-dimension accelerator: JSON memories + PE kernel vs the spec
depth goldens (sequentially-named graphs, as the reference requires)."""

import json

import numpy as np
import pytest

from conftest import GOLDEN_DIR
from pollen_tpu.accel import (
    depth_json,
    graph_json,
    node_depth_accel,
    parse_depth_json,
)
from pollen_tpu.accel.datagen import (
    accel_dims,
    depth_table_from_outputs,
    graph_from_json,
)
from pollen_tpu.accel.kernel import run_accel
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import parse_gfa_file


def _sequential(g):
    return bool(
        g.num_segments
        and (g.seg_name == np.arange(1, g.num_segments + 1)).all()
    )


def test_accel_depth_matches_golden(graph_path):
    g = parse_gfa_file(str(graph_path))
    if not _sequential(g):
        pytest.skip("accelerator output table assumes 1..N node names")
    memories = depth_json(g)
    path_ids, consider = parse_depth_json(memories)
    depth, uniq = run_accel(path_ids, consider)
    golden = (GOLDEN_DIR / f"{graph_path.stem}.depth").read_text()
    assert depth_table_from_outputs(depth, uniq) == golden


def test_accel_subset_matches_golden(graph_path):
    g = parse_gfa_file(str(graph_path))
    if not _sequential(g):
        pytest.skip("accelerator output table assumes 1..N node names")
    subset = [
        ln
        for ln in (GOLDEN_DIR / f"{graph_path.stem}.depthpaths")
        .read_text()
        .splitlines()
        if ln
    ]
    memories = depth_json(g, subset_paths=subset)
    path_ids, consider = parse_depth_json(memories)
    depth, uniq = run_accel(path_ids, consider)
    golden = (GOLDEN_DIR / f"{graph_path.stem}.depth_subset").read_text()
    assert depth_table_from_outputs(depth, uniq) == golden


def test_memory_layout():
    g = parse_gfa_file("tests/graphs/tiny.gfa")
    data = json.loads(depth_json(g, max_n=6, max_e=4, max_p=3))
    # Padded node memories exist for absent nodes 5..6.
    assert data["path_ids5"]["data"] == [0, 0, 0, 0]
    # Node 1 is crossed by both paths (ids 1 and 2).
    assert data["path_ids1"]["data"] == [1, 2, 0, 0]
    assert data["paths_to_consider1"]["data"] == [0, 1, 1, 1]
    assert data["depth_output"]["data"] == [0] * 6
    assert data["path_ids1"]["format"]["numeric_type"] == "bitnum"


def test_oversized_dims():
    g = parse_gfa_file("tests/graphs/tiny.gfa")
    n, e, p = accel_dims(g)
    memories = depth_json(g, max_n=n + 3, max_e=e + 5, max_p=p)
    path_ids, consider = parse_depth_json(memories)
    depth, uniq = run_accel(path_ids, consider)
    assert (depth[n:] == 0).all() and (uniq[n:] == 0).all()
    golden = open("tests/golden/tiny.depth").read().strip().splitlines()[1:]
    for i, line in enumerate(golden):
        _, d, u = line.split("\t")
        assert (depth[i], uniq[i]) == (int(d), int(u))


def test_graph_json_roundtrip(graph_path):
    g = parse_gfa_file(str(graph_path))
    again = graph_from_json(graph_json(g))
    assert emit_gfa(again, order="sorted") == emit_gfa(
        g, order="sorted", path_sort_keys=None
    ).replace("\t7M,2M,4M,1M,10M,1M", "\t*")  # overlaps not serialized


def test_single_pe_variant_matches_batched(graph_path):
    """The time-shared single-PE scan (reference: processing-elements/
    calyx_depth_simple.py) computes exactly what the PE array does."""
    from pollen_tpu.accel.kernel import (
        node_depth_accel,
        node_depth_accel_simple,
    )

    g = parse_gfa_file(str(graph_path))
    memories = depth_json(g, *accel_dims(g))
    path_ids, consider = parse_depth_json(memories)
    max_p = consider.shape[0] - 1
    d0, u0 = node_depth_accel(path_ids, consider, max_p)
    d1, u1 = node_depth_accel_simple(path_ids, consider, max_p)
    assert np.array_equal(np.asarray(d0), np.asarray(d1))
    assert np.array_equal(np.asarray(u0), np.asarray(u1))
