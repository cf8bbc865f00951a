"""Flat-arena tests: the vectorized parser and emitter against the spec
model and against raw round trips."""

import numpy as np
import pytest

from conftest import GOLDEN_DIR
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import (
    GFAParseError,
    GraphArrays,
    NameIndex,
    parse_gfa,
    parse_gfa_file,
    parse_uints,
    ragged_gather,
)
from pollen_tpu.spec.model import Graph


def test_ragged_gather():
    buf = np.frombuffer(b"abcdefgh", dtype=np.uint8)
    out = ragged_gather(buf, np.array([0, 4]), np.array([2, 3]))
    assert out.tobytes() == b"abefg"


def test_parse_uints():
    buf = np.frombuffer(b"123 7 456789", dtype=np.uint8)
    vals = parse_uints(buf, np.array([0, 4, 6]), np.array([3, 1, 6]))
    assert vals.tolist() == [123, 7, 456789]


def test_name_index_sequential():
    idx = NameIndex(np.array([1, 2, 3, 4], dtype=np.int64))
    assert idx.sequential
    assert idx.lookup(np.array([4, 1, 2])).tolist() == [3, 0, 1]


def test_name_index_sparse():
    idx = NameIndex(np.array([10, 3, 99], dtype=np.int64))
    assert not idx.sequential
    assert idx.lookup(np.array([99, 10, 3])).tolist() == [2, 0, 1]
    with pytest.raises(GFAParseError):
        idx.lookup(np.array([4]))


def test_roundtrip_preserved(graph_path):
    """parse -> emit(preserved) is byte-identical to the input file."""
    text = graph_path.read_text()
    g = parse_gfa_file(str(graph_path))
    assert emit_gfa(g, order="preserved") == text


def test_sorted_emission_matches_spec(graph_path):
    """emit(sorted) reproduces the spec's normalized emission exactly."""
    golden = (GOLDEN_DIR / f"{graph_path.stem}.norm").read_text()
    g = parse_gfa_file(str(graph_path))
    assert emit_gfa(g, order="sorted") == golden


def test_structure_matches_spec(graph_path):
    """Pool contents agree with the clarity-first model."""
    spec = Graph.parse_file(str(graph_path))
    g = parse_gfa_file(str(graph_path))
    g.validate_invariants()

    assert g.num_segments == len(spec.segments)
    assert g.num_paths == len(spec.paths)
    assert g.num_links == len(spec.links)
    assert g.num_steps == sum(len(p.steps) for p in spec.paths.values())

    # Segments in file order with matching names and sequences.
    spec_segs = list(spec.segments.values())
    for i in range(g.num_segments):
        assert str(g.seg_name[i]) == spec_segs[i].name
        assert g.seg_sequence(i).decode() == spec_segs[i].seq

    # Paths: names and decoded steps.
    name_to_id = {int(s.name): i for i, s in enumerate(spec_segs)}
    for p, (pname, path) in enumerate(spec.paths.items()):
        assert g.path_name_bytes(p).decode() == pname
        packed = g.path_step_slice(p)
        segs = (packed >> 1).astype(int).tolist()
        revs = (packed & 1).astype(bool).tolist()
        assert segs == [name_to_id[int(s.name)] for s in path.steps]
        assert revs == [not s.forward for s in path.steps]

    # Links: endpoints agree.
    for i, lnk in enumerate(spec.links):
        assert int(g.seg_name[g.link_from[i] >> 1]) == int(lnk.src.name)
        assert bool(g.link_from[i] & 1) == (not lnk.src.forward)
        assert int(g.seg_name[g.link_to[i] >> 1]) == int(lnk.dst.name)
        assert bool(g.link_to[i] & 1) == (not lnk.dst.forward)


def test_step_path_ids(graph_path):
    g = parse_gfa_file(str(graph_path))
    ids = g.step_path_ids()
    for p in range(g.num_paths):
        lo, hi = g.path_steps[p]
        assert (ids[lo:hi] == p).all()


def test_out_of_order_definitions():
    """Links and paths may reference segments defined later in the file."""
    text = "H\tVN:Z:1.0\nL\t2\t+\t1\t-\t0M\nP\tp\t2+,1+\t*\nS\t1\tAA\nS\t2\tCC\n"
    g = parse_gfa(text.encode())
    assert g.num_links == 1 and g.num_steps == 2
    assert emit_gfa(g, order="preserved") == text


def test_unknown_segment_rejected():
    with pytest.raises(GFAParseError):
        parse_gfa(b"S\t1\tAA\nP\tp\t1+,7+\t*\n")


def test_bad_line_kind_rejected():
    with pytest.raises(GFAParseError):
        parse_gfa(b"X\twat\n")


def test_empty_graph():
    g = parse_gfa(b"")
    assert g.num_segments == 0 and g.num_paths == 0
    assert emit_gfa(g) == ""
