"""Transform ops (crush, flip, chop) vs spec goldens."""

import numpy as np
import pytest

from conftest import GOLDEN_DIR
from pollen_tpu.device import build_device_graph
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import parse_gfa, parse_gfa_file
from pollen_tpu.ops import transform


@pytest.fixture()
def arena(graph_path):
    return parse_gfa_file(str(graph_path))


def test_crush_matches_golden(graph_path, arena):
    golden = (GOLDEN_DIR / f"{graph_path.stem}.crush").read_text()
    out = transform.crush(arena)
    assert emit_gfa(out, order="sorted") == golden


def test_flip_matches_golden(graph_path, arena):
    golden = (GOLDEN_DIR / f"{graph_path.stem}.flip").read_text()
    dg = build_device_graph(arena)
    out, sort_keys = transform.flip(arena, dg)
    assert emit_gfa(out, order="sorted", path_sort_keys=sort_keys) == golden


def test_chop_matches_golden(graph_path, arena):
    golden = (GOLDEN_DIR / f"{graph_path.stem}.chop").read_text()
    out = transform.chop(arena, 3)
    assert (
        emit_gfa(out, order="sorted", include_links=False) == golden
    )


def test_chop_roundtrips_through_parse(graph_path, arena):
    """Chop output re-emitted and re-parsed is stable (valid arena)."""
    out = transform.chop(arena, 2)
    text = emit_gfa(out, order="sorted", include_links=False)
    again = parse_gfa(text.encode())
    assert emit_gfa(again, order="sorted", include_links=False) == text


def test_chop_with_links():
    """Bridge + rewired links (fgfa `chop -l` semantics,
    reference: ops/chop.rs)."""
    g = parse_gfa(
        b"S\t1\tAAAA\nS\t2\tC\nS\t3\tGGGGG\n"
        b"P\tp\t1+,2+,3-\t*\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t-\t0M\n"
    )
    out = transform.chop(g, 2, with_links=True)
    # Segments: 1 -> {1,2}, 2 -> {3}, 3 -> {4,5,6}.
    assert out.seg_name.tolist() == [1, 2, 3, 4, 5, 6]
    lines = set()
    from pollen_tpu.emit import link_lines

    for ln in link_lines(out):
        lines.add(ln)
    # Bridges within chopped segments.
    assert "L\t1\t+\t2\t+\t0M" in lines
    assert "L\t4\t+\t5\t+\t0M" in lines
    assert "L\t5\t+\t6\t+\t0M" in lines
    # Rewired: old 1+->2+ becomes last-of-1 (2+) -> first-of-2 (3+);
    # old 2+ -> 3- becomes 3+ -> last-of-3 reversed (6-).
    assert "L\t2\t+\t3\t+\t0M" in lines
    assert "L\t3\t+\t6\t-\t0M" in lines


def test_flip_idempotent_on_forward_graph():
    g = parse_gfa(b"S\t1\tAC\nS\t2\tGT\nP\tp\t1+,2+\t*\nL\t1\t+\t2\t+\t0M\n")
    dg = build_device_graph(g)
    out, _ = transform.flip(g, dg)
    assert np.array_equal(out.steps, g.steps)
    assert out.path_name_bytes(0) == b"p"


def test_crush_empty_and_all_n():
    g = parse_gfa(b"S\t1\tNNNN\nS\t2\tNN\nP\tp\t1+,2+\t*\n")
    out = transform.crush(g)
    assert out.seg_sequence(0) == b"N"
    assert out.seg_sequence(1) == b"N"
