"""Engine inject vs spec goldens; engine extract vs the spec's clarity
model."""

import io

import numpy as np
import pytest

from conftest import GOLDEN_DIR
from pollen_tpu.bed import parse_bed
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import parse_gfa, parse_gfa_file
from pollen_tpu.ops.extract import extract as engine_extract
from pollen_tpu.ops.inject import inject as engine_inject
from pollen_tpu.spec import commands
from pollen_tpu.spec.model import Graph


def test_inject_matches_golden(graph_path):
    golden = (GOLDEN_DIR / f"{graph_path.stem}.inject").read_text()
    bed_text = (GOLDEN_DIR / f"{graph_path.stem}.bed").read_text()
    g = parse_gfa_file(str(graph_path))
    out = engine_inject(g, parse_bed(bed_text.encode()))
    assert emit_gfa(out, order="sorted", include_links=False) == golden


def test_inject_midsegment_cut():
    g = parse_gfa(
        b"S\t1\tAAAA\nS\t2\tCCCC\nP\tp\t1+,2+\t*\nL\t1\t+\t2\t+\t0M\n"
    )
    out = engine_inject(g, parse_bed(b"p\t2\t6\tmid\n"))
    text = emit_gfa(out, order="sorted", include_links=False)
    # Segment 1 splits at 2, segment 2 (now 3) splits at 2; the new
    # path covers the two middle pieces.
    assert "P\tmid\t2+,3+\t*" in text
    assert "S\t1\tAA" in text and "S\t2\tAA" in text
    assert "S\t3\tCC" in text and "S\t4\tCC" in text


def _spec_vs_engine(gfa_text: str, seg: str, dist: int, **kw):
    spec_graph = Graph.parse_lines(iter(gfa_text.splitlines()))
    spec_out = commands.extract(spec_graph, seg, dist, **kw)
    buf = io.StringIO()
    spec_out.emit(buf)

    g = parse_gfa(gfa_text.encode())
    eng = engine_extract(g, int(seg), dist, **kw)
    return buf.getvalue(), emit_gfa(eng, order="sorted")


def test_extract_simple():
    text = (
        "H\tVN:Z:1.0\n"
        "S\t1\tAA\nS\t2\tCC\nS\t3\tGG\nS\t4\tTT\nS\t5\tAT\n"
        "P\tp\t1+,2+,3+,4+,5+\t*\n"
        "L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
        "L\t3\t+\t4\t+\t0M\nL\t4\t+\t5\t+\t0M\n"
    )
    spec_text, engine_text = _spec_vs_engine(text, "3", 1)
    assert spec_text == engine_text
    assert "S\t2\tCC" in engine_text and "S\t4\tTT" in engine_text
    assert "S\t1\tAA" not in engine_text
    # Subpath naming: the p run over segments 2,3,4 starts at bp 2.
    assert "P\tp:2-8\t2+,3+,4+\t*" in engine_text


def test_extract_gap_merge():
    # Path visits the neighborhood, leaves through a short gap, returns:
    # the gap segments get merged in.
    text = (
        "S\t1\tAA\nS\t2\tC\nS\t3\tGG\n"
        "P\tp\t1+,2+,1-,3+\t*\n"
        "L\t1\t+\t2\t+\t0M\nL\t2\t+\t1\t-\t0M\nL\t1\t-\t3\t+\t0M\n"
    )
    spec_text, engine_text = _spec_vs_engine(text, "1", 0)
    assert spec_text == engine_text


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dist", [0, 1, 2])
def test_extract_random_matches_spec(seed, dist):
    from graphgen import random_graph

    text = random_graph(n_segs=25, n_paths=5, seed=seed, n_frac=0.0)
    spec_text, engine_text = _spec_vs_engine(text, "7", dist)
    assert spec_text == engine_text


@pytest.mark.parametrize("maxd", [0, 6, 1000])
def test_extract_merge_bounds_match_spec(maxd):
    from graphgen import random_graph

    text = random_graph(n_segs=30, n_paths=6, seed=9, n_frac=0.0)
    spec_text, engine_text = _spec_vs_engine(
        text, "5", 1, max_distance_subpaths=maxd, num_iterations=3
    )
    assert spec_text == engine_text
