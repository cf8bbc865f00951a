"""Spec-layer tests: model round trips + golden parity.

The goldens were cross-validated byte-for-byte against the reference
oracle (slow_odgi) when generated; here we pin the spec to them.
"""

import io
import subprocess
import sys

import pytest

from conftest import GOLDEN_DIR, GRAPH_DIR
from pollen_tpu.spec import commands
from pollen_tpu.spec.model import Bed, Cigar, Graph, Handle, Link, revcomp


def run_spec(args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "pollen_tpu.spec", *args],
        capture_output=True,
        text=True,
        input=stdin,
        check=True,
    ).stdout


# -- model basics -----------------------------------------------------------


def test_revcomp():
    assert revcomp("ACGTN") == "NACGT"
    assert revcomp("") == ""
    assert revcomp("GATTACA") == "TGTAATC"


def test_cigar_roundtrip():
    for text in ["0M", "3M1D2M", "10N", "5I"]:
        assert str(Cigar.parse(text)) == text


def test_link_canonicalization():
    ab = Link(Handle("2", True), Handle("1", False), Cigar.parse("0M"))
    assert str(ab) == "L\t1\t+\t2\t-\t0M"
    self_rev = Link(Handle("3", False), Handle("3", True), Cigar.parse("0M"))
    assert str(self_rev) == "L\t3\t-\t3\t+\t0M"


def test_parse_emit_roundtrip(graph_path):
    graph = Graph.parse_file(str(graph_path))
    out = io.StringIO()
    graph.emit(out)
    # Normalized emission is a fixpoint.
    again = Graph.parse(io.StringIO(out.getvalue()))
    out2 = io.StringIO()
    again.emit(out2)
    assert out.getvalue() == out2.getvalue()


# -- golden parity ----------------------------------------------------------

PRINTER_GOLDENS = [
    "depth",
    "degree",
    "matrix",
    "paths",
    "validate",
    "flatten",
    "overlap",
]

TRANSFORM_GOLDENS = ["norm", "crush", "flip", "chop", "inject"]


@pytest.mark.parametrize("kind", PRINTER_GOLDENS + TRANSFORM_GOLDENS)
def test_goldens(graph_path, kind):
    stem = graph_path.stem
    golden = (GOLDEN_DIR / f"{stem}.{kind}").read_text()
    graph = Graph.parse_file(str(graph_path))

    if kind == "depth":
        out = io.StringIO()
        commands.depth(graph, out)
    elif kind == "degree":
        out = io.StringIO()
        commands.degree(graph, out)
    elif kind == "matrix":
        out = io.StringIO()
        commands.matrix(graph, out)
    elif kind == "paths":
        out = io.StringIO()
        commands.paths(graph, out)
    elif kind == "validate":
        out = io.StringIO()
        commands.validate(graph, out)
    elif kind == "flatten":
        out = io.StringIO()
        commands.flatten(graph, out, f"tests/graphs/{stem}.og")
    elif kind == "overlap":
        out = io.StringIO()
        commands.overlap(graph, out, list(graph.paths))
    else:
        if kind == "norm":
            result = commands.norm(graph)
        elif kind == "crush":
            result = commands.crush(graph)
        elif kind == "flip":
            result = commands.flip(graph)
        elif kind == "chop":
            result = commands.chop(graph, 3)
        else:  # inject
            beds_text = (GOLDEN_DIR / f"{stem}.bed").read_text()
            beds = [Bed.parse(ln) for ln in beds_text.splitlines() if ln]
            result = commands.inject(graph, beds)
        out = io.StringIO()
        result.emit(out, kind not in ("chop", "inject"))

    assert out.getvalue() == golden


def test_depth_subset_golden(graph_path):
    stem = graph_path.stem
    golden = (GOLDEN_DIR / f"{stem}.depth_subset").read_text()
    subset = [
        ln
        for ln in (GOLDEN_DIR / f"{stem}.depthpaths").read_text().splitlines()
        if ln
    ]
    graph = Graph.parse_file(str(graph_path))
    out = io.StringIO()
    commands.depth(graph, out, subset)
    assert out.getvalue() == golden


def test_chop_preserves_paths(graph_path):
    graph = Graph.parse_file(str(graph_path))
    chopped = commands.chop(graph, 2)
    assert commands.paths_preserved(graph, chopped)


def test_cli_stdin_matches_file():
    gpath = GRAPH_DIR / "tiny.gfa"
    by_file = run_spec(["paths", str(gpath)])
    by_stdin = run_spec(["paths"], stdin=gpath.read_text())
    assert by_file == by_stdin
