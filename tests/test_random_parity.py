"""Randomized engine-vs-spec parity: every query and transform compared
on generated graphs directly against the executable spec (no goldens)."""

import io

import pytest

from graphgen import random_graph
from pollen_tpu.device import build_device_graph
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import parse_gfa
from pollen_tpu.ops import degree as degree_op
from pollen_tpu.ops import depth as depth_op
from pollen_tpu.ops import transform
from pollen_tpu.ops.flatten import run_flatten
from pollen_tpu.ops.matrix import run_matrix
from pollen_tpu.ops.overlap import run_overlap
from pollen_tpu.ops.validate import run_validate
from pollen_tpu.spec import commands
from pollen_tpu.spec.model import Graph

SEEDS = [11, 12, 13]


@pytest.fixture(params=SEEDS)
def pair(request):
    text = random_graph(
        seed=request.param, n_segs=35, n_paths=7, n_frac=0.15, walk_len=30
    )
    g = parse_gfa(text.encode())
    spec = Graph.parse_lines(iter(text.splitlines()))
    return g, build_device_graph(g), spec


def spec_out(fn, spec, *args):
    buf = io.StringIO()
    fn(spec, buf, *args)
    return buf.getvalue()


def test_depth(pair):
    g, dg, spec = pair
    assert depth_op.run_seg_depth(g, dg) == spec_out(commands.depth, spec)


def test_depth_subset(pair):
    g, dg, spec = pair
    subset = list(spec.paths)[::2]
    assert depth_op.run_seg_depth(g, dg, subset) == spec_out(
        commands.depth, spec, subset
    )


def test_degree(pair):
    g, dg, spec = pair
    assert degree_op.run_degree(g, dg) == spec_out(commands.degree, spec)


def test_matrix(pair):
    g, dg, spec = pair
    assert run_matrix(g) == spec_out(commands.matrix, spec)


def test_flatten(pair):
    g, dg, spec = pair
    assert run_flatten(g, dg, "x.og") == spec_out(
        commands.flatten, spec, "x.og"
    )


def test_overlap(pair):
    g, dg, spec = pair
    paths = list(spec.paths)
    assert run_overlap(g, dg, paths) == spec_out(
        commands.overlap, spec, paths
    )


def test_validate(pair):
    g, dg, spec = pair
    assert run_validate(g) == spec_out(commands.validate, spec)


def _spec_emit(graph, include_links=True):
    buf = io.StringIO()
    graph.emit(buf, include_links)
    return buf.getvalue()


def test_crush(pair):
    g, _, spec = pair
    assert emit_gfa(transform.crush(g), order="sorted") == _spec_emit(
        commands.crush(spec)
    )


def test_flip(pair):
    g, dg, spec = pair
    out, keys = transform.flip(g, dg)
    assert emit_gfa(out, order="sorted", path_sort_keys=keys) == _spec_emit(
        commands.flip(spec)
    )


@pytest.mark.parametrize("limit", [1, 4])
def test_chop(pair, limit):
    g, _, spec = pair
    assert emit_gfa(
        transform.chop(g, limit), order="sorted", include_links=False
    ) == _spec_emit(commands.chop(spec, limit), include_links=False)
