"""Byte-range-sharded loading: distributed-parse arenas match direct
parses byte-for-byte, split points come from seeks (not full reads),
and the 2-process jax.distributed exchange actually executes."""

import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

from pollen_tpu.device import build_device_graph
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import parse_gfa_file
from pollen_tpu.ops.depth import seg_depth_with_uniq
from pollen_tpu.parallel.loader import (
    load_gfa_sharded,
    parse_range_file,
    split_ranges,
    split_ranges_file,
)


def test_split_ranges_alignment(tmp_path):
    data = b"aaa\nbbbb\ncc\ndddddd\ne\n"
    ranges = split_ranges(len(data), 3, data)
    assert ranges[0][0] == 0 and ranges[-1][1] == len(data)
    for lo, hi in ranges:
        assert lo == 0 or data[lo - 1 : lo] == b"\n"
    joined = b"".join(data[lo:hi] for lo, hi in ranges)
    assert joined == data
    # The file-based splitter (size-only seek + window reads) agrees.
    f = tmp_path / "x.txt"
    f.write_bytes(data)
    assert split_ranges_file(str(f), 3) == ranges


def _assert_arenas_identical(a, b):
    for field in dataclasses.fields(a):
        np.testing.assert_array_equal(
            getattr(a, field.name),
            getattr(b, field.name),
            err_msg=field.name,
        )


@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_sharded_load_matches_direct(graph_path, n):
    """Distributed-parse assembly is byte-identical to a direct parse:
    every pool equal, preserved-order emission equal."""
    direct = parse_gfa_file(str(graph_path))
    sharded = load_gfa_sharded(str(graph_path), n)
    _assert_arenas_identical(direct, sharded)
    assert emit_gfa(sharded, order="preserved") == emit_gfa(
        direct, order="preserved"
    )
    d1, u1 = seg_depth_with_uniq(build_device_graph(direct))
    d2, u2 = seg_depth_with_uniq(build_device_graph(sharded))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_parse_range_reads_only_its_slice(tmp_path):
    """Phase-1 parse work is O(range), not O(file): parse_range_file
    sees only its own bytes (asserted via the parsed pool contents)."""
    text = b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\nP\tp\t1+,3-\t*\n"
    f = tmp_path / "x.gfa"
    f.write_bytes(text)
    ranges = split_ranges_file(str(f), 3)
    sizes = [hi - lo for lo, hi in ranges]
    assert sum(sizes) == len(text)
    d0 = parse_range_file(str(f), *ranges[0])
    # The first range holds only its own segment lines.
    assert d0.seg_name.shape[0] < 3
    total = sum(
        parse_range_file(str(f), lo, hi).seg_name.shape[0]
        for lo, hi in ranges
    )
    assert total == 3


def test_cross_range_references(tmp_path):
    """A path in range 0 referencing segments defined in range 2 still
    resolves (the two-pass defer across shards)."""
    text = b"P\tp\t3+,1+\t*\n" + b"S\t1\tAA\n" * 1 + b"S\t2\tCC\nS\t3\tGG\n"
    f = tmp_path / "x.gfa"
    f.write_bytes(text)
    g = load_gfa_sharded(str(f), 3)
    assert g.num_paths == 1
    steps = g.path_step_slice(0)
    assert [int(g.seg_name[s >> 1]) for s in steps] == [3, 1]


def test_distributed_single_process(graph_path):
    """The distributed ingest path in its single-process degenerate mode."""
    from pollen_tpu.parallel import distributed, make_mesh, sharded_seg_depth_fn
    from pollen_tpu.parallel.sharded import full_mask

    mesh = make_mesh()
    sg = distributed.ingest(str(graph_path), mesh)
    query = sharded_seg_depth_fn(mesh)
    depth_m, uniq_m = query(sg, full_mask(sg.num_paths))

    direct = parse_gfa_file(str(graph_path))
    d1, u1 = seg_depth_with_uniq(build_device_graph(direct))
    # Distributed assembly preserves file-order ids, so results align
    # directly with the direct parse.
    np.testing.assert_array_equal(np.asarray(depth_m), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(uniq_m), np.asarray(u1))


_WORKER = r"""
import os, sys, json
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
gfa = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2

from pollen_tpu.parallel import distributed

arena = distributed.ingest_arena(gfa)
# Every host must assemble the identical arena from the exchange.
print(json.dumps({
    "pid": pid,
    "segs": int(arena.num_segments),
    "paths": int(arena.num_paths),
    "steps_sum": int(arena.steps.astype(np.int64).sum()),
    "seq": arena.seq_data.tobytes().decode(),
}), flush=True)
"""


def test_distributed_two_process_exchange(tmp_path):
    """REAL 2-process jax.distributed run (CPU): each process parses
    only its own byte range, the process_allgather exchange shares the
    name table + resolved pools, and both assemble the same arena."""
    import socket

    graph_path = (
        os.path.dirname(os.path.abspath(__file__)) + "/graphs/names.gfa"
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(graph_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    import json

    recs = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                recs[rec["pid"]] = rec
    assert set(recs) == {0, 1}
    direct = parse_gfa_file(str(graph_path))
    for rec in recs.values():
        assert rec["segs"] == direct.num_segments
        assert rec["paths"] == direct.num_paths
        assert rec["steps_sum"] == int(direct.steps.astype(np.int64).sum())
        assert rec["seq"] == direct.seq_data.tobytes().decode()
