"""Native C++ GFA scanner vs the NumPy parser: bit-identical pools."""

import dataclasses

import numpy as np
import pytest

from pollen_tpu.flatgfa import parse_gfa
from pollen_tpu.native import native_available, parse_gfa_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="C++ toolchain unavailable"
)


def assert_same(a, b):
    assert b is not None
    for f in dataclasses.fields(a):
        va = np.asarray(getattr(a, f.name))
        vb = np.asarray(getattr(b, f.name))
        assert va.shape == vb.shape, f.name
        assert (va == vb).all(), f.name


def test_fixture_parity(graph_path):
    data = graph_path.read_bytes()
    assert_same(parse_gfa(data, native=False), parse_gfa_native(data))


def test_random_parity():
    from graphgen import big_step_graph, random_graph

    for seed in range(3):
        text = random_graph(seed=seed, n_segs=30, n_paths=5).encode()
        assert_same(parse_gfa(text, native=False), parse_gfa_native(text))
    text = big_step_graph(500, 20_000, 8, seed=2).encode()
    assert_same(parse_gfa(text, native=False), parse_gfa_native(text))


def test_overlap_columns_parity():
    text = (
        b"H\tVN:Z:1.0\nS\t1\tAA\nS\t2\tCC\n"
        b"P\tp\t1+,2-\t2M,1M1D\nP\tq\t2+\t*\n"
        b"L\t1\t+\t2\t-\t3M2N\nL\t2\t+\t1\t+\t*\n"
    )
    assert_same(parse_gfa(text, native=False), parse_gfa_native(text))


def test_out_of_order_parity():
    text = b"L\t2\t+\t1\t-\t0M\nP\tp\t2+,1+\t*\nS\t1\tAA\nS\t2\tCC\n"
    assert_same(parse_gfa(text, native=False), parse_gfa_native(text))


def test_sparse_names_parity():
    text = b"S\t10\tAA\nS\t3\tCC\nS\t99\tGG\nP\tp\t99+,10-,3+\t*\n"
    assert_same(parse_gfa(text, native=False), parse_gfa_native(text))


def test_emit_to_file_matches_emit(tmp_path, graph_path, monkeypatch):
    """The direct-to-file native emit == emit_gfa == the input bytes."""
    from pollen_tpu.emit import emit_gfa, emit_gfa_to_file

    monkeypatch.setenv("POLLEN_SCAN_THREADS", "3")
    data = graph_path.read_bytes()
    g = parse_gfa(data)
    out = tmp_path / "o.gfa"
    emit_gfa_to_file(g, str(out))
    assert out.read_bytes() == data
    assert emit_gfa(g, order="preserved").encode() == data


def test_multithreaded_shards_identical(monkeypatch):
    """The sharded parallel parse must be byte-identical to one shard,
    including CIGAR pools (link-then-path order) and sparse names."""
    from graphgen import big_step_graph, random_graph

    texts = [
        big_step_graph(400, 30_000, 7, seed=5).encode(),
        random_graph(
            seed=9, n_segs=64, n_paths=12, with_overlap_col=True
        ).encode(),
        # Sparse names force the hash-map path across shards.
        b"S\t10\tAA\nS\t3\tCC\nS\t99\tGG\n"
        b"P\tp\t99+,10-,3+\t*\nL\t10\t+\t3\t-\t2M\n",
    ]
    for text in texts:
        monkeypatch.setenv("POLLEN_SCAN_THREADS", "1")
        ref = parse_gfa_native(text)
        for nt in ("2", "3", "13"):
            monkeypatch.setenv("POLLEN_SCAN_THREADS", nt)
            assert_same(ref, parse_gfa_native(text))


@pytest.mark.parametrize("spare", [0.0, 0.5])
def test_convert_direct_to_file(tmp_path, graph_path, spare):
    """gfa_convert writes a file byte-identical to parse + save_flatgfa."""
    from pollen_tpu.fileformat import save_flatgfa
    from pollen_tpu.native import convert_gfa_native

    data = graph_path.read_bytes()
    native_out = tmp_path / "native.flatgfa"
    assert convert_gfa_native(data, str(native_out), spare)
    py_out = tmp_path / "python.flatgfa"
    save_flatgfa(str(py_out), parse_gfa(data, native=False), spare=spare)
    assert native_out.read_bytes() == py_out.read_bytes()


def test_convert_rejects_fall_back(tmp_path):
    from pollen_tpu.native import convert_gfa_native

    out = tmp_path / "x.flatgfa"
    assert not convert_gfa_native(b"X\twat\n", str(out))
    assert not out.exists()


def test_convert_write_failure_raises(tmp_path):
    from pollen_tpu.native import convert_gfa_native

    with pytest.raises(OSError):
        convert_gfa_native(b"S\t1\tAA\n", str(tmp_path / "no/dir/x.fgfa"))


def test_native_rejects_fall_back():
    # Unknown line kinds are a scanner error -> None (caller falls back
    # to the NumPy parser for the real diagnostics).
    assert parse_gfa_native(b"X\twat\n") is None
    assert parse_gfa_native(b"S\tabc\tAA\n") is None  # non-integer name
