"""GAF chunking, pangenotype, FlatBED intersection, window depth."""

import numpy as np
import pytest

from pollen_tpu.bed import parse_bed, run_bed_intersect, windows_bed
from pollen_tpu.device import build_device_graph
from pollen_tpu.flatgfa import parse_gfa
from pollen_tpu.ops.gaf import (
    KIND_ALL,
    KIND_NONE,
    KIND_PARTIAL,
    chunk_events,
    parse_gaf,
    run_gaf_lookup,
    run_pangenotype,
)
from pollen_tpu.ops.window_depth import run_window_depth

GFA = (
    b"H\tVN:Z:1.0\n"
    b"S\t1\tAAAA\nS\t2\tCCC\nS\t3\tGGGGG\nS\t4\tTT\n"
    b"P\tp\t1+,2+,3+,4+\t*\n"
    b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
)


def spec_chunker(seg_lens, steps, start, end):
    """Readable re-statement of the reference PathChunker state machine
    (reference: gaf.rs PathChunker::next)."""
    out = []
    pos = 0
    started = ended = False
    for seg, rev in steps:
        seg_len = seg_lens[seg]
        nxt = pos + seg_len
        if not started and start < nxt:
            started = True
            if end < nxt:
                ended = True
                out.append((KIND_PARTIAL, start - pos, end - pos))
            else:
                out.append((KIND_PARTIAL, start - pos, seg_len))
        elif started and not ended and end < nxt:
            ended = True
            out.append((KIND_PARTIAL, 0, end - pos))
        elif started and not ended:
            out.append((KIND_ALL, 0, seg_len))
        else:
            out.append((KIND_NONE, 0, 0))
        pos = nxt
    return out


def _graph():
    g = parse_gfa(GFA)
    return g, build_device_graph(g)


def test_gaf_parse_and_chunks():
    g, dg = _graph()
    gaf = b"read1\t14\t0\t14\t+\t>1>2>3>4\t14\t2\t9\t9\t9\t60\n"
    reads = parse_gaf(gaf, g.seg_id_by_name())
    assert reads.num_reads == 1
    assert reads.read_name(0) == b"read1"
    assert reads.start[0] == 2 and reads.end[0] == 9
    read_id, kind, a, b = chunk_events(g, dg, reads)
    # Segments: 4, 3, 5, 2 bp. Interval [2, 9):
    #  step0: starts at 2 (partial 2-4), step1: all, step2: ends (0-2),
    #  step3: skipped.
    assert kind.tolist() == [KIND_PARTIAL, KIND_ALL, KIND_PARTIAL, KIND_NONE]
    assert (a[0], b[0]) == (2, 4)
    assert (a[2], b[2]) == (0, 2)


def test_gaf_lookup_text():
    g, dg = _graph()
    gaf = b"r\t14\t0\t14\t+\t>1<2\t7\t1\t6\t5\t5\t60\n"
    reads = parse_gaf(gaf, g.seg_id_by_name())
    text = run_gaf_lookup(g, dg, reads)
    assert text.startswith("r\n")
    assert "0: 1+, 1-4bp" in text
    assert "1: 2-, 0-2bp" in text


def test_gaf_lookup_seqs_mode():
    g, dg = _graph()
    # Read over 1+ then 2- : oriented seqs AAAA then GGG.
    gaf = b"r\t7\t0\t7\t+\t>1<2\t7\t0\t7\t7\t7\t60\n"
    reads = parse_gaf(gaf, g.seg_id_by_name())
    text = run_gaf_lookup(g, dg, reads, seqs=True)
    assert text == "r\tAAAAGGG\n"


def test_gaf_bench_mode_counts():
    g, dg = _graph()
    gaf = b"r1\t1\t0\t1\t+\t>1>2\t7\t0\t7\t7\t7\t60\nr2\t1\t0\t1\t+\t>3\t5\t0\t5\t5\t5\t60\n"
    reads = parse_gaf(gaf, g.seg_id_by_name())
    assert run_gaf_lookup(g, dg, reads, bench=True) == "3\n"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_chunker_matches_spec_random(seed):
    rng = np.random.default_rng(seed)
    n = 12
    seg_lens = {i: int(rng.integers(1, 9)) for i in range(n)}
    gfa_lines = ["H\tVN:Z:1.0"]
    for i in range(n):
        gfa_lines.append(f"S\t{i + 1}\t" + "A" * seg_lens[i])
    gfa_lines.append("P\tp\t1+\t*")
    g = parse_gfa(("\n".join(gfa_lines) + "\n").encode())
    dg = build_device_graph(g)

    lines = []
    expected = []
    for r in range(6):
        k = int(rng.integers(1, 8))
        segs = rng.integers(0, n, k)
        revs = rng.integers(0, 2, k)
        total = sum(seg_lens[int(s)] for s in segs)
        start = int(rng.integers(0, max(total, 1)))
        end = int(rng.integers(start + 1, total + 1))
        path = "".join(
            f"{'<' if rv else '>'}{int(s) + 1}" for s, rv in zip(segs, revs)
        )
        lines.append(
            f"r{r}\t{total}\t0\t{total}\t+\t{path}\t{total}\t{start}\t{end}\t1\t1\t60"
        )
        expected.extend(
            spec_chunker(
                seg_lens, [(int(s), int(rv)) for s, rv in zip(segs, revs)],
                start, end,
            )
        )
    reads = parse_gaf(("\n".join(lines) + "\n").encode(), g.seg_id_by_name())
    _, kind, a, b = chunk_events(g, dg, reads)
    for i, (ek, ea, eb) in enumerate(expected):
        assert kind[i] == ek, (i, kind[i], ek)
        if ek == KIND_PARTIAL:
            assert (a[i], b[i]) == (ea, eb)


def test_gaf_stream_matches_slurp(tmp_path):
    """Windowed streaming produces byte-identical output to the
    in-memory path, across window boundaries mid-file."""
    from pollen_tpu.ops.gaf import parse_gaf_file, run_gaf_lookup_stream

    g, dg = _graph()
    lines = []
    for i in range(50):
        lines.append(f"r{i}\t14\t0\t14\t+\t>1>2<3\t12\t{i % 5}\t9\t9\t9\t60")
    path = tmp_path / "reads.gaf"
    path.write_text("\n".join(lines) + "\n")

    reads = parse_gaf_file(str(path), g)
    whole = run_gaf_lookup(g, dg, reads)
    for window in (64, 256, 1 << 20):
        streamed = "".join(
            run_gaf_lookup_stream(g, dg, str(path), window_bytes=window)
        )
        assert streamed == whole
        bench = "".join(
            run_gaf_lookup_stream(
                g, dg, str(path), bench=True, window_bytes=window
            )
        )
        assert bench == run_gaf_lookup(g, dg, reads, bench=True)


def test_gaf_stream_memory_capped(tmp_path):
    """A GAF far larger than the window processes under a fixed memory
    cap: peak python/numpy allocations stay O(window), not O(file)."""
    import tracemalloc

    from pollen_tpu.ops.gaf import iter_gaf_windows

    g, _ = _graph()
    line = b"readname_%08d\t14\t0\t14\t+\t>1>2>3>4\t14\t2\t9\t9\t9\t60\n"
    path = tmp_path / "big.gaf"
    with open(path, "wb") as f:
        for base in range(80):
            f.write(b"".join(line % (base * 10000 + i) for i in range(10000)))
    size = path.stat().st_size
    assert size > 38 << 20  # ~39 MB of reads

    window = 1 << 20
    names = g.seg_id_by_name()
    tracemalloc.start()
    tracemalloc.reset_peak()
    total_reads = 0
    for reads in iter_gaf_windows(str(path), names, window_bytes=window):
        total_reads += reads.num_reads
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert total_reads == 800000
    # Peak is a small multiple of the window (parse temporaries) and
    # independent of the file size — half the file here, O(window) in
    # general.
    assert peak < size // 2, f"peak {peak / 2**20:.1f} MB"
    assert peak < 20 * window, f"peak {peak / 2**20:.1f} MB"


def test_pangenotype(tmp_path):
    g, _ = _graph()
    f1 = tmp_path / "s1.gaf"
    f1.write_bytes(b"r\t7\t0\t7\t+\t>1>2\t7\t0\t7\t7\t7\t60\n")
    f2 = tmp_path / "s2.gaf"
    f2.write_bytes(b"r\t5\t0\t5\t+\t<3\t5\t0\t5\t5\t5\t60\n")
    out = run_pangenotype(g, [str(f1), str(f2)])
    assert out == "1100\n0010\n"


def test_bed_parse_and_intersect():
    a = parse_bed(b"x\t10\t20\nx\t30\t40\ny\t0\t5\n")
    b = parse_bed(b"x\t15\t35\ny\t4\t9\nz\t0\t100\n")
    assert a.num_entries == 3
    out = run_bed_intersect(a, b)
    assert out == "x\t15\t20\nx\t30\t35\ny\t4\t5\n"


def test_windows_bed():
    w = windows_bed(b"p", 0, 10, 4)
    assert w.num_entries == 3
    assert w.start.tolist() == [0, 4, 8]
    assert w.end.tolist() == [4, 8, 10]


def test_window_depth_values():
    g, dg = _graph()
    # Single path over segments of len 4,3,5,2 (total 14); depth 1 each.
    out = run_window_depth(g, dg, "p", 7)
    lines = out.strip().split("\n")
    assert lines[0] == "p\t0\t7\t1"
    assert lines[1] == "p\t7\t14\t1"


def test_window_depth_weighted():
    gfa = (
        b"S\t1\tAAAA\nS\t2\tCC\n"
        b"P\tx\t1+,2+\t*\nP\ty\t1+\t*\n"
        b"L\t1\t+\t2\t+\t0M\n"
    )
    g = parse_gfa(gfa)
    dg = build_device_graph(g)
    # Depths: seg1 = 2, seg2 = 1. Path x: 6bp. One window of 6:
    # (2*4 + 1*2)/6 = 1.6667
    out = run_window_depth(g, dg, "x", 6)
    assert out == "x\t0\t6\t1.6667\n"


def spec_window_depth(seg_lens, depth, steps, windows):
    """Clarity re-statement of the reference's two-pointer weighted
    window sweep (reference: ops/window_depth.rs assign_depths)."""
    out = [0.0] * len(windows)
    cur = 0
    pos = 0
    for seg, _rev in steps:
        a, b = pos, pos + seg_lens[seg]
        pos = b
        weight = float(depth[seg] * seg_lens[seg])
        while cur < len(windows):
            w0, w1 = windows[cur]
            lo, hi = max(w0, a), min(w1, b)
            if hi > lo:
                out[cur] += (weight * ((hi - lo) / (b - a))) / (w1 - w0)
            if w1 > b:
                break
            cur += 1
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("window", [3, 7, 50])
def test_window_depth_matches_two_pointer_spec(seed, window):
    from pollen_tpu.ops.window_depth import run_window_depth
    from pollen_tpu.ops.depth import format_float, seg_depth_with_uniq

    rng = np.random.default_rng(seed)
    n = 15
    seg_lens = {i: int(rng.integers(1, 9)) for i in range(n)}
    lines = ["H\tVN:Z:1.0"]
    for i in range(n):
        lines.append(f"S\t{i + 1}\t" + "A" * seg_lens[i])
    paths = []
    for p in range(4):
        k = int(rng.integers(2, 10))
        segs = rng.integers(0, n, k)
        toks = ",".join(f"{int(s) + 1}+" for s in segs)
        paths.append((f"p{p}", [(int(s), 0) for s in segs]))
        lines.append(f"P\tp{p}\t{toks}\t*")
    g = parse_gfa(("\n".join(lines) + "\n").encode())
    dg = build_device_graph(g)

    depth = {i: 0 for i in range(n)}
    for _, steps in paths:
        for s, _ in steps:
            depth[s] += 1

    name, steps = paths[0]
    total = sum(seg_lens[s] for s, _ in steps)
    windows = [(w, min(w + window, total)) for w in range(0, total, window)]
    want = spec_window_depth(seg_lens, depth, steps, windows)

    got = run_window_depth(g, dg, name, window)
    got_lines = got.strip().split("\n")
    assert len(got_lines) == len(windows)
    for line, w, value in zip(got_lines, windows, want):
        assert line == f"{name}\t{w[0]}\t{w[1]}\t{format_float(value, 4)}"


def test_gaf_parallel_windows_identical(tmp_path):
    """Process-parallel window parsing (shard + ordered merge) yields
    the same batches, in the same order, as the sequential path."""
    from pollen_tpu.ops.gaf import iter_gaf_windows

    g, _ = _graph()
    names = g.seg_id_by_name()
    lines = []
    for i in range(400):
        lines.append(f"r{i}\t14\t0\t14\t+\t>1>2<3\t12\t{i % 5}\t9\t9\t9\t60")
    path = tmp_path / "reads.gaf"
    path.write_text("\n".join(lines) + "\n")

    seq = list(iter_gaf_windows(str(path), names, window_bytes=512,
                                workers=1))
    par = list(iter_gaf_windows(str(path), names, window_bytes=512,
                                workers=2))
    assert len(seq) == len(par) > 2
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a.steps, b.steps)
        np.testing.assert_array_equal(a.name_data, b.name_data)
        np.testing.assert_array_equal(a.start, b.start)
        np.testing.assert_array_equal(a.end, b.end)
        np.testing.assert_array_equal(a.read_bounds, b.read_bounds)


def test_gaf_small_file_skips_pool(tmp_path, monkeypatch):
    """In auto mode (workers=None) small files must not pay worker
    startup, whatever POLLEN_GAF_WORKERS says."""
    from unittest import mock

    from pollen_tpu.ops import gaf as G

    g, _ = _graph()
    names = g.seg_id_by_name()
    path = tmp_path / "one.gaf"
    path.write_text("r0\t14\t0\t14\t+\t>1>2\t12\t0\t9\t9\t9\t60\n")
    monkeypatch.setenv("POLLEN_GAF_WORKERS", "4")
    with mock.patch("concurrent.futures.ProcessPoolExecutor") as pool:
        out = list(G.iter_gaf_windows(str(path), names))
    assert pool.call_count == 0
    assert len(out) == 1 and out[0].num_reads == 1


def test_pangenotype_parallel_identical(tmp_path):
    """Per-file parallel pangenotype rows equal the sequential ones."""
    from pollen_tpu.ops.gaf import pangenotype_matrix

    g, _ = _graph()
    files = []
    for i in range(3):
        p = tmp_path / f"s{i}.gaf"
        p.write_text(
            f"r\t14\t0\t14\t+\t>{i % 2 + 1}>2\t12\t0\t9\t9\t9\t60\n"
        )
        files.append(str(p))
    m1 = pangenotype_matrix(g, files, workers=1)
    m2 = pangenotype_matrix(g, files, workers=2)
    np.testing.assert_array_equal(m1, m2)
