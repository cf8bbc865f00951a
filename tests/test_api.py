"""Object API facade (flatgfa-py-equivalent surface) + packedseq.

Coverage mirrors the reference's flatgfa-py test suite
(reference: flatgfa-py/test/test_flatgfa.py).
"""

import numpy as np
import pytest

import pollen_tpu
from pollen_tpu.packedseq import PackedSeq, PackedSeqError, seq_export, seq_import

TINY = (
    "H\tVN:Z:1.0\n"
    "S\t1\tACGT\nS\t2\tTT\nS\t3\tGATTACA\nS\t4\tC\n"
    "P\talpha\t1+,2+,3+\t*\nP\tbeta\t1+,2+,4-\t*\n"
    "L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t2\t+\t4\t+\t0M\n"
)


@pytest.fixture()
def g():
    return pollen_tpu.parse_bytes(TINY.encode())


def test_segments(g):
    assert len(g.segments) == 4
    seg = g.segments[0]
    assert seg.name == 1
    assert seg.sequence() == b"ACGT"
    assert len(seg) == 4
    assert [s.name for s in g.segments] == [1, 2, 3, 4]


def test_find(g):
    assert g.segments.find(3).sequence() == b"GATTACA"
    assert g.segments.find(99) is None
    assert g.paths.find(b"beta").id == 1
    assert g.paths.find(b"nope") is None


def test_path_steps(g):
    path = g.paths[0]
    assert path.name == b"alpha"
    assert len(path) == 3
    names = [h.segment.name for h in path]
    assert names == [1, 2, 3]
    assert path[2].segment.name == 3
    assert path[-1].is_forward
    rev_handle = g.paths[1][2]
    assert not rev_handle.is_forward


def test_step_slicing(g):
    path = g.paths[0]
    sl = path[1:3]
    assert len(sl) == 2
    assert [h.segment.name for h in sl] == [2, 3]


def test_links(g):
    assert len(g.links) == 3
    lnk = g.links[0]
    assert lnk.from_.segment.name == 1
    assert lnk.to.segment.name == 2


def test_eq_and_hash(g):
    assert g.segments[0] == g.segments[0]
    assert g.segments[0] != g.segments[1]
    assert len({g.paths[0], g.paths[0], g.paths[1]}) == 2
    assert g.paths[0][0] == g.paths[1][0]  # same handle 1+


def test_str_roundtrip(g):
    assert str(g) == TINY


def test_file_roundtrips(g, tmp_path):
    gfa = tmp_path / "t.gfa"
    flat = tmp_path / "t.flatgfa"
    g.write_gfa(str(gfa))
    g.write_flatgfa(str(flat))
    assert str(pollen_tpu.parse(str(gfa))) == TINY
    assert str(pollen_tpu.load(str(flat))) == TINY


def test_pangenotype_api(g, tmp_path):
    f1 = tmp_path / "a.gaf"
    f1.write_bytes(b"r\t6\t0\t6\t+\t>1>2\t6\t0\t6\t6\t6\t60\n")
    mat = g.make_pangenotype_matrix([str(f1)])
    assert mat == [[True, True, False, False]]


# -- packedseq --------------------------------------------------------------


def test_packedseq_roundtrip():
    for text in [b"", b"A", b"ACTG", b"GATTACA", b"ACGT" * 100 + b"T"]:
        ps = PackedSeq.from_ascii(text)
        assert len(ps) == len(text)
        assert ps.to_ascii() == text


def test_packedseq_indexing():
    ps = PackedSeq.from_ascii(b"GATTACA")
    assert ps[0] == "G"
    assert ps[6] == "A"
    assert ps[3] == "T"


def test_packedseq_rejects_n():
    with pytest.raises(PackedSeqError):
        PackedSeq.from_ascii(b"ACGN")


def test_packedseq_file_roundtrip(tmp_path):
    raw = tmp_path / "seq.txt"
    packed = tmp_path / "seq.bin"
    raw.write_bytes(b"GAT TACA\nACGT\n")
    seq_export(str(raw), str(packed))
    assert seq_import(str(packed)) == b"GATTACAACGT"
    # File is roughly half the size plus the 25-byte TOC.
    assert packed.stat().st_size == 25 + 6


def test_packedseq_randomized():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(0, 64))
        text = bytes(rng.choice(list(b"ACTG"), n).astype(np.uint8))
        assert PackedSeq.from_ascii(text).to_ascii() == text


def test_profiling_utils(tmp_path, caplog):
    import logging

    from pollen_tpu import profiling

    with caplog.at_level(logging.INFO, logger="pollen_tpu"):
        with profiling.stopwatch("unit-test"):
            pass
    assert any("unit-test" in r.message for r in caplog.records)

    import jax.numpy as jnp

    t = profiling.time_jitted(lambda x: x + 1, jnp.ones(8), reps=1)
    assert t >= 0


def test_all_reads_object_surface(tmp_path):
    """GAFParser / GAFLine / ChunkEvent match the reference's flatgfa-py
    semantics (its test_gaf.py expectations reproduced verbatim on its
    fixture shapes)."""
    gfa = (
        b"H\tVN:Z:1.0\n"
        b"S\t1\tCAAATAAG\nS\t2\tAAATTTTCTGGAGTTCTAT\nS\t3\tTTG\n"
        b"S\t4\tCCAACTCTCTG\n"
        b"P\tone\t1+,2+,4-\t*\nP\ttwo\t1+,2+,3+,4-\t*\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t4\t-\t0M\n"
        b"L\t2\t+\t3\t+\t0M\nL\t3\t+\t4\t-\t0M\n"
    )
    gaf = tmp_path / "tiny.gaf"
    gaf.write_bytes(
        b"foo\t12\t0\t12\t+\t>1>2<4\t38\t5\t17\t12\t12\t0\tcg:Z:150M\n"
        b"bar\t20\t0\t20\t+\t>1>2>3\t30\t7\t27\t20\t20\t0\tcg:Z:150M\n"
    )
    g = pollen_tpu.parse_bytes(gfa)
    lines = list(g.all_reads(str(gaf)))
    assert [ln.name for ln in lines] == ["foo", "bar"]
    seqs = ["".join(e.sequence() for e in line) for line in lines]
    assert seqs == ["AAGAAATTTTCT", "GAAATTTTCTGGAGTTCTAT"]
    ranges = [[e.range for e in line] for line in lines]
    assert ranges == [
        [(5, 8), (0, 9), (1, 0)],
        [(7, 8), (0, 18), (0, 0)],
    ]
    assert lines[0].sequence() == "AAGAAATTTTCT"
    assert lines[0].segment_ranges().startswith("\n0: 1+, 5-8bp")
