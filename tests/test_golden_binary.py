"""Committed golden bytes pin the binary formats.

The FlatGFA file layout (flatgfa/src/file.rs:9-62) and the packed-seq
layout (packedseq.rs:100-147) are byte-compatibility surfaces. These
tests derive the expected bytes BY HAND with struct.pack — independent
arithmetic, not our writer — and also pin them as committed hex
fixtures (tests/golden/*.hex), so any layout drift in the writer OR
the loader becomes a test failure instead of a silent claim.
"""

import pathlib
import struct

import numpy as np

from pollen_tpu.fileformat import load_flatgfa_bytes, save_flatgfa
from pollen_tpu.flatgfa import parse_gfa
from pollen_tpu.packedseq import PackedSeq

GOLDEN = pathlib.Path(__file__).parent / "golden"

TINY_GFA = b"S\t1\tAC\nS\t2\tG\nP\tp\t1+,2-\t*\nL\t1\t+\t2\t+\t2M\n"


def hand_packed_flatgfa() -> bytes:
    """The tiny graph's FlatGFA file, packed field by field from the
    documented layout (file.rs: magic u64; 11 (len, capacity) u64
    pairs in fixed pool order; then each pool's raw little-endian
    bytes padded to capacity)."""
    out = bytearray()
    out += struct.pack("<Q", 0xB101_1054)  # magic (file.rs:9)
    # (len, capacity) per pool, in TOC order; spare=0 so len == cap.
    sizes = {
        "header": 0,
        "segs": 2,
        "paths": 1,
        "links": 1,
        "steps": 2,
        "seq_data": 3,
        "overlaps": 1,
        "alignment": 1,
        "name_data": 1,
        "optional_data": 0,
        "line_order": 4,
    }
    for n in sizes.values():
        out += struct.pack("<QQ", n, n)

    # segs: name u64, seq span (u32, u32), optional span (u32, u32).
    out += struct.pack("<QIIII", 1, 0, 2, 0, 0)  # S 1 AC
    out += struct.pack("<QIIII", 2, 2, 3, 0, 0)  # S 2 G
    # paths: name span, steps span, overlaps span (all (u32, u32)).
    # The path's '*' overlap contributes no entries; its entry span
    # sits after the 1 link CIGAR at (1, 1).
    out += struct.pack("<IIIIII", 0, 1, 0, 2, 1, 1)
    # links: from/to packed handles (seg << 1 | orient), overlap span.
    out += struct.pack("<IIII", 0 << 1 | 0, 1 << 1 | 0, 0, 1)
    # steps: packed handles 1+ -> 0, 2- -> 3.
    out += struct.pack("<II", 0, 3)
    out += b"ACG"  # seq_data
    out += struct.pack("<II", 0, 1)  # overlaps: the link CIGAR's ops
    out += struct.pack("<I", (2 << 8) | 0)  # alignment: "2M" (M = 0)
    out += b"p"  # name_data
    # optional_data empty.
    out += bytes([1, 1, 2, 3])  # line_order: S, S, P, L
    return bytes(out)


def hand_packed_seq() -> bytes:
    """'ACTGA' packed per packedseq.rs: codes A0 C1 T2 G3, even
    positions in the low nibble; 25-byte TOC (magic 0x12 u64, len u64,
    capacity u64, final-nibble flag u8)."""
    data = bytes(
        [
            0x0 | (0x1 << 4),  # A, C
            0x2 | (0x3 << 4),  # T, G
            0x0,  # A + low-nibble end (odd length)
        ]
    )
    return struct.pack("<QQQB", 0x12, 3, 3, 0) + data


def test_flatgfa_file_bytes_pinned(tmp_path):
    g = parse_gfa(TINY_GFA)
    path = tmp_path / "tiny.flatgfa"
    save_flatgfa(str(path), g)
    written = path.read_bytes()

    expected = hand_packed_flatgfa()
    assert written == expected, "writer drifted from the hand-packed layout"

    fixture = bytes.fromhex(
        (GOLDEN / "tiny.flatgfa.hex").read_text().strip()
    )
    assert written == fixture, "writer drifted from the committed fixture"

    # Loading the hand-packed bytes reproduces the parsed arena.
    g2 = load_flatgfa_bytes(expected)
    for field in (
        "seg_name",
        "seg_seq",
        "path_steps",
        "link_from",
        "link_to",
        "steps",
        "seq_data",
        "overlaps",
        "alignment",
        "name_data",
        "line_order",
    ):
        np.testing.assert_array_equal(
            getattr(g2, field), getattr(g, field), err_msg=field
        )


def test_packedseq_file_bytes_pinned():
    ps = PackedSeq.from_ascii(b"ACTGA")
    written = ps.to_file_bytes()

    expected = hand_packed_seq()
    assert written == expected, "writer drifted from the hand-packed layout"

    fixture = bytes.fromhex(
        (GOLDEN / "tiny.packedseq.hex").read_text().strip()
    )
    assert written == fixture, "writer drifted from the committed fixture"

    ps2 = PackedSeq.from_file_bytes(expected)
    assert ps2.to_ascii() == b"ACTGA"
    assert len(ps2) == 5 and not ps2.high_nibble_end
