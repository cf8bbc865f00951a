"""Binary FlatGFA file format: round trips and zero-copy loads."""

import numpy as np
import pytest

from pollen_tpu.emit import emit_gfa
from pollen_tpu.fileformat import (
    TOC_DTYPE,
    FlatFileError,
    load_flatgfa,
    load_flatgfa_bytes,
    save_flatgfa,
)
from pollen_tpu.flatgfa import parse_gfa_file


def test_toc_layout_matches_reference():
    # magic u64 + 11 pools x (len u64, capacity u64), packed.
    assert TOC_DTYPE.itemsize == 8 + 11 * 16


def test_roundtrip(graph_path, tmp_path):
    g = parse_gfa_file(str(graph_path))
    out = tmp_path / "g.flatgfa"
    save_flatgfa(str(out), g)
    g2 = load_flatgfa(str(out))
    assert emit_gfa(g2, order="preserved") == graph_path.read_text()
    assert (g2.steps == g.steps).all()
    assert (g2.seq_data == g.seq_data).all()
    assert g2.seg_name.tolist() == g.seg_name.tolist()


def test_roundtrip_with_spare_capacity(graph_path, tmp_path):
    g = parse_gfa_file(str(graph_path))
    out = tmp_path / "g.flatgfa"
    save_flatgfa(str(out), g, spare=0.5)
    g2 = load_flatgfa(str(out))
    assert emit_gfa(g2, order="preserved") == graph_path.read_text()


def test_bad_magic_rejected():
    with pytest.raises(FlatFileError):
        load_flatgfa_bytes(b"\x00" * 200)


def test_truncated_rejected(graph_path, tmp_path):
    g = parse_gfa_file(str(graph_path))
    out = tmp_path / "g.flatgfa"
    save_flatgfa(str(out), g)
    data = out.read_bytes()
    with pytest.raises(FlatFileError):
        load_flatgfa_bytes(data[: len(data) // 2])


def test_load_is_zero_copy(tmp_path):
    g = parse_gfa_file("tests/graphs/names.gfa")
    out = tmp_path / "g.flatgfa"
    save_flatgfa(str(out), g)
    g2 = load_flatgfa(str(out))
    # Pool views alias the mapping, not fresh allocations.
    assert not g2.steps.flags.owndata
    assert not g2.seq_data.flags.owndata


def test_update_in_place(graph_path, tmp_path):
    from pollen_tpu.ops.transform import crush

    g = parse_gfa_file(str(graph_path))
    out = tmp_path / "g.flatgfa"
    save_flatgfa(str(out), g, spare=1.0)
    crushed = crush(g)
    from pollen_tpu.fileformat import update_in_place

    update_in_place(str(out), crushed)
    again = load_flatgfa(str(out))
    from pollen_tpu.emit import emit_gfa as _emit

    assert _emit(again, order="sorted") == _emit(crushed, order="sorted")


def test_update_in_place_overflow(tmp_path):
    from pollen_tpu.ops.transform import chop

    g = parse_gfa_file("tests/graphs/tiny.gfa")
    out = tmp_path / "g.flatgfa"
    save_flatgfa(str(out), g)  # no spare capacity
    chopped = chop(g, 1)  # more segments than reserved
    from pollen_tpu.fileformat import update_in_place

    with pytest.raises(FlatFileError):
        update_in_place(str(out), chopped)
