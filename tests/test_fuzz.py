"""Robustness fuzzing: parsers must never crash with anything but their
own error types, and valid inputs must round trip."""

import numpy as np
import pytest

from pollen_tpu.bed import parse_bed
from pollen_tpu.emit import emit_gfa
from pollen_tpu.flatgfa import GFAParseError, parse_gfa
from pollen_tpu.packedseq import PackedSeq, PackedSeqError


@pytest.mark.parametrize("seed", range(8))
def test_random_bytes_never_crash(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        n = int(rng.integers(0, 200))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            parse_gfa(blob)
        except (GFAParseError, UnicodeDecodeError):
            pass


@pytest.mark.parametrize("seed", range(4))
def test_structured_garbage(seed):
    """Line-shaped garbage: right markers, wrong fields."""
    rng = np.random.default_rng(100 + seed)
    kinds = [b"H", b"S", b"L", b"P", b"X"]
    for _ in range(40):
        lines = []
        for _ in range(int(rng.integers(1, 8))):
            kind = kinds[int(rng.integers(0, len(kinds)))]
            n_fields = int(rng.integers(0, 6))
            fields = [
                bytes(rng.integers(33, 127, int(rng.integers(0, 6)), dtype=np.uint8))
                for _ in range(n_fields)
            ]
            lines.append(b"\t".join([kind] + fields))
        try:
            parse_gfa(b"\n".join(lines) + b"\n")
        except (GFAParseError, UnicodeDecodeError):
            pass


@pytest.mark.parametrize("seed", range(4))
def test_valid_graphs_roundtrip(seed):
    from graphgen import random_graph

    text = random_graph(seed=1000 + seed, n_segs=20, n_paths=4)
    g = parse_gfa(text.encode())
    assert emit_gfa(g, order="preserved") == text


def test_bed_garbage():
    rng = np.random.default_rng(7)
    for _ in range(40):
        blob = bytes(rng.integers(0, 256, int(rng.integers(0, 100)), dtype=np.uint8))
        try:
            parse_bed(blob)
        except (GFAParseError, ValueError):
            pass


def test_packedseq_garbage():
    rng = np.random.default_rng(8)
    for _ in range(40):
        blob = bytes(rng.integers(0, 256, int(rng.integers(0, 60)), dtype=np.uint8))
        try:
            PackedSeq.from_file_bytes(blob)
        except PackedSeqError:
            pass


def test_fuzz_batched_ell_vs_single():
    """Random Zipf graphs x random mask batches: the batched tiered-ELL
    path (both objectives) always equals per-query answers."""
    import jax.numpy as jnp
    import numpy as np

    import bench
    from pollen_tpu.ops import depth as depth_op

    rng = np.random.default_rng(97)
    for trial in range(4):
        s = int(rng.choice([2**12, 2**13, 2**14]))
        n = int(rng.choice([2**8, 2**9, 2**10]))
        p = int(rng.choice([8, 33, 100]))
        obj = ["single", "batch"][trial % 2]
        g, _ = bench.synth_device_graph(s, n, p, device="host")
        from pollen_tpu.device import build_device_graph

        dg = build_device_graph(g, ell_objective=obj)
        if not dg.cross_ell.size:
            continue
        q = int(rng.integers(1, 7))
        masks = jnp.asarray(rng.integers(0, 2, (q, p)).astype(bool))
        d_b, u_b = depth_op.seg_depth_with_uniq_ell_batch(dg, masks)
        for i in range(q):
            d1, u1 = depth_op.seg_depth_with_uniq_masked(dg, masks[i])
            np.testing.assert_array_equal(d_b[i], np.asarray(d1))
            np.testing.assert_array_equal(u_b[i], np.asarray(u1))
