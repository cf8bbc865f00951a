"""Sharded (mesh) depth vs the single-device kernels, on a virtual
8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pollen_tpu.device import build_device_graph
from pollen_tpu.flatgfa import parse_gfa_file
from pollen_tpu.ops import depth as depth_op
from pollen_tpu.parallel import (
    make_mesh,
    shard_device_graph,
    sharded_seg_depth_fn,
)
from pollen_tpu.parallel.sharded import full_mask

import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.shape == {"host": 2, "chip": 4}


def test_sharded_depth_matches_single(graph_path, mesh):
    g = parse_gfa_file(str(graph_path))
    dg = build_device_graph(g)
    sg = shard_device_graph(dg, mesh)
    query = sharded_seg_depth_fn(mesh)

    depth_m, uniq_m = query(sg, full_mask(dg.num_paths))
    depth_1, uniq_1 = depth_op.seg_depth_with_uniq(dg)
    np.testing.assert_array_equal(np.asarray(depth_m), np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(uniq_m), np.asarray(uniq_1))


def test_sharded_depth_masked_matches_single(graph_path, mesh):
    g = parse_gfa_file(str(graph_path))
    dg = build_device_graph(g)
    sg = shard_device_graph(dg, mesh)
    query = sharded_seg_depth_fn(mesh)

    # Drop every other path.
    mask = np.zeros(dg.num_paths + 1, dtype=np.int32)
    mask[0 : dg.num_paths : 2] = 1
    depth_m, uniq_m = query(sg, jnp.asarray(mask))
    depth_1, uniq_1 = depth_op.seg_depth_with_uniq_masked(
        dg, jnp.asarray(mask[:-1].astype(bool))
    )
    np.testing.assert_array_equal(np.asarray(depth_m), np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(uniq_m), np.asarray(uniq_1))


def test_sharded_uniq_straddling_groups(mesh):
    """A graph built so one (segment, path) group spans several chunks:
    one segment crossed 64 times by one path. Uniq must still be 1."""
    steps = ",".join(["1+"] * 64)
    text = f"H\tVN:Z:1.0\nS\t1\tACGT\nS\t2\tT\nP\tbig\t{steps}\t*\nP\tb2\t2+,1+\t*\n"
    from pollen_tpu.flatgfa import parse_gfa

    g = parse_gfa(text.encode())
    dg = build_device_graph(g)
    sg = shard_device_graph(dg, mesh)
    query = sharded_seg_depth_fn(mesh)
    depth_m, uniq_m = query(sg, full_mask(dg.num_paths))
    assert np.asarray(depth_m).tolist() == [65, 1]
    assert np.asarray(uniq_m).tolist() == [2, 1]


def test_sharded_degree_matches_single(graph_path, mesh):
    from pollen_tpu.ops.degree import seg_degree
    from pollen_tpu.parallel.sharded import (
        shard_degree_inputs,
        sharded_degree_fn,
    )

    g = parse_gfa_file(str(graph_path))
    dg = build_device_graph(g)
    weights, chunk_starts, bounds = shard_degree_inputs(dg, mesh)
    deg_m = sharded_degree_fn(mesh)(weights, chunk_starts, bounds)
    np.testing.assert_array_equal(
        np.asarray(deg_m), np.asarray(seg_degree(dg))
    )


def test_sharded_depth_scatter_output(graph_path, mesh):
    """Output-sharded depth (psum_scatter over chips) gathers to the
    same answer as the replicated-output query."""
    from pollen_tpu.parallel.sharded import sharded_seg_depth_scatter_fn

    g = parse_gfa_file(str(graph_path))
    dg = build_device_graph(g)
    sg = shard_device_graph(dg, mesh)
    d_r, u_r = sharded_seg_depth_fn(mesh)(sg, full_mask(dg.num_paths))
    d_s, u_s = sharded_seg_depth_scatter_fn(mesh)(sg, full_mask(dg.num_paths))
    n = dg.num_segments
    np.testing.assert_array_equal(np.asarray(d_s).reshape(-1)[:n], np.asarray(d_r))
    np.testing.assert_array_equal(np.asarray(u_s).reshape(-1)[:n], np.asarray(u_r))


def test_sharded_cross_depth_matches_single(graph_path, mesh):
    """Tensor-parallel crossing matrix (zero-collective) vs the
    single-device masked pipeline, including the overflow fixup."""
    from pollen_tpu.parallel.sharded import (
        shard_cross_inputs,
        sharded_cross_depth_fn,
    )

    g = parse_gfa_file(str(graph_path))
    dg = build_device_graph(g, cross_matrix="always")
    sc = shard_cross_inputs(dg, mesh)
    assert sc is not None
    query = sharded_cross_depth_fn(mesh, nibble=sc.nibble)

    rng = np.random.default_rng(23)
    n = dg.num_segments
    for _ in range(2):
        bools = rng.integers(0, 2, dg.num_paths).astype(bool)
        m = (
            jnp.zeros(sc.num_paths_padded, jnp.int32)
            .at[: dg.num_paths]
            .set(jnp.asarray(bools.astype(np.int32)))
        )
        d_c, u_c = query(sc.cross, sc.res, sc.res_seg, m)
        d_1, u_1 = depth_op.seg_depth_with_uniq_masked(dg, jnp.asarray(bools))
        np.testing.assert_array_equal(np.asarray(d_c)[:n], np.asarray(d_1))
        np.testing.assert_array_equal(np.asarray(u_c)[:n], np.asarray(u_1))


def _sharded_ell_natural(dg, se, mesh, bools):
    """Run the sharded tiered split-ELL query and reassemble natural
    order via the shared composition helper."""
    from pollen_tpu.parallel.sharded import (
        compose_ell_parts_natural,
        sharded_ell_depth_fn,
    )

    m = jnp.asarray(bools.astype(np.int32))
    has_mid = se.ell2 is not None
    has_heavy = se.heavy is not None
    args = [se.ell]
    if has_mid:
        args.append(se.ell2)
    if has_heavy:
        args += [se.heavy, se.heavy_res, se.heavy_res_col]
    args.append(m)
    parts = sharded_ell_depth_fn(
        mesh, has_heavy=has_heavy, has_mid=has_mid
    )(*args)
    return compose_ell_parts_natural(
        dg, parts, has_mid=has_mid, has_heavy=has_heavy
    )


def test_sharded_ell_depth_matches_single(graph_path, mesh):
    """Tensor-parallel split ELL run index (zero-collective) vs the
    single-device masked pipeline."""
    from pollen_tpu.parallel.sharded import shard_ell_inputs

    g = parse_gfa_file(str(graph_path))
    dg = build_device_graph(g, cross_matrix="always")
    se = shard_ell_inputs(dg, mesh)
    assert se is not None

    rng = np.random.default_rng(29)
    for _ in range(2):
        bools = rng.integers(0, 2, dg.num_paths).astype(bool)
        d_e, u_e = _sharded_ell_natural(dg, se, mesh, bools)
        d_1, u_1 = depth_op.seg_depth_with_uniq_masked(dg, jnp.asarray(bools))
        np.testing.assert_array_equal(d_e, np.asarray(d_1))
        np.testing.assert_array_equal(u_e, np.asarray(u_1))


def test_sharded_ell_heavy_sidecar(mesh):
    """Heavy segments' nibble columns (and clip residual) land on the
    right device shard and reconstruct exactly."""
    from pollen_tpu.flatgfa import parse_gfa
    from pollen_tpu.parallel.sharded import shard_ell_inputs

    # Segment 1 gets 40 single-crossing runs (heavy for small K) plus
    # a count-21 run (clip residual).
    lines = ["S\t1\tAA"] + [f"S\t{i}\tC" for i in range(2, 40)]
    lines += ["P\tp0\t" + ",".join(["1+"] * 20) + ",2+\t*"]
    lines += [f"P\tp{j}\t1+,{2 + (j % 38)}+\t*" for j in range(1, 40)]
    text = ("\n".join(lines) + "\n").encode()
    dg = build_device_graph(parse_gfa(text), cross_matrix="always")
    se = shard_ell_inputs(dg, mesh)
    assert se is not None and se.heavy is not None
    assert dg.ell_heavy_res_col.size
    bools = np.ones(dg.num_paths, bool)
    d_e, u_e = _sharded_ell_natural(dg, se, mesh, bools)
    d_1, u_1 = depth_op.seg_depth_with_uniq_masked(
        dg, jnp.ones(dg.num_paths, bool)
    )
    np.testing.assert_array_equal(d_e, np.asarray(d_1))
    np.testing.assert_array_equal(u_e, np.asarray(u_1))


def test_sharded_cross_overflow(mesh):
    """Clipped residuals land on the right device shard."""
    from pollen_tpu.flatgfa import parse_gfa
    from pollen_tpu.parallel.sharded import (
        shard_cross_inputs,
        sharded_cross_depth_fn,
    )

    steps = ",".join(["1+"] * 300 + ["2+"] * 2)
    text = f"S\t1\tA\nS\t2\tC\nP\tp\t{steps}\t*\n".encode()
    dg = build_device_graph(parse_gfa(text), cross_matrix="always")
    assert dg.cross_res_seg.size
    sc = shard_cross_inputs(dg, mesh)
    m = jnp.zeros(sc.num_paths_padded, jnp.int32).at[:1].set(1)
    d_c, u_c = sharded_cross_depth_fn(mesh, nibble=sc.nibble)(
        sc.cross, sc.res, sc.res_seg, m
    )
    assert np.asarray(d_c)[:2].tolist() == [300, 2]
    assert np.asarray(u_c)[:2].tolist() == [1, 1]
