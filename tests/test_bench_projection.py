"""bench.py's per-impl DeviceGraph projection: shipping only the
chosen index's tensors must not change any impl's answer (the round-3
driver bench died uploading indexes it never measured)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bench import (
    _IMPL_FIELDS,
    measure_call_overhead,
    project_for_impl,
    synth_device_graph,
)


def _masks(n_paths, seed=7):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2, n_paths).astype(np.int32))


@pytest.fixture(scope="module")
def graphs():
    # Big enough that the tiered ELL split has all classes and the
    # crossing matrix is built.
    _, dg_host = synth_device_graph(2**14, 2**10, 48, device="host")
    _, dg_full = synth_device_graph(2**14, 2**10, 48)
    return dg_host, dg_full


def test_host_ingest_matches_device(graphs):
    dg_host, dg_full = graphs
    for name in ("step_path_sorted", "seg_bounds", "cross_ell",
                 "cross_matrix", "ell_heavy", "run_start"):
        h = getattr(dg_host, name)
        assert isinstance(h, np.ndarray), name
        np.testing.assert_array_equal(h, np.asarray(getattr(dg_full, name)))
    assert dg_host.ell_k == dg_full.ell_k
    assert dg_host.num_paths == dg_full.num_paths


@pytest.mark.parametrize("impl", sorted(_IMPL_FIELDS))
def test_projection_preserves_answers(graphs, impl):
    from pollen_tpu.device import bounded_segment_sum, first_in_group_mask
    from pollen_tpu.ops.depth import (
        seg_depth_with_uniq_cross,
        seg_depth_with_uniq_ell_permuted,
        seg_depth_with_uniq_masked,
    )

    dg_host, dg_full = graphs
    mask = _masks(dg_full.num_paths)
    dg_proj = project_for_impl(dg_host, impl)

    # Kept fields are device arrays; dropped data fields are zero-size.
    for f in _IMPL_FIELDS[impl]:
        assert isinstance(getattr(dg_proj, f), jax.Array)
    if impl == "ell":
        assert dg_proj.cross_matrix.size == 0
        d, u = seg_depth_with_uniq_ell_permuted(dg_proj, mask, pallas=False)
        d_ref, u_ref = seg_depth_with_uniq_ell_permuted(
            dg_full, mask, pallas=False
        )
    elif impl == "cross":
        assert dg_proj.cross_ell.size == 0
        d, u = seg_depth_with_uniq_cross(dg_proj, mask, pallas=False)
        d_ref, u_ref = seg_depth_with_uniq_cross(dg_full, mask, pallas=False)
    else:  # scan/xla read the sorted index
        ext = jnp.concatenate([mask, jnp.zeros(1, jnp.int32)])
        w = ext[dg_proj.step_path_sorted]
        d = bounded_segment_sum(w, dg_proj.seg_bounds)
        u = bounded_segment_sum(
            first_in_group_mask(w, dg_proj.run_start), dg_proj.seg_bounds
        )
        d_ref, u_ref = seg_depth_with_uniq_masked(dg_full, mask)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u_ref))


def test_ingest_cache_roundtrip(tmp_path, monkeypatch):
    """The disk ingest cache (bench retries skip synth + planning) must
    reproduce the projected host graph exactly — arrays, meta ints, and
    tuple statics."""
    import dataclasses

    import bench

    monkeypatch.setattr(bench, "_ingest_cache_dir", lambda: str(tmp_path))
    shape = (2**12, 2**8, 8)
    _, dg_full = synth_device_graph(*shape, device="host")
    host = bench.project_host(dg_full, "ell")
    bench.ingest_cache_store(host, "ell", shape)
    got = bench.ingest_cache_load(*shape)
    assert got is not None
    impl, dg2 = got
    assert impl == "ell"
    for f in dataclasses.fields(host):
        a, b = getattr(host, f.name), getattr(dg2, f.name)
        if hasattr(a, "ndim"):
            assert a.dtype == b.dtype, f.name
            np.testing.assert_array_equal(a, b, err_msg=f.name)
        else:
            assert a == b, f.name
    # A different shape must miss.
    assert bench.ingest_cache_load(2**12, 2**8, 16) is None


def test_measured_call_overhead_sane():
    import bench

    v = measure_call_overhead()
    assert 1e-4 <= v <= 2.0
    assert bench.CALL_OVERHEAD_S == v
