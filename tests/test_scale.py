"""Large-scale smoke: an 8M-step graph through ingest, single-device
and mesh-sharded depth on the virtual CPU mesh.

Gated behind POLLEN_SCALE_TEST=1 (run via `make test-scale`) to keep the
default suite fast.
"""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("POLLEN_SCALE_TEST") != "1",
    reason="set POLLEN_SCALE_TEST=1 to run the scale smoke",
)


def test_scale_depth_pipeline():
    import jax.numpy as jnp

    import bench as bench_mod
    from pollen_tpu.ops import depth as depth_op
    from pollen_tpu.parallel import (
        make_mesh,
        shard_device_graph,
        sharded_seg_depth_fn,
    )
    from pollen_tpu.parallel.sharded import full_mask

    t0 = time.perf_counter()
    n_steps = 2**23
    g, dg = bench_mod.synth_device_graph(n_steps, 2**19, 256)
    build_time = time.perf_counter() - t0
    assert build_time < 120, f"ingest too slow: {build_time:.1f}s"

    mask = np.ones(dg.num_paths, dtype=bool)
    t0 = time.perf_counter()
    d1, u1 = depth_op.seg_depth_with_uniq_masked(dg, jnp.asarray(mask))
    d1, u1 = np.asarray(d1), np.asarray(u1)
    assert int(d1.sum()) == n_steps

    mesh = make_mesh()
    sg = shard_device_graph(dg, mesh)
    dm, um = sharded_seg_depth_fn(mesh)(sg, full_mask(dg.num_paths))
    np.testing.assert_array_equal(np.asarray(dm), d1)
    np.testing.assert_array_equal(np.asarray(um), u1)


def test_validate_corpus_dry_run(tmp_path):
    """The real-corpus validation script end-to-end on a local fixture
    (the networked deployment runs it with a fetch instead)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture = tmp_path / "fix.gfa"
    sys.path.insert(0, os.path.join(repo, "tests"))
    from graphgen import big_step_graph

    fixture.write_text(big_step_graph(500, 20000, 8, seed=3))
    env = dict(os.environ, POLLEN_DEVICE="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "benchsuite.validate_corpus",
            "hprc.chr8",
            "--graph",
            str(fixture),
        ],
        capture_output=True,
        text=True,
        cwd=repo,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "round trip: byte-identical OK" in proc.stdout
    assert "depth: exact-diff OK" in proc.stdout
    assert "degree: exact-diff OK" in proc.stdout
    assert "VALIDATION OK" in proc.stdout
    assert "RESULT hprc.chr8:" in proc.stdout
