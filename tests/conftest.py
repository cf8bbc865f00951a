"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/mesh code is validated on virtual CPU devices (the real TPU is
reserved for benchmarks; multi-chip hardware is emulated, as the driver
does for `dryrun_multichip`).
"""

import os

# jax may already be imported by the interpreter's sitecustomize (TPU
# autoregistration), so set platform/device-count via jax.config, which
# takes effect as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real TPU
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

GRAPH_DIR = REPO / "tests" / "graphs"
GOLDEN_DIR = REPO / "tests" / "golden"

FIXTURE_GRAPHS = sorted(p.name for p in GRAPH_DIR.glob("*.gfa"))


@pytest.fixture(params=FIXTURE_GRAPHS)
def graph_path(request) -> pathlib.Path:
    return GRAPH_DIR / request.param
