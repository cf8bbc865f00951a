"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/mesh code is validated on virtual CPU devices (the real TPU is
reserved for benchmarks; multi-chip hardware is emulated, as the driver
does for `dryrun_multichip`).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
