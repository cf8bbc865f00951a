"""The examples/ programs run and print what their reference
counterparts print (reference: flatgfa-py/examples/*.py run by hand;
flatgfa-sh/example.sh; mygfa/example.py)."""

import pathlib
import subprocess
import sys

from pollen_tpu.scripts import script_env

REPO = pathlib.Path(__file__).resolve().parents[1]
EXAMPLES = REPO / "examples"


def _run(argv, **kw):
    return subprocess.run(
        argv,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
        env=script_env(),
        **kw,
    )


def test_depth_example():
    r = _run([sys.executable, str(EXAMPLES / "depth.py")])
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "#node.id\tdepth"
    assert lines[1:] == ["1\t2", "2\t2", "3\t1", "4\t2"]


def test_spec_depth_example():
    gfa = (EXAMPLES / "example.gfa").read_text()
    r = _run([sys.executable, str(EXAMPLES / "spec_depth.py")], input=gfa)
    assert r.returncode == 0, r.stderr
    assert r.stdout.splitlines()[1:] == ["1\t2", "2\t2", "3\t1", "4\t2"]


def test_gaf_example():
    r = _run([sys.executable, str(EXAMPLES / "gaf.py")])
    assert r.returncode == 0, r.stderr
    out = r.stdout.splitlines()
    assert out[0] == "foo"
    assert out[1] == "AAGAAATTTTCT"
    assert "(5, 8)" in r.stdout and "bar" in r.stdout


def test_matrix_example():
    r = _run([sys.executable, str(EXAMPLES / "matrix.py")])
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("example.gaf 1 1 1 1")


def test_flash_example_script():
    """Both statements of a multi-line flash script execute in order
    (reference example.sh has one node-depth and one path-depth)."""
    r = _run(["flash-tpu", str(EXAMPLES / "flash_example.sh")])
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "#node.id\tdepth\tdepth.uniq" in out
    assert "#path\tstart\tend\tmean.depth" in out
    assert out.index("#node.id") < out.index("#path")


def test_windows_script():
    r = _run(["sh", str(EXAMPLES / "windows.sh")])
    assert r.returncode == 0, r.stderr
    # BED-interval depth over the generated 4bp windows along alpha.
    assert r.stdout.splitlines()[0].startswith("alpha\t0\t4\t")


def test_model_emitter_cli():
    gfa = (EXAMPLES / "example.gfa").read_text()
    r = _run(
        [sys.executable, "-m", "pollen_tpu.spec.model"], input=gfa
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("L\t") == 4
    r = _run(
        [sys.executable, "-m", "pollen_tpu.spec.model", "--nl"], input=gfa
    )
    assert r.returncode == 0, r.stderr
    assert "L\t" not in r.stdout


def test_sizes_probe():
    r = _run([sys.executable, "-m", "benchsuite.sizes", "gen"])
    assert r.returncode == 0, r.stderr
    assert "gen tiny" in r.stdout


def test_batch_depth_example():
    """The batched serving example: each subset's table equals the
    engine's single-query answer."""
    r = _run([sys.executable, str(EXAMPLES / "batch_depth.py")])
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("# subset") == 3
    single = _run(
        [
            sys.executable,
            "-m",
            "pollen_tpu.cli",
            "-I",
            str(EXAMPLES / "example.gfa"),
            "depth",
            "-d",
        ]
    )
    assert single.returncode == 0, single.stderr
    # Subset 1 is all paths: its block must equal the plain query.
    blocks = r.stdout.split("# subset ")
    all_paths_block = "\n".join(blocks[2].splitlines()[2:]) + "\n"
    assert all_paths_block == single.stdout.split(
        "#node.id\tdepth\tdepth.uniq\n"
    )[1] or all_paths_block in single.stdout
