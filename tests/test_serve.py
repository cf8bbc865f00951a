"""fgfa-tpu serve: resident-graph query server over stdin/stdout."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
TINY = "tests/graphs/tiny.gfa"


def _serve(requests: str) -> str:
    result = subprocess.run(
        [sys.executable, "-m", "pollen_tpu.cli", "-I", TINY, "serve"],
        input=requests,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=180,
    )
    assert result.returncode == 0, result.stderr[-500:]
    return result.stdout


def _single(*argv: str) -> str:
    result = subprocess.run(
        [sys.executable, "-m", "pollen_tpu.cli", "-I", TINY, *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=180,
    )
    assert result.returncode == 0, result.stderr[-500:]
    return result.stdout


def test_serve_matches_single_shot():
    out = _serve("depth -d\npaths\nstats -S\n")
    frames = out.split("##end\tok\n")
    assert len(frames) == 4 and frames[-1] == ""
    assert frames[0] == _single("depth", "-d")
    assert frames[1] == _single("paths")
    assert frames[2] == _single("stats", "-S")


def test_serve_subset_depth(tmp_path):
    subset = tmp_path / "subset.txt"
    subset.write_text("alpha\n")
    out = _serve(f"depth -d -s {subset}\n")
    assert out.endswith("##end\tok\n")
    assert out[: -len("##end\tok\n")] == _single(
        "depth", "-d", "-s", str(subset)
    )


def test_serve_survives_bad_requests():
    out = _serve(
        "depth --no-such-flag\n"  # argparse error
        "serve\n"  # blocked command
        "position -g nope\n"  # parse error of operands
        "paths\n"
    )
    lines = out.splitlines()
    errors = [ln for ln in lines if ln.startswith("##end\terror")]
    assert len(errors) == 3
    assert out.endswith("##end\tok\n")
    assert "alpha" in out and "beta" in out


def test_serve_blocks_reload():
    out = _serve(f"-I {TINY} depth -d\n")
    assert "##end\terror" in out and "re-load" in out


def test_depth_subset_batch_cli(tmp_path):
    """`depth -S file` answers every subset in one batched pass, each
    table equal to the matching single `-s` query."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graph = os.path.join(repo, "tests", "graphs", "tiny.gfa")
    batch = tmp_path / "subsets.txt"
    # Discover path names from the paths listing.
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "pollen_tpu.cli", "-I", graph, *extra],
            capture_output=True,
            text=True,
            cwd=repo,
            env=env,
            timeout=300,
        ).stdout

    names = [ln for ln in run("paths").splitlines() if ln]
    assert len(names) >= 2
    batch.write_text(f"{names[0]}\n{names[0]},{names[1]}\n")
    got = run("depth", "-d", "-S", str(batch))
    singles = []
    for i, subset in enumerate(([names[0]], [names[0], names[1]])):
        f = tmp_path / f"s{i}.txt"
        f.write_text("\n".join(subset) + "\n")
        singles.append(f"##query\t{i}\n" + run("depth", "-d", "-s", str(f)))
    assert got == "".join(singles)


def test_masked_index_gate():
    """Only depth -d -s and depth -S build the masked-query indexes;
    every other command (including bare depth -s, which dispatches to
    path depth, and depth -b ... -s) skips the multi-second crossing
    matrix / ELL construction."""
    from pollen_tpu.cli import _needs_masked_index, build_parser

    parser = build_parser()

    def needs(argv):
        return _needs_masked_index(parser.parse_args(argv))

    assert needs(["depth", "-d", "-s", "subset.txt"])
    assert needs(["depth", "-S", "subsets.txt"])
    assert not needs(["depth", "-d"])
    assert not needs(["depth", "-s", "subset.txt"])  # path depth
    assert not needs(["depth", "-b", "x.bed", "-s", "subset.txt"])
    assert not needs(["depth", "-r", "alpha"])
    assert not needs(["degree"])
    assert not needs(["chop", "-c", "3"])
