"""flash-tpu: shell parsing, IR optimization, evaluation."""

import gzip
import shutil

import pytest

from conftest import GRAPH_DIR
from pollen_tpu.fileformat import save_flatgfa
from pollen_tpu.flatgfa import parse_gfa_file
from pollen_tpu.shell import optimize, run_program, shell_to_ir

TINY = str(GRAPH_DIR / "tiny.gfa")


def render(text, opt=False):
    prog = shell_to_ir(text)
    if opt:
        prog = optimize(prog)
    return prog.render()


def run(text, opt=False, stdin=b""):
    prog = shell_to_ir(text)
    if opt:
        prog = optimize(prog)
    return run_program(prog, stdin).decode()


def test_ir_basic():
    out = render(f"odgi depth -i {TINY} -d")
    assert out == (
        f'parse-gfa("{TINY}") -> gfa-0\n' "node-depth(gfa-0) -> stdout\n"
    )


def test_unsupported_operators_rejected():
    """&&, || and & raise parse errors (the reference's translator
    rejects the same constructs with unimplemented!(), parse.rs:195-209
    — they must not silently become Exec argv tokens)."""
    from pollen_tpu.shell.parse import ShellParseError

    for text in (
        "odgi depth -d && echo done",
        "true || false",
        "sleep 1 &",
    ):
        with pytest.raises(ShellParseError):
            shell_to_ir(text)


def test_quoted_operators_stay_literal():
    """A quoted "|" (or ">x", "&&") is an argument word, not an
    operator — the reference's shell parser resolves quoting before
    the translator sees operators (flatgfa-sh/src/parse.rs:238-251).
    Regression test for the shlex-based lexer that erased the
    distinction."""
    prog = shell_to_ir('grep "|" f')
    out = prog.render()
    assert "pipe" not in out
    (instr,) = prog.instrs
    assert instr.args["command"] == "grep"
    assert instr.args["args"] == ("|", "f")

    prog = shell_to_ir('echo ">x" \'&&\' "a b"')
    (instr,) = prog.instrs
    assert instr.args["args"] == (">x", "&&", "a b")


def test_real_redirect_still_splits(tmp_path):
    """Unquoted attached redirections (`>out`) still lex as operator +
    word, and quote escapes behave POSIXly."""
    out = tmp_path / "o.txt"
    prog = shell_to_ir(f"echo hi >{out}")
    (instr,) = prog.instrs
    assert instr.args["args"] == ("hi",)

    from pollen_tpu.shell.parse import ShellParseError

    with pytest.raises(ShellParseError):
        shell_to_ir('echo "unterminated')
    with pytest.raises(ShellParseError):
        shell_to_ir("cat <<EOF")
    # Backslash escape keeps an operator literal too.
    (instr,) = shell_to_ir("echo \\|").instrs
    assert instr.args["args"] == ("|",)


def test_ir_pipeline_and_exec():
    out = render(f"odgi depth -i {TINY} -d | tail -n 2")
    assert "node-depth(gfa-0) -> pipe-0" in out
    assert "exec(pipe-0" in out and "command=tail" in out


def test_node_depth_matches_cli():
    from conftest import GOLDEN_DIR

    golden = (GOLDEN_DIR / "tiny.depth").read_text()
    assert run(f"odgi depth -i {TINY} -d") == golden


def test_exec_passthrough():
    out = run(f"odgi depth -i {TINY} -d | tail -n 1")
    assert out == "4\t1\t1\n"


def test_path_depth():
    out = run(f"odgi depth -i {TINY} -r alpha")
    assert out == "#path\tstart\tend\tmean.depth\nalpha\t0\t13\t1.46\n"


def test_makewindows_pipeline():
    out = run(
        f"odgi depth -i {TINY} -r alpha"
        " | bedtools makewindows -b /dev/stdin -w 5",
        opt=True,
    )
    assert out == "alpha\t0\t5\nalpha\t5\t10\nalpha\t10\t13\n"


def test_opt_depth_to_length():
    text = (
        f"odgi depth -i {TINY} -r alpha"
        " | bedtools makewindows -b /dev/stdin -w 5"
    )
    assert "path-depth" in render(text)
    optimized = render(text, opt=True)
    assert "path-length" in optimized
    assert "parse-bed" not in optimized  # BED round trip elided


def test_opt_flatgfa_substitution(tmp_path):
    gfa = tmp_path / "g.gfa"
    shutil.copy(TINY, gfa)
    save_flatgfa(str(tmp_path / "g.flatgfa"), parse_gfa_file(TINY))
    text = f"odgi depth -i {gfa} -d"
    plain = render(text)
    assert "parse-gfa" in plain
    optimized = render(text, opt=True)
    assert "map-file" in optimized and "g.flatgfa" in optimized
    # And it still evaluates correctly through the mmap path.
    from conftest import GOLDEN_DIR

    assert run(text, opt=True) == (GOLDEN_DIR / "tiny.depth").read_text()


def test_opt_og_view_elimination(tmp_path):
    og = tmp_path / "g.og"
    og.write_bytes(b"fake odgi file")
    shutil.copy(TINY, tmp_path / "g.gfa")
    text = f"odgi depth -i {og} -d"
    plain = render(text)
    assert "odgi-view" in plain
    optimized = render(text, opt=True)
    assert "odgi-view" not in optimized
    assert "g.gfa" in optimized


def test_opt_dedup_map_file(tmp_path):
    save_flatgfa(str(tmp_path / "g.flatgfa"), parse_gfa_file(TINY))
    flat = tmp_path / "g.flatgfa"
    text = f"odgi depth -i {flat} -d ; odgi depth -i {flat} -r alpha"
    optimized = render(text, opt=True)
    assert optimized.count("map-file") == 1


def test_gzip_input(tmp_path):
    gz = tmp_path / "g.gfa.gz"
    gz.write_bytes(gzip.compress(open(TINY, "rb").read()))
    plain = render(f"odgi depth -i {gz} -d")
    assert "gzip-decompress" in plain
    optimized = render(f"odgi depth -i {gz} -d", opt=True)
    assert "gzip-decompress" not in optimized
    assert "gz " in optimized  # fused encoded read
    from conftest import GOLDEN_DIR

    golden = (GOLDEN_DIR / "tiny.depth").read_text()
    assert run(f"odgi depth -i {gz} -d") == golden
    assert run(f"odgi depth -i {gz} -d", opt=True) == golden


def test_stdin_redirect_and_cat():
    data = open(TINY, "rb").read()
    out = run("odgi depth -d", stdin=data)
    from conftest import GOLDEN_DIR

    assert out == (GOLDEN_DIR / "tiny.depth").read_text()


def test_file_output_redirect(tmp_path):
    target = tmp_path / "out.txt"
    run(f"odgi depth -i {TINY} -d > {target}")
    assert target.read_text().startswith("#node.id")


def test_interval_depth(tmp_path):
    windows = tmp_path / "w.bed"
    run(
        f"odgi depth -i {TINY} -r alpha"
        f" | bedtools makewindows -b /dev/stdin -w 5 > {windows}"
    )
    out = run(f"odgi depth -i {TINY} -b {windows}")
    lines = out.strip().split("\n")
    assert lines[0] == "#path\tstart\tend\tmean.depth"
    assert len(lines) == 4
    assert lines[1].startswith("alpha\t0\t5\t")
