"""C API: build the shared library + example program and run it."""

import pathlib
import shutil
import subprocess

import pytest

NATIVE = pathlib.Path(__file__).resolve().parent.parent / "pollen_tpu" / "native"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="C++ toolchain unavailable"
)


@pytest.fixture(scope="module")
def example(tmp_path_factory):
    d = tmp_path_factory.mktemp("capi")
    subprocess.run(
        [
            "g++",
            "-O2",
            "-shared",
            "-fPIC",
            "-pthread",
            "-std=c++17",
            "-o",
            str(d / "libpollen_capi.so"),
            str(NATIVE / "capi.cpp"),
            str(NATIVE / "gfa_scan.cpp"),
            "-I",
            str(NATIVE),
        ],
        check=True,
    )
    subprocess.run(
        [
            "g++",
            str(NATIVE / "example.c"),
            "-o",
            str(d / "example"),
            "-I",
            str(NATIVE),
            "-L",
            str(d),
            "-lpollen_capi",
            f"-Wl,-rpath,{d}",
        ],
        check=True,
    )
    return d / "example"


def test_capi_example(example):
    out = subprocess.run(
        [str(example), "tests/graphs/tiny.gfa"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "segments: 4" in out
    assert "seg 2: GATTACA" in out
    assert "paths: 2" in out
    assert "alpha: 0+ 1+ 2+" in out


def test_capi_parse_failure(example, tmp_path):
    bad = tmp_path / "bad.gfa"
    bad.write_text("X\tnope\n")
    result = subprocess.run(
        [str(example), str(bad)], capture_output=True, text=True
    )
    assert result.returncode == 1
    assert "parse failed" in result.stderr
