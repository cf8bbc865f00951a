"""Execute every console block in the shell README (trycmd-style: the
documentation is the test, reference: flatgfa-sh/src/main.rs:56-62)."""

import pathlib
import re
import subprocess

import pytest

from pollen_tpu.scripts import script_env

README = (
    pathlib.Path(__file__).resolve().parent.parent
    / "pollen_tpu"
    / "shell"
    / "README.md"
)
REPO = README.parent.parent.parent

_BLOCK = re.compile(r"```console\n\$ (.*?)\n(.*?)```", re.S)


def _blocks():
    text = README.read_text()
    return [(m.group(1), m.group(2)) for m in _BLOCK.finditer(text)]


@pytest.mark.parametrize(
    "command,expected", _blocks(), ids=[c[:40] for c, _ in _blocks()]
)
def test_readme_block(command, expected):
    result = subprocess.run(
        command,
        shell=True,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
        env=script_env(),
    )
    assert result.returncode == 0, result.stderr[-500:]
    assert result.stdout == expected
