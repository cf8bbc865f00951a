"""Probe the download sizes of the corpus-book graphs.

Reference analogue: bench/sizes.py (HEAD request per URL, human
formatting). This environment has no network egress, so remote probes
are expected to fail individually and are reported as unreachable; the
``gen.*`` entries are measured from their locally generated files.

Usage: python -m benchsuite.sizes [category ...]
"""

from __future__ import annotations

import os
import sys
import tomllib
import urllib.error
import urllib.request

GRAPHS_TOML = os.path.join(os.path.dirname(__file__), "graphs.toml")

SIZE_NAMES = {0: "", 3: "k", 6: "M", 9: "G", 12: "T"}


def fmt_size(count: float) -> str:
    for scale, name in sorted(SIZE_NAMES.items(), reverse=True):
        unit = 10 ** scale
        if count > unit:
            return "{:.0f}{}B".format(count / unit, name)
    return f"{count:.0f}B"


def remote_size(url: str, timeout: float = 10.0) -> int:
    req = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(req, timeout=timeout) as res:
        return int(res.headers["Content-Length"])


def show_sizes(categories=()) -> None:
    with open(GRAPHS_TOML, "rb") as f:
        graphs_data = tomllib.load(f)

    for category, graphs in graphs_data.items():
        if categories and category not in categories:
            continue
        for name, entry in graphs.items():
            url = entry if isinstance(entry, str) else entry.get("url", "")
            if not url.startswith(("http://", "https://")):
                # locally generated graph: measure the file if present
                path = os.path.join(
                    os.path.dirname(__file__), "graphs", f"{name}.gfa"
                )
                if os.path.exists(path):
                    print(category, name, fmt_size(os.path.getsize(path)))
                else:
                    print(category, name, "(not generated)")
                continue
            try:
                print(category, name, fmt_size(remote_size(url)))
            except (urllib.error.URLError, OSError, ValueError) as exc:
                print(category, name, f"(unreachable: {exc})")


if __name__ == "__main__":
    show_sizes(tuple(sys.argv[1:]))
