"""Result summarizer (reference analogue: bench/summary.py): per-mode
runtime ratios vs the fastest tool, aggregated with the harmonic mean."""

from __future__ import annotations

import csv
import statistics
import sys
from collections import defaultdict
from typing import Dict, List


def summarize(csv_path: str) -> str:
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))

    # mode -> graph -> tool -> mean time
    data: Dict[str, Dict[str, Dict[str, float]]] = defaultdict(
        lambda: defaultdict(dict)
    )
    for row in rows:
        data[row["mode"]][row["graph"]][row["tool"]] = float(row["mean"])

    out: List[str] = []
    for mode, graphs in data.items():
        out.append(f"mode: {mode}")
        ratios: Dict[str, List[float]] = defaultdict(list)
        for graph, tools in graphs.items():
            fastest = min(tools.values())
            detail = ", ".join(
                f"{tool} {t * 1e3:.1f}ms" for tool, t in sorted(tools.items())
            )
            out.append(f"  {graph}: {detail}")
            for tool, t in tools.items():
                ratios[tool].append(t / fastest)
        for tool, rs in sorted(ratios.items()):
            out.append(
                f"  {tool}: {statistics.harmonic_mean(rs):.2f}x of fastest"
            )
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    sys.stdout.write(summarize(sys.argv[1]))
