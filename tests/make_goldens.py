"""Regenerate golden outputs for every fixture graph using the spec layer.

The spec layer itself was validated byte-for-byte against the reference
oracle (slow_odgi) at development time; these files freeze that behavior
so the fast engine can be tested hermetically.

Run from the repo root:  python tests/make_goldens.py
"""

from __future__ import annotations

import io
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pollen_tpu.spec import commands
from pollen_tpu.spec.model import Bed, Graph

GRAPHS = sorted((REPO / "tests" / "graphs").glob("*.gfa"))
GOLDEN = REPO / "tests" / "golden"


def capture(fn, *args) -> str:
    out = io.StringIO()
    fn(*args, out)
    return out.getvalue()


def emit(graph: Graph, include_links: bool = True) -> str:
    out = io.StringIO()
    graph.emit(out, include_links)
    return out.getvalue()


def main() -> None:
    GOLDEN.mkdir(exist_ok=True)
    for path in GRAPHS:
        stem = path.stem
        graph = Graph.parse_file(str(path))

        def save(ext: str, text: str) -> None:
            (GOLDEN / f"{stem}.{ext}").write_text(text)

        # Subset-paths and BED query inputs (seeded => reproducible).
        subset = io.StringIO()
        commands.some_paths(graph, subset, 50)
        save("depthpaths", subset.getvalue())
        subset_list = [ln for ln in subset.getvalue().splitlines() if ln]

        beds_text = capture(lambda g, out: commands.inject_setup(g, out), graph)
        save("bed", beds_text)
        beds = [Bed.parse(ln) for ln in beds_text.splitlines() if ln]

        save("depth", capture(commands.depth, graph))
        save("depth_subset", capture(lambda g, o: commands.depth(g, o, subset_list), graph))
        save("degree", capture(commands.degree, graph))
        save("matrix", capture(commands.matrix, graph))
        save("paths", capture(commands.paths, graph))
        save("validate", capture(commands.validate, graph))
        save("flatten", capture(lambda g, o: commands.flatten(g, o, f"tests/graphs/{stem}.og"), graph))
        all_paths = list(graph.paths)
        save("overlap", capture(lambda g, o: commands.overlap(g, o, all_paths), graph))

        save("norm", emit(commands.norm(graph)))
        save("crush", emit(commands.crush(graph)))
        save("flip", emit(commands.flip(graph)))
        save("chop", emit(commands.chop(graph, 3), include_links=False))
        # inject mutates its input; re-parse for a fresh graph.
        fresh = Graph.parse_file(str(path))
        save("inject", emit(commands.inject(fresh, beds), include_links=False))
        vs = commands.validate_setup(Graph.parse_file(str(path)))
        save("validate_setup", emit(vs))
        # Validate the *emitted* graph (normalized path order), as a
        # pipeline consumer would see it.
        reparsed = Graph.parse_lines(iter(emit(vs).splitlines()))
        save("validate_broken", capture(commands.validate, reparsed))

    print(f"wrote goldens for {len(GRAPHS)} graphs into {GOLDEN}")


if __name__ == "__main__":
    main()
