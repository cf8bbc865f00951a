"""``fgfa-tpu``: the command-line driver for the flat TPU engine.

Mirrors the reference's ``fgfa`` CLI surface (reference:
flatgfa/src/cli/main.rs:9-55) — I/O mode selection plus one subcommand
per query — with the compute path running through JAX.

Subcommands land here as the engine grows; ``norm``/``paths`` work today.
"""

from __future__ import annotations

import argparse
import sys

from .emit import emit_gfa
from .flatgfa import GraphArrays, parse_gfa_file


def _load(args: argparse.Namespace) -> GraphArrays:
    if args.input:
        from .fileformat import load_flatgfa

        return load_flatgfa(args.input)
    if args.input_gfa:
        return parse_gfa_file(args.input_gfa)
    data = sys.stdin.buffer.read()
    from .flatgfa import parse_gfa

    return parse_gfa(data)


def _store(args: argparse.Namespace, g: GraphArrays) -> bool:
    """Write the graph per the output flags; True if something was written."""
    if args.output:
        from .fileformat import save_flatgfa

        save_flatgfa(args.output, g)
        return True
    if args.output_gfa:
        with open(args.output_gfa, "w", encoding="ascii") as f:
            f.write(emit_gfa(g, order="preserved"))
        return True
    return False


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="fgfa-tpu")
    parser.add_argument("-i", "--input", help="read a binary FlatGFA file")
    parser.add_argument("-I", "--input-gfa", help="read a GFA text file")
    parser.add_argument("-o", "--output", help="write a binary FlatGFA file")
    parser.add_argument("-O", "--output-gfa", help="write a GFA text file")
    sub = parser.add_subparsers(dest="command", metavar="COMMAND")

    sub.add_parser("paths", help="list the paths")
    sub.add_parser("norm", help="emit the graph in normalized order")

    return parser


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()
    g = _load(args)

    if args.command == "paths":
        for name in g.path_names():
            print(name.decode())
    elif args.command == "norm":
        sys.stdout.write(emit_gfa(g, order="sorted"))
    elif args.command is None:
        if not _store(args, g):
            sys.stdout.write(emit_gfa(g, order="preserved"))
    else:
        parser.error(f"unknown command {args.command!r}")


if __name__ == "__main__":
    main()
