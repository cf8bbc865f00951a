"""``flash-tpu``: the shell-DSL driver.

Usage (reference: flatgfa-sh/src/main.rs):

    flash-tpu -c 'odgi depth -i graph.gfa -d | tail -n 2'
    flash-tpu [-O] [-p] script.sh
    flash-tpu            # REPL

``-O`` enables the optimizer; ``-p`` pretend-prints the IR instead of
running it.
"""

from __future__ import annotations

import argparse
import sys

from .evaluate import run_program
from .opt import optimize
from .parse import shell_to_ir


def run_shell(text: str, do_opt: bool, pretend: bool) -> None:
    prog = shell_to_ir(text)
    if do_opt:
        prog = optimize(prog)
    if pretend:
        sys.stdout.write(prog.render())
        return
    stdin = b"" if sys.stdin.isatty() else sys.stdin.buffer.read()
    sys.stdout.buffer.write(run_program(prog, stdin))
    sys.stdout.flush()


def main() -> None:
    parser = argparse.ArgumentParser(prog="flash-tpu")
    parser.add_argument("-c", "--command", help="run one command string")
    parser.add_argument(
        "-O", "--optimize", action="store_true", help="optimize the IR"
    )
    parser.add_argument(
        "-p",
        "--pretend",
        action="store_true",
        help="print the IR instead of running",
    )
    parser.add_argument("script", nargs="?", help="script file to run")
    args = parser.parse_args()

    if args.command is not None:
        run_shell(args.command, args.optimize, args.pretend)
    elif args.script:
        with open(args.script, "r", encoding="utf-8") as f:
            run_shell(f.read(), args.optimize, args.pretend)
    else:
        # REPL.
        while True:
            try:
                line = input("flash> ")
            except EOFError:
                break
            if line.strip():
                try:
                    run_shell(line, args.optimize, args.pretend)
                except Exception as exc:  # keep the REPL alive
                    print(f"error: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
