"""CLI: python -m benchsuite --modes depth paths --graphs smoke"""

from __future__ import annotations

import argparse

from . import runner, summary


def main() -> None:
    parser = argparse.ArgumentParser(prog="benchsuite")
    parser.add_argument(
        "--modes", nargs="+", default=["depth"], help="modes to run"
    )
    parser.add_argument("--graphs", default="smoke", help="graph set")
    args = parser.parse_args()
    csv_path = runner.run(args.modes, args.graphs)
    print(summary.summarize(str(csv_path)))


if __name__ == "__main__":
    main()
