"""Seeded random GFA generator for tests and benchmarks.

Produces odgi-flavored graphs: integer segment names 1..N, a linear
backbone with bubbles and reverse edges, and paths generated as random
walks over the link set (so `validate` is clean), with a configurable
fraction of N bases for `crush` coverage.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"


def random_graph(
    n_segs: int = 50,
    n_paths: int = 8,
    seed: int = 0,
    max_seg_len: int = 12,
    n_frac: float = 0.1,
    walk_len: int = 40,
    with_overlap_col: bool = False,
) -> str:
    """Build a random GFA text document."""
    rng = np.random.default_rng(seed)
    lines = ["H\tVN:Z:1.0"]

    seqs = []
    for i in range(1, n_segs + 1):
        length = int(rng.integers(1, max_seg_len + 1))
        chars = rng.choice(list(BASES), size=length)
        n_mask = rng.random(length) < n_frac
        chars[n_mask] = "N"
        seqs.append("".join(chars))
        lines.append(f"S\t{i}\t{seqs[-1]}")

    # Links: a backbone plus random extras (both orientations).
    links = set()
    for i in range(1, n_segs):
        links.add((i, "+", i + 1, "+"))
    n_extra = max(n_segs // 2, 4)
    for _ in range(n_extra):
        a = int(rng.integers(1, n_segs + 1))
        b = int(rng.integers(1, n_segs + 1))
        ori_a = "+" if rng.random() < 0.8 else "-"
        ori_b = "+" if rng.random() < 0.8 else "-"
        links.add((a, ori_a, b, ori_b))
    link_list = sorted(links)

    # Adjacency over oriented handles, including implied reverse traversal.
    adj: dict = {}
    for a, oa, b, ob in link_list:
        adj.setdefault((a, oa), []).append((b, ob))
        flip = {"+": "-", "-": "+"}
        adj.setdefault((b, flip[ob]), []).append((a, flip[oa]))

    paths = []
    for p in range(n_paths):
        node = (int(rng.integers(1, n_segs + 1)), "+")
        steps = [node]
        for _ in range(walk_len - 1):
            choices = adj.get(steps[-1])
            if not choices:
                break
            steps.append(choices[int(rng.integers(0, len(choices)))])
        toks = ",".join(f"{s}{o}" for s, o in steps)
        if with_overlap_col:
            olap = ",".join("0M" for _ in steps[:-1]) or "*"
        else:
            olap = "*"
        paths.append(f"P\tpath{p}\t{toks}\t{olap}")
    lines.extend(paths)

    for a, oa, b, ob in link_list:
        lines.append(f"L\t{a}\t{oa}\t{b}\t{ob}\t0M")

    return "\n".join(lines) + "\n"


def big_step_graph(n_segs: int, n_steps: int, n_paths: int, seed: int = 0) -> str:
    """A benchmark-shaped graph: a huge flat step list over n_segs."""
    rng = np.random.default_rng(seed)
    lines = ["H\tVN:Z:1.0"]
    for i in range(1, n_segs + 1):
        length = int(rng.integers(1, 32))
        lines.append("S\t%d\t%s" % (i, "".join(rng.choice(list(BASES), length))))
    per_path = n_steps // n_paths
    for p in range(n_paths):
        segs = rng.integers(1, n_segs + 1, size=per_path)
        oris = np.where(rng.random(per_path) < 0.9, "+", "-")
        toks = ",".join(f"{s}{o}" for s, o in zip(segs, oris))
        lines.append(f"P\tp{p}\t{toks}\t*")
    return "\n".join(lines) + "\n"
