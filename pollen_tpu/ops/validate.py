"""Validate: does the link set support every path's adjacent step pairs?
(reference semantics: slow_odgi/validate.py).

TPU design: the per-pair hash lookups become a vectorized sorted-set
membership test — link endpoint pairs are packed into u64 keys, sorted
once at ingest, and every adjacent step pair in every path is probed
with one batched ``searchsorted``. A pair (a, b) is supported if the
link a->b exists or the link flip(b)->flip(a) does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..flatgfa import GraphArrays


def link_keys(g: GraphArrays) -> np.ndarray:
    """Sorted u64 keys of all links: (from_handle << 32) | to_handle."""
    keys = (g.link_from.astype(np.uint64) << np.uint64(32)) | g.link_to.astype(
        np.uint64
    )
    keys.sort()
    return keys


@jax.jit
def _unsupported_pairs(
    steps: jax.Array,  # uint32[S] packed handles (natural order)
    step_path: jax.Array,  # int32[S]
    keys: jax.Array,  # uint64[L] sorted link keys
) -> jax.Array:
    """bool[S-1]: True where (steps[i], steps[i+1]) is an unsupported
    adjacent pair within one path."""
    a = steps[:-1].astype(jnp.uint64)
    b = steps[1:].astype(jnp.uint64)
    same_path = step_path[:-1] == step_path[1:]

    def member(k):
        if keys.shape[0] == 0:
            return jnp.zeros(k.shape, dtype=bool)
        idx = jnp.clip(
            jnp.searchsorted(keys, k), 0, keys.shape[0] - 1
        )
        return keys[idx] == k

    fwd = member((a << jnp.uint64(32)) | b)
    rev = member(((b ^ jnp.uint64(1)) << jnp.uint64(32)) | (a ^ jnp.uint64(1)))
    return same_path & ~(fwd | rev)


def run_validate(g: GraphArrays) -> str:
    if g.num_steps < 2:
        return ""
    bad = np.asarray(
        _unsupported_pairs(
            jnp.asarray(g.steps),
            jnp.asarray(g.step_path_ids()),
            jnp.asarray(link_keys(g)),
        )
    )
    if not bad.any():
        return ""
    names = g.seg_name.astype("U20")
    segs = g.step_segs
    rev = g.step_reverse.astype(bool)
    path_ids = g.step_path_ids()
    lines = []
    for i in np.flatnonzero(bad):
        pname = g.path_name_bytes(int(path_ids[i])).decode()
        a = f"{names[segs[i]]}{'-' if rev[i] else '+'}"
        b = f"{names[segs[i + 1]]}{'-' if rev[i + 1] else '+'}"
        lines.append(
            f"[odgi::validate] error: the path {pname} does not respect "
            f"the graph topology: the link {a},{b} is missing."
        )
    return "\n".join(lines) + "\n"


def run_stats(g: GraphArrays, self_loops: bool = False) -> str:
    """Graph statistics (reference: cli/cmds.rs stats)."""
    if not self_loops:
        return (
            "#length\tnodes\tedges\tpaths\tsteps\n"
            f"{g.seq_data.shape[0]}\t{g.num_segments}\t{g.num_links}\t"
            f"{g.num_paths}\t{g.num_steps}\n"
        )
    from_seg = g.link_from >> 1
    to_seg = g.link_to >> 1
    loops = from_seg == to_seg
    total = int(loops.sum())
    unique = int(np.unique(from_seg[loops]).shape[0])
    return f"#type\tnum\ntotal\t{total}\nunique\t{unique}\n"
