"""The fixed-dimension depth "processing element" array as device code.

Reference semantics: pollen_py/pollen/depth/calyx_depth.py — every node
owns a fixed memory of crossing path ids; its PE counts considered
crossings (depth) and popcounts the AND of its paths-on-node bitvector
with the paths-to-consider bitvector (unique depth). All PEs run in
parallel. Here the PE array is one jitted batched computation: the
node axis is the batch, the bitvector ops become a one-hot presence
matrix on the VPU/MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_p",))
def node_depth_accel(
    path_ids: jax.Array,  # int32[N, E], 0 = empty slot
    consider: jax.Array,  # int32[P+1] bitvector (index 0 unused)
    max_p: int,
) -> Tuple[jax.Array, jax.Array]:
    """(depth int32[N], uniq int32[N]) for all node PEs at once."""
    consider = consider.astype(jnp.int32).at[0].set(0)

    # depth: count considered crossings (slot 0 never counts).
    w = consider[path_ids]
    depth = jnp.sum(w, axis=1)

    # uniq: presence bitvector per node AND consider, popcounted.
    ids = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, max_p + 1), 2
    )
    presence = jnp.any(path_ids[:, :, None] == ids, axis=1)
    presence = presence & (consider[None, :] > 0)
    uniq = jnp.sum(presence.astype(jnp.int32), axis=1)
    return depth, uniq


def run_accel(path_ids: np.ndarray, consider: np.ndarray):
    """Host driver: marshal memories in, run the PE array, marshal out."""
    max_p = consider.shape[0] - 1
    depth, uniq = node_depth_accel(
        jnp.asarray(path_ids), jnp.asarray(consider), max_p
    )
    return np.asarray(depth), np.asarray(uniq)


@partial(jax.jit, static_argnames=("max_p",))
def node_depth_accel_simple(
    path_ids: jax.Array,  # int32[N, E], 0 = empty slot
    consider: jax.Array,  # int32[P+1] bitvector (index 0 unused)
    max_p: int,
) -> Tuple[jax.Array, jax.Array]:
    """Single-PE variant: one processing element re-used across nodes.

    Reference semantics: pollen_py/pollen/depth/processing-elements/
    calyx_depth_simple.py — the design-study generator that time-shares
    one hardware PE over every node instead of instantiating one per
    node. Here the node axis becomes a sequential ``lax.scan`` carrying
    the PE through the node memories; outputs are bit-identical to the
    batched PE array (tests/test_accel.py)."""
    consider = consider.astype(jnp.int32).at[0].set(0)
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, max_p + 1), 1)

    def pe(carry, node_ids):
        w = consider[node_ids]
        depth = jnp.sum(w)
        presence = jnp.any(node_ids[:, None] == ids, axis=0)
        presence = presence & (consider > 0)
        uniq = jnp.sum(presence.astype(jnp.int32))
        return carry, (depth, uniq)

    _, (depth, uniq) = jax.lax.scan(pe, 0, path_ids)
    return depth, uniq
