"""ELL-packed run index: masked depth + uniq with no gathers, no
boundary stage, and no dense (path, segment) matrix.

The run-level index (device.py) is a sparse matrix: per segment, the
list of (path, count) crossings. This kernel stores it ELLPACK-style —
``K`` fixed slots per segment column, each an int32 packing
``path << 16 | count`` (empty slots are 0) — so the masked depth query
is a short, regular reduction over the slot axis:

    depth[s] = sum_k  mask[path(v_ks)] * count(v_ks)
    uniq[s]  = sum_k  mask[path(v_ks)] * (v_ks != 0)

The mask lookup — the gather that makes XLA's TPU backend crawl — is
replaced by **bitwise word selection**: the query mask is packed into
P/32 int32 words held in SMEM; each slot extracts its path's bit with
a constant-depth select chain plus one variable shift. Everything is
int32 VPU work on K*N values; with crossings averaging ~2 runs per
segment this touches ~K/P of the dense crossing matrix's cells
(kernels/crossmat.py) and ~4 bytes per run of HBM — ~2 with the
pack16 paired-slot form (pair_ell16) used for <= 256-path graphs.

Segments with more than K runs (or any count >= 2**16) are routed
whole to the dense residual sidecar (device.py), which restores both
depth and uniq with one tiny dot + K-sized scatter.

Reference semantics: flatgfa/src/ops/depth.rs:15-39. Layout pick per
graph by the byte-cost model in ops/depth.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
# Tile width along the segment axis; (K, width) int32 slots per step.
# 8192-wide tiles balloon the Mosaic compile from ~1.6 s to >6 min on
# this toolchain (lane-block unrolling over the select chain); 4096
# compiles fast and keeps the grid short.
ELL_BLOCK = 4096
COUNT_BITS = 16
COUNT_MAX = (1 << COUNT_BITS) - 1


# Measured equivalent-streamed-byte weights, fit from the r4 ellcal1
# probe sweep (probes/RESULTS.txt; standalone kernels at multiple
# sizes, P=128). Units: equivalent streamed bytes at the 657 GB/s
# roofline (657 B == 1 ns). The old single C_SLOT=12 / heavy=1.75
# constants conflated each kernel's ~5-6 us standalone fixed cost into
# the marginals, which made every small-but-wide tier look too
# expensive and barred a third tier outright. The fits decompose:
#
# * tier kernel: 12.9 ps/slot at k=1, 6.9 ps/slot at k=4 ==
#   per-SLOT a + per-COLUMN b with a = 3.25, b = 5.25 (the b term is
#   the two int32 output writes per column, amortized over k slots);
#   per-slot work scales with the mask-word select chain, so `a` is
#   parameterized by n_words (calibrated at n_words = 4, extrapolated
#   linearly in the select count beyond it).
# * heavy nibble pass: 2.26 ps per packed byte == 0.74 equiv B per
#   (path, column) cell pair member — C_HEAVY_PER_PATH.
# * fixed cost: ~4.8-6.4 us per STANDALONE kernel; inside the fused
#   split grid an extra phase costs ~2 us (C_TIER_FIXED), inferred
#   from the 14.9 us three-phase total vs 5.5 us of summed marginals.
C_COL_B = 5.25  # per padded tier column (output writes)
C_HEAVY_PER_PATH = 0.74
C_HEAVY_PER_BYTE = 2 * C_HEAVY_PER_PATH
C_TIER_FIXED = 1.3e6  # ~2 us per extra fused phase
# Nominal batch the "batch" planning objective amortizes fixed costs
# over. This IS the serving batch size: ops/depth.py chunks batches at
# this Q (its ELL_BATCH_CHUNK aliases this constant) and the CLI
# serves at it, so the amortization constant and the real batch agree.
ELL_BATCH_Q = 32


def c_slot_a(n_words: int = 4) -> float:
    """Marginal per-slot cost: unpack + (n_words-1)-select tournament
    + shift + two MACs. The intercept reproduces the ellcal1 fit
    exactly at the calibration point (a = 3.25 at n_words = 4)."""
    return 1.15 + 0.7 * max(n_words - 1, 1)




def plan_ell_tiers_n(
    runs_per_seg: np.ndarray,
    big_seg: np.ndarray,
    p_pad: int,
    max_tiers: int = 3,
    objective: str = "single",
):
    """Up-to-``max_tiers``-way sliced-ELL split: tier t's columns get
    K_t slots (K_1 < K_2 < ...); the rest of the crossed segments go
    dense ("heavy"). Crossing counts follow a Zipf law, so one small K
    wastes dense work on mid-popularity segments — a second tier
    measured ~30% off the whole query at bench shape, and a third
    shrinks the heavy class further once the fixed per-phase cost is
    charged honestly (C_TIER_FIXED vs the marginals). Segments no path
    crosses are excluded from every class — their depth/uniq are
    identically zero at ingest and buy no device work at all.

    ``objective``: "single" charges each phase its full fixed cost
    (the Q=1 query pays every launch); "batch" amortizes it over a
    nominal batch (the batched kernel reads each slot block once per
    batch, so per-QUERY cost is slot-dominated and finer tiers with
    fewer wasted slots win — measured 5.57 vs 6.46 us/query at Q=16
    for the 1+4-tier vs single-k4 plans at bench shape).

    Returns ``(ks, tiers, heavy_mask)``: ``ks`` a tuple of slot counts
    (possibly length < max_tiers), ``tiers`` the matching list of
    bool masks, ``heavy_mask`` the dense remainder. ``ks`` is empty
    only when no crossed segment fits any K (all heavy)."""
    crossed = runs_per_seg > 0
    valid = ~big_seg & crossed
    # No tier-count cap for the batch objective: three-plus-tier batch
    # plans route through the per-tier split emission
    # (masked_ell_splitn_depth_batch_split), which compiles where the
    # fused 3-tier program crashed the helper in r4. Measured on
    # hardware (r5 ellb3/ellb3ok): a forced k=1,4,16 3-tier batch at
    # Q=16 runs 6.75 us/query, diff=0 — real but beaten at bench shape
    # by the model's own heavy-dominant 2-class pick (4.99 us), so the
    # search decides per graph; chr8-shaped graphs genuinely plan
    # three tiers (k=1,2,8).
    # Tiers are charged at their RESIDENT (tall-padded) column counts:
    # pack_ell_tall pads to SUB*TALL_W-column tiles, so a small tier
    # with a large K is far costlier than its raw count suggests.
    tile = SUB * TALL_W

    def pad(n: int) -> int:
        return -(-n // tile) * tile if n else 0

    import itertools

    n_crossed = int(crossed.sum())
    n_words = max(-(-p_pad // 32), 1)
    a = c_slot_a(n_words)
    # Batch objective: the batched kernel amortizes per-phase fixed
    # cost AND the heavy unpack/matmul over the whole batch (the
    # serving batch, ELL_BATCH_Q); what stays per-query is the select
    # work per slot and the output writes per column (~8 B). Heavy
    # columns therefore cost ~8 equiv B per query instead of
    # C_HEAVY_PER_PATH * p_pad.
    if objective == "single":
        tier_fixed = C_TIER_FIXED
        heavy_per_col = C_HEAVY_PER_PATH * p_pad
    else:
        tier_fixed = C_TIER_FIXED / ELL_BATCH_Q
        heavy_per_col = C_HEAVY_PER_PATH * p_pad / ELL_BATCH_Q + 8
    kset = (1, 2, 4, 8, 16, 32)
    # One O(n) pass per candidate K; the 41-combination search then
    # works on the 6-entry cumulative counts (ks are ascending, so a
    # tier's count is a difference of two of them). Masks materialize
    # only for the winning plan.
    c_le = {k: int((valid & (runs_per_seg <= k)).sum()) for k in kset}
    best = None
    for size in range(1, max_tiers + 1):
        for ks in itertools.combinations(kset, size):
            counts = []
            prev_le = 0
            ok = True
            for k in ks:
                n_t = c_le[k] - prev_le
                if n_t == 0:
                    ok = False  # equivalent to a smaller subset
                    break
                counts.append(n_t)
                prev_le = c_le[k]
            if not ok:
                continue
            nh = n_crossed - sum(counts)
            cost = sum(
                tier_fixed + (a * k + C_COL_B) * pad(n_t)
                for k, n_t in zip(ks, counts)
            )
            if nh:
                cost += tier_fixed + heavy_per_col * nh
            if best is None or cost < best[0]:
                best = (cost, ks)
    if best is None:
        # No crossed segment fits any K: everything heavy (the ingest
        # gate then skips ELL and the dense/scan indexes serve).
        return (), [], crossed.copy()
    _, ks = best
    masks = []
    prev = np.zeros_like(valid)
    for k in ks:
        t = valid & (runs_per_seg <= k) & ~prev
        masks.append(t)
        prev = prev | t
    return ks, masks, crossed & ~prev


def plan_ell_tiers(
    runs_per_seg: np.ndarray,
    big_seg: np.ndarray,
    p_pad: int,
) -> Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """Two-tier compatibility form of :func:`plan_ell_tiers_n`.

    Returns ``(k1, k2, tier1_mask, tier2_mask, heavy_mask)`` with
    ``k2 == 0`` (and an all-false tier2) when a middle tier does not
    pay; the remainder (``~t1 & ~t2 & ~heavy``) is the empty class."""
    ks, masks, heavy = plan_ell_tiers_n(
        runs_per_seg, big_seg, p_pad, max_tiers=2
    )
    empty = np.zeros_like(heavy)
    if not ks:
        return 1, 0, empty, empty, heavy
    if len(ks) == 1:
        return ks[0], 0, masks[0], empty, heavy
    return ks[0], ks[1], masks[0], masks[1], heavy


def plan_ell(
    runs_per_seg: np.ndarray,
    big_seg: np.ndarray,
    p_pad: int,
) -> Tuple[int, np.ndarray]:
    """Pick K in {1, 2, 4, 8, 16} and the heavy-segment split.

    A segment is *heavy* for a given K when its runs overflow K slots
    (or any count overflows the 16-bit packing — ``big_seg``). Heavy
    segments move whole to the nibble-packed sub-matrix sidecar, so the
    streamed cost is ``4 K`` bytes per light column plus ``p_pad / 2``
    bytes per heavy column; minimize over K. Returns ``(k, heavy)``
    with ``heavy`` a bool mask over segments."""
    best = None
    for k in (1, 2, 4, 8, 16):
        heavy = (runs_per_seg > k) | big_seg
        nh = int(heavy.sum())
        nl = runs_per_seg.shape[0] - nh
        nl_pad = -(-max(nl, 1) // LANES) * LANES
        nh_pad = -(-nh // LANES) * LANES if nh else 0
        cost = 4 * k * nl_pad + (p_pad // 2) * nh_pad
        if best is None or cost < best[0]:
            best = (cost, k, heavy)
    return best[1], best[2]


def pack_ell(
    run_path: np.ndarray,
    run_count: np.ndarray,
    run_col: np.ndarray,
    slot: np.ndarray,
    k: int,
    n_cols_pad: int,
) -> np.ndarray:
    """Pack runs into int32[K, n_cols_pad] ELL slots
    (``path << 16 | count``; empty slots 0). ``run_col`` is each run's
    column, ``slot`` its slot index (must be < K, counts <= COUNT_MAX —
    the caller routed overflowing segments to the heavy sidecar)."""
    ell = np.zeros((k, n_cols_pad), np.int32)
    ell[slot, run_col] = (
        run_path.astype(np.int32) << COUNT_BITS
    ) | run_count.astype(np.int32)
    return ell


def build_ell(
    run_path: np.ndarray,
    run_count: np.ndarray,
    run_seg: np.ndarray,
    num_segments: int,
    k: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack the run-level index into ELL slots over ALL segments
    (heavy columns left empty) — the pre-split layout, kept for direct
    kernel tests and small graphs.

    Returns ``(ell, heavy_segs)``: ``ell`` is int32[K, N_pad] with
    ``path << 16 | count`` per slot, zero-padded; ``heavy_segs`` lists
    segments whose runs did NOT fit (too many runs or count overflow).
    Runs must arrive segment-grouped (the (segment, path) sort order of
    device.py ingest).
    """
    n_pad = -(-max(num_segments, 1) // LANES) * LANES
    runs_per_seg = np.bincount(run_seg, minlength=num_segments)
    big_seg = np.zeros(num_segments, bool)
    big_seg[run_seg[run_count > COUNT_MAX]] = True
    if k is None:
        p = int(run_path.max(initial=0)) + 1
        p_pad = -(-max(p, 1) // LANES) * LANES
        k, heavy_b = plan_ell(runs_per_seg, big_seg, p_pad)
    else:
        heavy_b = (runs_per_seg > k) | big_seg
    heavy = np.flatnonzero(heavy_b).astype(np.int32)
    # Slot index of each run within its segment (runs are grouped).
    seg_starts = np.concatenate(([0], np.cumsum(runs_per_seg)))
    slot = np.arange(run_seg.size, dtype=np.int64) - seg_starts[run_seg]
    keep = ~heavy_b[run_seg]
    ell = pack_ell(
        run_path[keep], run_count[keep], run_seg[keep], slot[keep], k, n_pad
    )
    return ell, heavy


def _select_word(widx: jax.Array, words) -> jax.Array:
    """Per-lane selection of the mask word ``words[widx]`` via a
    log-depth tournament of compare+selects — ``words`` is a
    static-length list of scalar int32s, so this is n_words-1 selects
    (depth ceil(log2 n_words)), no gather."""
    # Round l merges candidates i and i + 2^l, keyed on bit l of widx.
    cands = [
        (jnp.int32(j), jnp.full(widx.shape, w, jnp.int32))
        for j, w in enumerate(words)
    ]
    level = 0
    while len(cands) > 1:
        bit = (widx >> level) & 1
        merged = []
        for i in range(0, len(cands), 2):
            if i + 1 == len(cands):
                merged.append(cands[i])
                continue
            lo_j, lo = cands[i]
            _, hi = cands[i + 1]
            merged.append((lo_j, jnp.where(bit == 1, hi, lo)))
        cands = merged
        level += 1
    return cands[0][1]


def _kernel(mask_ref, ell_ref, depth_ref, uniq_ref, *, n_words):
    v = ell_ref[:]  # (K, width) int32
    # Mask off the sign-extension: ``>>`` is arithmetic, and paths
    # >= 2**15 set the packed word's sign bit.
    pid = (v >> COUNT_BITS) & 0xFFFF
    cnt = v & COUNT_MAX
    words = [mask_ref[j] for j in range(n_words)]
    w32 = _select_word(pid >> 5, words)
    bit = (w32 >> (pid & 31)) & 1
    depth = jnp.sum(bit * cnt, axis=0, keepdims=True)
    uniq = jnp.sum(bit * (v != 0).astype(jnp.int32), axis=0, keepdims=True)
    depth_ref[:] = depth
    uniq_ref[:] = uniq


def pair_ell16(ell: np.ndarray) -> np.ndarray:
    """int32[K, N] ``path<<16|count`` slots -> int32[ceil(K/2), N]
    words holding TWO 16-bit ``path<<8|count`` slots (low half = even
    slot). Requires paths < 256 and counts <= 255 — the compact form
    for haplotype-scale graphs (HPRC pangenomes carry ~90-100 paths);
    callers clip counts and route overflow to a residual/heavy class.
    Kernels consume it via ``pack16=True`` (half the tier-phase DMA,
    same select work per logical slot)."""
    path = (ell >> 16) & 0xFFFF
    cnt = ell & 0xFFFF
    assert int(path.max(initial=0)) < 256, "pack16 needs path ids < 256"
    assert int(cnt.max(initial=0)) < 256, "pack16 needs counts <= 255"
    h = ((path.astype(np.int64) << 8) | cnt.astype(np.int64))
    if h.shape[0] % 2:
        h = np.concatenate([h, np.zeros((1, h.shape[1]), h.dtype)])
    pair = (h[1::2] << 16) | h[0::2]
    return (pair & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def unpair_ell16(paired):
    """Inverse of :func:`pair_ell16` up to slot order: int32[Kw, N]
    paired words -> int32[2*Kw, N] standard ``path<<16|count`` slots
    (slot order is permuted — even halves first — which is irrelevant
    to the slot-sum reductions; a padded zero half stays a zero slot).
    Works on numpy or jax arrays (the XLA fallback unpairs in-trace)."""
    xp = jnp if isinstance(paired, jax.Array) else np

    def expand(h):
        return (((h >> 8) & 0xFF) << COUNT_BITS) | (h & 0xFF)

    lo = paired & 0xFFFF
    hi = (paired >> 16) & 0xFFFF
    return xp.concatenate([expand(lo), expand(hi)], axis=0)


def pack_mask_words(mask: jax.Array, n_words: int) -> jax.Array:
    """Pack a 0/1 path mask into int32 bit words (path p -> bit p%32 of
    word p//32)."""
    p_pad = n_words * 32
    m = jnp.zeros(p_pad, jnp.int32).at[: mask.shape[0]].set(
        mask.astype(jnp.int32)
    )
    shifted = m.reshape(n_words, 32) << jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(shifted, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_ell_depth(
    ell: jax.Array,  # int32[K, N_pad]
    mask: jax.Array,  # int32/bool[>=P] (0/1)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[N_pad]: one streamed pass over the slots."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, n_pad = ell.shape
    n_words = -(-mask.shape[0] // 32)
    words = pack_mask_words(mask, n_words)
    width = ELL_BLOCK if n_pad % ELL_BLOCK == 0 else LANES
    assert n_pad % width == 0

    ell_block = pl.BlockSpec(
        (k, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (1, width), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            functools.partial(_kernel, n_words=n_words),
            grid=(n_pad // width,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                ell_block,
            ],
            out_specs=(o_block, o_block),
            out_shape=(
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ),
            interpret=interpret,
        )(words, ell)
    return depth[0], uniq[0]


# --- tall layout ------------------------------------------------------
# The flat (K, N_pad) layout issues (1, width)-narrow output stores —
# which the hardware pads to 8 sublanes (8x write amplification) — and
# (K, width) input blocks small enough that per-grid-step overhead
# shows. The tall layout folds SUB column-tiles into the sublane axis:
# one grid step covers SUB * TALL_W columns with a (K*SUB, TALL_W)
# input block and fully-populated (SUB, TALL_W) output blocks, whose
# flat reshape is exactly the natural column order.

import os as _os

SUB = int(_os.environ.get("POLLEN_ELL_SUB", "8"))
TALL_W = 4096


def pack_ell_tall(ell: np.ndarray) -> np.ndarray:
    """(K, N_pad) slots -> (G*K*SUB, TALL_W) with
    tall[(g*K + k)*SUB + r, c] = ell[k, g*SUB*TALL_W + r*TALL_W + c]
    (zero-padding N to a multiple of SUB*TALL_W)."""
    k, n = ell.shape
    tile = SUB * TALL_W
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        ell = np.concatenate(
            [ell, np.zeros((k, n_pad - n), ell.dtype)], axis=1
        )
    g = n_pad // tile
    return (
        ell.reshape(k, g, SUB, TALL_W)
        .transpose(1, 0, 2, 3)
        .reshape(g * k * SUB, TALL_W)
        .copy()
    )


def unfold_ell_tall(tall, k: int):
    """Inverse of ``pack_ell_tall``: (G*K*SUB, TALL_W) -> (K, N_pad)
    flat slots (works on numpy or jax arrays; N_pad = G*SUB*TALL_W)."""
    rows = tall.shape[0]
    g = rows // (k * SUB)
    return (
        tall.reshape(g, k, SUB, TALL_W)
        .transpose(1, 0, 2, 3)
        .reshape(k, g * SUB * TALL_W)
    )


def _kernel_tall(mask_ref, ell_ref, depth_ref, uniq_ref, *, n_words, k):
    a = ell_ref[:]  # (K*SUB, TALL_W) int32
    words = [mask_ref[j] for j in range(n_words)]
    depth = jnp.zeros((SUB, TALL_W), jnp.int32)
    uniq = jnp.zeros((SUB, TALL_W), jnp.int32)
    for kk in range(k):
        v = a[kk * SUB : (kk + 1) * SUB]
        pid = (v >> COUNT_BITS) & 0xFFFF
        cnt = v & COUNT_MAX
        w32 = _select_word(pid >> 5, words)
        bit = (w32 >> (pid & 31)) & 1
        depth = depth + bit * cnt
        uniq = uniq + bit * (v != 0).astype(jnp.int32)
    depth_ref[:] = depth
    uniq_ref[:] = uniq


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def masked_ell_depth_tall(
    ell_tall: jax.Array,  # int32[G*K*SUB, TALL_W] (pack_ell_tall)
    mask: jax.Array,  # int32/bool[>=P] (0/1)
    k: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(depth, uniq) int32[G*SUB*TALL_W] in natural column order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = ell_tall.shape[0]
    assert ell_tall.shape[1] == TALL_W and rows % (k * SUB) == 0
    g = rows // (k * SUB)
    n_words = -(-mask.shape[0] // 32)
    words = pack_mask_words(mask, n_words)

    ell_block = pl.BlockSpec(
        (k * SUB, TALL_W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    o_block = pl.BlockSpec(
        (SUB, TALL_W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        depth, uniq = pl.pallas_call(
            functools.partial(_kernel_tall, n_words=n_words, k=k),
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), ell_block],
            out_specs=(o_block, o_block),
            out_shape=(
                jax.ShapeDtypeStruct((g * SUB, TALL_W), jnp.int32),
                jax.ShapeDtypeStruct((g * SUB, TALL_W), jnp.int32),
            ),
            interpret=interpret,
        )(words, ell_tall)
    return depth.reshape(-1), uniq.reshape(-1)


# --- fused split kernel ----------------------------------------------
# The split query's passes — the tall tier reductions and the heavy
# nibble sub-matrix dots — measured 9.7 us and 11.2 us alone but 19.3
# us back-to-back: separate pallas_calls serialize. One call with a
# heterogeneous grid (tier steps first, then heavy steps) overlaps
# the phases' DMA and VPU work and drops a kernel launch. Inactive
# phases leave their output blocks untouched (clamped index maps keep
# each block resident until its writer runs).


def _kernel_splitn(
    mask_ref,
    m_ref,
    *refs,
    n_words,
    ks,
    gs,
    has_heavy,
    h_rotate=True,
    h_lo=None,
    gh=0,
    pack16=False,
):
    """N tier phases + an optional heavy phase in one grid. ``refs``
    is (tier_in..., [heavy_in], tier_d/u pairs..., [heavy_d/u]).

    ``h_lo``: first grid step where the heavy phase is active. None =
    sequential (heavy follows the tiers, the r3/r4 form); 0 = JOINT —
    heavy steps share the early grid steps with the tier phases, so
    the MXU dots overlap the tier VPU work instead of paying their own
    pipeline ramp after it (``gh`` bounds the active heavy steps)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    nt = len(ks)
    tier_in = refs[:nt]
    h_ref = refs[nt] if has_heavy else None
    outs = refs[nt + (1 if has_heavy else 0) :]

    def tier(ref, d_ref, u_ref, kk_slots):
        a = ref[:]
        words = [mask_ref[j] for j in range(n_words)]
        depth = jnp.zeros((SUB, TALL_W), jnp.int32)
        uniq = jnp.zeros((SUB, TALL_W), jnp.int32)
        for kk in range(kk_slots):
            v = a[kk * SUB : (kk + 1) * SUB]
            if pack16:
                # Two 16-bit slots per word: (path<<8|count) halves
                # (paths < 256, counts clipped at 255 with residual).
                # Same select work per LOGICAL slot, half the DMA.
                for shift in (0, 16):
                    h = (v >> shift) & 0xFFFF
                    pid = (h >> 8) & 0xFF
                    cnt = h & 0xFF
                    w32 = _select_word(pid >> 5, words)
                    bit = (w32 >> (pid & 31)) & 1
                    depth = depth + bit * cnt
                    uniq = uniq + bit * (h != 0).astype(jnp.int32)
            else:
                pid = (v >> COUNT_BITS) & 0xFFFF
                cnt = v & COUNT_MAX
                w32 = _select_word(pid >> 5, words)
                bit = (w32 >> (pid & 31)) & 1
                depth = depth + bit * cnt
                uniq = uniq + bit * (v != 0).astype(jnp.int32)
        d_ref[:] = depth
        u_ref[:] = uniq

    off = 0
    for t in range(nt):
        lo, hi = off, off + gs[t]

        @pl.when(jnp.logical_and(i >= lo, i < hi))
        def _tier(t=t):
            tier(tier_in[t], outs[2 * t], outs[2 * t + 1], ks[t])

        off = hi

    if has_heavy:
        g_tiers = off
        lo = g_tiers if h_lo is None else h_lo
        active = (
            i >= lo
            if h_lo is None
            else jnp.logical_and(i >= lo, i < lo + gh)
        )

        @pl.when(active)
        def _heavy():
            from .crossmat import _unpack_tile

            a = _unpack_tile(h_ref[:])
            m = m_ref[:]
            depth = jax.lax.dot_general(
                m,
                a,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ind = jnp.minimum(a, jnp.bfloat16(1))
            uniq = jax.lax.dot_general(
                m,
                ind,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if h_rotate:
                r = (i - lo) % 8
                outs[2 * nt][pl.dslice(r, 1), :] = depth[:1, :].astype(
                    jnp.int32
                )
                outs[2 * nt + 1][pl.dslice(r, 1), :] = uniq[
                    :1, :
                ].astype(jnp.int32)
            else:
                outs[2 * nt][:] = depth[:1, :].astype(jnp.int32)
                outs[2 * nt + 1][:] = uniq[:1, :].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("ks", "interpret", "joint", "pack16")
)
def masked_ell_splitn_depth(
    tiers,  # tuple of int32[G_i*K_i*SUB, TALL_W] tall slot arrays
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] or (0, 0)
    mask: jax.Array,  # int32/bool[>=P] (0/1), original path order
    ks: Tuple[int, ...],
    interpret: bool = False,
    joint: bool = False,
    pack16: bool = False,
):
    """Fused (N tiers + heavy) split query — the general form of the
    three-phase kernel, one Pallas pass whatever the tier count.
    Returns ``(d_i, u_i)`` per tier followed by ``(dh, uh)`` when the
    heavy class is present, each in natural column order."""
    from .crossmat import fold_mask

    n_words = -(-mask.shape[0] // 32)
    words = pack_mask_words(mask, n_words)
    if heavy.size > 0:
        p_pad = heavy.shape[0] * 2
        mp = jnp.zeros(p_pad, jnp.int32).at[: mask.shape[0]].set(
            mask.astype(jnp.int32)
        )
        m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
            fold_mask(mp).astype(jnp.bfloat16)
        )
    else:
        m = jnp.zeros((8, LANES), jnp.bfloat16)
    return masked_ell_splitn_depth_raw(
        tiers, heavy, words, m, ks=ks, interpret=interpret, joint=joint,
        pack16=pack16,
    )


@functools.partial(
    jax.jit, static_argnames=("ks", "interpret", "joint", "pack16")
)
def masked_ell_splitn_depth_raw(
    tiers,  # tuple of int32[G_i*K_i*SUB, TALL_W] tall slot arrays
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] or (0, 0)
    words: jax.Array,  # int32[n_words] pre-packed mask bit words
    m: jax.Array,  # bf16 (8, P_pad) folded-mask matrix (row 0)
    ks: Tuple[int, ...],
    interpret: bool = False,
    joint: bool = False,
    pack16: bool = False,
):
    """The fused split query with the mask ALREADY packed: ``words``
    from :func:`pack_mask_words`, ``m`` the folded bf16 mask matrix.
    The serving hot path — a client that keeps its masks packed skips
    every per-query mask-prep op (the packing is host-trivial)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .crossmat import pick_seg_block

    nt = len(tiers)
    assert nt == len(ks) and nt >= 1
    gs = []
    for t, k in zip(tiers, ks):
        assert t.shape[1] == TALL_W and t.shape[0] % (k * SUB) == 0
        gs.append(t.shape[0] // (k * SUB))
    gs = tuple(gs)
    g_tiers = sum(gs)

    has_heavy = heavy.size > 0
    if has_heavy:
        h_rows, nh_pad = heavy.shape
        p_pad = h_rows * 2
        hw0 = pick_seg_block(p_pad, nh_pad)
        hw = hw0
        while hw > LANES and (nh_pad // hw) % 8:
            hw //= 2
        # Rotated (8, hw) output blocks avoid the 8x sublane write
        # amplification of (1, hw) stores, but only pay while they do
        # not force narrower tiles: at the bench heavy block the full
        # 8192-wide tile with narrow stores measured 8.17 us vs the
        # 2048-wide rotated form's 8.76 (r4 hrot probe) — fewer grid
        # steps beat the amplified writes once tiles shrink 2x+.
        h_rotate = (nh_pad // hw) % 8 == 0 and hw * 2 >= hw0
        if not h_rotate:
            hw = hw0
        assert nh_pad % hw == 0
        gh = nh_pad // hw
        assert m.shape == (8, p_pad)
    else:
        h_rows, hw, gh = 1, LANES, 0
        h_rotate = True
        heavy = jnp.zeros((8, LANES), jnp.uint8)
        # Full-lane-width placeholder: Mosaic rejects narrow blocks
        # (CLAUDE.md gaps); never exercised but must lower cleanly.
        m = jnp.zeros((8, LANES), jnp.bfloat16)

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    offs = [sum(gs[:t]) for t in range(nt)]
    tier_specs = [
        pl.BlockSpec(
            (ks[t] * SUB, TALL_W),
            (lambda t: lambda i: (
                clamp(i - offs[t], 0, gs[t] - 1), 0
            ))(t),
            memory_space=pltpu.VMEM,
        )
        for t in range(nt)
    ]
    tier_out_specs = [
        pl.BlockSpec(
            (SUB, TALL_W),
            (lambda t: lambda i: (
                clamp(i - offs[t], 0, gs[t] - 1), 0
            ))(t),
            memory_space=pltpu.VMEM,
        )
        for t in range(nt)
    ]
    # JOINT mode: heavy steps ride the first gh grid steps alongside
    # the tier phases (MXU overlaps VPU) instead of extending the grid.
    h_lo = 0 if joint else g_tiers
    h_spec = pl.BlockSpec(
        (h_rows, hw),
        lambda i: (0, clamp(i - h_lo, 0, max(gh - 1, 0))),
        memory_space=pltpu.VMEM,
    )
    if h_rotate:
        ho_spec = pl.BlockSpec(
            (8, hw),
            lambda i: (clamp(i - h_lo, 0, max(gh - 1, 0)) // 8, 0),
            memory_space=pltpu.VMEM,
        )
        ho_shape = jax.ShapeDtypeStruct((gh // 8 * 8, hw), jnp.int32)
    else:
        ho_spec = pl.BlockSpec(
            (1, hw),
            lambda i: (0, clamp(i - h_lo, 0, max(gh - 1, 0))),
            memory_space=pltpu.VMEM,
        )
        ho_shape = jax.ShapeDtypeStruct((1, gh * hw), jnp.int32)

    out_specs = []
    out_shape = []
    for t in range(nt):
        out_specs += [tier_out_specs[t], tier_out_specs[t]]
        s = jax.ShapeDtypeStruct((gs[t] * SUB, TALL_W), jnp.int32)
        out_shape += [s, s]
    if has_heavy:
        out_specs += [ho_spec, ho_spec]
        out_shape += [ho_shape, ho_shape]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        *tier_specs,
    ]
    ins = [*tiers]
    if has_heavy:
        in_specs.append(h_spec)
        ins.append(heavy)

    n_words = words.shape[0]
    grid_len = max(g_tiers, gh) if joint else g_tiers + gh
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(
                _kernel_splitn,
                n_words=n_words,
                ks=tuple(ks),
                gs=gs,
                has_heavy=has_heavy,
                h_rotate=h_rotate,
                h_lo=0 if joint else None,
                gh=gh,
                pack16=pack16,
            ),
            grid=(grid_len,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(words, m, *ins)
    return tuple(o.reshape(-1) for o in outs)


def masked_ell_split3_depth(
    ell_tall: jax.Array,  # int32[G1*K*SUB, TALL_W] tier-1 slots
    ell2_tall: jax.Array,  # int32[G2*K2*SUB, TALL_W] tier-2 slots
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] nibble-packed
    mask: jax.Array,  # int32/bool[>=P] (0/1), original path order
    k: int,
    k2: int,
    interpret: bool = False,
):
    """Fused three-phase split query: tier-1 slots, tier-2 slots, then
    the dense heavy block, all in one Pallas pass (the two-tier special
    case of :func:`masked_ell_splitn_depth`). Returns
    ``(d1, u1, d2, u2, dh, uh)`` — each tier in natural column order."""
    return masked_ell_splitn_depth(
        (ell_tall, ell2_tall),
        heavy,
        mask,
        ks=(k, k2),
        interpret=interpret,
    )


def masked_ell_split_depth(
    ell_tall: jax.Array,  # int32[G*K*SUB, TALL_W] (pack_ell_tall)
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] nibble-packed
    mask: jax.Array,  # int32/bool[>=P] (0/1), original path order
    k: int,
    interpret: bool = False,
):
    """Fused split query: ``(depth_l, uniq_l, depth_h, uniq_h)`` in one
    Pallas pass (the one-tier special case of
    :func:`masked_ell_splitn_depth`)."""
    return masked_ell_splitn_depth(
        (ell_tall,), heavy, mask, ks=(k,), interpret=interpret
    )


# --- batched form ------------------------------------------------------
# Production serving's shape: one resident graph, a stream of subset
# queries. One fused pass answers Q masks at once: the tier phases
# re-run the bit-select chain per query over a block READ ONCE (the
# slot DMA amortizes Q-fold), and the heavy phase turns Q mat-vecs
# into one real (Q, P) x (P, NH) MXU matmul whose output blocks are
# fully populated — the single-query kernel's row-rotation trick
# becomes unnecessary. The reference has no batch path at all
# (flatgfa/src/ops/depth.rs answers one query per call).


def _kernel_splitn_batch(
    mask_ref,  # SMEM int32[Q, n_words] packed mask words
    m_ref,  # VMEM bf16 (Q8, P_pad) folded masks
    *refs,  # tier inputs..., [heavy], tier d/u pairs..., [heavy d/u]
    n_words,
    ks,
    gs,
    q,
    has_heavy,
    h_lo=None,
    gh=0,
    pack16=False,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    nt = len(ks)
    tier_in = refs[:nt]
    h_ref = refs[nt] if has_heavy else None
    outs = refs[nt + (1 if has_heavy else 0) :]

    def tier(ref, d_ref, u_ref, kk_slots):
        a = ref[:]
        # Unpack once per block; the per-query work is only the select
        # tournament + shift + two multiply-accumulates.
        pids = []
        cnts = []
        nz = []
        for kk in range(kk_slots):
            v = a[kk * SUB : (kk + 1) * SUB]
            if pack16:
                for shift in (0, 16):
                    h = (v >> shift) & 0xFFFF
                    pids.append((h >> 8) & 0xFF)
                    cnts.append(h & 0xFF)
                    nz.append((h != 0).astype(jnp.int32))
                continue
            pids.append((v >> COUNT_BITS) & 0xFFFF)
            cnts.append(v & COUNT_MAX)
            nz.append((v != 0).astype(jnp.int32))
        for qq in range(q):
            words = [mask_ref[qq, j] for j in range(n_words)]
            depth = jnp.zeros((SUB, TALL_W), jnp.int32)
            uniq = jnp.zeros((SUB, TALL_W), jnp.int32)
            for kk in range(len(pids)):
                w32 = _select_word(pids[kk] >> 5, words)
                bit = (w32 >> (pids[kk] & 31)) & 1
                depth = depth + bit * cnts[kk]
                uniq = uniq + bit * nz[kk]
            d_ref[qq * SUB : (qq + 1) * SUB] = depth
            u_ref[qq * SUB : (qq + 1) * SUB] = uniq

    off = 0
    for t in range(nt):
        lo, hi = off, off + gs[t]

        @pl.when(jnp.logical_and(i >= lo, i < hi))
        def _tier(t=t):
            tier(tier_in[t], outs[2 * t], outs[2 * t + 1], ks[t])

        off = hi

    if has_heavy:
        g_tiers = off
        lo = g_tiers if h_lo is None else h_lo
        active = (
            i >= lo
            if h_lo is None
            else jnp.logical_and(i >= lo, i < lo + gh)
        )

        @pl.when(active)
        def _heavy():
            from .crossmat import _unpack_tile

            a = _unpack_tile(h_ref[:])  # (P_pad, hw) bf16
            m = m_ref[:]  # (Q8, P_pad)
            depth = jax.lax.dot_general(
                m,
                a,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ind = jnp.minimum(a, jnp.bfloat16(1))
            uniq = jax.lax.dot_general(
                m,
                ind,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs[2 * nt][:] = depth.astype(jnp.int32)
            outs[2 * nt + 1][:] = uniq.astype(jnp.int32)


def _tall_batch_to_natural(x: jax.Array, g: int, q: int) -> jax.Array:
    """(g*Q*SUB, TALL_W) per-block query-major rows -> (Q, g*SUB*TALL_W)
    natural column order per query."""
    return (
        x.reshape(g, q, SUB, TALL_W)
        .transpose(1, 0, 2, 3)
        .reshape(q, g * SUB * TALL_W)
    )


def pack_mask_words_batch(masks: jax.Array) -> jax.Array:
    """int32[Q, ceil(P/32)] packed mask-bit words for a (Q, P) batch
    (the batched analogue of :func:`pack_mask_words`)."""
    q, p = masks.shape
    n_words = -(-p // 32)
    return jnp.stack(
        [pack_mask_words(masks[i], n_words) for i in range(q)]
    )


@functools.partial(
    jax.jit, static_argnames=("ks", "interpret", "joint", "pack16")
)
def masked_ell_splitn_depth_batch(
    tiers,  # tuple of int32[G_t*K_t*SUB, TALL_W] tall slot arrays
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] or (0, 0)
    masks: jax.Array,  # int32/bool[Q, >=P] (0/1)
    ks,
    interpret: bool = False,
    joint: bool = False,
    pack16: bool = False,
):
    """Fused batched split query, any tier count: Q masks in one Pallas
    pass. Returns ``(d_t, u_t)`` per tier of shape (Q, tier_cols),
    then ``(dh, uh)`` of shape (Q, heavy_cols) (or None, None when the
    heavy class is absent)."""
    return masked_ell_splitn_depth_batch_raw(
        tiers, heavy, pack_mask_words_batch(masks), masks,
        ks=ks, interpret=interpret, joint=joint, pack16=pack16,
    )


@functools.partial(
    jax.jit, static_argnames=("ks", "interpret", "joint", "pack16")
)
def masked_ell_splitn_depth_batch_raw(
    tiers,
    heavy: jax.Array,
    words: jax.Array,  # int32[Q, n_words] pre-packed mask-bit words
    masks: jax.Array,  # int32/bool[Q, >=P] (heavy fold + shapes only)
    ks,
    interpret: bool = False,
    joint: bool = False,
    pack16: bool = False,
):
    """The batched split query with the bit words ALREADY packed —
    lets the split (per-tier) emission pack once and share across its
    pallas_calls instead of repeating the Q-row packing per tier."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .crossmat import fold_mask, pick_seg_block

    q, p = masks.shape
    nt = len(tiers)
    assert nt == len(ks) and nt >= 1
    gs = []
    for t, k in zip(tiers, ks):
        assert t.shape[1] == TALL_W and t.shape[0] % (k * SUB) == 0
        gs.append(t.shape[0] // (k * SUB))
    gs = tuple(gs)
    g_tiers = sum(gs)
    n_words = words.shape[1]

    has_heavy = heavy.size > 0
    if has_heavy:
        h_rows, nh_pad = heavy.shape
        p_pad = h_rows * 2
        hw = pick_seg_block(p_pad, nh_pad)
        while hw > LANES and nh_pad % hw:
            hw //= 2
        assert nh_pad % hw == 0
        gh = nh_pad // hw
        q8 = -(-q // 8) * 8  # MXU-friendly row count, fully populated
        mp = jnp.zeros((q8, p_pad), jnp.int32).at[:q, :p].set(
            masks.astype(jnp.int32)
        )
        m = jax.vmap(fold_mask)(mp).astype(jnp.bfloat16)
    else:
        h_rows, hw, gh, q8 = 1, LANES, 0, 8
        heavy = jnp.zeros((8, LANES), jnp.uint8)
        # Full-lane-width placeholder: Mosaic rejects narrow blocks.
        m = jnp.zeros((q8, LANES), jnp.bfloat16)

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    offs = [sum(gs[:t]) for t in range(nt)]
    tier_specs = [
        pl.BlockSpec(
            (ks[t] * SUB, TALL_W),
            (lambda t: lambda i: (
                clamp(i - offs[t], 0, gs[t] - 1), 0
            ))(t),
            memory_space=pltpu.VMEM,
        )
        for t in range(nt)
    ]
    tier_out_specs = [
        pl.BlockSpec(
            (q * SUB, TALL_W),
            (lambda t: lambda i: (
                clamp(i - offs[t], 0, gs[t] - 1), 0
            ))(t),
            memory_space=pltpu.VMEM,
        )
        for t in range(nt)
    ]
    # JOINT mode (see the single-query form): heavy steps ride the
    # first gh grid steps so the MXU matmul overlaps the tier phases.
    h_lo = 0 if joint else g_tiers
    h_spec = pl.BlockSpec(
        (h_rows, hw),
        lambda i: (0, clamp(i - h_lo, 0, max(gh - 1, 0))),
        memory_space=pltpu.VMEM,
    )
    ho_spec = pl.BlockSpec(
        (q8, hw),
        lambda i: (clamp(i - h_lo, 0, max(gh - 1, 0)), 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        *tier_specs,
    ]
    ins = [*tiers]
    out_specs = []
    out_shape = []
    for t in range(nt):
        out_specs += [tier_out_specs[t], tier_out_specs[t]]
        s = jax.ShapeDtypeStruct((gs[t] * q * SUB, TALL_W), jnp.int32)
        out_shape += [s, s]
    if has_heavy:
        in_specs.append(h_spec)
        ins.append(heavy)
        out_specs += [ho_spec, ho_spec]
        s = jax.ShapeDtypeStruct((gh * q8, hw), jnp.int32)
        out_shape += [s, s]

    grid_len = max(g_tiers, gh) if joint else g_tiers + gh
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(
                _kernel_splitn_batch,
                n_words=n_words,
                ks=tuple(ks),
                gs=gs,
                q=q,
                has_heavy=has_heavy,
                h_lo=0 if joint else None,
                gh=gh,
                pack16=pack16,
            ),
            grid=(grid_len,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(words, m, *ins)
    result = []
    for t in range(nt):
        result.append(_tall_batch_to_natural(outs[2 * t], gs[t], q))
        result.append(_tall_batch_to_natural(outs[2 * t + 1], gs[t], q))
    if has_heavy:
        dh, uh = outs[2 * nt], outs[2 * nt + 1]
        result.append(
            dh.reshape(gh, q8, hw)[:, :q].transpose(1, 0, 2).reshape(q, -1)
        )
        result.append(
            uh.reshape(gh, q8, hw)[:, :q].transpose(1, 0, 2).reshape(q, -1)
        )
    else:
        result += [None, None]
    return tuple(result)


@functools.partial(
    jax.jit, static_argnames=("ks", "interpret", "pack16")
)
def masked_ell_splitn_depth_batch_split(
    tiers,  # tuple of int32[G_t*K_t*SUB, TALL_W] tall slot arrays
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] or (0, 0)
    masks: jax.Array,  # int32/bool[Q, >=P] (0/1)
    ks,
    interpret: bool = False,
    pack16: bool = False,
):
    """The batched split query emitted as PER-TIER ``pallas_call``s
    plus one batched heavy pass, instead of one fused program.

    Why it exists: the fully-fused N-tier batch program allocates
    (Q*SUB, TALL_W) int32 output blocks per tier *simultaneously* — at
    Q=16 a three-tier program hit Mosaic's 16 MB scoped-VMEM ceiling
    (17.14 MB) and its ~120 KB of MLIR crashed the remote compile
    helper outright (r4 probes). Splitting keeps every program at the
    proven one-tier size. The cost is nt extra kernel launches
    (~5-6 us fixed each), which the batch amortizes Q-fold —
    ~0.2 us/query at Q=32 — where the single-query fused form saves
    real microseconds. Same return convention as
    :func:`masked_ell_splitn_depth_batch`."""
    from .crossmat import batched_cross_depth_pallas

    empty_heavy = jnp.zeros((0, 0), jnp.uint8)
    words = pack_mask_words_batch(masks)  # once, shared by every tier
    result = []
    for t, k in zip(tiers, ks):
        d, u, _, _ = masked_ell_splitn_depth_batch_raw(
            (t,), empty_heavy, words, masks, ks=(k,),
            interpret=interpret, pack16=pack16,
        )
        result += [d, u]
    if heavy.size > 0:
        q, p = masks.shape
        p_pad = heavy.shape[0] * 2
        mp = jnp.zeros((q, p_pad), jnp.int32).at[:, :p].set(
            masks.astype(jnp.int32)
        )
        dh, uh = batched_cross_depth_pallas(
            heavy, mp, nibble=True, interpret=interpret
        )
        result += [dh, uh]
    else:
        result += [None, None]
    return tuple(result)


def masked_ell_split3_depth_batch(
    ell_tall: jax.Array,  # int32[G1*K*SUB, TALL_W] tier-1 slots
    ell2_tall: jax.Array,  # int32[G2*K2*SUB, TALL_W] or (0, 0)
    heavy: jax.Array,  # uint8[P_pad/2, NH_pad] or (0, 0)
    masks: jax.Array,  # int32/bool[Q, >=P] (0/1)
    k: int,
    k2: int = 0,
    interpret: bool = False,
):
    """Two-tier compatibility wrapper over
    :func:`masked_ell_splitn_depth_batch`. Returns
    ``(d1, u1, d2, u2, dh, uh)``; absent classes are None."""
    has_mid = ell2_tall.size > 0 and k2 > 0
    tiers = (ell_tall, ell2_tall) if has_mid else (ell_tall,)
    ks = (k, k2) if has_mid else (k,)
    outs = masked_ell_splitn_depth_batch(
        tiers, heavy, masks, ks=ks, interpret=interpret
    )
    if has_mid:
        return outs
    d1, u1, dh, uh = outs
    return d1, u1, None, None, dh, uh


@jax.jit
def masked_ell_depth_xla(
    ell: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Portable fallback (CPU, or shapes the kernel rejects): the same
    slot reduction with a plain mask gather."""
    pid = (ell >> COUNT_BITS) & 0xFFFF  # zero-extend: >> is arithmetic
    cnt = ell & COUNT_MAX
    m = jnp.zeros(1 << 16, jnp.int32).at[: mask.shape[0]].set(
        mask.astype(jnp.int32)
    )
    bit = m[pid]
    depth = jnp.sum(bit * cnt, axis=0)
    uniq = jnp.sum(bit * (ell != 0).astype(jnp.int32), axis=0)
    return depth, uniq
