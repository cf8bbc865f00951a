"""Time the ELL run-index depth kernel pieces on the TPU, one stage
per process (the tunnel's death windows punish big payloads: round 2's
combined probe — two compiles + four full-vector readbacks ~6 MB
through a 30 MB/s link — never fit its time box and GAVE UP 6 times).

Stages (each: ONE compile, scalar-only readbacks):
  ellk    - bare tier-1 tall kernel (masked_ell_depth_tall)
  heavyk  - bare heavy nibble pass (crossmat kernel)
  ell     - full tiered split query, parts form (fused kernel)
  ellraw  - fused kernel alone, mask pre-packed (no XLA glue)
  ellb [Q] - batched split query (one Q per process when given)
  ellok/ellbok - on-device correctness, 1-scalar diff
  ellcal1 tier:K:G | heavy:W | hrot:W:FW:FROT - calibration points
  crossd  - depth-only crossing matrix (uniq dot + indicator skipped)
  scanb/scanx - fused scan + planned/XLA boundary
  scatter - depth.at[ids].add cost for K2 in {256..32768}

Usage: python probes/ell_probe.py <stage> [arg]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _time_chain_raw, synth_device_graph  # noqa: E402


def time_chained(fn, args, reps=2):
    """args = (mask, *rest); rest flows through jit as REAL arguments —
    closing over device arrays bakes them into the program as constants
    that re-upload through the slow tunnel on every compile."""

    @jax.jit
    def chained(mask, k, *rest):
        def body(i, carry):
            mask, acc = carry
            depth, uniq = fn(mask, *rest)
            mask = jnp.roll(mask, 1).at[0].set(depth[0] % 2)
            return mask, acc + depth[-1] + uniq[-1]

        _, acc = jax.lax.fori_loop(0, k, body, (mask, jnp.int32(0)))
        return acc

    mask, rest = args[0], args[1:]
    k = 6
    while True:
        per_iter, raw = _time_chain_raw(
            chained, (mask, jnp.int32(k), *rest), reps, k
        )
        if raw >= 0.29 or k >= 65536:
            return per_iter
        k *= 8


def _force_three_tiers():
    """Monkeypatch the planner to a fixed three-tier split (k=1,4,16 +
    heavy): the ellb3* stages measure whether a 3-tier plan ever pays
    at batch shapes now that the split emission compiles (the fused
    3-tier batch program crashed the compile helper in r4)."""
    from pollen_tpu.kernels import ellscan as _e

    def forced(runs_per_seg, big_seg, p_pad, max_tiers=3,
               objective="single"):
        crossed = runs_per_seg > 0
        valid = ~big_seg & crossed
        ks = (1, 4, 16)
        tiers = []
        prev = np.zeros_like(valid)
        for k in ks:
            t = valid & (runs_per_seg <= k) & ~prev
            tiers.append(t)
            prev = prev | t
        return ks, tiers, crossed & ~prev

    _e.plan_ell_tiers_n = forced


def main():
    n_steps = int(os.environ.get("POLLEN_BENCH_STEPS", 2**22))
    n_segs = int(os.environ.get("POLLEN_BENCH_SEGS", 2**18))
    n_paths = int(os.environ.get("POLLEN_BENCH_PATHS", 128))
    stage = sys.argv[1]

    if stage.startswith("ellb3"):
        _force_three_tiers()
    t0 = time.perf_counter()
    _, dg = synth_device_graph(n_steps, n_segs, n_paths)
    print(
        f"# ingest {time.perf_counter() - t0:.1f}s; "
        f"t1 {dg.cross_ell.shape} k{dg.ell_k} "
        f"t2 {dg.cross_ell2.shape} k{dg.ell_k2} "
        f"classes {dg.ell_num_light}/{dg.ell_num_mid}/"
        f"{dg.ell_num_heavy} hmat {dg.ell_heavy.shape} "
        f"res {dg.ell_heavy_res.shape}",
        flush=True,
    )

    if stage in ("ellk", "elltall"):
        # The bare light kernel over the resident (tall) layout:
        # fully-populated (8, 4096) output blocks instead of the flat
        # layout's (1, width) narrow stores (measured 25.6 -> 9.7 us).
        # pack16 residents route through the splitn form (the tall
        # kernel has no pack16 body — a raw read would misinterpret
        # the paired slots).
        from pollen_tpu.kernels.ellscan import (
            masked_ell_depth_tall,
            masked_ell_splitn_depth,
        )

        k = dg.ell_k

        def q(mask, tall):
            if dg.ell_pack16:
                return masked_ell_splitn_depth(
                    (tall,), jnp.zeros((0, 0), jnp.uint8), mask,
                    ks=(k,), pack16=True,
                )[:2]
            return masked_ell_depth_tall(tall, mask, k=k)

        mask = jnp.ones(dg.num_paths, jnp.int32)
        t0 = time.perf_counter()
        per = time_chained(q, (mask, dg.cross_ell))
        print(
            f"{stage}: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.1f} G steps/s) "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage == "heavyk":
        # The heavy nibble sub-matrix pass alone (rotated crossmat
        # kernel): isolates how much of the full split query's gap over
        # the light kernel is heavy work vs inter-kernel glue.
        from pollen_tpu.kernels.crossmat import masked_cross_depth

        p_pad = dg.ell_heavy.shape[0] * 2

        def q(mask, heavy):
            return masked_cross_depth(heavy, mask, nibble=True)

        mask = jnp.ones(p_pad, jnp.int32)
        t0 = time.perf_counter()
        per = time_chained(q, (mask, dg.ell_heavy))
        print(
            f"heavyk: {per * 1e6:.1f} us/query "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage == "ell":
        from pollen_tpu.ops.depth import seg_depth_with_uniq_ell_parts

        def q(mask, dg):
            # The parts form (production serving shape); fold tier-2 /
            # heavy parts into u1[-1] — the element the chained timing
            # reads — so no part is a dead store XLA can eliminate.
            d1, u1, d2, u2, dh, uh = seg_depth_with_uniq_ell_parts(
                dg, mask, pallas=True
            )
            extra = jnp.int32(0)
            if d2 is not None:
                extra = extra + d2[-1] + u2[-1]
            if dh is not None:
                extra = extra + dh[-1] + uh[-1]
            return d1, u1.at[-1].add(extra)

        mask = jnp.ones(dg.num_paths, jnp.int32)
        t0 = time.perf_counter()
        per = time_chained(q, (mask, dg))
        print(
            f"ell: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.1f} G steps/s) "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage in ("ellb", "ellb3"):
        # Batched fused split kernel (parts form): µs/query. Pass a Q
        # as argv[2] to run ONE compile per process (probe discipline:
        # a death window mid-stage must cost one point, not three).
        from pollen_tpu.ops.depth import (
            seg_depth_with_uniq_ell_batch_parts,
        )

        qs = (
            [int(sys.argv[2])] if len(sys.argv) > 2 else [8, 16, 32]
        )
        for q in qs:
            def bq(masks, dg):
                d1, u1, d2, u2, dh, uh = (
                    seg_depth_with_uniq_ell_batch_parts(
                        dg, masks, pallas=True
                    )
                )
                extra = jnp.int32(0)
                if d2 is not None:
                    extra = extra + d2[-1, -1] + u2[-1, -1]
                if dh is not None:
                    extra = extra + dh[-1, -1] + uh[-1, -1]
                # 1-row outputs keep the chained timing's readback tiny.
                return d1[:, -1], u1[:, -1].at[-1].add(extra)

            @jax.jit
            def chained(masks, k, dg):
                def body(i, carry):
                    masks, acc = carry
                    d, u = bq(masks, dg)
                    masks = jnp.roll(masks, 1, axis=1).at[0, 0].set(
                        d[0] % 2
                    )
                    return masks, acc + d[-1] + u[-1]

                _, acc = jax.lax.fori_loop(
                    0, k, body, (masks, jnp.int32(0))
                )
                return acc

            rng = np.random.default_rng(4)
            masks = jnp.asarray(
                rng.integers(0, 2, (q, dg.num_paths)).astype(np.int32)
            )
            t0 = time.perf_counter()
            k = 6
            while True:
                per_iter, raw = _time_chain_raw(
                    chained, (masks, jnp.int32(k), dg), 2, k
                )
                if raw >= 0.29 or k >= 65536:
                    break
                k *= 8
            per_q = per_iter / q
            print(
                f"{stage} q={q}: {per_iter * 1e6:.1f} us/batch "
                f"({per_q * 1e6:.2f} us/query, "
                f"{n_steps / per_q / 1e9:.0f} G steps/s) "
                f"(total {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        print(f"{stage}: done", flush=True)

    elif stage == "ellraw":
        # The fused splitn kernel ALONE, mask words + folded-mask
        # matrix pre-packed and carried through the chain: isolates the
        # kernel from the XLA mask-prep/residual glue to decompose the
        # single query's fixed cost (docs/status.md gap 3).
        from jax.experimental import pallas as pl  # noqa: F401
        from pollen_tpu.kernels.ellscan import (
            masked_ell_splitn_depth_raw,
        )

        tiers = [dg.cross_ell]
        ks = [dg.ell_k]
        if dg.cross_ell2.size:
            tiers.append(dg.cross_ell2)
            ks.append(dg.ell_k2)
        n_words = -(-dg.num_paths // 32)
        p_pad = dg.ell_heavy.shape[0] * 2

        @jax.jit
        def chained(words, m, k, t1, t2, heavy):
            tt = (t1,) if t2 is None else (t1, t2)

            def body(i, carry):
                words, acc = carry
                outs = masked_ell_splitn_depth_raw(
                    tt, heavy, words, m, ks=tuple(ks),
                    pack16=bool(dg.ell_pack16),
                )
                d1, u1 = outs[0], outs[1]
                dh, uh = outs[-2], outs[-1]
                acc = acc + d1[-1] + u1[-1] + dh[-1] + uh[-1]
                words = words.at[0].set(
                    words[0] ^ (d1[0] % 7)
                )  # true dependency
                return words, acc

            _, acc = jax.lax.fori_loop(
                0, k, body, (words, jnp.int32(0))
            )
            return acc

        from pollen_tpu.kernels.ellscan import pack_mask_words
        from pollen_tpu.kernels.crossmat import fold_mask

        mask = jnp.ones(dg.num_paths, jnp.int32)
        words = pack_mask_words(mask, n_words)
        mp = jnp.zeros(p_pad, jnp.int32).at[: dg.num_paths].set(mask)
        m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
            fold_mask(mp).astype(jnp.bfloat16)
        )
        t2 = jnp.asarray(dg.cross_ell2) if dg.cross_ell2.size else None
        t0 = time.perf_counter()
        k = 6
        while True:
            per_iter, raw = _time_chain_raw(
                chained,
                (words, m, jnp.int32(k), dg.cross_ell, t2, dg.ell_heavy),
                2,
                k,
            )
            if raw >= 0.29 or k >= 65536:
                break
            k *= 8
        print(
            f"ellraw: {per_iter * 1e6:.1f} us/query "
            f"({n_steps / per_iter / 1e9:.1f} G steps/s) "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage in ("ellp16", "ellp16ok"):
        # 16-bit paired tier slots (pack16): two path<<8|count halves
        # per int32 word — half the tier-phase DMA, same select work.
        # Counts clip at 255 for the probe (report how many); the
        # heavy phase is unchanged. ellp16 times the raw kernel like
        # ellraw; ellp16ok checks exactness vs the XLA slot reduction
        # on the same clipped slots.
        from pollen_tpu.kernels.crossmat import fold_mask
        from pollen_tpu.kernels.ellscan import (
            masked_ell_depth_xla,
            masked_ell_splitn_depth_raw,
            pack_mask_words,
            pack_ell_tall,
            pair_ell16,
            unfold_ell_tall,
        )

        flat = unfold_ell_tall(np.asarray(dg.cross_ell), dg.ell_k)
        if dg.ell_pack16:
            # The resident is ALREADY paired under the default ingest;
            # un-pair back to standard slots before re-packing, or the
            # odd halves masquerade as path ids.
            from pollen_tpu.kernels.ellscan import unpair_ell16

            flat = np.asarray(unpair_ell16(flat))
        path = (flat >> 16) & 0xFFFF
        cnt = flat & 0xFFFF
        clipped = int((cnt > 255).sum())
        ell_c = ((path << 16) | np.minimum(cnt, 255)).astype(np.int32)
        paired = pair_ell16(ell_c)
        tall16 = jnp.asarray(pack_ell_tall(paired))
        k16 = paired.shape[0]  # stored words/column, layout-agnostic
        n_words = -(-dg.num_paths // 32)
        p_pad = dg.ell_heavy.shape[0] * 2
        mask = jnp.ones(dg.num_paths, jnp.int32)
        words = pack_mask_words(mask, n_words)
        mp = jnp.zeros(p_pad, jnp.int32).at[: dg.num_paths].set(mask)
        m = jnp.zeros((8, p_pad), jnp.bfloat16).at[0].set(
            fold_mask(mp).astype(jnp.bfloat16)
        )

        if stage == "ellp16ok":
            @jax.jit
            def diff(words, m, tall16, ell_c, heavy, mask):
                d, u, dh, uh = masked_ell_splitn_depth_raw(
                    (tall16,), heavy, words, m, ks=(k16,), pack16=True
                )
                d_x, u_x = masked_ell_depth_xla(ell_c, mask)
                n = d_x.shape[0]
                return (
                    jnp.abs(d[:n].astype(jnp.int64) - d_x).sum()
                    + jnp.abs(u[:n].astype(jnp.int64) - u_x).sum()
                )

            t0 = time.perf_counter()
            total = int(np.asarray(jax.device_get(diff(
                words, m, tall16, jnp.asarray(ell_c), dg.ell_heavy, mask
            ))))
            print(
                f"ellp16ok: diff={total} ({clipped} slots clipped) "
                f"(total {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        else:
            @jax.jit
            def chained(words, m, k, tall16, heavy):
                def body(i, carry):
                    words, acc = carry
                    d, u, dh, uh = masked_ell_splitn_depth_raw(
                        (tall16,), heavy, words, m,
                        ks=(k16,), pack16=True,
                    )
                    acc = acc + d[-1] + u[-1] + dh[-1] + uh[-1]
                    words = words.at[0].set(words[0] ^ (d[0] % 7))
                    return words, acc

                _, acc = jax.lax.fori_loop(
                    0, k, body, (words, jnp.int32(0))
                )
                return acc

            t0 = time.perf_counter()
            k = 6
            while True:
                per_iter, raw = _time_chain_raw(
                    chained,
                    (words, m, jnp.int32(k), tall16, dg.ell_heavy),
                    2,
                    k,
                )
                if raw >= 0.29 or k >= 65536:
                    break
                k *= 8
            print(
                f"ellp16: {per_iter * 1e6:.1f} us/query "
                f"({n_steps / per_iter / 1e9:.1f} G steps/s, "
                f"{clipped} slots clipped) "
                f"(total {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )

    elif stage in ("ellbok", "ellb3ok"):
        # Batched on-device exactness: parts vs Q single XLA queries.
        from pollen_tpu.ops.depth import (
            seg_depth_with_uniq_ell_batch_parts,
            seg_depth_with_uniq_ell_parts,
        )

        q = 8
        rng = np.random.default_rng(6)
        masks = jnp.asarray(
            rng.integers(0, 2, (q, dg.num_paths)).astype(np.int32)
        )

        @jax.jit
        def diff(masks, dg):
            outs_b = seg_depth_with_uniq_ell_batch_parts(
                dg, masks, pallas=True
            )
            total = jnp.int64(0)
            for i in range(q):
                outs_1 = seg_depth_with_uniq_ell_parts(
                    dg, masks[i], pallas=False
                )
                for b, s in zip(outs_b, outs_1):
                    if b is None:
                        continue
                    total = total + jnp.abs(
                        b[i].astype(jnp.int64) - s.astype(jnp.int64)
                    ).sum()
            return total

        t0 = time.perf_counter()
        total = int(np.asarray(jax.device_get(diff(masks, dg))))
        print(
            f"{stage}: diff={total} "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage == "ellok":
        from pollen_tpu.ops.depth import (
            seg_depth_with_uniq_ell_permuted,
            seg_depth_with_uniq_masked,
        )

        @jax.jit
        def diff(mask, dg):
            # Permutation-invariant on-device comparison (sum and sum
            # of squares in int64); exact element-wise equality is
            # covered by the CPU test suite.
            d_e, u_e = seg_depth_with_uniq_ell_permuted(
                dg, mask, pallas=True
            )
            d_x, u_x = seg_depth_with_uniq_masked(dg, mask)

            def stats(v):
                v = v.astype(jnp.int64)
                return jnp.stack([v.sum(), (v * v).sum()])

            return jnp.abs(
                stats(d_e) - stats(d_x)
            ).sum() + jnp.abs(stats(u_e) - stats(u_x)).sum()

        rng = np.random.default_rng(3)
        mask = jnp.asarray(
            rng.integers(0, 2, dg.num_paths).astype(np.int32)
        )
        t0 = time.perf_counter()
        total = int(np.asarray(jax.device_get(diff(mask, dg))))
        print(
            f"ellok: diff={total} "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage.startswith("ellcal1"):
        # One calibration point per process (the tunnel's death windows
        # punish multi-compile processes — CLAUDE.md): ``ellcal1
        # tier:K:G`` or ``ellcal1 heavy:W``. Results feed the planner /
        # router constants (ellscan.C_*, ops/depth._masked_impl_costs).
        from pollen_tpu.kernels.ellscan import (
            SUB,
            TALL_W,
            masked_ell_depth_tall,
        )
        from pollen_tpu.kernels.crossmat import masked_cross_depth

        spec = sys.argv[2]
        rng = np.random.default_rng(12)

        def chain2(fn):
            @jax.jit
            def chained(mask, k, *rest):
                def body(i, carry):
                    mask, acc = carry
                    d, u = fn(mask, *rest)
                    mask = jnp.roll(mask, 1).at[0].set(d[0] % 2)
                    return mask, acc + d[-1] + u[-1]

                _, acc = jax.lax.fori_loop(
                    0, k, body, (mask, jnp.int32(0))
                )
                return acc

            return chained

        def time_one(fn, args):
            chained = chain2(fn)
            k = 6
            while True:
                per_iter, raw = _time_chain_raw(
                    chained, (args[0], jnp.int32(k), *args[1:]), 2, k
                )
                if raw >= 0.29 or k >= 65536:
                    return per_iter
                k *= 8

        kind, *params = spec.split(":")
        if kind == "hrot":
            # Heavy pass tile/rotation variants: hrot:W:ROT:FW:FROT
            # times the REAL bench heavy block with forced tiling.
            w = int(params[0])
            fw, frot = int(params[1]), bool(int(params[2]))
            p_pad = 128
            hm = jnp.asarray(
                rng.integers(
                    0, 256, (p_pad // 2, w), dtype=np.int32
                ).astype(np.uint8)
            )
            hmask = jnp.ones(p_pad, jnp.int32)

            def hq(mask, hm):
                return masked_cross_depth(
                    hm, mask, nibble=True, force=(fw, frot)
                )

            per = time_one(hq, (hmask, hm))
            print(
                f"ellcal1 hrot w={w} fw={fw} rot={int(frot)}: "
                f"{per * 1e6:.2f} us",
                flush=True,
            )
        elif kind == "tier":
            kk, g = int(params[0]), int(params[1])
            rows = g * kk * SUB
            tall = jnp.asarray(
                rng.integers(0, 1 << 22, (rows, TALL_W), dtype=np.int32)
            )
            mask = jnp.ones(dg.num_paths, jnp.int32)

            def q(mask, tall):
                return masked_ell_depth_tall(tall, mask, k=kk)

            per = time_one(q, (mask, tall))
            print(
                f"ellcal1 tier k={kk} g={g}: {per * 1e6:.2f} us "
                f"({rows * TALL_W} slots)",
                flush=True,
            )
        else:
            w = int(params[0])
            p_pad = 128
            hm = jnp.asarray(
                rng.integers(
                    0, 256, (p_pad // 2, w), dtype=np.int32
                ).astype(np.uint8)
            )
            hmask = jnp.ones(p_pad, jnp.int32)

            def hq(mask, hm):
                return masked_cross_depth(hm, mask, nibble=True)

            per = time_one(hq, (hmask, hm))
            print(
                f"ellcal1 heavy w={w}: {per * 1e6:.2f} us "
                f"({(p_pad // 2) * w} bytes)",
                flush=True,
            )

    elif stage == "ellcal":
        # Calibration: fixed + marginal costs of the tier kernel and
        # the heavy nibble pass, fit from multiple sizes. Feeds the
        # ingest planner / query router constants (ellscan.C_*,
        # ops/depth._masked_impl_costs).
        from pollen_tpu.kernels.ellscan import (
            SUB,
            TALL_W,
            masked_ell_depth_tall,
        )
        from pollen_tpu.kernels.crossmat import masked_cross_depth

        rng = np.random.default_rng(12)
        mask = jnp.ones(dg.num_paths, jnp.int32)

        def time_fn(fn, args):
            chained = _chain2(fn)  # ONE jit; k is a runtime argument
            k = 6
            while True:
                per_iter, raw = _time_chain_raw(
                    chained, (args[0], jnp.int32(k), *args[1:]), 2, k
                )
                if raw >= 0.29 or k >= 65536:
                    return per_iter

        def _chain2(fn):
            @jax.jit
            def chained(mask, k, *rest):
                def body(i, carry):
                    mask, acc = carry
                    d, u = fn(mask, *rest)
                    mask = jnp.roll(mask, 1).at[0].set(d[0] % 2)
                    return mask, acc + d[-1] + u[-1]

                _, acc = jax.lax.fori_loop(
                    0, k, body, (mask, jnp.int32(0))
                )
                return acc

            return chained

        # Tier kernel: k=1 at G in {1, 2, 4, 8}; k=4 at G in {1, 4}.
        for kk, gs in ((1, (1, 2, 4, 8)), (4, (1, 4))):
            for g in gs:
                rows = g * kk * SUB
                tall = jnp.asarray(
                    rng.integers(
                        0, 1 << 22, (rows, TALL_W), dtype=np.int32
                    )
                )

                def q(mask, tall, kk=kk):
                    return masked_ell_depth_tall(tall, mask, k=kk)

                per = time_fn(q, (mask, tall))
                slots = rows * TALL_W
                print(
                    f"ellcal tier k={kk} g={g}: {per * 1e6:.2f} us "
                    f"({slots} slots)",
                    flush=True,
                )

        # Heavy nibble pass at widths 4096 / 16384 / 32768.
        p_pad = 128
        hmask = jnp.ones(p_pad, jnp.int32)
        for w in (4096, 16384, 32768):
            hm = jnp.asarray(
                rng.integers(0, 256, (p_pad // 2, w), dtype=np.int32
                             ).astype(np.uint8)
            )

            def hq(mask, hm):
                return masked_cross_depth(hm, mask, nibble=True)

            per = time_fn(hq, (hmask, hm))
            print(
                f"ellcal heavy w={w}: {per * 1e6:.2f} us "
                f"({(p_pad // 2) * w} bytes)",
                flush=True,
            )
        print("ellcal: done", flush=True)

    elif stage == "crossd":
        from pollen_tpu.kernels.crossmat import masked_cross_depth

        p_pad = dg.cross_matrix.shape[0] * (2 if dg.cross_nibble else 1)

        def q(mask, cross):
            d = masked_cross_depth(
                cross, mask, nibble=dg.cross_nibble, uniq=False
            )
            return d, d

        mask = jnp.ones(p_pad, jnp.int32)
        t0 = time.perf_counter()
        per = time_chained(q, (mask, dg.cross_matrix))
        print(
            f"crossd: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.1f} G steps/s) "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage in ("scanb", "scanx"):
        # Scan family full query: fused Pallas cumsums + boundary stage
        # (scanb = planned one-hot MXU gather; scanx = XLA gather).
        from pollen_tpu.ops.depth import seg_depth_with_uniq_fused

        planned = stage == "scanb"

        def q(mask, dg):
            return seg_depth_with_uniq_fused(
                dg, mask, planned_boundary=planned
            )

        mask = jnp.ones(dg.num_paths, jnp.int32)
        t0 = time.perf_counter()
        per = time_chained(q, (mask, dg))
        print(
            f"{stage}: {per * 1e6:.1f} us/query "
            f"({n_steps / per / 1e9:.2f} G steps/s) "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage == "runsk":
        # Run-level fused kernel (runscan) + planned boundary, timed on
        # host-synthesized run arrays alone (uploading the full
        # non-minimal graph costs minutes through the tunnel; the runs
        # kernel only reads run_path/run_count/run_seg_bounds).
        from pollen_tpu.kernels.gatherb import plan_boundary
        from pollen_tpu.kernels.gatherb import boundary_diff_planned
        from pollen_tpu.kernels.runscan import BLOCK, masked_run_cumsums

        rng = np.random.default_rng(8)
        pop = rng.zipf(1.3, size=n_steps).astype(np.int64)
        segs = (pop - 1) % n_segs
        bounds = np.linspace(0, n_steps, n_paths + 1).astype(np.int64)
        pid = np.searchsorted(
            bounds[1:], np.arange(n_steps), side="right"
        )
        key = segs << np.int64(20) | pid
        uniq_keys, counts = np.unique(key, return_counts=True)
        run_seg = (uniq_keys >> 20).astype(np.int64)
        run_path = (uniq_keys & ((1 << 20) - 1)).astype(np.int32)
        run_count = counts.astype(np.int32)
        r = run_path.size
        r_pad = -(-r // BLOCK) * BLOCK
        run_path = np.concatenate(
            [run_path, np.full(r_pad - r, n_paths, np.int32)]
        )
        run_count = np.concatenate(
            [run_count, np.zeros(r_pad - r, np.int32)]
        )
        run_seg_bounds = np.searchsorted(
            run_seg, np.arange(n_segs + 1)
        ).astype(np.int32)
        plan = plan_boundary(run_seg_bounds, r_pad)
        print(f"# runs {r} (pad {r_pad}) w_rows {plan.w_rows}", flush=True)

        bargs = (
            jnp.asarray(plan.row_start),
            jnp.asarray(plan.loc),
            plan.over_tiles,
            jnp.asarray(plan.over_bounds),
        )

        def q(mask, rp, rc):
            cswc, csw = masked_run_cumsums(rp, rc, mask)
            depth = boundary_diff_planned(
                cswc, *bargs, w_rows=plan.w_rows,
                n_bounds=n_segs + 1,
            )
            uniq = boundary_diff_planned(
                csw, *bargs, w_rows=plan.w_rows,
                n_bounds=n_segs + 1,
            )
            return depth, uniq

        p_pad = -(-(n_paths + 1) // 128) * 128
        mask = jnp.zeros(p_pad, jnp.int32).at[:n_paths].set(1)
        t0 = time.perf_counter()
        per = time_chained(
            q, (mask, jnp.asarray(run_path), jnp.asarray(run_count))
        )
        print(
            f"runsk: {per * 1e6:.1f} us/query "
            f"({r / per / 1e9:.2f} G runs/s, "
            f"{n_steps / per / 1e9:.2f} G steps/s) "
            f"(total {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    elif stage == "scatter":
        rng = np.random.default_rng(5)
        base = jnp.zeros(n_segs, jnp.int32)
        for k2 in (256, 4096, 16384, 32768):
            ids = jnp.asarray(
                np.sort(
                    rng.choice(n_segs, size=k2, replace=False)
                ).astype(np.int32)
            )
            vals = jnp.asarray(rng.integers(1, 100, k2).astype(np.int32))

            def sc(mask, ids=ids, vals=vals):
                out = base.at[ids].add(vals * mask[0], mode="drop")
                return out, out

            t0 = time.perf_counter()
            per = time_chained(sc, (jnp.ones(128, jnp.int32),))
            print(
                f"scatter k2={k2}: {per * 1e6:.1f} us "
                f"(total {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        print("scatter: done", flush=True)

    else:
        raise SystemExit(f"unknown stage {stage!r}")


if __name__ == "__main__":
    main()
