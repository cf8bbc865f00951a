"""Measure the host-vs-device claim for transform ops (chop/crush).

docs/parity.md asserts transforms stay host-NumPy "deliberately"
(emit-bound); SURVEY §7 Phase 3 planned device count-then-allocate
kernels instead. This probe puts a number behind the choice: the
count/scan/expansion stages of chop and the mask/scan stages of crush,
host NumPy wall time vs an on-device XLA formulation timed with the
chained-dispatch methodology (device arrays as jit args, scalar
readback). The device expansion uses the standard padded
searchsorted-gather form (output sizes are data-dependent, so the
device pays a worst-case-padded gather; XLA's TPU gather runs ~94 M
elem/s — the very op the resident-index design avoids).

Stages:  chop  |  crush     Usage: python probes/transform_probe.py <stage>
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _time_chain_raw, measure_call_overhead  # noqa: E402
from bench import synth_device_graph  # noqa: E402


def chained_time(fn, args, reps=2):
    """Chained wall time of ``fn(carry, *args) -> carry`` with a TRUE
    inter-iteration dependency: the scalar carry must perturb one of
    fn's inputs, or XLA hoists the loop-invariant body and the
    division by K understates the time (the exact folding trap
    CLAUDE.md documents)."""

    @jax.jit
    def chained(k, *rest):
        def body(i, carry):
            return fn(carry, *rest)

        return jax.lax.fori_loop(0, k, body, jnp.int64(0))

    k = 2
    while True:
        per_iter, raw = _time_chain_raw(chained, (jnp.int32(k), *args), reps, k)
        if raw >= 0.29 or k >= 4096:
            return per_iter
        k *= 4


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "chop"
    n_steps, n_segs, n_paths = 2**22, 2**18, 128
    g, _ = synth_device_graph(n_steps, n_segs, n_paths, device="host")
    measure_call_overhead()

    if stage == "chop":
        from pollen_tpu.ops.transform import chop

        # Host reference: the full production op.
        t0 = time.perf_counter()
        out = chop(g, 3, with_links=True)
        host_full = time.perf_counter() - t0
        total_new = out.num_steps

        # Host, stages only (count + scan + expansion, no arena build).
        lens = g.seg_len
        t0 = time.perf_counter()
        pieces = np.maximum((lens + 2) // 3, 0).astype(np.int64)
        first_new = np.cumsum(pieces) - pieces
        s_seg = (np.asarray(g.steps) >> 1).astype(np.int64)
        counts = pieces[s_seg]
        owner_step = np.repeat(np.arange(g.num_steps), counts)
        offs = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        new_ids = first_new[s_seg[owner_step]] + offs
        host_stages = time.perf_counter() - t0
        assert new_ids.shape[0] == total_new

        # Device formulation: counts/scans are elementwise+cumsum; the
        # expansion is a padded searchsorted + two gathers.
        pad_total = int(counts.sum())  # static worst case for the jit
        lens_d = jnp.asarray(lens)
        steps_d = jnp.asarray(np.asarray(g.steps))

        def dev(carry, lens_d, steps_d):
            # True dependency: the previous result perturbs step 0's
            # orientation bit, so no iteration's work can be hoisted.
            steps_d = steps_d.at[0].set(
                steps_d[0] ^ (carry % 2).astype(steps_d.dtype)
            )
            pieces = jnp.maximum((lens_d + 2) // 3, 0).astype(jnp.int32)
            first_new = jnp.cumsum(pieces) - pieces
            s_seg = (steps_d >> 1).astype(jnp.int32)
            counts = pieces[s_seg]
            cum = jnp.cumsum(counts)
            j = jnp.arange(pad_total, dtype=jnp.int32)
            owner = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
            off = j - (cum[owner] - counts[owner])
            new_ids = first_new[s_seg[owner]] + off
            return (new_ids[-1] + new_ids[0]).astype(jnp.int64)

        per = chained_time(dev, (lens_d, steps_d))
        print(
            f"chop: host full {host_full:.2f}s, host stages "
            f"{host_stages:.2f}s, device stages {per:.3f}s/op "
            f"({total_new / 1e6:.1f} M new steps)",
            flush=True,
        )

    elif stage == "crush":
        from pollen_tpu.ops.transform import crush

        # Give the synthetic arena real N runs to crush.
        rng = np.random.default_rng(5)
        seq = rng.choice(
            np.frombuffer(b"ACGTNN", dtype=np.uint8), g.seq_data.shape[0]
        )
        import dataclasses

        g2 = dataclasses.replace(g, seq_data=seq)
        t0 = time.perf_counter()
        out = crush(g2)
        host_full = time.perf_counter() - t0

        b = int(g2.seq_data.shape[0])
        seq_d = jnp.asarray(seq)
        bounds_np = np.concatenate(
            ([0], np.cumsum(g2.seg_len))
        ).astype(np.int32)
        starts_d = jnp.asarray(bounds_np[:-1])

        def dev(carry, seq_d, starts_d):
            # True dependency: the previous result toggles byte 0
            # between 'A' and 'N'.
            seq_d = seq_d.at[0].set(
                jnp.where(carry % 2 == 0, 65, 78).astype(jnp.uint8)
            )
            is_n = seq_d == np.uint8(78)
            prev = jnp.concatenate([jnp.zeros(1, bool), is_n[:-1]])
            seg_start = jnp.zeros(b, bool).at[starts_d].set(True)
            keep = ~(is_n & prev & ~seg_start)
            new_pos = jnp.cumsum(keep.astype(jnp.int32))
            return new_pos[-1].astype(jnp.int64)

        per = chained_time(dev, (seq_d, starts_d))
        print(
            f"crush: host full {host_full:.2f}s "
            f"({b / 1e6:.0f} MB seq), device mask+scan {per:.3f}s/op "
            f"(no compaction: the byte gather itself is the emit path)",
            flush=True,
        )


if __name__ == "__main__":
    main()
