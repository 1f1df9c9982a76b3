"""Probe: consolidation stage costs in the HIGH-CARDINALITY regime.

The hc bench phase (48M-base genome, live prefix near CP) runs ~14% below
the k=31 headline (BASELINE.md round 4: 139-142M vs 160-162M).  This
probe measures, on the chip, where an hc consolidation actually spends
its time when the live prefix is LARGE (CP ~ 32M live rows, CR ~ 32M raw
rows — the steady state the bench phase reaches), so round 5's attack
(two-level compact network / larger cap / LSM-style run deferral) is
aimed at the measured cost, not a model.

Stages timed (chained dispatches — 8+ per measurement, per CLAUDE.md's
tunnel round-trip note; dependent-scalar drains):

  A. _c3_sort_raw_desc over CR raw rows (keys-only descending sort).
  B. _c3_merge_compact_bitonic (fused merge+fold+compact) at a large
     live prefix, at tile 64K / 32K / 16K (KMER_TPU_BITONIC_TILE).
  C. The same merge at a SMALL live prefix (1M rows) — the low-card
     comparison that isolates the prefix-size-dependent cost.

Usage (ONE TPU process at a time):
    PYTHONPATH=. timeout 800 python docs/probe_hc_stages.py

Results (round 5, TPU v5 lite, chained dispatches, warm cache):

    A. sort_raw_desc CR=32.1M:                          122.4ms
    B. fused merge live=35.7M + raw=32.1M, tile=65536:   55.8ms
    B. fused merge live=35.7M + raw=32.1M, tile=32768:   56.6ms
    B. fused merge live=35.7M + raw=32.1M, tile=16384:   63.1ms
    C. fused merge live=1M    + raw=32.1M, tile=65536:   56.0ms

Conclusions (they shaped round 5's hc attack):

  1. The full 64K tile is already optimal — 16K runs 13% SLOWER despite
     two fewer compare-exchange stages, so per-tile overhead (windows,
     staging, launches) dominates stage count.  ROADMAP's "two-level
     compact network" idea (trade 4 full-buffer stages for 16 segment
     rolls) is therefore dead: the stages are not where the time is.
  2. The merge pays per ALLOCATED SLOT, not per live row: C (live=1M)
     costs the same as B (live=35.7M) because the kernel always runs
     n = CP + CR slots.  The hc deficit vs the headline is exactly the
     CP term of the merge (CP grows from 1x to 8x chunk in hc), which
     amortizes over chunks-per-consolidation — hence the cap_mult
     sweep on the hc phase (BENCH_CAP_MULT), not a kernel change.
  3. 0.82ns/slot through the fused merge vs 3.8ns/row through lax.sort:
     consolidation remains sort-dominated at every regime.

Follow-ups measured the same session:

  4. Unfused bitonic merge (fold, no in-kernel compact) at the same
     shape: 39.6ms — the compact portion is 16.2ms (29%) of the fused
     kernel.
  5. An all-live TILE bypass of the compact network (skip the position
     cumsum + delta-shift stages when a tile has zero dead rows) was
     built, interpret-validated, and measured on-chip: fc 156.3M /
     hc 140.9M — NO gain (within the +-10% session variance, slightly
     negative).  Root cause: the bypass is all-or-nothing per 64K tile,
     and in the hc phase ~half the raw keys duplicate prefix keys, so
     P(65536 consecutive rows all live) ~ 0 — the branch never fires.
     The kernel change was reverted; the equivalence tests remain
     (test_fused_compact_all_live_bypass / _mixed_live_tiles).
  6. BENCH_CAP_MULT=12 on the hc phase: 142.7M vs 142.3M at 8 — no
     amortization win, because the phase sizes CP with cap_mult, so
     merge slots per chunk stay ~(2 chunks worth) regardless.

Bottom line: the hc budget is (sort CR at its proven primitive floor) +
(merge CP+CR slots at 0.82ns/slot with the tile already optimal and
stage count not the dominant term).  Both terms are per-row/per-slot
floors of their kernels; the ~14% hc deficit vs the headline is the
extra CP-worth of merge slots per consolidation, which is the work of
rewriting a large live table and has no remaining kernel-level escape
on this hardware.  (An LSM-style multi-run prefix would help only when
CP >> CR — the real config-4 endgame — not in this phase's CP ~ CR
shape; the disk-spill path already covers the true out-of-HBM regime.)
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kmer_counter_tpu.ops import table2 as t2
from kmer_counter_tpu.ops.pallas_sort import TILE


def log(m):
    print(f"[probe +{time.perf_counter() - T0:5.1f}s] {m}", flush=True)


T0 = time.perf_counter()
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

NL = 2  # k=31 canonical: 2 key lanes
CHUNK = 4_587_520  # 64k reads x 70 windows (the bench chunk)
CP = 8 * CHUNK  # 36.7M prefix slots
CR = 7 * CHUNK  # 32.1M raw slots
# Round to TILE alignment as the engine does.
CP = -(-CP // TILE) * TILE
CR = -(-CR // TILE) * TILE
rng = np.random.default_rng(0)
dev = jax.devices()[0]
log(f"device={dev} CP={CP} CR={CR}")


def sorted_distinct_lanes(n, seed):
    """[NL, n] uint32, lexicographically sorted, effectively distinct."""
    r = np.random.default_rng(seed)
    lane0 = np.sort(r.integers(0, 2**32, size=n, dtype=np.uint64)).astype(
        np.uint32
    )
    lane1 = r.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    return np.stack([lane0, lane1])


def timeit(fn, label, reps=3, chain=8):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn()
        # dependent-scalar drain
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / chain)
    log(f"{label}: {best * 1e3:.1f}ms")
    return best


# ---- stage A: raw descending sort -----------------------------------------
raw = jax.device_put(
    jnp.asarray(
        rng.integers(0, 2**32, size=(NL, CR), dtype=np.uint64).astype(
            np.uint32
        )
    ),
    dev,
)
off = jnp.int32(CR)
timeit(lambda: t2._c3_sort_raw_desc(raw, off), "A. sort_raw_desc CR=32.1M")

s_desc, ones = t2._c3_sort_raw_desc(raw, off)
s_desc, ones = jax.device_get((s_desc, ones))
s_desc = jax.device_put(jnp.asarray(s_desc), dev)
ones = jax.device_put(jnp.asarray(ones), dev)

# ---- stage B: fused merge at LARGE live prefix ----------------------------
live_big = CP - TILE  # nearly-full prefix
# Dead prefix rows are SENTINEL keys (the consolidate3 contract: live
# dense at the front, sentinel fill past — the merge-path split search
# requires the whole operand sorted ascending).
pl_big = np.full((NL, CP), 0xFFFFFFFF, np.uint32)
pl_big[:, :live_big] = sorted_distinct_lanes(live_big, 1)
pc_big = np.zeros((CP,), np.uint32)
pc_big[:live_big] = 1
pl_big = jax.device_put(jnp.asarray(pl_big), dev)
pc_big = jax.device_put(jnp.asarray(pc_big), dev)

from functools import partial


@partial(jax.jit, static_argnames=("cp", "tile"))
def merge_fused(p_lanes, p_counts, sd, on, cp, tile):
    # _c3_merge_compact_bitonic with an explicit static tile (the env
    # knob can't vary inside one jit cache entry).
    from kmer_counter_tpu.ops import pallas_sort

    nl = p_lanes.shape[0]
    out, live = pallas_sort.merge_fold_compact_bitonic(
        [*(p_lanes[i] for i in range(nl)), p_counts],
        [*(sd[i] for i in range(nl)), on],
        num_keys=nl,
        tile=tile,
    )
    return (
        jnp.stack([out[i][:cp] for i in range(nl)], axis=0),
        out[nl][:cp],
        live,
    )


for tile in (TILE, TILE // 2, TILE // 4):
    timeit(
        lambda tile=tile: merge_fused(pl_big, pc_big, s_desc, ones, CP, tile),
        f"B. fused merge live=35.7M + raw=32.1M, tile={tile}",
        reps=2,
        chain=4,
    )

# ---- stage C: fused merge at SMALL live prefix (low-card comparison) ------
live_small = TILE * 16  # ~1M
pl_small = np.full((NL, CP), 0xFFFFFFFF, np.uint32)
pl_small[:, :live_small] = sorted_distinct_lanes(live_small, 2)
pc_small = np.zeros((CP,), np.uint32)
pc_small[:live_small] = 1
pl_small = jax.device_put(jnp.asarray(pl_small), dev)
pc_small = jax.device_put(jnp.asarray(pc_small), dev)

timeit(
    lambda: merge_fused(pl_small, pc_small, s_desc, ones, CP, TILE),
    "C. fused merge live=1M + raw=32.1M, tile=65536",
    reps=2,
    chain=4,
)
log("done")
