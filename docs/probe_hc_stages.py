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
    PYTHONPATH=. timeout 550 python docs/probe_hc_stages.py

Results (round 5, TPU v5 lite, recorded after the run):  see bottom.
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
