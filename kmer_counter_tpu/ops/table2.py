"""Two-level HBM count table: deduped sorted prefix + keys-only raw region.

The single-buffer table (ops.table) re-sorts *everything* — previously
consolidated records included — through a 3-operand dedup sort plus a
4-operand compaction sort on every consolidation.  This variant is the
same scatter-free design (SURVEY §2.1: the reference's dormant
sortKmers+reduceKMers epoch, GPUHandler.cu:300-360) restructured so that

  * raw k-mer records carry **no count operand at all**: a raw record is
    valid iff its key lanes are not the all-ones sentinel (ops.pipeline
    writes sentinels for masked windows), so the raw dedup sort moves NL
    key lanes and nothing else;
  * per-key raw counts are pure **index arithmetic** on the sorted raw
    region (run length = next boundary position − mine);
  * the previously consolidated prefix never passes through the raw
    dedup sort again: one 3-operand merge sort (NL key lanes + counts)
    over [collapsed prefix ++ raw boundary rows] both merges and
    compacts — sentinel rows sort to the end and are truncated.

Per consolidation that is ``NL·CR + (NL+1)·(CP+CR)`` operand-slots versus
the single-buffer table's ``(2NL+1)·C + (NL+2)·C``, and consolidated
records are re-sorted through 1 sort instead of 2.

Prefix invariant: rows [0, CP) sorted ascending by key with **at most two
live rows per key** (one carried count from earlier rounds + one from the
latest merge); count-0 rows only at the tail.  ``_collapse_prefix`` folds
duplicate-key runs of any length onto their first row before each merge,
restoring uniqueness, and ``finalize`` (a plain sort_reduce) produces the
fully deduped compacted table for dumping.

All-T^k special case: when k % 16 == 0 a forward-strand all-T k-mer is
bit-identical to the sentinel, so the extractor counts those windows into
a side scalar (``allt``) instead of the key stream; the host dump layer
re-materializes the single T^k record (it is the maximum possible key, so
it always belongs at the very end of the sorted output).  Canonical mode
never produces it (canonical(T^k) = A^k).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmer_counter_tpu.ops.sortcount import device_sort, sort_reduce

SENTINEL = jnp.uint32(0xFFFFFFFF)


class TwoLevelTable(NamedTuple):
    """Device state for the two-level count table."""

    prefix_lanes: jnp.ndarray  # [NL, CP] uint32, sorted, ≤2 live rows/key
    prefix_counts: jnp.ndarray  # [CP] uint32 (0 = empty slot)
    raw_lanes: jnp.ndarray  # [NL, CR] uint32 keys-only (sentinel = invalid)
    raw_off: jnp.ndarray  # scalar int32: raw slots in use
    allt: jnp.ndarray  # scalar uint32: side count of all-T k-mers (k%16==0)


def make_table2(prefix_slots: int, raw_slots: int, num_lanes: int) -> TwoLevelTable:
    return TwoLevelTable(
        prefix_lanes=jnp.zeros((num_lanes, prefix_slots), dtype=jnp.uint32),
        prefix_counts=jnp.zeros((prefix_slots,), dtype=jnp.uint32),
        raw_lanes=jnp.zeros((num_lanes, raw_slots), dtype=jnp.uint32),
        raw_off=jnp.int32(0),
        allt=jnp.uint32(0),
    )


@partial(jax.jit, donate_argnums=(0,))
def append_raw(table: TwoLevelTable, chunk_lanes, chunk_allt) -> TwoLevelTable:
    """Append one chunk's sentinel-encoded key lanes at the raw offset.

    The caller guarantees raw_off + chunk ≤ CR (the host mirrors raw_off
    exactly: appends advance by the chunk's static width).
    """
    raw = jax.lax.dynamic_update_slice(
        table.raw_lanes, chunk_lanes, (jnp.int32(0), table.raw_off)
    )
    return table._replace(
        raw_lanes=raw,
        raw_off=table.raw_off + jnp.int32(chunk_lanes.shape[1]),
        allt=table.allt + chunk_allt,
    )


@partial(jax.jit, donate_argnums=(0,), static_argnames=("offset",))
def append_raw_at(
    table: TwoLevelTable, chunk_lanes, chunk_allt, offset: int
) -> TwoLevelTable:
    """append_raw with a *static* offset: the host mirrors raw_off exactly
    (appends advance by the chunk's static width, consolidation resets to
    0), so the write start can be a compile-time constant — the offsets
    cycle through at most CR/chunk values, each a cached executable with
    a cheaper constant-offset in-place update."""
    raw = jax.lax.dynamic_update_slice(
        table.raw_lanes, chunk_lanes, (0, offset)
    )
    return table._replace(
        raw_lanes=raw,
        raw_off=jnp.int32(offset + chunk_lanes.shape[1]),
        allt=table.allt + chunk_allt,
    )


def _next_boundary_pos(boundary: jnp.ndarray) -> jnp.ndarray:
    """For each row, the position of the nearest boundary strictly after
    it (N when none).  int32 position math — immune to count wraparound."""
    n = boundary.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    bpos = jnp.where(boundary, idx, n)
    nearest_at_or_after = jax.lax.cummin(bpos, reverse=True)
    return jnp.concatenate(
        [nearest_at_or_after[1:], jnp.full((1,), n, dtype=jnp.int32)]
    )


def _fill_from_right(flags: jnp.ndarray, vals: jnp.ndarray, fill):
    """out[i] = vals[j] for the smallest j >= i with flags[j]; ``fill``
    where no such j exists.  A suffix select-scan — the scatter/gather-free
    way to read "the value at the next marked row" (XLA gather measured 46x
    a sort-based permutation on TPU; this is a handful of cumsum-cost
    passes).  The combine (leftmost flagged wins) is associative, and it is
    wraparound-safe: values are selected, never added."""

    def comb(a, b):
        # reverse=True flips, scans forward, flips back: the element nearer
        # the ORIGINAL left arrives as ``b``, and it wins when flagged.
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    # Unflagged slots carry ``fill``: when nothing is flagged at or after i,
    # the select chain bottoms out at the last slot's fill value.
    _, out = jax.lax.associative_scan(
        comb, (flags, jnp.where(flags, vals, fill)), reverse=True
    )
    return out


def _collapse_prefix(lanes: jnp.ndarray, counts: jnp.ndarray):
    """Fold duplicate-key runs onto their first row (sorted input, holes
    allowed).  Returns (eff_lanes, collapsed_counts) where non-first rows
    and holes are sentinel-keyed with count 0.  Uses the u32 exclusive-
    cumsum difference (wraparound cancels, see ops.sortcount)."""
    NL, CP = lanes.shape
    valid = counts > 0
    eff = jnp.where(valid[None, :], lanes, SENTINEL)
    is_sent = jnp.all(eff == SENTINEL, axis=0)
    prev_differs = jnp.any(eff[:, 1:] != eff[:, :-1], axis=0)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), prev_differs])
    csum = jnp.cumsum(counts)
    starts = csum - counts
    # starts at the next boundary == inclusive csum at the end of my run:
    # a gather-free suffix fill from run-end rows (ADVICE r1: the previous
    # jnp.take gather cost 41.5ms at 4.6M rows on-chip; this is ~2ms).
    is_end = jnp.concatenate([boundary[1:], jnp.ones((1,), dtype=bool)])
    start_next = _fill_from_right(is_end, csum, csum[-1])
    run_total = start_next - starts  # u32 wrap cancels
    keep = boundary & ~is_sent
    new_counts = jnp.where(keep, run_total, jnp.uint32(0))
    new_lanes = jnp.where(keep[None, :], eff, SENTINEL)
    return new_lanes, new_counts


def _reduce_raw(raw_lanes: jnp.ndarray, raw_off) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Keys-only dedup of the raw region: sort NL lanes, then per-key
    counts as boundary-position differences (every live raw record has
    implicit count 1).  Rows at/past raw_off are masked to sentinel."""
    NL, CR = raw_lanes.shape
    idx = jnp.arange(CR, dtype=jnp.int32)
    live = idx < raw_off
    eff = jnp.where(live[None, :], raw_lanes, SENTINEL)
    sorted_ops = device_sort(tuple(eff[i] for i in range(NL)), num_keys=NL)
    s = jnp.stack(sorted_ops, axis=0)
    is_sent = jnp.all(s == SENTINEL, axis=0)
    prev_differs = jnp.any(s[:, 1:] != s[:, :-1], axis=0)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), prev_differs])
    nb = _next_boundary_pos(boundary)
    keep = boundary & ~is_sent
    counts = jnp.where(keep, (nb - idx).astype(jnp.uint32), jnp.uint32(0))
    lanes = jnp.where(keep[None, :], s, SENTINEL)
    return lanes, counts


@partial(jax.jit, donate_argnums=(0,))
def consolidate2(table: TwoLevelTable):
    """Merge the raw region into the prefix.

    Returns (table', live, lost): live = prefix rows in use afterwards;
    lost = live records truncated (must be 0 — the host sizes/grows the
    prefix so the merge always fits; nonzero is a hard error).
    """
    NL, CP = table.prefix_lanes.shape
    p_lanes, p_counts = _collapse_prefix(table.prefix_lanes, table.prefix_counts)
    r_lanes, r_counts = _reduce_raw(table.raw_lanes, table.raw_off)
    lanes_cat = jnp.concatenate([p_lanes, r_lanes], axis=1)
    counts_cat = jnp.concatenate([p_counts, r_counts])
    merged = device_sort(
        (*(lanes_cat[i] for i in range(NL)), counts_cat), num_keys=NL
    )
    m_lanes = jnp.stack(merged[:NL], axis=0)
    m_counts = merged[NL]
    live = jnp.sum((m_counts[:CP] > 0).astype(jnp.int32))
    lost = jnp.sum((m_counts[CP:] > 0).astype(jnp.int32))
    out = table._replace(
        prefix_lanes=m_lanes[:, :CP],
        prefix_counts=m_counts[:CP],
        raw_off=jnp.int32(0),
    )
    return out, live, lost


def _raw_counts_in_place(s_lanes: jnp.ndarray) -> jnp.ndarray:
    """Per-key multiplicities for a SORTED keys-only raw region, counts at
    run heads with keys left in place (the merge-input form): head rows
    get the run length, other rows 0, all-sentinel rows 0."""
    NL, CR = s_lanes.shape
    idx = jnp.arange(CR, dtype=jnp.int32)
    is_sent = jnp.all(s_lanes == SENTINEL, axis=0)
    prev_differs = jnp.any(s_lanes[:, 1:] != s_lanes[:, :-1], axis=0)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), prev_differs])
    nb = _next_boundary_pos(boundary)
    keep = boundary & ~is_sent
    return jnp.where(keep, (nb - idx).astype(jnp.uint32), jnp.uint32(0))


def _fold_counts_in_place(lanes: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """Fold duplicate-key run totals onto each run's head row, zero the
    rest — keys untouched (stays sorted), sentinel rows zeroed.  The
    keep-keys variant of _collapse_prefix, for the Pallas-merge path."""
    is_sent = jnp.all(lanes == SENTINEL, axis=0)
    prev_differs = jnp.any(lanes[:, 1:] != lanes[:, :-1], axis=0)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), prev_differs])
    csum = jnp.cumsum(counts)
    starts = csum - counts
    is_end = jnp.concatenate([boundary[1:], jnp.ones((1,), dtype=bool)])
    start_next = _fill_from_right(is_end, csum, csum[-1])
    run_total = start_next - starts  # u32 wrap cancels
    return jnp.where(boundary & ~is_sent, run_total, jnp.uint32(0))


# ---- split-stage consolidate3 ---------------------------------------------
#
# The monolithic _consolidate3_impl program (raw sort + Pallas merge + fold
# + Pallas compact in ONE XLA program) never finished compiling through
# this environment's remote-compile tunnel (>57 min in both the round-2
# driver bench, BENCH_r02 rc=124, and a round-3 probe), while the SAME
# kernels compiled standalone in minutes (docs/experiments_consolidate_tpu
# measured them on-chip).  The production path therefore runs the stages
# as separate jitted programs: dispatch is async so there is no added
# device latency, each program is small enough to compile, and each lands
# in the persistent compilation cache independently.


@jax.jit
def _c3_sort_raw(raw_lanes, raw_off):
    """Stage 1 (XLA): sentinel-mask + keys-only sort of the raw region,
    plus in-place multiplicities.  raw_lanes is NOT donated — the table
    keeps its raw buffer across consolidations."""
    NL, CR = raw_lanes.shape
    idx = jnp.arange(CR, dtype=jnp.int32)
    eff = jnp.where((idx < raw_off)[None, :], raw_lanes, SENTINEL)
    s_ops = jax.lax.sort(
        tuple(eff[i] for i in range(NL)),
        dimension=0,
        num_keys=NL,
        # Unstable: keys-only rows are interchangeable within a tie
        # run, and the unstable TPU sort measured 32% faster than
        # the stable default (80.5 vs 117.9ms @ 32.1M x 2 lanes,
        # round 5 — round 4's 'stability is free' result does not
        # reproduce on this JAX).
        is_stable=False,
    )
    s_lanes = jnp.stack(s_ops, axis=0)
    return s_lanes, _raw_counts_in_place(s_lanes)


@jax.jit
def _c3_sort_raw_ones(raw_lanes, raw_off):
    """Stage 1 for the fused-fold path: multiplicities are just 0/1
    liveness (the merge kernel's fold sums them)."""
    NL, CR = raw_lanes.shape
    idx = jnp.arange(CR, dtype=jnp.int32)
    eff = jnp.where((idx < raw_off)[None, :], raw_lanes, SENTINEL)
    s_ops = jax.lax.sort(
        tuple(eff[i] for i in range(NL)),
        dimension=0,
        num_keys=NL,
        # Unstable: keys-only rows are interchangeable within a tie
        # run, and the unstable TPU sort measured 32% faster than
        # the stable default (80.5 vs 117.9ms @ 32.1M x 2 lanes,
        # round 5 — round 4's 'stability is free' result does not
        # reproduce on this JAX).
        is_stable=False,
    )
    s_lanes = jnp.stack(s_ops, axis=0)
    is_sent = jnp.all(s_lanes == SENTINEL, axis=0)
    return s_lanes, jnp.where(is_sent, jnp.uint32(0), jnp.uint32(1))


def _kernel_tile(n_ops: int) -> int:
    """NON-PRODUCTION fallbacks only (the default bitonic/fused-compact
    paths keep pallas_sort.TILE at every record width — their live
    buffers are w-element, not 2w).  For the odd-even variants
    (KMER_TPU_BITONIC=0): wide records (k>32, three+ key lanes + counts)
    halve the tile — at the full 64K tile a 5-operand ODD-EVEN merge
    peaks ~16.6MB of scoped VMEM against the 16MB limit (measured OOM at
    k=55, round 3).  Halving trades one extra merge stage for half the
    buffer footprint; (CP+CR) stays a multiple of either tile."""
    from kmer_counter_tpu.ops import pallas_sort

    return pallas_sort.TILE if n_ops <= 3 else pallas_sort.TILE // 2


@jax.jit
def _c3_sort_raw_desc(raw_lanes, raw_off):
    """Stage 1 for the bitonic half-merge path: the raw region sorted
    DESCENDING, with 0/1 liveness for the in-kernel fold.

    Descending order comes from sorting the BIT-FLIPPED lanes ascending
    and unflipping.  Dead rows (at/past raw_off) are masked to the
    flip-space sentinel, so they sort to the END of the flip-ascending
    array — where they unflip to real all-zero keys, bit-identical to a
    genuine A^k record.  Liveness therefore cannot come from the keys;
    it is POSITIONAL: every row with flip-key < sentinel is live and
    sorts strictly before the tie-run, so exactly the first ``raw_off``
    rows take liveness 1.  Rows inside the all-zero tie-run are
    interchangeable (identical keys — the fold only needs the run's
    total), so the positional assignment counts genuine A^k records
    correctly and gives every dead row 0."""
    NL, CR = raw_lanes.shape
    idx = jnp.arange(CR, dtype=jnp.int32)
    live = idx < raw_off
    eff = jnp.where(live[None, :], ~raw_lanes, SENTINEL)
    s_ops = jax.lax.sort(
        tuple(eff[i] for i in range(NL)),
        dimension=0,
        num_keys=NL,
        # Unstable: keys-only rows are interchangeable within a tie
        # run, and the unstable TPU sort measured 32% faster than
        # the stable default (80.5 vs 117.9ms @ 32.1M x 2 lanes,
        # round 5 — round 4's 'stability is free' result does not
        # reproduce on this JAX).
        is_stable=False,
    )
    s_desc = ~jnp.stack(s_ops, axis=0)
    ones = jnp.where(live, jnp.uint32(1), jnp.uint32(0))
    return s_desc, ones


def _bitonic_tile(n_ops: int) -> int:
    """Bitonic merge window by operand count: the halved live footprint
    (w-element buffers, not 2w) keeps the full 64K tile through FIVE
    operands (k<=64; validated on-chip at k=55), but the widest records
    OOM scoped VMEM at the full tile — measured 18.76M vs the 16M limit
    at 8 operands (k=101, 7 key lanes + counts).  Halve beyond five;
    (CP+CR) is a multiple of TILE, hence of either window.

    The 4-5-operand tile (k in (32,64]) is ALSO halved by default: the
    halved tile re-enables the window prefetch
    (pallas_sort._merge_prefetch_ok), and the DMA overlap beats the
    bigger tile — measured 93.8M vs 92.0M k-mers/s at k=55, back-to-back
    on-chip (round 5).  KMER_TPU_WIDE_HALF=0 restores the round-4 full
    tile.  KMER_TPU_BITONIC_TILE=<n> overrides the tile outright
    (probing only; must divide CP+CR)."""
    import os

    from kmer_counter_tpu.ops import pallas_sort

    t_env = os.environ.get("KMER_TPU_BITONIC_TILE")
    if t_env:
        return int(t_env)
    if n_ops <= 3:
        return pallas_sort.TILE
    if n_ops <= 5:
        if os.environ.get("KMER_TPU_WIDE_HALF", "1") == "1":
            return pallas_sort.TILE // 2
        return pallas_sort.TILE
    return pallas_sort.TILE // 2


@partial(jax.jit, static_argnames=("interpret",))
def _c3_merge_bitonic(p_lanes, p_counts, s_desc, ones, interpret=False):
    """Stage 2 (Pallas, bitonic): one half-merge pass prefix x descending
    sorted-raw with the fused count fold — 16 compare-exchange stages on
    w-element buffers instead of 17 on 2w (pallas_sort.
    merge_sorted_runs_fold_bitonic), at the full 64K tile through k=64
    (_bitonic_tile)."""
    from kmer_counter_tpu.ops import pallas_sort

    NL = p_lanes.shape[0]
    return pallas_sort.merge_sorted_runs_fold_bitonic(
        [*(p_lanes[i] for i in range(NL)), p_counts],
        [*(s_desc[i] for i in range(NL)), ones],
        num_keys=NL,
        tile=_bitonic_tile(NL + 1),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("cp", "interpret"))
def _c3_merge_compact_bitonic(p_lanes, p_counts, s_desc, ones, cp: int, interpret=False):
    """Stages 2+4 fused (Pallas): the bitonic half-merge with the count
    fold AND the stream compaction in one kernel (pallas_sort.
    merge_fold_compact_bitonic) — deletes compact_live's separate pass
    over the full merged table.  Dispatched at every record width: full
    64K tile through five operands, halved beyond (_bitonic_tile);
    golden-matched on-chip at k=31/55/101."""
    from kmer_counter_tpu.ops import pallas_sort

    NL = p_lanes.shape[0]
    out, live_count = pallas_sort.merge_fold_compact_bitonic(
        [*(p_lanes[i] for i in range(NL)), p_counts],
        [*(s_desc[i] for i in range(NL)), ones],
        num_keys=NL,
        tile=_bitonic_tile(NL + 1),
        interpret=interpret,
    )
    new_lanes = jnp.stack([out[i][:cp] for i in range(NL)], axis=0)
    new_counts = out[NL][:cp]
    return (
        new_lanes,
        new_counts,
        jnp.minimum(live_count, cp),
        jnp.maximum(live_count - cp, 0),
    )


@partial(jax.jit, static_argnames=("interpret", "fold"))
def _c3_merge(p_lanes, p_counts, s_lanes, r_counts, interpret=False, fold=False):
    """Stage 2 (Pallas): one merge-path pass prefix x sorted-raw.  (No
    donation: every output is CP+CR long, bigger than any input buffer.)"""
    from kmer_counter_tpu.ops import pallas_sort

    NL = p_lanes.shape[0]
    f = pallas_sort.merge_sorted_runs_fold if fold else pallas_sort.merge_sorted_runs
    return f(
        [*(p_lanes[i] for i in range(NL)), p_counts],
        [*(s_lanes[i] for i in range(NL)), r_counts],
        num_keys=NL,
        tile=_kernel_tile(NL + 1),
        interpret=interpret,
    )


@partial(jax.jit, donate_argnums=(1,))
def _c3_fold(m_lanes_tuple, m_counts):
    """Stage 3 (XLA): run totals onto run-head rows (skipped when the
    merge kernel folds in-kernel)."""
    return _fold_counts_in_place(jnp.stack(m_lanes_tuple, axis=0), m_counts)


@partial(jax.jit, static_argnames=("cp", "interpret"))
def _c3_compact(m_ops, folded, cp: int, interpret: bool = False):
    """Stage 4 (Pallas): stream-compact live rows, truncate to the prefix."""
    from kmer_counter_tpu.ops import pallas_sort

    NL = len(m_ops)
    out = pallas_sort.compact_live(
        [*m_ops, folded],
        folded,
        num_keys=NL,
        tile=_kernel_tile(NL + 1),
        interpret=interpret,
    )
    live_count = jnp.sum((folded != 0).astype(jnp.int32))
    new_lanes = jnp.stack([out[i][:cp] for i in range(NL)], axis=0)
    new_counts = out[NL][:cp]
    return (
        new_lanes,
        new_counts,
        jnp.minimum(live_count, cp),
        jnp.maximum(live_count - cp, 0),
    )


def _consolidate3_split(
    table: TwoLevelTable,
    interpret: bool = False,
    fold_fused: bool = False,
    bitonic: bool = False,
    fused_compact: bool = False,
):
    """consolidate3 as separately jitted stages (see block comment)."""
    NL, CP = table.prefix_lanes.shape
    # Fused path at every record width: full 64K tile through five
    # operands, halved beyond (_bitonic_tile).  On-chip validated: golden
    # byte-exact configs 2 and 4 (k=31/55), and the 8-operand kernel
    # compile-fits scoped VMEM at the 32K tile with a golden-matched run
    # (docs note: 20.9s compile, round 4 — the gate this replaces
    # guarded exactly that fit).
    if bitonic and fused_compact:
        s_desc, ones = _c3_sort_raw_desc(table.raw_lanes, table.raw_off)
        new_lanes, new_counts, live, lost = _c3_merge_compact_bitonic(
            table.prefix_lanes,
            table.prefix_counts,
            s_desc,
            ones,
            CP,
            interpret=interpret,
        )
        out = table._replace(
            prefix_lanes=new_lanes, prefix_counts=new_counts, raw_off=jnp.int32(0)
        )
        return out, live, lost
    if bitonic:
        s_desc, ones = _c3_sort_raw_desc(table.raw_lanes, table.raw_off)
        merged = _c3_merge_bitonic(
            table.prefix_lanes,
            table.prefix_counts,
            s_desc,
            ones,
            interpret=interpret,
        )
        folded = merged[NL]
    else:
        if fold_fused:
            s_lanes, r_counts = _c3_sort_raw_ones(table.raw_lanes, table.raw_off)
        else:
            s_lanes, r_counts = _c3_sort_raw(table.raw_lanes, table.raw_off)
        merged = _c3_merge(
            table.prefix_lanes,
            table.prefix_counts,
            s_lanes,
            r_counts,
            interpret=interpret,
            fold=fold_fused,
        )
        folded = (
            merged[NL] if fold_fused else _c3_fold(tuple(merged[:NL]), merged[NL])
        )
    new_lanes, new_counts, live, lost = _c3_compact(
        tuple(merged[:NL]), folded, CP, interpret=interpret
    )
    out = table._replace(
        prefix_lanes=new_lanes, prefix_counts=new_counts, raw_off=jnp.int32(0)
    )
    return out, live, lost


@partial(jax.jit, donate_argnums=(0,), static_argnames=("interpret",))
def _consolidate3_fold_impl(table: TwoLevelTable, interpret: bool = False):
    """consolidate3 with the count-fold fused into the merge kernel
    (pallas_sort.merge_sorted_runs_fold): drops BOTH the 23M-row XLA fold
    pass and the raw-multiplicity pass — the raw region feeds plain 0/1
    liveness and the kernel sums run totals onto run-end rows in VMEM
    (docs/ROADMAP.md round-3 item)."""
    from kmer_counter_tpu.ops import pallas_sort

    NL, CP = table.prefix_lanes.shape
    CR = table.raw_lanes.shape[1]
    idx = jnp.arange(CR, dtype=jnp.int32)
    live = idx < table.raw_off
    eff = jnp.where(live[None, :], table.raw_lanes, SENTINEL)
    s_ops = jax.lax.sort(
        tuple(eff[i] for i in range(NL)),
        dimension=0,
        num_keys=NL,
        # Unstable: keys-only rows are interchangeable within a tie
        # run, and the unstable TPU sort measured 32% faster than
        # the stable default (80.5 vs 117.9ms @ 32.1M x 2 lanes,
        # round 5 — round 4's 'stability is free' result does not
        # reproduce on this JAX).
        is_stable=False,
    )
    s_lanes = jnp.stack(s_ops, axis=0)
    is_sent = jnp.all(s_lanes == SENTINEL, axis=0)
    r_ones = jnp.where(is_sent, jnp.uint32(0), jnp.uint32(1))

    merged = pallas_sort.merge_sorted_runs_fold(
        [*(table.prefix_lanes[i] for i in range(NL)), table.prefix_counts],
        [*(s_lanes[i] for i in range(NL)), r_ones],
        num_keys=NL,
        interpret=interpret,
    )
    folded = merged[NL]
    out = pallas_sort.compact_live(
        [*merged[:NL], folded],
        folded,
        num_keys=NL,
        interpret=interpret,
    )
    live_count = jnp.sum((folded != 0).astype(jnp.int32))
    new_lanes = jnp.stack([out[i][:CP] for i in range(NL)], axis=0)
    new_counts = out[NL][:CP]
    lost = jnp.maximum(live_count - CP, 0)
    table = table._replace(
        prefix_lanes=new_lanes, prefix_counts=new_counts, raw_off=jnp.int32(0)
    )
    return table, jnp.minimum(live_count, CP), lost


@partial(jax.jit, donate_argnums=(0,), static_argnames=("interpret",))
def _consolidate3_impl(table: TwoLevelTable, interpret: bool = False):
    from kmer_counter_tpu.ops import pallas_sort

    NL, CP = table.prefix_lanes.shape
    CR = table.raw_lanes.shape[1]
    idx = jnp.arange(CR, dtype=jnp.int32)
    live = idx < table.raw_off
    eff = jnp.where(live[None, :], table.raw_lanes, SENTINEL)
    s_ops = jax.lax.sort(
        tuple(eff[i] for i in range(NL)),
        dimension=0,
        num_keys=NL,
        # Unstable: keys-only rows are interchangeable within a tie
        # run, and the unstable TPU sort measured 32% faster than
        # the stable default (80.5 vs 117.9ms @ 32.1M x 2 lanes,
        # round 5 — round 4's 'stability is free' result does not
        # reproduce on this JAX).
        is_stable=False,
    )
    s_lanes = jnp.stack(s_ops, axis=0)
    r_counts = _raw_counts_in_place(s_lanes)

    merged = pallas_sort.merge_sorted_runs(
        [*(table.prefix_lanes[i] for i in range(NL)), table.prefix_counts],
        [*(s_lanes[i] for i in range(NL)), r_counts],
        num_keys=NL,
        interpret=interpret,
    )
    m_lanes = jnp.stack(merged[:NL], axis=0)
    folded = _fold_counts_in_place(m_lanes, merged[NL])
    out = pallas_sort.compact_live(
        [*(m_lanes[i] for i in range(NL)), folded],
        folded,
        num_keys=NL,
        interpret=interpret,
    )
    live_count = jnp.sum((folded != 0).astype(jnp.int32))
    new_lanes = jnp.stack([out[i][:CP] for i in range(NL)], axis=0)
    new_counts = out[NL][:CP]
    lost = jnp.maximum(live_count - CP, 0)
    table = table._replace(
        prefix_lanes=new_lanes, prefix_counts=new_counts, raw_off=jnp.int32(0)
    )
    return table, jnp.minimum(live_count, CP), lost


def consolidate3(
    table: TwoLevelTable,
    _interpret: bool = False,
    fold_fused: bool | None = None,
    bitonic: bool | None = None,
    fused_compact: bool | None = None,
):
    """Pallas-merge consolidation: raw keys-only lax sort + in-place
    multiplicities + ONE merge-path pass against the prefix
    (pallas_sort.merge_sorted_runs) + run-total fold + stream compaction
    (pallas_sort.compact_live) — replacing consolidate2's 3-operand
    merge sort (118ms at 22.9M rows) with ~1/4 the cost (measured,
    docs/experiments_consolidate_tpu.py).

    ``fold_fused`` (default: on; set env KMER_TPU_FOLD_FUSED=0 to disable)
    selects the merge kernel with the in-kernel count fold
    (_consolidate3_fold_impl), which skips two whole-table XLA passes.
    ``bitonic`` (default: on; set env KMER_TPU_BITONIC=0 to disable)
    further replaces the odd-even merge with the bitonic half-merge over
    a DESCENDING-stored raw sort (16 stages on w-element buffers instead
    of 17 on 2w; full 64K tile at every record width) — it implies the
    fused fold.

    Same contract as consolidate2: returns (table', live, lost); lost
    must be 0 (finalize_host raises otherwise).  Prefix invariant becomes
    *unique* live rows (consolidate2's ≤2-rows/key prefixes are also
    accepted — the fold handles any run length).

    Requires (CP+CR) % pallas_sort.TILE == 0 and a TPU backend (or
    ``_interpret=True`` for tests); otherwise falls back to consolidate2.
    """
    import os

    from kmer_counter_tpu.ops import pallas_sort
    from kmer_counter_tpu.ops.sortcount import tpu_backend

    NL, CP = table.prefix_lanes.shape
    CR = table.raw_lanes.shape[1]
    if (CP + CR) % pallas_sort.TILE != 0 or not (tpu_backend() or _interpret):
        return consolidate2(table)
    if fold_fused is None:
        # Default ON: besides skipping two whole-table passes, the fused
        # kernel avoids _fold_counts_in_place's associative_scan, whose
        # XLA compile through this environment's remote tunnel never
        # finished (>10 min standalone, measured round 3 — the root cause
        # of the monolithic consolidate3 compile hang).
        fold_fused = os.environ.get("KMER_TPU_FOLD_FUSED", "1") == "1"
    if bitonic is None:
        # Default ON: validated on real Mosaic at the full 64K tile by the
        # on-chip selftest (bench.py --selftest, round 4 — merge_fold
        # PASS including the traced sublane rotate and the dead-row
        # positional-liveness protocol).
        bitonic = os.environ.get("KMER_TPU_BITONIC", "1") == "1"
    if fused_compact is None:
        # Default ON: fuse the stream compaction into the bitonic merge
        # kernel (narrow records only — wide records and the non-bitonic
        # variants keep the split stages) — deletes compact_live's
        # separate pass over the merged table.  Golden byte-exact on-chip
        # (run_configs config 2) and +1.1% same-session at k=31;
        # KMER_TPU_FUSED_COMPACT=0 reverts to split merge+compact.
        fused_compact = os.environ.get("KMER_TPU_FUSED_COMPACT", "1") == "1"
    if os.environ.get("KMER_TPU_MONO_CONSOLIDATE", "0") == "1":
        # The single-program variants: never finished compiling through
        # this environment's remote tunnel (see _consolidate3_split's
        # block comment) but kept for real TPU environments where one
        # program saves dispatches.
        if fold_fused:
            return _consolidate3_fold_impl(table, interpret=_interpret)
        return _consolidate3_impl(table, interpret=_interpret)
    return _consolidate3_split(
        table,
        interpret=_interpret,
        fold_fused=fold_fused,
        bitonic=bitonic,
        fused_compact=fused_compact,
    )


@partial(jax.jit, static_argnames=("prefix_slots", "raw_slots"))
def grow2(table: TwoLevelTable, prefix_slots: int, raw_slots: int) -> TwoLevelTable:
    """Copy into larger buffers (host-triggered under cardinality growth)."""
    NL, CP = table.prefix_lanes.shape
    CR = table.raw_lanes.shape[1]
    if prefix_slots < CP or raw_slots < CR:
        raise ValueError("grow2() cannot shrink the table")
    pl = jnp.zeros((NL, prefix_slots), jnp.uint32).at[:, :CP].set(table.prefix_lanes)
    pc = jnp.zeros((prefix_slots,), jnp.uint32).at[:CP].set(table.prefix_counts)
    rl = jnp.zeros((NL, raw_slots), jnp.uint32).at[:, :CR].set(table.raw_lanes)
    return TwoLevelTable(pl, pc, rl, table.raw_off, table.allt)


@jax.jit
def finalize2(table: TwoLevelTable):
    """Fully deduped compacted prefix (raw region must already be merged:
    raw_off == 0).  Returns (lanes [NL, CP], counts, num_unique) per the
    sort_reduce contract; the allt side count is handled by the caller
    (use ``finalize_host`` for the complete, checked protocol)."""
    return sort_reduce(table.prefix_lanes, table.prefix_counts)


def raw_append_fits(table: TwoLevelTable, chunk_width: int) -> bool:
    """Host-side overflow guard for ``append_raw``: the host mirrors
    raw_off exactly (appends advance by the chunk's static width), so this
    check is authoritative.  A violated bound would make
    ``dynamic_update_slice`` silently clamp and overwrite the newest
    previously-appended records (ADVICE r1) — callers must consolidate
    (or grow) when this returns False."""
    return int(jax.device_get(table.raw_off)) + chunk_width <= table.raw_lanes.shape[1]


def finalize_host(table: TwoLevelTable, k: int):
    """The one checked host-side finalize for a TwoLevelTable.

    Centralizes the two protocol obligations that would otherwise be on
    every caller (ADVICE r1): (a) any outstanding raw region is merged and
    a nonzero ``lost`` (live records truncated by an undersized prefix) is
    a hard error, never silent truncation; (b) when k % 16 == 0 in forward
    mode, the all-T k-mer — bit-identical to the sentinel, so counted out
    of band (see module docstring) — is re-materialized as the final,
    maximum-key record.

    Returns (lanes ``[num_unique, NL] uint32`` record-major, counts
    ``[num_unique] uint32``), keys sorted ascending — ready for
    io.dump.dump_table.
    """
    import numpy as np

    if int(jax.device_get(table.raw_off)) > 0:
        table, _live, lost = consolidate3(table)  # falls back to consolidate2
        lost = int(jax.device_get(lost))
        if lost:
            raise RuntimeError(
                f"two-level consolidation truncated {lost} live records: "
                "prefix region undersized (grow2 before finalize)"
            )
    lanes, counts, num_unique = finalize2(table)
    n = int(jax.device_get(num_unique))
    NL = table.prefix_lanes.shape[0]
    out_lanes = (
        np.asarray(jax.device_get(lanes[:, :n])).T
        if n
        else np.zeros((0, NL), np.uint32)
    )
    out_counts = np.asarray(jax.device_get(counts[:n]), dtype=np.uint32)
    allt = int(jax.device_get(table.allt))
    if allt:
        # T^k packs to all-ones in every active lane: the maximum possible
        # key, so appending keeps the table sorted.
        tk = np.full((1, NL), 0xFFFFFFFF, np.uint32)
        if out_lanes.shape[0] and np.array_equal(out_lanes[-1], tk[0]):
            # A real error type (not assert): this must fire under python -O
            # too — it means extract_chunk_keys leaked a sentinel-valued key
            # into the stream and counts would silently double.
            raise RuntimeError(
                "all-T key present in the key stream despite the side "
                "counter: extract_chunk_keys contract violated"
            )
        out_lanes = np.concatenate([out_lanes, tk], axis=0)
        out_counts = np.concatenate(
            [out_counts, np.asarray([allt], np.uint32)]
        )
    return out_lanes, out_counts
