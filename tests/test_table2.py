"""Two-level table (ops.table2) vs the golden model.

Exercises the steady-state loop the engine/bench run: sentinel-encoded
keys-only raw appends, merge-consolidations at arbitrary points, prefix
pair-rows across rounds, the all-T side counter at k%16==0, and grow.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_counter_tpu import golden, records
from kmer_counter_tpu.ops import table2 as t2
from kmer_counter_tpu.ops.pipeline import extract_chunk_keys

from conftest import random_reads


def table_counter(table, k):
    """Fully finalize a TwoLevelTable to {key-words tuple: count} through
    the production finalize_host protocol (lost check + allt record)."""
    lanes, counts = t2.finalize_host(table, k)
    words = records.lanes_to_words(lanes)
    got = {}
    for row, c in zip(words, counts):
        got[tuple(int(w) for w in row)] = int(c)
    return got


def run_rounds(reads_list, k, canonical, cp, cr, consolidate_every=None):
    NL = records.active_lanes(k)
    table = t2.make_table2(cp, cr, NL)
    for i, reads in enumerate(reads_list):
        lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, canonical)
        if int(table.raw_off) + lanes.shape[1] > cr or (
            consolidate_every and i and i % consolidate_every == 0
        ):
            table, live, lost = t2.consolidate2(table)
            assert int(lost) == 0
        table = t2.append_raw(table, lanes, allt)
    return table


@pytest.mark.parametrize("k", [4, 15, 31, 55])
@pytest.mark.parametrize("canonical", [False, True])
def test_two_level_matches_golden(rng, k, canonical):
    L = max(k + 9, 40)
    chunks = [random_reads(rng, 12, L, invalid_frac=0.05) for _ in range(5)]
    P = L - k + 1
    table = run_rounds(chunks, k, canonical, cp=4 * 12 * P, cr=2 * 12 * P,
                       consolidate_every=2)
    want = dict(golden.count_reads(np.vstack(chunks), k, canonical))
    assert table_counter(table, k) == want


@pytest.mark.parametrize("canonical", [False, True])
def test_two_level_allt_k16(rng, canonical):
    # k % 16 == 0: a valid all-T k-mer is bit-identical to the sentinel and
    # must flow through the side counter (forward) / the A^k key (canonical).
    k = 16
    base = random_reads(rng, 6, 40, invalid_frac=0.02)
    allt_reads = np.full((3, 40), ord("T"), np.uint8)
    allt_reads[1, 5] = ord("N")  # invalid base inside a T run
    chunks = [base, allt_reads]
    table = run_rounds(chunks, k, canonical, cp=4096, cr=2048)
    want = dict(golden.count_reads(np.vstack(chunks), k, canonical))
    assert table_counter(table, k) == want


def test_two_level_repeated_consolidation_pairs(rng):
    # The same keys re-appear each round: the prefix accumulates two live
    # rows per key between rounds and _collapse_prefix must fold them.
    k = 15
    reads = random_reads(rng, 8, 30)
    chunks = [reads] * 4
    table = run_rounds(chunks, k, False, cp=2048, cr=256, consolidate_every=1)
    want = {key: 4 * c for key, c in golden.count_reads(reads, k, False).items()}
    assert table_counter(table, k) == want


def test_two_level_grow(rng):
    k = 15
    reads = random_reads(rng, 8, 30)
    NL = records.active_lanes(k)
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
    # prefix too small for the distinct keys: consolidation detects the
    # truncation it would have caused (consolidate2 donates its input, so
    # build a throwaway table for the probe).
    probe = t2.append_raw(t2.make_table2(64, 256, NL), lanes, allt)
    _, _, lost = t2.consolidate2(probe)
    assert int(lost) > 0
    table = t2.append_raw(t2.make_table2(64, 256, NL), lanes, allt)
    table = t2.grow2(table, 2048, 256)
    want = dict(golden.count_reads(reads, k, False))
    assert table_counter(table, k) == want


VARIANTS = {
    "plain": dict(fold_fused=False, bitonic=False),
    "fused": dict(fold_fused=True, bitonic=False),
    "bitonic": dict(bitonic=True),
    "fused_compact": dict(bitonic=True, fused_compact=True),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_consolidate3_matches_golden(rng, variant):
    # The Pallas-merge consolidation path (interpret mode: one 64K tile).
    # Several rounds so the prefix re-merges with later raw regions.
    kw = VARIANTS[variant]
    k = 15
    canonical = True
    NL = records.active_lanes(k)
    CP, CR = 16384, 49152  # CP+CR == pallas_sort.TILE
    table = t2.make_table2(CP, CR, NL)
    chunks = [random_reads(rng, 16, 40, invalid_frac=0.05) for _ in range(4)]
    for i, reads in enumerate(chunks):
        lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, canonical)
        if not t2.raw_append_fits(table, lanes.shape[1]) or i == 2:
            table, live, lost = t2.consolidate3(table, _interpret=True, **kw)
            assert int(lost) == 0
        table = t2.append_raw(table, lanes, allt)
    table, live, lost = t2.consolidate3(table, _interpret=True, **kw)
    assert int(lost) == 0
    # prefix is unique + compact: live rows all count>0, sorted strictly
    counts = np.asarray(table.prefix_counts)
    nl = int(live)
    assert np.all(counts[:nl] > 0) and np.all(counts[nl:] == 0)
    lanes_np = np.asarray(table.prefix_lanes)[:, :nl]
    keys = [tuple(lanes_np[:, i]) for i in range(nl)]
    assert keys == sorted(set(keys)), "prefix not strictly sorted unique"
    got = table_counter(table, k)
    want = dict(golden.count_reads(np.vstack(chunks), k, canonical))
    assert got == want


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_consolidate3_lost_detection(rng, variant):
    k = 15
    NL = records.active_lanes(k)
    CP, CR = 128, 65536 - 128
    table = t2.make_table2(CP, CR, NL)
    reads = random_reads(rng, 16, 40)
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
    table = t2.append_raw(table, lanes, allt)
    _, live, lost = t2.consolidate3(table, _interpret=True, **VARIANTS[variant])
    assert int(lost) > 0  # far more distinct keys than the 128-slot prefix


def test_finalize_host_merges_and_raises_on_lost(rng):
    k = 15
    reads = random_reads(rng, 8, 30)
    NL = records.active_lanes(k)
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
    # Outstanding raw region is merged implicitly by finalize_host...
    table = t2.append_raw(t2.make_table2(2048, 256, NL), lanes, allt)
    got_lanes, got_counts = t2.finalize_host(table, k)
    want = dict(golden.count_reads(reads, k, False))
    assert len(got_counts) == len(want)
    # ...and an undersized prefix is a hard error, not silent truncation.
    table = t2.append_raw(t2.make_table2(8, 256, NL), lanes, allt)
    with pytest.raises(RuntimeError, match="truncated"):
        t2.finalize_host(table, k)


def test_raw_append_fits(rng):
    k = 15
    NL = records.active_lanes(k)
    reads = random_reads(rng, 8, 30)
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
    width = lanes.shape[1]
    table = t2.make_table2(64, width + width // 2, NL)
    assert t2.raw_append_fits(table, width)
    table = t2.append_raw(table, lanes, allt)
    assert not t2.raw_append_fits(table, width)


def test_fill_from_right():
    flags = jnp.asarray([False, True, False, False, True, False])
    vals = jnp.asarray([10, 20, 30, 40, 50, 60], jnp.uint32)
    out = t2._fill_from_right(flags, vals, jnp.uint32(99))
    assert np.asarray(out).tolist() == [20, 20, 50, 50, 50, 99]


def test_extract_chunk_keys_sentinels(rng):
    reads = random_reads(rng, 4, 20, invalid_frac=0.2)
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), 7, False)
    assert int(allt) == 0
    arr = np.asarray(lanes)
    sent = np.all(arr == 0xFFFFFFFF, axis=0)
    n_valid = sum(
        c for c in golden.count_reads(reads, 7, False).values()
    )
    assert (~sent).sum() == n_valid


def test_consolidate3_fold_fused_matches_golden(rng):
    # The in-kernel count-fold variant (merge_sorted_runs_fold): same
    # contract and result as consolidate3, two fewer whole-table passes.
    k = 15
    canonical = True
    NL = records.active_lanes(k)
    CP, CR = 16384, 49152  # CP+CR == pallas_sort.TILE
    table = t2.make_table2(CP, CR, NL)
    chunks = [random_reads(rng, 16, 40, invalid_frac=0.05) for _ in range(4)]
    for i, reads in enumerate(chunks):
        lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, canonical)
        if not t2.raw_append_fits(table, lanes.shape[1]) or i == 2:
            table, live, lost = t2.consolidate3(
                table, _interpret=True, fold_fused=True, bitonic=False
            )
            assert int(lost) == 0
        table = t2.append_raw(table, lanes, allt)
    table, live, lost = t2.consolidate3(
        table, _interpret=True, fold_fused=True, bitonic=False
    )
    assert int(lost) == 0
    counts = np.asarray(table.prefix_counts)
    nl = int(live)
    assert np.all(counts[:nl] > 0) and np.all(counts[nl:] == 0)
    lanes_np = np.asarray(table.prefix_lanes)[:, :nl]
    keys = [tuple(lanes_np[:, i]) for i in range(nl)]
    assert keys == sorted(set(keys)), "prefix not strictly sorted unique"
    got = table_counter(table, k)
    want = dict(golden.count_reads(np.vstack(chunks), k, canonical))
    assert got == want


def test_consolidate3_fold_fused_lost_detection(rng):
    k = 15
    NL = records.active_lanes(k)
    CP, CR = 128, 65536 - 128
    table = t2.make_table2(CP, CR, NL)
    reads = random_reads(rng, 16, 40)
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
    table = t2.append_raw(table, lanes, allt)
    _, live, lost = t2.consolidate3(
        table, _interpret=True, fold_fused=True, bitonic=False
    )
    assert int(lost) > 0


@pytest.mark.parametrize("variant", ["fused", "bitonic", "fused_compact"])
def test_consolidate3_fold_fused_wide_records(rng, variant):
    # k=55: 4 key lanes + counts = 5 operands.  The odd-even variant runs
    # at the halved tile (_kernel_tile; full-tile 5-op odd-even merge
    # OOMs scoped VMEM on the chip); the bitonic variants keep the full
    # 64K tile (5 operands is _bitonic_tile's full-tile limit, and the
    # fused-compact gate's).  CP+CR stays a multiple of both tiles.
    kw = VARIANTS[variant]
    k = 55
    NL = records.active_lanes(k)
    assert NL == 4
    CP, CR = 16384, 49152
    table = t2.make_table2(CP, CR, NL)
    chunks = [random_reads(rng, 12, 70, invalid_frac=0.03) for _ in range(3)]
    for i, reads in enumerate(chunks):
        lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, True)
        if not t2.raw_append_fits(table, lanes.shape[1]) or i == 1:
            table, live, lost = t2.consolidate3(table, _interpret=True, **kw)
            assert int(lost) == 0
        table = t2.append_raw(table, lanes, allt)
    got = table_counter(table, k)
    want = dict(golden.count_reads(np.vstack(chunks), k, True))
    assert got == want


@pytest.mark.parametrize("variant", ["fused", "bitonic"])
def test_consolidate3_fold_fused_accepts_pair_row_prefix(rng, variant):
    # consolidate2 leaves <=2 live rows per key in the prefix; a later
    # fused consolidation must fold those pairs together with the fresh
    # raw region (the "fold handles any run length" contract).
    kw = VARIANTS[variant]
    k = 15
    NL = records.active_lanes(k)
    CP, CR = 16384, 49152
    table = t2.make_table2(CP, CR, NL)
    reads = random_reads(rng, 16, 40)
    # two consolidate2 rounds of the SAME reads -> pair rows in the prefix
    for _ in range(2):
        lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
        table = t2.append_raw(table, lanes, allt)
        table, live, lost = t2.consolidate2(table)
        assert int(lost) == 0
    pc = np.asarray(table.prefix_counts)
    pl = np.asarray(table.prefix_lanes)[:, pc > 0]
    keys = [tuple(pl[:, i]) for i in range(pl.shape[1])]
    assert len(keys) != len(set(keys)), "precondition: prefix has pair rows"
    # third round through the FUSED path
    lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, False)
    table = t2.append_raw(table, lanes, allt)
    table, live, lost = t2.consolidate3(table, _interpret=True, **kw)
    assert int(lost) == 0
    got = table_counter(table, k)
    want = {key: 3 * c for key, c in golden.count_reads(reads, k, False).items()}
    assert got == want


def test_consolidate3_bitonic_widest_records(rng):
    # k=101: 7 key lanes + counts = 8 operands — the widest-record
    # regime.  On the chip the 8-operand bitonic merge OOMs scoped VMEM
    # at the full 64K tile (18.76M vs the 16M limit, measured round 4);
    # _bitonic_tile halves the window beyond five operands.  Interpret
    # mode exercises the halved-tile path end-to-end against golden.
    k = 101
    NL = records.active_lanes(k)
    assert NL == 7
    CP, CR = 16384, 49152
    table = t2.make_table2(CP, CR, NL)
    chunks = [random_reads(rng, 8, 120, invalid_frac=0.03) for _ in range(3)]
    for i, reads in enumerate(chunks):
        lanes, allt = extract_chunk_keys(jnp.asarray(reads), k, True)
        if not t2.raw_append_fits(table, lanes.shape[1]) or i == 1:
            table, live, lost = t2.consolidate3(table, _interpret=True, bitonic=True)
            assert int(lost) == 0
        table = t2.append_raw(table, lanes, allt)
    got = table_counter(table, k)
    want = dict(golden.count_reads(np.vstack(chunks), k, True))
    assert got == want
