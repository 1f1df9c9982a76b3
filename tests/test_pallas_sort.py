"""ops.pallas_sort: the odd-even network sort vs jax.lax.sort.

The kernels run in Pallas interpret mode on the CPU mesh (slow — sizes
stay small; the real-chip validation and perf numbers live in
docs/experiments_psort_tpu.py).  The XLA-side merge-path diagonal search
is tested directly at larger sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmer_counter_tpu.ops import pallas_sort as ps

TILE = 1024  # small tile for interpret-mode runs


def _rand_ops(rng, n, n_ops, vmax=2**32):
    return [
        jnp.asarray(rng.integers(0, vmax, n, np.uint64).astype(np.uint32))
        for _ in range(n_ops)
    ]


def _payload_multiset_equal(got, want, num_keys, n_payload):
    """Keys equal exactly; payload rows equal as a multiset of
    (key, payload) records (equal-key payload order is unspecified)."""
    n_ops = num_keys + n_payload
    a = np.stack([np.asarray(got[i]) for i in range(n_ops)], 1)
    b = np.stack([np.asarray(want[i]) for i in range(n_ops)], 1)
    return np.array_equal(
        a[np.lexsort(a.T[::-1])], b[np.lexsort(b.T[::-1])]
    )


def check(rng, n, num_keys, n_payload, vmax=2**32, data=None):
    ops = data if data is not None else _rand_ops(rng, n, num_keys + n_payload, vmax)
    got = ps.sort_ops(ops, num_keys, tile=TILE, interpret=True)
    want = jax.lax.sort(tuple(ops), dimension=0, num_keys=num_keys)
    for i in range(num_keys):
        assert np.array_equal(np.asarray(got[i]), np.asarray(want[i]))
    if n_payload:
        assert _payload_multiset_equal(got, want, num_keys, n_payload)


def test_leaf_only_single_key(rng):
    check(rng, TILE, 1, 0)


def test_leaf_only_two_keys_payload(rng):
    check(rng, TILE, 2, 1)


def test_two_tiles_one_merge_pass(rng):
    check(rng, 2 * TILE, 2, 1)


def test_four_tiles_heavy_dups(rng):
    check(rng, 4 * TILE, 1, 1, vmax=8)


def test_odd_tile_count_copy_through(rng):
    # 3 runs: the unpaired tail run must pass through each pass unchanged.
    check(rng, 3 * TILE, 1, 1)


def test_presorted_and_reversed(rng):
    s = np.sort(rng.integers(0, 2**32, 2 * TILE, np.uint64).astype(np.uint32))
    check(rng, 2 * TILE, 1, 0, data=[jnp.asarray(s)])
    check(rng, 2 * TILE, 1, 0, data=[jnp.asarray(s[::-1].copy())])


def test_sentinel_blocks_sort_to_end(rng):
    # count-0 sentinel rows (the sort_reduce encoding) must coalesce at the
    # end without disturbing genuine keys.
    keys = rng.integers(0, 2**20, 2 * TILE, np.uint64).astype(np.uint32)
    keys[rng.random(2 * TILE) < 0.3] = 0xFFFFFFFF
    counts = (keys != 0xFFFFFFFF).astype(np.uint32)
    got = ps.sort_ops(
        [jnp.asarray(keys), jnp.asarray(counts)], 1, tile=TILE, interpret=True
    )
    want = jax.lax.sort(
        (jnp.asarray(keys), jnp.asarray(counts)), dimension=0, num_keys=1
    )
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    n_sent = int((keys == 0xFFFFFFFF).sum())
    assert np.all(np.asarray(got[1])[-n_sent:] == 0)


def test_length_not_tile_multiple_raises(rng):
    with pytest.raises(ValueError, match="sort_ops requires"):
        ps.sort_ops(_rand_ops(rng, TILE + 128, 1), 1, tile=TILE, interpret=True)


def test_merge_sorted_runs_unequal(rng):
    na, nb = TILE, 3 * TILE
    a = np.sort(rng.integers(0, 2**32, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 2**32, nb, np.uint64).astype(np.uint32))
    ap = rng.integers(0, 2**32, na, np.uint64).astype(np.uint32)
    bp = rng.integers(0, 2**32, nb, np.uint64).astype(np.uint32)
    got = ps.merge_sorted_runs(
        [jnp.asarray(a), jnp.asarray(ap)],
        [jnp.asarray(b), jnp.asarray(bp)],
        1,
        tile=TILE,
        interpret=True,
    )
    want = jax.lax.sort(
        (jnp.asarray(np.concatenate([a, b])), jnp.asarray(np.concatenate([ap, bp]))),
        dimension=0,
        num_keys=1,
    )
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert _payload_multiset_equal(got, want, 1, 1)


def test_merge_sorted_runs_dups_and_sentinel_tails(rng):
    # the consolidation shape: both runs carry duplicate keys and trailing
    # sentinel (count-0) regions
    na, nb = 2 * TILE, 2 * TILE
    a = np.sort(rng.integers(0, 64, na, np.uint64).astype(np.uint32))
    a[-TILE // 2 :] = 0xFFFFFFFF
    b = np.sort(rng.integers(0, 64, nb, np.uint64).astype(np.uint32))
    b[-TILE // 3 :] = 0xFFFFFFFF
    ac = (a != 0xFFFFFFFF).astype(np.uint32)
    bc = (b != 0xFFFFFFFF).astype(np.uint32)
    got = ps.merge_sorted_runs(
        [jnp.asarray(a), jnp.asarray(ac)],
        [jnp.asarray(b), jnp.asarray(bc)],
        1,
        tile=TILE,
        interpret=True,
    )
    keys = np.asarray(got[0])
    counts = np.asarray(got[1])
    assert np.array_equal(keys, np.sort(np.concatenate([a, b])))
    # count totals per genuine key preserved
    live = keys != 0xFFFFFFFF
    want_total = int(ac.sum() + bc.sum())
    assert int(counts[live].sum()) == want_total


def test_merge_and_compact_five_operands(rng):
    # k=55..128 records: 4 key lanes + count = 5 operands end to end.
    na, nb = TILE, TILE
    a_keys = np.sort(rng.integers(0, 2**16, na, np.uint64).astype(np.uint32))
    b_keys = np.sort(rng.integers(0, 2**16, nb, np.uint64).astype(np.uint32))
    a_ops = [jnp.asarray(a_keys)] * 4 + [
        jnp.asarray(rng.integers(1, 4, na, np.uint64).astype(np.uint32))
    ]
    b_ops = [jnp.asarray(b_keys)] * 4 + [
        jnp.asarray(rng.integers(1, 4, nb, np.uint64).astype(np.uint32))
    ]
    got = ps.merge_sorted_runs(a_ops, b_ops, 4, tile=TILE, interpret=True)
    want_keys = np.sort(np.concatenate([a_keys, b_keys]))
    for i in range(4):
        assert np.array_equal(np.asarray(got[i]), want_keys)
    assert int(np.asarray(got[4]).sum()) == int(a_ops[4].sum() + b_ops[4].sum())
    live = (np.asarray(got[4]) % 2).astype(np.uint32)  # arbitrary subset
    comp = ps.compact_live(list(got), jnp.asarray(live), num_keys=4,
                           tile=TILE, interpret=True)
    nl = int(live.sum())
    assert np.array_equal(np.asarray(comp[0])[:nl], want_keys[live != 0])
    assert np.array_equal(
        np.asarray(comp[4])[:nl], np.asarray(got[4])[live != 0]
    )


def test_compact_live(rng):
    n = 3 * TILE
    keys = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
    pay = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
    live = (rng.random(n) < 0.4).astype(np.uint32)
    got = ps.compact_live(
        [jnp.asarray(keys), jnp.asarray(pay)],
        jnp.asarray(live),
        num_keys=1,
        tile=TILE,
        interpret=True,
    )
    nl = int(live.sum())
    assert np.array_equal(np.asarray(got[0])[:nl], keys[live != 0])
    assert np.array_equal(np.asarray(got[1])[:nl], pay[live != 0])
    assert np.all(np.asarray(got[0])[nl:] == 0xFFFFFFFF)
    assert np.all(np.asarray(got[1])[nl:] == 0)


@pytest.mark.parametrize("density", [0.0, 1.0, 0.97])
def test_compact_live_extremes(rng, density):
    n = 2 * TILE
    keys = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
    live = (rng.random(n) < density).astype(np.uint32)
    got = ps.compact_live(
        [jnp.asarray(keys)], jnp.asarray(live), num_keys=1, tile=TILE,
        interpret=True,
    )
    nl = int(live.sum())
    assert np.array_equal(np.asarray(got[0])[:nl], keys[live != 0])
    assert np.all(np.asarray(got[0])[nl:] == 0xFFFFFFFF)


def test_diag_splits_partition(rng):
    # XLA-side merge-path search: consumptions partition both runs, each
    # tile consumes exactly W elements, and outputs are range-disjoint.
    n, w, run = 64 * 1024, 1024, 8 * 1024
    keys = np.sort(
        rng.integers(0, 2**32, n, np.uint64).astype(np.uint32).reshape(-1, run),
        axis=1,
    ).reshape(-1)
    a_s, a_e, b_s, b_e = jax.jit(
        lambda k: ps._diag_splits((k,), 1, run, w, n)
    )(jnp.asarray(keys))
    a_s, a_e, b_s, b_e = map(np.asarray, (a_s, a_e, b_s, b_e))
    assert np.all(a_e - a_s + (b_e - b_s) == w)
    assert np.all(a_e - a_s >= 0) and np.all(b_e - b_s >= 0)
    # per-pair coverage: consumed A/B ranges tile the runs exactly
    tiles_per_pair = 2 * run // w
    for q in range(n // (2 * run)):
        t0, t1 = q * tiles_per_pair, (q + 1) * tiles_per_pair
        assert a_s[t0] == q * 2 * run and a_e[t1 - 1] == q * 2 * run + run
        assert b_s[t0] == q * 2 * run + run and b_e[t1 - 1] == (q + 1) * 2 * run
        assert np.array_equal(a_s[t0 + 1 : t1], a_e[t0 : t1 - 1])
        assert np.array_equal(b_s[t0 + 1 : t1], b_e[t0 : t1 - 1])
    # merging each tile's consumed ranges reproduces the pair's sorted order
    merged = []
    for t in range(n // w):
        seg = np.concatenate([keys[a_s[t] : a_e[t]], keys[b_s[t] : b_e[t]]])
        merged.append(np.sort(seg))
    got = np.concatenate(merged)
    want = np.sort(
        keys.reshape(-1, 2 * run), axis=1
    ).reshape(-1)
    assert np.array_equal(got, want)


def _ref_fold_ends(keys_cols, counts):
    """Reference fold: merged-sorted keys; each duplicate-key run's summed
    count on the run's LAST row, 0 elsewhere; all-sentinel runs dead."""
    karr = np.stack([np.asarray(c) for c in keys_cols], 1)
    counts = np.asarray(counts, np.uint32)
    n = len(counts)
    out = np.zeros(n, np.uint32)
    i = 0
    while i < n:
        j = i
        while j + 1 < n and (karr[j + 1] == karr[i]).all():
            j += 1
        if not (karr[i] == 0xFFFFFFFF).all():
            out[j] = np.uint32(counts[i : j + 1].sum())
        i = j + 1
    return out


def _check_fold(a_keys_cols, a_counts, b_keys_cols, b_counts, num_keys):
    got = ps.merge_sorted_runs_fold(
        [*(jnp.asarray(c) for c in a_keys_cols), jnp.asarray(a_counts)],
        [*(jnp.asarray(c) for c in b_keys_cols), jnp.asarray(b_counts)],
        num_keys,
        tile=TILE,
        interpret=True,
    )
    merged_cols = [
        np.concatenate([a, b]) for a, b in zip(a_keys_cols, b_keys_cols)
    ]
    order = np.lexsort(tuple(reversed(merged_cols)))
    want_keys = [c[order] for c in merged_cols]
    for i in range(num_keys):
        assert np.array_equal(np.asarray(got[i]), want_keys[i]), f"lane {i}"
    want_counts = _ref_fold_ends(
        want_keys, np.concatenate([a_counts, b_counts])[order]
    )
    assert np.array_equal(np.asarray(got[num_keys]), want_counts)


def test_merge_fold_heavy_dups(rng):
    na, nb = TILE, 3 * TILE
    a = np.sort(rng.integers(0, 48, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 48, nb, np.uint64).astype(np.uint32))
    ac = rng.integers(1, 5, na).astype(np.uint32)
    bc = np.ones(nb, np.uint32)
    _check_fold([a], ac, [b], bc, 1)


def test_merge_fold_two_key_lanes_with_sentinels(rng):
    # the consolidate3 shape: 2-lane keys, sentinel tails on both sides
    na, nb = 2 * TILE, 2 * TILE
    a0 = np.sort(rng.integers(0, 16, na, np.uint64).astype(np.uint32))
    a1 = rng.integers(0, 4, na, np.uint64).astype(np.uint32)
    order = np.lexsort((a1, a0))
    a0, a1 = a0[order], a1[order]
    a0[-TILE // 2 :] = 0xFFFFFFFF
    a1[-TILE // 2 :] = 0xFFFFFFFF
    ac = np.where(a0 != 0xFFFFFFFF, 2, 0).astype(np.uint32)
    b0 = np.sort(rng.integers(0, 16, nb, np.uint64).astype(np.uint32))
    b1 = rng.integers(0, 4, nb, np.uint64).astype(np.uint32)
    order = np.lexsort((b1, b0))
    b0, b1 = b0[order], b1[order]
    b0[-TILE // 3 :] = 0xFFFFFFFF
    b1[-TILE // 3 :] = 0xFFFFFFFF
    bc = np.where(b0 != 0xFFFFFFFF, 1, 0).astype(np.uint32)
    _check_fold([a0, a1], ac, [b0, b1], bc, 2)


def test_merge_fold_single_run_spans_all_tiles(rng):
    # carry torture: one key across 4 tiles; total lands on the last row
    na = nb = 2 * TILE
    a = np.full(na, 7, np.uint32)
    b = np.full(nb, 7, np.uint32)
    ac = np.ones(na, np.uint32)
    bc = rng.integers(1, 3, nb).astype(np.uint32)
    _check_fold([a], ac, [b], bc, 1)


def test_merge_fold_run_ends_exactly_at_tile_boundary(rng):
    # a run whose last element is a tile's last row: the end must be
    # detected against the NEXT merged element (extracted from the input
    # windows), not within the tile.
    na = nb = TILE
    a = np.concatenate(
        [np.full(TILE // 2, 5, np.uint32), np.full(TILE // 2, 9, np.uint32)]
    )
    b = np.concatenate(
        [np.full(TILE // 2, 5, np.uint32), np.full(TILE // 2, 9, np.uint32)]
    )
    # merged: TILE of key 5 (exactly tile 0), TILE of key 9 (tile 1)
    ac = np.ones(na, np.uint32)
    bc = np.ones(nb, np.uint32)
    _check_fold([a], ac, [b], bc, 1)


def test_merge_fold_count_wraparound(rng):
    # uint32 modular counts: totals that wrap must still difference out
    na = nb = TILE
    a = np.full(na, 3, np.uint32)
    b = np.full(nb, 3, np.uint32)
    ac = np.full(na, 0x80000000, np.uint32)  # 2*TILE halves wrap many times
    bc = np.full(nb, 0x80000001, np.uint32)
    _check_fold([a], ac, [b], bc, 1)


# ---- bitonic half-merge (B stored descending) ------------------------------


def _check_fold_bitonic(a_keys_cols, a_counts, b_keys_cols, b_counts, num_keys):
    """b_* given in ASCENDING order here; the call flips them to the
    kernel's descending storage and the expectation matches the ascending
    fold reference."""
    got = ps.merge_sorted_runs_fold_bitonic(
        [*(jnp.asarray(c) for c in a_keys_cols), jnp.asarray(a_counts)],
        [*(jnp.asarray(c[::-1].copy()) for c in b_keys_cols),
         jnp.asarray(b_counts[::-1].copy())],
        num_keys,
        tile=TILE,
        interpret=True,
    )
    merged_cols = [
        np.concatenate([a, b]) for a, b in zip(a_keys_cols, b_keys_cols)
    ]
    order = np.lexsort(tuple(reversed(merged_cols)))
    want_keys = [c[order] for c in merged_cols]
    for i in range(num_keys):
        assert np.array_equal(np.asarray(got[i]), want_keys[i]), f"lane {i}"
    want_counts = _ref_fold_ends(
        want_keys, np.concatenate([a_counts, b_counts])[order]
    )
    assert np.array_equal(np.asarray(got[num_keys]), want_counts)


def test_bitonic_fold_heavy_dups(rng):
    na, nb = TILE, 3 * TILE
    a = np.sort(rng.integers(0, 48, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 48, nb, np.uint64).astype(np.uint32))
    ac = rng.integers(1, 5, na).astype(np.uint32)
    bc = np.ones(nb, np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_random_wide(rng):
    na, nb = 3 * TILE, TILE
    a = np.sort(rng.integers(0, 2**32, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 2**32, nb, np.uint64).astype(np.uint32))
    ac = rng.integers(1, 9, na).astype(np.uint32)
    bc = rng.integers(1, 9, nb).astype(np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_two_key_lanes_with_sentinels(rng):
    # the consolidate3 shape: 2-lane keys, A carries a sentinel tail
    # (count-0 prefix holes), B carries dead all-zero-key rows (count-0)
    # that surface at the FRONT of the merged stream.
    na, nb = 2 * TILE, 2 * TILE
    a0 = np.sort(rng.integers(1, 16, na, np.uint64).astype(np.uint32))
    a1 = rng.integers(0, 4, na, np.uint64).astype(np.uint32)
    order = np.lexsort((a1, a0))
    a0, a1 = a0[order], a1[order]
    a0[-TILE // 2:] = 0xFFFFFFFF
    a1[-TILE // 2:] = 0xFFFFFFFF
    ac = np.where(a0 != 0xFFFFFFFF, 2, 0).astype(np.uint32)
    b0 = np.sort(rng.integers(1, 16, nb, np.uint64).astype(np.uint32))
    b1 = rng.integers(0, 4, nb, np.uint64).astype(np.uint32)
    order = np.lexsort((b1, b0))
    b0, b1 = b0[order], b1[order]
    # dead raw rows: all-zero keys at the ascending FRONT, count 0
    b0[: TILE // 3] = 0
    b1[: TILE // 3] = 0
    bc = np.ones(nb, np.uint32)
    bc[: TILE // 3] = 0
    _check_fold_bitonic([a0, a1], ac, [b0, b1], bc, 2)


def test_bitonic_fold_dead_rows_collide_with_azero_key(rng):
    # genuine A^k (all-zero key, count 1) records adjacent to dead
    # all-zero-key count-0 rows: the run total must equal the genuine
    # multiplicity only.
    na = nb = TILE
    a = np.sort(rng.integers(0, 8, na, np.uint64).astype(np.uint32))
    ac = np.ones(na, np.uint32)
    b = np.sort(rng.integers(0, 8, nb, np.uint64).astype(np.uint32))
    b[: TILE // 4] = 0  # some genuine zeros may also exist
    bc = np.ones(nb, np.uint32)
    bc[: TILE // 8] = 0  # first half of the zero block is dead
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_single_run_spans_all_tiles(rng):
    na = nb = 2 * TILE
    a = np.full(na, 7, np.uint32)
    b = np.full(nb, 7, np.uint32)
    ac = np.ones(na, np.uint32)
    bc = rng.integers(1, 3, nb).astype(np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_run_ends_exactly_at_tile_boundary(rng):
    na = nb = TILE
    a = np.concatenate(
        [np.full(TILE // 2, 5, np.uint32), np.full(TILE // 2, 9, np.uint32)]
    )
    b = np.concatenate(
        [np.full(TILE // 2, 5, np.uint32), np.full(TILE // 2, 9, np.uint32)]
    )
    ac = np.ones(na, np.uint32)
    bc = np.ones(nb, np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_count_wraparound(rng):
    na = nb = TILE
    a = np.full(na, 3, np.uint32)
    b = np.full(nb, 3, np.uint32)
    ac = np.full(na, 0x80000000, np.uint32)
    bc = np.full(nb, 0x80000001, np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_five_operands(rng):
    # k=55..128 records: 4 key lanes + count — the width whose odd-even
    # variant needed a halved tile; the bitonic kernel keeps full tiles.
    na, nb = TILE, 3 * TILE
    a_keys = np.sort(rng.integers(0, 2**12, na, np.uint64).astype(np.uint32))
    b_keys = np.sort(rng.integers(0, 2**12, nb, np.uint64).astype(np.uint32))
    ac = rng.integers(1, 4, na).astype(np.uint32)
    bc = np.ones(nb, np.uint32)
    _check_fold_bitonic([a_keys] * 4, ac, [b_keys] * 4, bc, 4)


def test_bitonic_fold_extreme_splits(rng):
    # windows that consume only-A or only-B for whole tiles (all of A
    # strictly below all of B and vice versa).
    na = nb = TILE
    lo = np.sort(rng.integers(0, 2**16, na, np.uint64).astype(np.uint32))
    hi = np.sort(
        (rng.integers(2**30, 2**31, nb, np.uint64)).astype(np.uint32)
    )
    c = np.ones(na, np.uint32)
    _check_fold_bitonic([lo], c, [hi], c.copy(), 1)
    _check_fold_bitonic([hi], c, [lo], c.copy(), 1)


# ---- serial fallbacks of the double-buffered kernels -----------------------
# The production default pipelines DMAs (compact: two staging sets by tile
# parity; bitonic merge: next-tile window prefetch).  The env flags keep the
# round-3 serialized forms as fallbacks — cover both so neither path rots.
# (The flags are read at call time; these tests call the kernels directly,
# not through a cached jit.)


def test_compact_live_serial_fallback(rng, monkeypatch):
    monkeypatch.setenv("KMER_TPU_COMPACT_PIPE", "0")
    n = 3 * TILE
    keys = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
    pay = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
    live = (rng.random(n) < 0.4).astype(np.uint32)
    got = ps.compact_live(
        [jnp.asarray(keys), jnp.asarray(pay)],
        jnp.asarray(live),
        num_keys=1,
        tile=TILE,
        interpret=True,
    )
    nl = int(live.sum())
    assert np.array_equal(np.asarray(got[0])[:nl], keys[live != 0])
    assert np.array_equal(np.asarray(got[1])[:nl], pay[live != 0])
    assert np.all(np.asarray(got[0])[nl:] == 0xFFFFFFFF)


def test_bitonic_fold_serial_fallback(rng, monkeypatch):
    monkeypatch.setenv("KMER_TPU_MERGE_PREFETCH", "0")
    na, nb = 2 * TILE, 2 * TILE
    a = np.sort(rng.integers(0, 2**32, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 2**32, nb, np.uint64).astype(np.uint32))
    ac = rng.integers(1, 9, na).astype(np.uint32)
    bc = rng.integers(1, 9, nb).astype(np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_bitonic_fold_single_tile_prefetch(rng):
    # n_tiles == 1 in the pipelined kernel: tile 0 primes, waits, never
    # prefetches (t+1 == n_tiles) — the degenerate-grid edge.
    na = nb = TILE // 2
    a = np.sort(rng.integers(0, 2**16, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 2**16, nb, np.uint64).astype(np.uint32))
    ac = np.ones(na, np.uint32)
    bc = np.ones(nb, np.uint32)
    _check_fold_bitonic([a], ac, [b], bc, 1)


def test_fused_compact_matches_unfused_pipeline(rng):
    # merge_fold_compact_bitonic == merge_sorted_runs_fold_bitonic +
    # compact_live, including sentinel prefix holes and dead raw rows.
    na, nb = 2 * TILE, 2 * TILE
    a0 = np.sort(rng.integers(1, 64, na, np.uint64).astype(np.uint32))
    a1 = rng.integers(0, 4, na, np.uint64).astype(np.uint32)
    o = np.lexsort((a1, a0)); a0, a1 = a0[o], a1[o]
    a0[-TILE // 2:] = 0xFFFFFFFF
    a1[-TILE // 2:] = 0xFFFFFFFF
    ac = np.where(a0 != 0xFFFFFFFF, 2, 0).astype(np.uint32)
    b0 = np.sort(rng.integers(1, 64, nb, np.uint64).astype(np.uint32))
    b1 = rng.integers(0, 4, nb, np.uint64).astype(np.uint32)
    o = np.lexsort((b1, b0)); b0, b1 = b0[o], b1[o]
    b0[: TILE // 3] = 0
    b1[: TILE // 3] = 0
    bc = np.ones(nb, np.uint32)
    bc[: TILE // 3] = 0

    A = [jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(ac)]
    B = [jnp.asarray(b0[::-1].copy()), jnp.asarray(b1[::-1].copy()),
         jnp.asarray(bc[::-1].copy())]

    m = ps.merge_sorted_runs_fold_bitonic(A, B, 2, tile=TILE, interpret=True)
    ref = ps.compact_live(list(m), m[2], num_keys=2, tile=TILE, interpret=True)
    ref_live = int(np.sum(np.asarray(m[2]) != 0))

    got, live = ps.merge_fold_compact_bitonic(A, B, 2, tile=TILE, interpret=True)
    assert int(live) == ref_live
    for i in range(3):
        assert np.array_equal(np.asarray(got[i]), np.asarray(ref[i])), f"op{i}"


def test_fused_compact_serial_fallbacks(rng, monkeypatch):
    # the fused kernel with both double-buffer systems disabled
    monkeypatch.setenv("KMER_TPU_MERGE_PREFETCH", "0")
    na = nb = TILE
    a = np.sort(rng.integers(0, 2**20, na, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 2**20, nb, np.uint64).astype(np.uint32))
    ac = rng.integers(1, 5, na).astype(np.uint32)
    bc = rng.integers(1, 5, nb).astype(np.uint32)
    A = [jnp.asarray(a), jnp.asarray(ac)]
    B = [jnp.asarray(b[::-1].copy()), jnp.asarray(bc[::-1].copy())]
    m = ps.merge_sorted_runs_fold_bitonic(A, B, 1, tile=TILE, interpret=True)
    ref = ps.compact_live(list(m), m[1], num_keys=1, tile=TILE, interpret=True)
    got, live = ps.merge_fold_compact_bitonic(A, B, 1, tile=TILE, interpret=True)
    assert int(live) == int(np.sum(np.asarray(m[1]) != 0))
    for i in range(2):
        assert np.array_equal(np.asarray(got[i]), np.asarray(ref[i])), f"op{i}"


def test_fused_compact_all_live_bypass(rng):
    """All-distinct keys: every tile is fully live, so the fused kernel
    takes the all-live bypass (no compact network) in every tile — the
    output must equal the unfused merge verbatim (round-5 hc
    optimization, docs/probe_hc_stages.py)."""
    na, nb = 2 * TILE, 2 * TILE
    # Interleave evens/odds: all keys distinct across A and B.
    a = np.sort((2 * rng.permutation(np.arange(na, dtype=np.uint64)))).astype(np.uint32)
    b = np.sort((2 * np.arange(nb, dtype=np.uint64) + 1)).astype(np.uint32)
    ac = rng.integers(1, 9, na).astype(np.uint32)
    bc = np.ones(nb, np.uint32)
    A = [jnp.asarray(a), jnp.asarray(ac)]
    B = [jnp.asarray(b[::-1].copy()), jnp.asarray(bc[::-1].copy())]
    m = ps.merge_sorted_runs_fold_bitonic(A, B, 1, tile=TILE, interpret=True)
    got, live = ps.merge_fold_compact_bitonic(A, B, 1, tile=TILE, interpret=True)
    assert int(live) == na + nb  # nothing folded, nothing dead
    for i in range(2):
        assert np.array_equal(
            np.asarray(got[i])[: na + nb], np.asarray(m[i])
        ), f"op{i}"


def test_fused_compact_mixed_live_tiles(rng):
    """Some tiles fully live, some with dead rows: the carried output
    offset must stay exact across bypass/network branch switches."""
    na, nb = 4 * TILE, 4 * TILE
    # A: all-distinct low half (all-live tiles), duplicated high half
    # (dup folds => dead rows => network path).
    a = np.concatenate([
        np.arange(2 * TILE, dtype=np.uint64) * 2,
        5_000_000 + np.repeat(np.arange(TILE, dtype=np.uint64) * 2, 2),
    ]).astype(np.uint32)
    b = np.concatenate([
        np.arange(2 * TILE, dtype=np.uint64) * 2 + 1,
        5_000_000 + np.arange(2 * TILE, dtype=np.uint64) * 2 + 1,
    ]).astype(np.uint32)
    ac = np.ones(na, np.uint32)
    bc = np.ones(nb, np.uint32)
    A = [jnp.asarray(a), jnp.asarray(ac)]
    B = [jnp.asarray(b[::-1].copy()), jnp.asarray(bc[::-1].copy())]
    m = ps.merge_sorted_runs_fold_bitonic(A, B, 1, tile=TILE, interpret=True)
    ref = ps.compact_live(list(m), m[1], num_keys=1, tile=TILE, interpret=True)
    got, live = ps.merge_fold_compact_bitonic(A, B, 1, tile=TILE, interpret=True)
    assert int(live) == int(np.sum(np.asarray(m[1]) != 0))
    for i in range(2):
        assert np.array_equal(np.asarray(got[i]), np.asarray(ref[i])), f"op{i}"
