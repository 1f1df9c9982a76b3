"""Tests for the golden-model counter itself (the oracle must be right)."""

import numpy as np

from kmer_counter_tpu import golden, records


def brute_force(reads, k, canonical=False):
    """An even dumber counter: pure string ops."""
    from collections import Counter

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    counts = Counter()
    for read in reads:
        read = read.upper()
        for i in range(len(read) - k + 1):
            window = read[i : i + k]
            if any(c not in "ACGT" for c in window):
                continue
            if canonical:
                rc = "".join(comp[c] for c in reversed(window))
                window = min(window, rc)
            counts[window] += 1
    return counts


def as_strings(counter, k):
    return {
        records.kmer_to_string(np.array(key, dtype=np.uint64), k): v
        for key, v in counter.items()
    }


def test_golden_simple():
    counts = golden.count_reads(["ACGTACGT"], k=4)
    s = as_strings(counts, 4)
    assert s == {"ACGT": 2, "CGTA": 1, "GTAC": 1, "TACG": 1}


def test_golden_invalid_bases():
    counts = golden.count_reads(["ACGNACGT"], k=4)
    s = as_strings(counts, 4)
    # Windows covering the N are skipped (GPUHandler.cu:169-172 semantics).
    assert s == {"ACGT": 1}


def test_golden_short_read_skipped():
    assert golden.count_reads(["ACG"], k=4) == {}


def test_golden_vs_brute_force(rng):
    for k in (3, 15, 31, 33):
        for canonical in (False, True):
            reads = [
                "".join(rng.choice(list("ACGTN"), size=60, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
                for _ in range(20)
            ]
            got = as_strings(golden.count_reads(reads, k, canonical), k)
            want = dict(brute_force(reads, k, canonical))
            assert got == want


def test_golden_uint8_matrix_input(make_reads):
    reads = make_reads(10, 50, invalid_frac=0.05)
    from_matrix = golden.count_reads(reads, k=15)
    from_strings = golden.count_reads(
        [bytes(row).decode("ascii") for row in reads], k=15
    )
    assert from_matrix == from_strings


def test_table_sorted_and_serializable(rng):
    reads = ["".join(rng.choice(list("ACGT"), size=40)) for _ in range(10)]
    counter = golden.count_reads(reads, k=31)
    words, counts = golden.table_from_counter(counter)
    assert len(words) == len(counter)
    # sorted ascending by words
    keys = list(map(tuple, words.tolist()))
    assert keys == sorted(keys)
    data = golden.serialize_counter(counter)
    w2, c2 = records.parse_records(data, 31)
    np.testing.assert_array_equal(w2, words)
    np.testing.assert_array_equal(c2, counts)
    assert int(counts.sum()) == sum(counter.values())
