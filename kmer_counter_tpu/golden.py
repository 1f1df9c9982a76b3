"""Golden-model k-mer counter — the test oracle.

A deliberately simple dict-based counter implementing the behavioral contract
of the reference pipeline (SURVEY.md §7.1): per read, every window of k
consecutive *valid* bases contributes one count; windows overlapping an
invalid base are skipped (GPUHandler.cu:79-87, 169-172); k-mers never cross
read boundaries (one CUDA thread per read, GPUHandler.cu:129-233).  With
``canonical=True`` the key is min(kmer, revcomp) — the correctness target of
BASELINE.json configs 2/5; ``canonical=False`` replicates the reference's
forward-strand-only semantics.

The device engine in ``ops``/``parallel`` must match this model exactly.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from kmer_counter_tpu import records


def count_reads(
    reads, k: int, canonical: bool = False
) -> "Counter[tuple[int, ...]]":
    """Count k-mers over an iterable of reads.

    ``reads`` may be an iterable of strings/bytes, or a 2-D uint8 ASCII
    array of shape [R, L].  Returns Counter mapping key-word tuples
    (ints, ``words_per_kmer(k)`` long) to counts.
    """
    counts: Counter[tuple[int, ...]] = Counter()
    for read in reads:
        if isinstance(read, str):
            arr = np.frombuffer(read.encode("ascii"), dtype=np.uint8)
        elif isinstance(read, (bytes, bytearray)):
            arr = np.frombuffer(bytes(read), dtype=np.uint8)
        else:
            arr = np.asarray(read, dtype=np.uint8)
        L = arr.shape[0]
        if L < k:
            continue
        codes, valid = records.encode_bases(arr)
        # All windows at once: windows [P, k] of codes; window valid iff all
        # its bases are valid.
        P = L - k + 1
        idx = np.arange(P)[:, None] + np.arange(k)[None, :]
        win_codes = codes[idx]
        win_valid = valid[idx].all(axis=1)
        if not win_valid.any():
            continue
        words = records.pack_codes(win_codes[win_valid], k)
        if canonical:
            words = records.canonical_words(words, k)
        for key in map(tuple, words.tolist()):
            counts[key] += 1
    return counts


def table_from_counter(counter) -> tuple[np.ndarray, np.ndarray]:
    """Counter → (sorted keys [U, W] uint64, counts [U] uint32).

    Sorted ascending by key words — the globally-sorted dump order the
    dormant reference merge pipeline was designed to produce
    (SURVEY.md §7.1, BASELINE.json:5).
    """
    if not counter:
        return np.zeros((0, 1), dtype=np.uint64), np.zeros(0, dtype=np.uint32)
    keys = sorted(counter.keys())
    words = np.array(keys, dtype=np.uint64)
    counts = np.array([counter[key] for key in keys], dtype=np.uint32)
    return words, counts


def serialize_counter(counter) -> bytes:
    """Counter → reference record bytes, globally sorted."""
    words, counts = table_from_counter(counter)
    return records.serialize_table(words, counts)
