"""Synthetic genome / FASTQ generation for tests, benchmarks and fixtures.

The reference ships no test data at all (SURVEY.md §4); every fixture in
this framework is generated: a random reference genome, reads sampled from
it at a chosen coverage (so k-mer multiplicity is realistic), optional
invalid-base noise, and standard 4-line FASTQ serialization.
"""

from __future__ import annotations

import os

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(rng: np.random.Generator, length: int) -> np.ndarray:
    """Random uint8 ASCII genome of the given length."""
    return rng.choice(_BASES, size=length)


def sample_reads(
    rng: np.random.Generator,
    genome: np.ndarray,
    n_reads: int,
    read_length: int,
    invalid_frac: float = 0.0,
) -> np.ndarray:
    """[n_reads, read_length] uint8 reads sampled uniformly from a genome,
    with an optional fraction of bases replaced by 'N'."""
    if len(genome) < read_length:
        raise ValueError("genome shorter than read length")
    starts = rng.integers(0, len(genome) - read_length + 1, size=n_reads)
    reads = genome[starts[:, None] + np.arange(read_length)[None, :]].copy()
    if invalid_frac > 0:
        mask = rng.random(reads.shape) < invalid_frac
        reads[mask] = ord("N")
    return reads


def write_fastq_file(path: str, reads: np.ndarray, qual_char: str = "I") -> int:
    """Serialize a dense read matrix as 4-line FASTQ; returns reads written."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w") as fh:
        for i, row in enumerate(np.asarray(reads, dtype=np.uint8)):
            seq = bytes(row).decode("ascii").rstrip("\x00")
            fh.write(f"@r{i}\n{seq}\n+\n{qual_char * len(seq)}\n")
    return len(reads)


def make_fastq_dir(
    dirpath: str,
    rng: np.random.Generator,
    n_reads: int,
    read_length: int,
    n_files: int = 1,
    genome_len: int = 100_000,
    invalid_frac: float = 0.0,
) -> int:
    """Directory of FASTQ files sampled from one shared genome."""
    genome = random_genome(rng, genome_len)
    per_file = n_reads // n_files
    total = 0
    for f in range(n_files):
        reads = sample_reads(rng, genome, per_file, read_length, invalid_frac)
        total += write_fastq_file(
            os.path.join(dirpath, f"reads_{f:02d}.fastq"), reads
        )
    return total
