"""MeshCountEngine end-to-end on the virtual 8-device CPU mesh."""

import numpy as np

from kmer_counter_tpu.config import Options
from kmer_counter_tpu.engine import MeshCountEngine
from kmer_counter_tpu.io.dump import load_table

from tests.test_engine import golden_dir_table
from tests.test_ingest import random_seqs, write_fastq


def run_mesh_engine(tmp_path, k, canonical=False, **kw):
    out = str(tmp_path / "output.bin")
    opts = Options(
        kmer_length=k,
        canonical=canonical,
        input_dir=str(tmp_path / "in"),
        output_file=out,
        mesh_shape=(8,),
        verbose=0,
        **kw,
    )
    stats = MeshCountEngine(opts).run()
    return load_table(out, k), stats


def test_mesh_engine_matches_golden(tmp_path, rng):
    (tmp_path / "in").mkdir()
    write_fastq(tmp_path / "in" / "a.fastq", random_seqs(rng, 100, 60))
    (words, counts), stats = run_mesh_engine(
        tmp_path, 31, canonical=True, reads_per_chunk=32
    )
    want_words, want_counts = golden_dir_table(tmp_path, 31, canonical=True)
    np.testing.assert_array_equal(words, want_words)
    np.testing.assert_array_equal(counts, want_counts)
    assert stats.reads == 100


def test_mesh_engine_multi_file_mixed_lengths(tmp_path, rng):
    (tmp_path / "in").mkdir()
    write_fastq(tmp_path / "in" / "a.fastq", random_seqs(rng, 30, 40))
    write_fastq(tmp_path / "in" / "b.fastq", random_seqs(rng, 20, 70))
    write_fastq(tmp_path / "in" / "c.fastq", random_seqs(rng, 5, 10))  # < k
    (words, counts), stats = run_mesh_engine(tmp_path, 15, reads_per_chunk=16)
    want_words, want_counts = golden_dir_table(tmp_path, 15)
    np.testing.assert_array_equal(words, want_words)
    np.testing.assert_array_equal(counts, want_counts)
    assert stats.reads == 55
