"""kmer_counter_tpu — a TPU-native k-mer counting engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA k-mer counter (jsdjayanga/kmer-counter): FASTQ reads are streamed
data-parallel, 2-bit packed on device, and (optionally canonical) k-mers are
extracted and counted via sorted-segment reduction, with per-chip partial
count tables range-partitioned by k-mer prefix and merged with all-to-all
collectives over a ``jax.sharding.Mesh`` — subsuming the reference's
external-memory disk-merge pipeline (KMerFileMerger/SortedKMerFile) in HBM.

Component map (reference file → this package; see SURVEY.md §2):

  main.cpp (CLI)                     → kmer_counter_tpu.__main__ / cli.py
  Options.{h,cpp}                    → kmer_counter_tpu.config
  KMerCounter.{h,cpp} (orchestrator) → kmer_counter_tpu.engine
  InputFileHandler / FASTQFileReader
    / FASTQData                      → kmer_counter_tpu.io.fastq (+ native/)
  GPUHandler.cu bitEncode            → kmer_counter_tpu.ops.encode
  GPUHandler.cu extractKMers         → kmer_counter_tpu.ops.extract
  GPUHandler.cu sortKmers+reduceKMers→ kmer_counter_tpu.ops.sortcount
  KMerSizes.h (record structs)       → kmer_counter_tpu.records
  KMerFileMergeHandler / KMerFileMerger
    / SortedKMerFile (disk merge)    → kmer_counter_tpu.parallel.shuffle (HBM)
                                       + kmer_counter_tpu.io.spill (host path)
  FileDump                           → kmer_counter_tpu.io.dump
  KMerPrinter                        → kmer_counter_tpu.io.printer
"""

from kmer_counter_tpu.config import Options
from kmer_counter_tpu import records

__version__ = "0.1.0"

__all__ = ["Options", "records", "__version__"]
