"""Orchestrator: chunked count loop over a FASTQ directory.

The TPU-native analog of KMerCounter (KMerCounter.cpp:108-191).  Where the
reference busy-waits on a pool of 8 CUDA streams and spawns a host thread
per chunk (KMerCounter.cpp:117-147), this engine exploits JAX's async
dispatch: a single host thread enqueues ``count_chunk`` + ``append`` steps
that the device executes while the ingest prefetch thread parses the next
chunks — the same overlap with no stream bookkeeping.

Chunk sizing follows GetChunkSize's role (KMerCounter.cpp:193-212): the
``gpuMemoryLimit`` budget bounds the HBM working set — the accumulation
table gets half, and the per-chunk sort region (whose worst case is
``reads × (L-k+1)`` slots, the calculateOutputSize analog,
GPUHandler.cu:235-245) sizes the read count.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import jax
import numpy as np

from kmer_counter_tpu import records
from kmer_counter_tpu.config import Options
from kmer_counter_tpu.io.dump import dump_table
from kmer_counter_tpu.io.fastq import DirectoryInput
from kmer_counter_tpu.ops import count_chunk
from kmer_counter_tpu.ops import table as table_ops

_SENTINEL = object()


@dataclass
class RunStats:
    """End-of-run summary (the observability the reference lacks, §5)."""

    reads: int = 0
    bases: int = 0
    chunks: int = 0
    consolidations: int = 0
    distinct_kmers: int = 0
    total_kmers: int = 0
    ingest_seconds: float = 0.0
    wall_seconds: float = 0.0
    per_file: dict = field(default_factory=dict)

    @property
    def kmers_per_second(self) -> float:
        return self.total_kmers / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def reads_per_second(self) -> float:
        return self.reads / self.wall_seconds if self.wall_seconds else 0.0


def plan_chunks(
    opts: Options, line_length: int
) -> tuple[int, int]:
    """(reads_per_chunk, table_slots) under the HBM budget.

    Budget model: a table slot is (NL+1) uint32s; consolidation sorts the
    whole table with NL+2 operands and roughly doubles that working set, so
    the table gets budget/2 / (slot_bytes * 3).  The chunk worst case is
    reads*(L-k+1) slots and must fit 4x inside the table so appends
    amortize between consolidations.
    """
    k = opts.kmer_length
    if line_length < k:
        raise ValueError(
            f"line length {line_length} < k={k}: no k-mers can be extracted"
        )
    NL = opts.lanes_per_kmer
    slot_bytes = (NL + 1) * 4
    table_slots = opts.table_slots or max(
        opts.memory_limit_bytes // 2 // (slot_bytes * 3), 1 << 14
    )
    P = line_length - k + 1
    reads_per_chunk = opts.reads_per_chunk or max(table_slots // 4 // P, 16)
    # Re-check: chunk must fit the free half of the table even right after
    # a worst-case consolidation.
    if reads_per_chunk * P > table_slots // 2:
        table_slots = 2 * reads_per_chunk * P
    return reads_per_chunk, table_slots


class CountEngine:
    """Single-process count engine (multi-host sharding in parallel/)."""

    def __init__(self, opts: Options, device=None):
        if opts.input_dir is None:
            raise ValueError("inputFileLocation is required")
        if opts.output_file is None:
            raise ValueError("outputFile is required")
        self.opts = opts
        self.device = device or jax.devices()[0]

    def _ingest_worker(self, source, reads_per_chunk, out_q, stats):
        """Prefetch thread: parse chunks ahead of the device (the analog of
        the reference's reader-ahead main loop, KMerCounter.cpp:123-143)."""
        try:
            while True:
                t0 = time.perf_counter()
                chunk = source.read_chunk(reads_per_chunk)
                stats.ingest_seconds += time.perf_counter() - t0
                if chunk is None:
                    break
                out_q.put(chunk)
        finally:
            out_q.put(_SENTINEL)

    def run(self) -> RunStats:
        opts = self.opts
        k = opts.kmer_length
        stats = RunStats()
        t_start = time.perf_counter()

        source = DirectoryInput(opts.input_dir)
        all_lengths = source.probe_line_lengths()
        usable = [L for L in all_lengths if L >= k]
        if not usable:
            # No file has reads long enough for a single k-mer.
            dump_table(opts.output_file, np.zeros((0, opts.lanes_per_kmer), np.uint32), np.zeros(0, np.uint32))
            stats.wall_seconds = time.perf_counter() - t_start
            return stats
        line_length = max(usable)
        reads_per_chunk, table_slots = plan_chunks(opts, line_length)
        NL = opts.lanes_per_kmer
        if opts.verbose:
            print(
                f"[engine] k={k} canonical={opts.canonical} L={line_length} "
                f"reads/chunk={reads_per_chunk} table_slots={table_slots} "
                f"device={self.device}"
            )

        table = jax.device_put(
            table_ops.make_table(table_slots, NL), self.device
        )
        chunk_q: "queue.Queue" = queue.Queue(maxsize=max(opts.prefetch_chunks, 1))
        ingest = threading.Thread(
            target=self._ingest_worker,
            args=(source, reads_per_chunk, chunk_q, stats),
            daemon=True,
        )
        ingest.start()

        host_bound = 0  # worst-case table offset (see ops.table docstring)
        cur_L = line_length
        cur_slots = reads_per_chunk * (cur_L - k + 1)
        while True:
            item = chunk_q.get()
            if item is _SENTINEL:
                break
            if item.line_length < k:
                # No k-mers can come from these reads; skip the chunk
                # (the golden model skips short reads too).
                stats.reads += item.n_reads
                stats.bases += item.n_reads * item.line_length
                continue
            if item.line_length != cur_L:
                # New file with a different read length: new static shapes.
                cur_L = item.line_length
                cur_slots = reads_per_chunk * (cur_L - k + 1)
            reads = item.reads
            if reads.shape[0] < reads_per_chunk:
                # Pad the final partial chunk to the static shape; zero rows
                # are masked invalid by the encoder.
                pad = np.zeros(
                    (reads_per_chunk - reads.shape[0], reads.shape[1]),
                    dtype=np.uint8,
                )
                reads = np.vstack([reads, pad])
            if host_bound + cur_slots > table_slots:
                table = table_ops.consolidate(table)
                host_bound = int(jax.device_get(table.offset))
                stats.consolidations += 1
                if host_bound + cur_slots > table_slots:
                    table = self._grow_for(table, host_bound + cur_slots)
                    table_slots = table.lanes.shape[0]
            dev_reads = jax.device_put(reads, self.device)
            lanes, counts, n_unique = count_chunk(dev_reads, k, opts.canonical)
            table = table_ops.append(table, lanes, counts, n_unique)
            host_bound += cur_slots
            stats.chunks += 1
            stats.reads += item.n_reads
            stats.bases += item.n_reads * item.line_length

        ingest.join()
        table = table_ops.consolidate(table)
        stats.consolidations += 1
        num_unique = int(jax.device_get(table.offset))
        lanes = np.asarray(jax.device_get(table.lanes[:num_unique]))
        counts = np.asarray(jax.device_get(table.counts[:num_unique]))
        stats.distinct_kmers = num_unique
        stats.total_kmers = int(counts.sum())
        dump_table(opts.output_file, lanes, counts)
        stats.wall_seconds = time.perf_counter() - t_start
        if opts.verbose:
            print(
                f"[engine] reads={stats.reads} bases={stats.bases} "
                f"distinct={stats.distinct_kmers} total={stats.total_kmers} "
                f"chunks={stats.chunks} consolidations={stats.consolidations} "
                f"wall={stats.wall_seconds:.2f}s "
                f"({stats.kmers_per_second/1e6:.2f}M kmers/s)"
            )
        return stats

    def _grow_for(self, table, needed_slots: int):
        """Double capacity until the next chunk fits (cardinality outgrew
        the initial budget — the reference would spill to disk here)."""
        cap = table.lanes.shape[0]
        while cap < needed_slots:
            cap *= 2
        if self.opts.verbose:
            print(f"[engine] growing table to {cap} slots")
        return table_ops.grow(table, cap)


def run_count(opts: Options) -> RunStats:
    return CountEngine(opts).run()
