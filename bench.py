"""Benchmark: k-mers counted per second per chip (BASELINE.json north star).

Measures the steady-state per-chunk loop on the default device (the real
TPU chip under the driver): encode → extract → canonical → sort-count →
table append, exactly the engine's hot path, on synthetic 100-base reads at
k=31 canonical (BASELINE.json config 2).

Prints ONE JSON line:
  {"metric": "kmers_per_sec_per_chip_k31", "value": ..., "unit": "kmers/s",
   "vs_baseline": ...}

``vs_baseline`` is measured, not copied: the reference publishes no numbers
(BASELINE.md) and its CUDA binary cannot run here, so the baseline proxy is
the same workload executed by the best host-side implementation of the
reference's *active* aggregation design (NumPy vectorized extract + sort —
generous to the reference, whose actual path is a single-thread -O0 hash
insert loop).  vs_baseline = device_throughput / host_proxy_throughput.

Env knobs: BENCH_READS (default 65536), BENCH_ITERS (8), BENCH_K (31),
BENCH_CANONICAL (1), BENCH_LINE_LEN (100), BENCH_GENOME (1000000),
JAX_COMPILATION_CACHE_DIR (default /tmp/jax_compile_cache — remote
compiles through this environment's tunnel take minutes; the persistent
cache makes reruns start in seconds).
"""

import json
import os
import sys
import time

import numpy as np


def host_proxy_throughput(reads, k, canonical):
    """Reference-semantics counter in vectorized NumPy (sort-count)."""
    from kmer_counter_tpu import records

    t0 = time.perf_counter()
    codes, _ = records.encode_bases(reads)
    R, L = codes.shape
    P = L - k + 1
    idx = np.arange(P)[:, None] + np.arange(k)[None, :]
    windows = codes[:, idx]  # [R, P, k]
    words = records.pack_codes(windows.reshape(R * P, k), k)
    if canonical:
        words = records.canonical_words(words, k)
    # sort + adjacent reduce (the dormant reference design, on host)
    order = np.lexsort(tuple(words[:, w] for w in reversed(range(words.shape[1]))))
    swords = words[order]
    boundary = np.concatenate(
        [[True], (swords[1:] != swords[:-1]).any(axis=1)]
    )
    np.add.reduceat(np.ones(len(swords), np.uint32), np.flatnonzero(boundary))
    dt = time.perf_counter() - t0
    return (R * P) / dt


def main():
    n_reads = int(os.environ.get("BENCH_READS", 65536))
    iters = int(os.environ.get("BENCH_ITERS", 8))
    k = int(os.environ.get("BENCH_K", 31))
    canonical = os.environ.get("BENCH_CANONICAL", "1") == "1"
    L = int(os.environ.get("BENCH_LINE_LEN", 100))

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache"),
        )
    except Exception:
        pass  # cache is an optimization only
    import jax.numpy as jnp

    from kmer_counter_tpu.ops import table as table_ops
    from kmer_counter_tpu.records import active_lanes

    rng = np.random.default_rng(0)
    # Genome-like workload: reads sampled from a fixed reference sequence so
    # k-mer multiplicity matches real coverage (~reads*L/genome_len x),
    # exercising consolidation exactly as the engine does.
    genome_len = int(os.environ.get("BENCH_GENOME", 1_000_000))
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=genome_len)
    starts = rng.integers(0, genome_len - L, size=n_reads)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    P = L - k + 1
    kmers_per_chunk = n_reads * P
    capacity = 4 * kmers_per_chunk
    device = jax.devices()[0]
    print(
        f"[bench] device={device} reads={n_reads} L={L} k={k} "
        f"canonical={canonical} kmers/chunk={kmers_per_chunk} "
        f"table={capacity} slots",
        file=sys.stderr,
    )

    dev_reads = jax.device_put(jnp.asarray(reads), device)
    n_scalar = jnp.int32(kmers_per_chunk)

    from kmer_counter_tpu.ops import extract_chunk

    state = {"bound": 0, "consolidations": 0}
    mode = os.environ.get("BENCH_TABLE", "two")

    if mode == "two":
        # Two-level table + Pallas-merge consolidation (ops.table2
        # consolidate3): keys-only raw appends, one merge-path pass +
        # stream compaction per consolidation.
        from kmer_counter_tpu.ops import table2 as t2
        from kmer_counter_tpu.ops.pipeline import extract_chunk_keys

        cp = kmers_per_chunk  # prefix: all distinct keys must fit
        cr = capacity - cp
        table = jax.device_put(t2.make_table2(cp, cr, active_lanes(k)), device)

        def drain(table):
            return int(jax.device_get(table.raw_off))

        def step(table):
            if state["bound"] + kmers_per_chunk > cr:
                table, live, lost = t2.consolidate3(table)
                state["bound"] = 0
                state["consolidations"] += 1
            lanes, allt = extract_chunk_keys(dev_reads, k, canonical)
            table = t2.append_raw_at(table, lanes, allt, state["bound"])
            state["bound"] += kmers_per_chunk
            return table

    else:
        table = jax.device_put(
            table_ops.make_table(capacity, active_lanes(k)), device
        )

        def drain(table):
            # Force full completion: fetch a scalar that depends on the
            # whole chain.  (block_until_ready alone can return early
            # through the remote-tunnel backend.)
            return int(jax.device_get(table.offset))

        def step(table):
            # consolidate when the next raw append would overflow, then
            # extract + append (no per-chunk sort).
            if state["bound"] + kmers_per_chunk > capacity:
                table = table_ops.consolidate(table)
                state["bound"] = drain(table)
                state["consolidations"] += 1
            lanes, counts = extract_chunk(dev_reads, k, canonical)
            table = table_ops.append(table, lanes, counts, n_scalar)
            state["bound"] += kmers_per_chunk
            return table

    # Warmup / compile (extract, append, consolidate all compiled here).
    t0 = time.perf_counter()
    for _ in range(4):
        table = step(table)
    drain(table)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            table = step(table)
        drain(table)
        best = min(best, time.perf_counter() - t0)
    dt = best
    device_tput = iters * kmers_per_chunk / dt
    print(f"[bench] consolidations={state['consolidations']}", file=sys.stderr)
    print(
        f"[bench] compile={compile_s:.1f}s steady={dt/iters*1e3:.1f}ms/chunk "
        f"-> {device_tput/1e6:.1f}M kmers/s",
        file=sys.stderr,
    )

    proxy_reads = reads[:1024]  # fixed size: keeps vs_baseline comparable
    # best-of-3: the first NumPy pass can be 10-70x slow on a cold
    # allocator/cache (observed in the round-1 driver run), which would
    # inflate vs_baseline meaninglessly.
    proxy_tput = max(
        host_proxy_throughput(proxy_reads, k, canonical) for _ in range(3)
    )
    print(f"[bench] host proxy {proxy_tput/1e6:.2f}M kmers/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"kmers_per_sec_per_chip_k{k}",
                "value": round(device_tput, 1),
                "unit": "kmers/s",
                "vs_baseline": round(device_tput / proxy_tput, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
