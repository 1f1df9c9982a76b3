"""Benchmark: k-mers counted per second per chip (BASELINE.json north star).

Measures the steady-state per-chunk loop on the default device (the real
TPU chip under the driver): encode → extract → canonical → sort-count →
table append, exactly the engine's hot path, on synthetic 100-base reads at
k=31 canonical (BASELINE.json config 2).

Prints ONE JSON line:
  {"metric": "kmers_per_sec_per_chip_k31", "value": ..., "unit": "kmers/s",
   "vs_baseline": ...}

Timeout-proofing (round 2 was lost to a driver timeout during remote XLA
compiles, BENCH_r02.json rc=124): the run banks a result as soon as the
cheap one-level-table phase finishes (its executables are compile-cached
from earlier rounds), then upgrades to the two-level Pallas-consolidation
number if the budget allows.  A watchdog thread prints the best banked
JSON line and exits 0 at BENCH_DEADLINE_S (default 560s) so a slow remote
compile can never swallow the whole run again; the one-level phase also
banks a coarse warmup-based floor the moment its first drain completes
(the remote service's first-dispatch stall was observed to eat 500+s).

``vs_baseline`` is measured, not copied: the reference publishes no numbers
(BASELINE.md) and its CUDA binary cannot run here, so the baseline proxy is
the same workload executed by the best host-side implementation of the
reference's *active* aggregation design (NumPy vectorized extract + sort —
generous to the reference, whose actual path is a single-thread -O0 hash
insert loop).  vs_baseline = device_throughput / host_proxy_throughput.

Env knobs: BENCH_READS (default 65536), BENCH_ITERS (8), BENCH_K (31),
BENCH_CANONICAL (1), BENCH_LINE_LEN (100), BENCH_GENOME (1000000),
BENCH_PHASES ("one,three"; "two" = the unfused two-level phase,
off by default — its XLA fold pass never finishes compiling through this
sandbox's remote tunnel), BENCH_DEADLINE_S (560),
JAX_COMPILATION_CACHE_DIR (default /tmp/jax_compile_cache — remote
compiles through this environment's tunnel take minutes; the persistent
cache makes reruns start in seconds).
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_BANK = {"json": None}
_T0 = time.perf_counter()


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:5.1f}s] {msg}", file=sys.stderr)
    sys.stderr.flush()


def _bank(metric, value, vs_baseline):
    _BANK["json"] = json.dumps(
        {
            "metric": metric,
            "value": round(value, 1),
            "unit": "kmers/s",
            "vs_baseline": round(vs_baseline, 2),
        }
    )
    _log(f"banked: {_BANK['json']}")


def _emit_and_exit(rc):
    if _BANK["json"] is not None:
        print(_BANK["json"], flush=True)
    os._exit(rc)


def _arm_watchdog(deadline_s):
    """Print the best banked result and exit before the driver's timeout.

    A daemon *thread* (not a signal handler): Python signal handlers only
    run between bytecodes on the main thread, which can be blocked for
    minutes inside one remote XLA compile — exactly the failure mode that
    produced BENCH_r02.json's rc=124 with no output."""

    def fire():
        time.sleep(deadline_s)
        _log(f"watchdog fired at {deadline_s}s — emitting best banked result")
        _emit_and_exit(0)

    threading.Thread(target=fire, daemon=True).start()
    # Best-effort TERM handler for the measurement loops (no-op while the
    # main thread is inside a C++ compile, hence the thread above).
    try:
        signal.signal(signal.SIGTERM, lambda *_a: _emit_and_exit(0))
    except Exception:
        pass


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


def _measure(step, drain, table, iters, label, on_warmup=None):
    """Warm up (compiles), then best-of-3 timed reps of ``iters`` chunks.

    ``on_warmup(n_chunks, seconds)`` fires after the warmup drain: with a
    warm cache the warmup is real steady-state work, so callers can bank
    a coarse floor immediately — insurance against the remote service's
    first-dispatch stalls eating the budget before the refined reps."""
    t0 = time.perf_counter()
    for _ in range(4):
        table = step(table)
    drain(table)
    dt_warm = time.perf_counter() - t0
    _log(f"{label}: compile+warmup {dt_warm:.1f}s")
    if on_warmup is not None:
        on_warmup(4, dt_warm)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            table = step(table)
        drain(table)
        best = min(best, time.perf_counter() - t0)
    return best, table


def main():
    n_reads = int(os.environ.get("BENCH_READS", 65536))
    iters = int(os.environ.get("BENCH_ITERS", 8))
    k = int(os.environ.get("BENCH_K", 31))
    canonical = os.environ.get("BENCH_CANONICAL", "1") == "1"
    L = int(os.environ.get("BENCH_LINE_LEN", 100))
    phases = os.environ.get("BENCH_PHASES", "one,three").split(",")
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 560))
    metric = f"kmers_per_sec_per_chip_k{k}"

    _arm_watchdog(deadline_s)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # Honor an explicit platform override (the CPU smoke test): the
        # ambient sitecustomize force-selects the remote TPU backend via
        # jax.config at import time, so the env var alone is not enough.
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
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

    cap_mult = int(os.environ.get("BENCH_CAP_MULT", 8))
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
    _log(
        f"device={device} reads={n_reads} L={L} k={k} "
        f"canonical={canonical} kmers/chunk={kmers_per_chunk} "
        f"table={capacity} slots"
    )

    # The remote service stalls a process's FIRST dispatch for minutes when
    # degraded (observed 130-520s, round 3).  Absorb it on a background
    # thread while the host proxy runs; phases join it before timing.
    def _first_dispatch():
        t0 = time.perf_counter()
        float(jnp.ones((8, 128), jnp.float32).sum())
        _log(f"first device dispatch took {time.perf_counter() - t0:.1f}s")

    warm_thread = threading.Thread(target=_first_dispatch, daemon=True)
    warm_thread.start()

    # Host proxy (pure NumPy, ~20s): every banked result gets a real
    # vs_baseline.  best-of-3: the first NumPy pass can be 10-70x slow on a
    # cold allocator/cache (observed in the round-1 driver run).
    proxy_reads = reads[:1024]  # fixed size: keeps vs_baseline comparable
    proxy_tput = max(
        host_proxy_throughput(proxy_reads, k, canonical) for _ in range(3)
    )
    _log(f"host proxy {proxy_tput / 1e6:.2f}M kmers/s")
    warm_thread.join()

    dev_reads = jax.device_put(jnp.asarray(reads), device)
    n_scalar = jnp.int32(kmers_per_chunk)

    from kmer_counter_tpu.ops import extract_chunk

    best_tput = 0.0

    if "one" in phases:
        # Phase 1 — one-level table (ops.table): executables are
        # compile-cached from round 1; banks a result fast.
        try:
            table = jax.device_put(
                table_ops.make_table(capacity, active_lanes(k)), device
            )
            state = {"bound": 0, "consolidations": 0}

            def drain1(table):
                # Force full completion: fetch a scalar that depends on the
                # whole chain.  (block_until_ready alone can return early
                # through the remote-tunnel backend.)
                return int(jax.device_get(table.offset))

            def step1(table):
                if state["bound"] + kmers_per_chunk > capacity:
                    table = table_ops.consolidate(table)
                    state["bound"] = drain1(table)
                    state["consolidations"] += 1
                lanes, counts = extract_chunk(dev_reads, k, canonical)
                table = table_ops.append(table, lanes, counts, n_scalar)
                state["bound"] += kmers_per_chunk
                return table

            def warm_bank1(n, dt_w):
                coarse = n * kmers_per_chunk / dt_w
                if _BANK["json"] is None:
                    _bank(metric, coarse, coarse / proxy_tput)

            dt, table = _measure(
                step1, drain1, table, iters, "one-level", on_warmup=warm_bank1
            )
            del table
            tput = iters * kmers_per_chunk / dt
            _log(
                f"one-level: {dt / iters * 1e3:.1f}ms/chunk -> "
                f"{tput / 1e6:.1f}M kmers/s "
                f"({state['consolidations']} consolidations)"
            )
            if tput > best_tput:
                best_tput = tput
                _bank(metric, tput, tput / proxy_tput)
        except Exception as e:  # never let phase 1 kill the run
            _log(f"one-level phase failed: {e!r}")

    def run_two_level_phase(label, fold_fused):
        # Two-level table + Pallas-merge consolidation (ops.table2
        # consolidate3, split-stage programs): keys-only raw appends, one
        # merge-path pass + stream compaction per consolidation.
        nonlocal best_tput
        try:
            from kmer_counter_tpu.ops import table2 as t2
            from kmer_counter_tpu.ops.pipeline import count_step_two_level

            cp = kmers_per_chunk  # prefix: all distinct keys must fit
            # Raw region: cap_mult-1 chunks per consolidation (the merge +
            # compact amortize over more chunks; sort cost is per-element —
            # measured 125M at 4x vs 154M at 8x, probe5 round 3).
            cr = cap_mult * kmers_per_chunk - cp
            iters2 = cr // kmers_per_chunk  # one full cycle per timed rep
            table = jax.device_put(t2.make_table2(cp, cr, active_lanes(k)), device)
            state = {"bound": 0, "consolidations": 0}

            def drain2(table):
                # Depend on BOTH halves of the state: raw_off covers the
                # append steps, prefix_counts[0] covers the consolidation
                # chain (sort→merge→compact).  raw_off alone is a constant
                # after consolidate3 (raw_off=0), so fetching only it lets
                # consolidation work escape the timing window.
                return int(jax.device_get(table.raw_off)) + int(
                    jax.device_get(table.prefix_counts[0])
                )

            def step2(table):
                # The steady state compiles few, SMALL programs: the fused
                # extract+append step (device-resident raw offset — no
                # per-offset executable variants) and consolidate3's split
                # stages.  Round 2's monolithic five-program phase died in
                # remote compiles (BENCH_r02 rc=124).
                if state["bound"] + kmers_per_chunk > cr:
                    table, live, lost = t2.consolidate3(
                        table, fold_fused=fold_fused
                    )
                    state["bound"] = 0
                    state["consolidations"] += 1
                table = count_step_two_level(table, dev_reads, k, canonical)
                state["bound"] += kmers_per_chunk
                return table

            dt, table = _measure(step2, drain2, table, iters2, label)
            del table
            tput = iters2 * kmers_per_chunk / dt
            _log(
                f"{label}: {dt / iters2 * 1e3:.1f}ms/chunk -> "
                f"{tput / 1e6:.1f}M kmers/s "
                f"({state['consolidations']} consolidations)"
            )
            if tput > best_tput:
                best_tput = tput
                _bank(metric, tput, tput / proxy_tput)
        except Exception as e:
            _log(f"{label} phase failed: {e!r}")

    # Phase 2 — split-stage Pallas-merge consolidation; phase 3 upgrades
    # to the in-kernel count fold.  Each banks incrementally.
    if "two" in phases:
        run_two_level_phase("two-level", fold_fused=False)
    if "three" in phases:
        run_two_level_phase("two-level-fused", fold_fused=True)

    if _BANK["json"] is None:
        raise SystemExit("no phase produced a measurement")
    print(_BANK["json"], flush=True)


if __name__ == "__main__":
    main()
