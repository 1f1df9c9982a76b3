"""Probe: stable vs unstable lax.sort at the production shape (round 5).

Round 4's sort-variant probe concluded "comparator complexity and
stability are FREE" and every sort in the framework kept JAX's stable
default.  Re-measured this round on fresh random inputs (8 distinct
arrays per timing rep — chaining a sort's output back into itself lets
the sorted-input fast path contaminate the number):

    stable   (the old default): 117.9ms  (3.67 ns/row)
    unstable (is_stable=False):  80.5ms  (2.51 ns/row)   -32%

at 32.1M rows x 2 uint32 key lanes, TPU v5 lite, chained dispatches,
dependent-scalar drain.  int32 vs uint32 keys: no difference (85.5 vs
86.7ms).  Every hot sort in the framework is a keys-only dedup where tie
order is unobservable, so all five table2 raw sorts and
sortcount.device_sort switched to is_stable=False — end-to-end k=31
headline went 162.6M -> 195.2M at 64k-read chunks, and the cheaper sort
moved the chunk-size optimum up to 262144 reads (219.3M; 524k regresses
to 202.6M as the 293M-row sort's per-element cost creeps).

Lesson: re-verify negative perf results after every toolchain bump —
the round-4 measurement was either confounded or obsoleted by the JAX
0.8 -> 0.9 upgrade.

Usage (ONE TPU process at a time):
    PYTHONPATH=. timeout 800 python docs/probe_sort_stability.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
T0 = time.perf_counter()


def log(m):
    print(f"[stab +{time.perf_counter() - T0:5.1f}s] {m}", flush=True)


N = 32_112_640
rng = np.random.default_rng(0)
dev = jax.devices()[0]
ins = [
    tuple(
        jax.device_put(
            jnp.asarray(
                rng.integers(0, 2**32, size=N, dtype=np.uint64).astype(
                    np.uint32
                )
            ),
            dev,
        )
        for _ in range(2)
    )
    for _ in range(8)
]


@jax.jit
def s_stable(a, b):
    o = jax.lax.sort((a, b), dimension=0, num_keys=2, is_stable=True)
    return o[0][0] + o[1][0]


@jax.jit
def s_unstable(a, b):
    o = jax.lax.sort((a, b), dimension=0, num_keys=2, is_stable=False)
    return o[0][0] + o[1][0]


def timeit(f, label):
    acc = f(*ins[0])
    jax.device_get(acc)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        accs = [f(*p) for p in ins]  # 8 fresh-input dispatches
        for a in accs:
            jax.device_get(a)
        best = min(best, (time.perf_counter() - t0) / 8)
    log(f"{label}: {best * 1e3:.1f}ms ({best / N * 1e9:.2f} ns/row)")


timeit(s_stable, "stable   (the old default)")
timeit(s_unstable, "unstable")
log("done")
