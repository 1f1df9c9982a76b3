"""Stage-level timing on the real chip: where do the 63ms/chunk go?

Measures, with the drain-through-dependent-scalar protocol (CLAUDE.md):
  1. extract_chunk alone
  2. table append alone (and a fused single-buffer variant)
  3. consolidate (sort_reduce of the full table)
  4. lax.sort per-record cost vs segment length — does sorting [G, T]
     along axis 1 beat one global [N] sort per record?  (If XLA's TPU sort
     is bitonic, short segments should be ~log^2 cheaper.)
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kmer_counter_tpu.ops import extract_chunk
from kmer_counter_tpu.ops import table as table_ops
from kmer_counter_tpu.records import active_lanes

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

K = 31
L = 100
N_READS = 65536
P = L - K + 1
N = N_READS * P          # 4.59M records / chunk
CAP = 4 * N              # 18.35M-slot table
NL = active_lanes(K)

rng = np.random.default_rng(0)
genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=1_000_000)
starts = rng.integers(0, 1_000_000 - L, size=N_READS)
reads = genome[starts[:, None] + np.arange(L)[None, :]]
dev = jax.devices()[0]
print("device:", dev, flush=True)
dev_reads = jax.device_put(jnp.asarray(reads), dev)


def timeit(fn, *args, reps=10, drain=None, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    d = drain(out) if drain else jax.block_until_ready(out)
    if drain:
        pass
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    if drain:
        drain(out)
    else:
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# --- 1. extract ---
@jax.jit
def do_extract(r):
    lanes, counts = extract_chunk(r, K, True)
    return lanes, counts, counts[-1]


dt = timeit(do_extract, dev_reads, drain=lambda o: int(jax.device_get(o[2])))
print(f"extract: {dt*1e3:.2f} ms  ({N/dt/1e6:.0f} M rec/s)", flush=True)

lanes, counts, _ = do_extract(dev_reads)
lanes = jax.block_until_ready(lanes)

# --- 2. append (current two-DUS form) ---
table = jax.device_put(table_ops.make_table(CAP, NL), dev)
app = jax.jit(table_ops.append.__wrapped__, donate_argnums=(0,))


def do_append(t):
    t = app(t, lanes, counts, jnp.int32(0))  # offset fixed at 0: same write cost
    return t


# donation complicates reps; time a fresh chain each rep
def time_append():
    global table
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        table = app(table, lanes, counts, jnp.int32(0))
        int(jax.device_get(table.offset))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# warm compile
table = app(table, lanes, counts, jnp.int32(0))
int(jax.device_get(table.offset))
dt = time_append()
print(f"append(2xDUS): {dt*1e3:.2f} ms  ({(NL+1)*N*4/dt/1e9:.1f} GB/s chunk-write)", flush=True)


# --- 2b. fused single-buffer append ---
@jax.jit
def app_fused(buf, lanes, counts, off):
    chunk = jnp.concatenate([lanes, counts[None, :]], axis=0)  # [NL+1, N]
    return jax.lax.dynamic_update_slice(buf, chunk, (jnp.int32(0), off))


buf = jnp.zeros((NL + 1, CAP), jnp.uint32)
buf = jax.device_put(buf, dev)
app_fused_d = jax.jit(app_fused, donate_argnums=(0,))
buf = app_fused_d(buf, lanes, counts, jnp.int32(0))
int(jax.device_get(buf[0, 0]))
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    buf = app_fused_d(buf, lanes, counts, jnp.int32(0))
    int(jax.device_get(buf[0, 0]))
    ts.append(time.perf_counter() - t0)
print(f"append(fused DUS): {min(ts)*1e3:.2f} ms", flush=True)

# --- 3. consolidate (sort_reduce over CAP slots) ---
tbl = table_ops.make_table(CAP, NL)
fill_lanes = np.zeros((NL, CAP), np.uint32)
fill_counts = np.zeros((CAP,), np.uint32)
for i in range(4):
    fl, fc, _ = do_extract(dev_reads)
    fill_lanes[:, i * N : (i + 1) * N] = np.asarray(jax.device_get(fl))
    fill_counts[i * N : (i + 1) * N] = np.asarray(jax.device_get(fc))
tbl = table_ops.CountTable(
    jax.device_put(jnp.asarray(fill_lanes), dev),
    jax.device_put(jnp.asarray(fill_counts), dev),
    jnp.int32(CAP),
)
cons = jax.jit(table_ops.consolidate.__wrapped__)
out = cons(tbl)
nu = int(jax.device_get(out.offset))
print("consolidate unique:", nu, flush=True)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = cons(tbl)
    int(jax.device_get(out.offset))
    ts.append(time.perf_counter() - t0)
dt = min(ts)
print(
    f"consolidate({CAP/1e6:.1f}M): {dt*1e3:.1f} ms "
    f"({CAP/dt/1e6:.0f} M slot/s through 2 sorts; amortized/chunk at 3.7 chunks: {dt/3.7*1e3:.1f} ms)",
    flush=True,
)

# --- 3b. the two sorts separately ---
sent = jnp.uint32(0xFFFFFFFF)


@jax.jit
def sort1(lanes, counts):
    ops = (*(lanes[i] for i in range(NL)), counts)
    s = jax.lax.sort(ops, dimension=0, num_keys=NL)
    return s[0][0]


dt = timeit(sort1, tbl.lanes, tbl.counts, reps=5, drain=lambda o: int(jax.device_get(o)))
print(f"sort1 (NL={NL} keys + 1 payload, {CAP/1e6:.1f}M): {dt*1e3:.1f} ms ({CAP/dt/1e6:.0f} M rec/s)", flush=True)


@jax.jit
def sort2(lanes, counts):
    ck = counts.astype(jnp.int32)
    ops = (ck, *(lanes[i] for i in range(NL)), counts)
    s = jax.lax.sort(ops, dimension=0, num_keys=1)
    return s[0][0]


dt = timeit(sort2, tbl.lanes, tbl.counts, reps=5, drain=lambda o: int(jax.device_get(o)))
print(f"sort2 (1 key + {NL+1} payload, {CAP/1e6:.1f}M): {dt*1e3:.1f} ms", flush=True)

# --- 4. segment-sort scaling ---
flat = tbl.lanes[0]
for T in (1 << 11, 1 << 13, 1 << 15, 1 << 17):
    G = CAP // T

    @jax.jit
    def seg_sort(x, G=G, T=T):
        y = jax.lax.sort(x[: G * T].reshape(G, T), dimension=1)
        return y[0, 0]

    dt = timeit(seg_sort, flat, reps=5, drain=lambda o: int(jax.device_get(o)))
    print(
        f"segment sort [G={G}, T={T}] 1 operand: {dt*1e3:.1f} ms ({G*T/dt/1e6:.0f} M rec/s)",
        flush=True,
    )

# full-array single-operand sort for reference
@jax.jit
def full_sort(x):
    return jax.lax.sort(x, dimension=0)[0]


dt = timeit(full_sort, flat, reps=5, drain=lambda o: int(jax.device_get(o)))
print(f"full sort [N={CAP}] 1 operand: {dt*1e3:.1f} ms ({CAP/dt/1e6:.0f} M rec/s)", flush=True)

# segment sort with full operand set (3 ops, NL keys)
T = 1 << 15
G = CAP // T


@jax.jit
def seg_sort_multi(lanes, counts):
    ops = tuple(x[: G * T].reshape(G, T) for x in (*(lanes[i] for i in range(NL)), counts))
    s = jax.lax.sort(ops, dimension=1, num_keys=NL)
    return s[0][0, 0]


dt = timeit(seg_sort_multi, tbl.lanes, tbl.counts, reps=5, drain=lambda o: int(jax.device_get(o)))
print(f"segment sort [G={G}, T={T}] NL keys+payload: {dt*1e3:.1f} ms ({G*T/dt/1e6:.0f} M rec/s)", flush=True)
