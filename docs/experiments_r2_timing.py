"""Round-2 stage timing on the real chip.

Questions:
  1. table2 stage split: _collapse_prefix (ADVICE flagged its jnp.take
     gather), _reduce_raw, and the 3-op merge sort, each in isolation.
  2. append cost: is dynamic_update_slice on a donated table in-place
     (~0.1ms for 55MB) or a full-buffer copy (~8ms measured in the loop)?
  3. extract_chunk cost on its own.
  4. keys-only 2-lane lax.sort at raw-region size (the dedup floor).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

N = 18350080  # table slots in the bench config
NL = 2
CHUNK = 4587520
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print("device:", dev, flush=True)

lanes = jax.device_put(
    jnp.asarray(rng.integers(0, 2**32, (NL, N), dtype=np.uint64).astype(np.uint32)),
    dev,
)
counts = jax.device_put(
    jnp.asarray(rng.integers(0, 3, N, dtype=np.uint64).astype(np.uint32)), dev
)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps


from kmer_counter_tpu.ops import table2 as t2

# sorted prefix with holes (counts 0/],1/2) as _collapse_prefix expects
CP = 4587520
p_lanes_np = np.sort(
    rng.integers(0, 2**32, (CP,), dtype=np.uint64).astype(np.uint32)
)
p_lanes = jax.device_put(jnp.stack([jnp.asarray(p_lanes_np)] * NL, 0), dev)
p_counts = jax.device_put(
    jnp.asarray(rng.integers(0, 3, CP, dtype=np.uint64).astype(np.uint32)), dev
)

f_collapse = jax.jit(t2._collapse_prefix)
print(f"_collapse_prefix (CP={CP/1e6:.1f}M): {timeit(f_collapse, p_lanes, p_counts)*1e3:.1f} ms", flush=True)

f_rawred = jax.jit(lambda l: t2._reduce_raw(l, jnp.int32(N)))
print(f"_reduce_raw (CR={N/1e6:.1f}M): {timeit(f_rawred, lanes)*1e3:.1f} ms", flush=True)


@jax.jit
def f_merge_sort(pl_, pc_, rl_, rc_):
    lanes_cat = jnp.concatenate([pl_, rl_], axis=1)
    counts_cat = jnp.concatenate([pc_, rc_])
    merged = jax.lax.sort(
        (*(lanes_cat[i] for i in range(NL)), counts_cat), dimension=0, num_keys=NL
    )
    return merged[NL]


r_lanes, r_counts = f_rawred(lanes)
print(
    f"merge sort 3-op ({(CP+N)/1e6:.1f}M rows): "
    f"{timeit(f_merge_sort, p_lanes, p_counts, r_lanes, r_counts)*1e3:.1f} ms",
    flush=True,
)

# keys-only sort floor
@jax.jit
def f_sort_keys(l):
    return jax.lax.sort(tuple(l[i] for i in range(NL)), dimension=0, num_keys=NL)[0]


print(f"keys-only 2-lane sort ({N/1e6:.1f}M): {timeit(f_sort_keys, lanes)*1e3:.1f} ms", flush=True)


@jax.jit
def f_sort_keys_chunk(l):
    return jax.lax.sort(
        tuple(l[i, :CHUNK] for i in range(NL)), dimension=0, num_keys=NL
    )[0]


print(f"keys-only 2-lane sort ({CHUNK/1e6:.1f}M): {timeit(f_sort_keys_chunk, lanes)*1e3:.1f} ms", flush=True)

# append: donated dynamic_update_slice at a traced offset
from kmer_counter_tpu.ops import table as table_ops

tbl = jax.device_put(table_ops.make_table(N, NL), dev)
chunk_lanes = jax.device_put(lanes[:, :CHUNK], dev)
chunk_counts = jax.device_put(counts[:CHUNK], dev)
nsc = jnp.int32(CHUNK)

t_append = None
tbl2 = table_ops.append(tbl, chunk_lanes, chunk_counts, nsc)  # compile
jax.device_get(tbl2.offset)
reps = 10
t0 = time.perf_counter()
for _ in range(reps):
    tbl2 = table_ops.append(tbl2, chunk_lanes, chunk_counts, jnp.int32(0))
jax.device_get(tbl2.offset)
print(f"append (donated, {CHUNK/1e6:.1f}M slots into {N/1e6:.1f}M table): {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)

# append_raw (two-level, keys-only)
tbl2l = jax.device_put(t2.make_table2(CP, N, NL), dev)
t2_app = t2.append_raw
o = t2_app(tbl2l, chunk_lanes, jnp.uint32(0))
jax.device_get(o.raw_off)
# reset offset each step by replacing raw_off: keep it simple, just re-time with growing offset modulo
t0 = time.perf_counter()
for i in range(reps):
    o = o._replace(raw_off=jnp.int32(0))
    o = t2_app(o, chunk_lanes, jnp.uint32(0))
jax.device_get(o.raw_off)
print(f"append_raw (keys-only {CHUNK/1e6:.1f}M): {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)

# extract_chunk
from kmer_counter_tpu.ops import extract_chunk, pipeline

reads_np = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(65536, 100))
dev_reads = jax.device_put(jnp.asarray(reads_np), dev)
f_ex = lambda r: extract_chunk(r, 31, True)
print(f"extract_chunk (65536x100 k=31 canon): {timeit(f_ex, dev_reads)*1e3:.1f} ms", flush=True)
f_exk = lambda r: pipeline.extract_chunk_keys(r, 31, True)
print(f"extract_chunk_keys: {timeit(f_exk, dev_reads)*1e3:.1f} ms", flush=True)
