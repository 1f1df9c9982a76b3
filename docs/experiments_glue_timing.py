"""Where do consolidate's non-sort ~92ms go?  (stage timing showed
sort1 79.3 + sort2 55.4 = 135 of 227 ms total at 18.35M slots.)

Measures each elementwise/scan stage of ops.sortcount.sort_reduce in
isolation on the real chip, plus key-count scaling of lax.sort.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

N = 18350080
NL = 2
rng = np.random.default_rng(0)
dev = jax.devices()[0]
lanes = jax.device_put(
    jnp.asarray(rng.integers(0, 2**32, (NL, N), dtype=np.uint64).astype(np.uint32)), dev
)
counts = jax.device_put(jnp.asarray(rng.integers(0, 3, N, dtype=np.uint64).astype(np.uint32)), dev)
print("device:", dev, flush=True)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    int(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    int(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / reps


@jax.jit
def f_sentinel(lanes, counts):
    valid = counts > 0
    return jnp.where(valid[None, :], lanes, jnp.uint32(0xFFFFFFFF))


@jax.jit
def f_boundary(lanes):
    pd = jnp.any(lanes[:, 1:] != lanes[:, :-1], axis=0)
    return jnp.concatenate([jnp.ones((1,), bool), pd])


@jax.jit
def f_cumsum(counts):
    return jnp.cumsum(counts)


@jax.jit
def f_cumsum_i32(counts):
    return jnp.cumsum(counts.astype(jnp.int32))


@jax.jit
def f_cummin_rev(b):
    idx = jnp.arange(N, dtype=jnp.int32)
    bpos = jnp.where(b, idx, N)
    return jax.lax.cummin(bpos, reverse=True)


@jax.jit
def f_seg(b):
    return jnp.cumsum(b.astype(jnp.int32)) - 1


for name, fn, args in [
    ("sentinel-where (2 lanes)", f_sentinel, (lanes, counts)),
    ("boundary detect", f_boundary, (lanes,)),
    ("cumsum u32", f_cumsum, (counts,)),
    ("cumsum i32", f_cumsum_i32, (counts,)),
    ("cummin rev i32", f_cummin_rev, (counts > 0,)),
    ("seg = cumsum(bool)", f_seg, (counts > 0,)),
]:
    print(f"{name}: {timeit(fn, *args)*1e3:.1f} ms", flush=True)

# key-count scaling of lax.sort
for nk, np_ in [(1, 0), (1, 1), (1, 3), (2, 0), (2, 1), (2, 2), (3, 0), (4, 0)]:
    ops = tuple(lanes[i % NL] for i in range(nk)) + tuple(
        counts for _ in range(np_)
    )

    def f(ops=ops, nk=nk):
        return jax.lax.sort(ops, dimension=0, num_keys=nk)[0][0]

    f = jax.jit(f)
    print(f"sort {nk} keys + {np_} payload: {timeit(f)*1e3:.1f} ms", flush=True)

# full sort_reduce for reference
from kmer_counter_tpu.ops.sortcount import sort_reduce

f = jax.jit(lambda l, c: sort_reduce(l, c)[2])
print(f"sort_reduce total: {timeit(f, lanes, counts)*1e3:.1f} ms", flush=True)

# two-level consolidate2 (CP=4.6M)
from kmer_counter_tpu.ops import table2 as t2

CP = 4587520
tbl = t2.TwoLevelTable(
    prefix_lanes=jnp.zeros((NL, CP), jnp.uint32),
    prefix_counts=jnp.zeros((CP,), jnp.uint32),
    raw_lanes=lanes,
    raw_off=jnp.int32(N),
    allt=jnp.uint32(0),
)
cons2 = jax.jit(t2.consolidate2.__wrapped__)
out = cons2(tbl)
print("consolidate2 live:", int(jax.device_get(out[1])), flush=True)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    o = cons2(tbl)
    int(jax.device_get(o[1]))
    ts.append(time.perf_counter() - t0)
print(f"consolidate2 (CR={N/1e6:.1f}M, CP={CP/1e6:.1f}M): {min(ts)*1e3:.1f} ms", flush=True)
