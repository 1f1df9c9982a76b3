"""On-chip validation + timing of ops.pallas_sort vs jax.lax.sort.

Correctness at 1M elements (leaf + 4 merge passes) on random, heavy-dup,
sorted, and reversed inputs; timing at the bench table size (18.35M).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from kmer_counter_tpu.ops import pallas_sort as ps

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print("device:", dev, flush=True)


def check(n, n_keys, n_payload, vmax=2**32, label="", data=None):
    if data is None:
        data = [
            rng.integers(0, vmax, n, np.uint64).astype(np.uint32)
            for _ in range(n_keys + n_payload)
        ]
    ops = [jax.device_put(jnp.asarray(v), dev) for v in data]
    t0 = time.perf_counter()
    got = jax.jit(lambda *o: ps.sort_ops(o, n_keys))(*ops)
    jax.device_get(got[0][0])
    compile_s = time.perf_counter() - t0
    want = jax.lax.sort(tuple(ops), dimension=0, num_keys=n_keys)
    okk = all(
        np.array_equal(np.asarray(got[i]), np.asarray(want[i]))
        for i in range(n_keys)
    )
    okp = True
    if n_payload and okk:
        kg = np.stack([np.asarray(got[i]) for i in range(n_keys)], 1)
        pg = np.stack([np.asarray(got[n_keys + i]) for i in range(n_payload)], 1)
        pw = np.stack([np.asarray(want[n_keys + i]) for i in range(n_payload)], 1)
        # payload multiset per key group: compare via sorted (key,payload) rows
        a = np.concatenate([kg, pg], 1)
        b = np.concatenate([kg, pw], 1)
        okp = np.array_equal(
            a[np.lexsort(a.T[::-1])], b[np.lexsort(b.T[::-1])]
        )
    print(
        f"{label}: keys {'OK' if okk else 'WRONG'} payload "
        f"{'OK' if okp else 'WRONG'} (compile {compile_s:.1f}s)",
        flush=True,
    )
    return okk and okp


M = 1 << 20
ok = True
ok &= check(M, 2, 1, label="1M random 2key+payload")
ok &= check(M, 2, 1, vmax=64, label="1M heavy dups")
ok &= check(M, 1, 0, label="1M single key")
s = np.sort(rng.integers(0, 2**32, M, np.uint64).astype(np.uint32))
ok &= check(M, 1, 0, label="1M presorted", data=[s])
ok &= check(M, 1, 0, label="1M reversed", data=[s[::-1].copy()])
if not ok:
    raise SystemExit("correctness FAILED; skipping timing")

# ---- timing at bench size ----
N = 18350080
CH = 4587520


def timeit(f, ops, reps=5):
    out = f(*ops)
    jax.device_get(out[0][0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*ops)
    jax.device_get(out[0][0])
    return (time.perf_counter() - t0) / reps


for n, n_keys, n_payload, label in [
    (N, 2, 1, "18.4M 2key+1payload (sort_reduce stage1)"),
    (N, 1, 3, "18.4M 1key+3payload (comp sort)"),
    (N, 2, 0, "18.4M keys-only"),
    (CH, 2, 0, "4.6M keys-only (chunk)"),
]:
    data = [
        jax.device_put(
            jnp.asarray(rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)),
            dev,
        )
        for _ in range(n_keys + n_payload)
    ]
    fp = jax.jit(lambda *o, nk=n_keys: ps.sort_ops(o, nk))
    fl = jax.jit(lambda *o, nk=n_keys: jax.lax.sort(o, dimension=0, num_keys=nk))
    tp = timeit(fp, data)
    tl = timeit(fl, data)
    print(
        f"{label}: pallas {tp*1e3:.1f} ms vs lax.sort {tl*1e3:.1f} ms "
        f"({tl/tp:.2f}x)",
        flush=True,
    )
