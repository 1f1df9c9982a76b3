"""On-chip validation + timing: merge_sorted_runs + compact_live at the
consolidation shapes (the ops that replace the 118ms 3-op merge sort and
the 118ms compaction sort)."""
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


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.device_get(out[0][0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(out[0][0])
    return (time.perf_counter() - t0) / reps


# ---- correctness at 2M (merge) ----
na, nb = ps.TILE * 8, ps.TILE * 24
a = np.sort(rng.integers(0, 2**32, na, np.uint64).astype(np.uint32))
b = np.sort(rng.integers(0, 2**32, nb, np.uint64).astype(np.uint32))
ap = rng.integers(0, 2**32, na, np.uint64).astype(np.uint32)
bp = rng.integers(0, 2**32, nb, np.uint64).astype(np.uint32)
f = jax.jit(lambda a1, a2, b1, b2: ps.merge_sorted_runs([a1, a2], [b1, b2], 1))
got = f(*map(jnp.asarray, (a, ap, b, bp)))
want = jax.lax.sort(
    (jnp.asarray(np.concatenate([a, b])), jnp.asarray(np.concatenate([ap, bp]))),
    dimension=0,
    num_keys=1,
)
ok = np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
kg = np.stack([np.asarray(got[0]), np.asarray(got[1])], 1)
kw = np.stack([np.asarray(want[0]), np.asarray(want[1])], 1)
okp = np.array_equal(kg[np.lexsort(kg.T[::-1])], kw[np.lexsort(kw.T[::-1])])
print(f"merge 2M correctness: keys {'OK' if ok else 'WRONG'} payload {'OK' if okp else 'WRONG'}", flush=True)

# ---- correctness at 2M (compact) ----
n = ps.TILE * 32
keys = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
pay = rng.integers(0, 2**32, n, np.uint64).astype(np.uint32)
live = (rng.random(n) < 0.11).astype(np.uint32)
fc = jax.jit(lambda k, p, l: ps.compact_live([k, p], l, num_keys=1))
got = fc(jnp.asarray(keys), jnp.asarray(pay), jnp.asarray(live))
nl = int(live.sum())
okc = np.array_equal(np.asarray(got[0])[:nl], keys[live != 0]) and np.array_equal(
    np.asarray(got[1])[:nl], pay[live != 0]
) and np.all(np.asarray(got[0])[nl:] == 0xFFFFFFFF)
print(f"compact 2M correctness: {'OK' if okc else 'WRONG'}", flush=True)
if not (ok and okp and okc):
    raise SystemExit("FAILED")

# ---- timing at consolidation shapes: NL=2 keys + counts ----
CP, CR = 4587520, 18350080
a_l0 = np.sort(rng.integers(0, 2**32, CP, np.uint64).astype(np.uint32))
a_ops = [jnp.asarray(a_l0), jnp.asarray(a_l0), jnp.asarray(rng.integers(1, 5, CP, np.uint64).astype(np.uint32))]
b_l0 = np.sort(rng.integers(0, 2**32, CR, np.uint64).astype(np.uint32))
b_ops = [jnp.asarray(b_l0), jnp.asarray(b_l0), jnp.asarray(rng.integers(0, 2, CR, np.uint64).astype(np.uint32))]
fm = jax.jit(lambda a1, a2, a3, b1, b2, b3: ps.merge_sorted_runs([a1, a2, a3], [b1, b2, b3], 2))
t = timeit(fm, *a_ops, *b_ops)
print(f"merge_sorted_runs CP+CR=22.9M (2key+count): {t*1e3:.1f} ms", flush=True)

N = CP + CR
keys2 = [jnp.asarray(np.sort(rng.integers(0, 2**32, N, np.uint64).astype(np.uint32)))] * 2
cnt = jnp.asarray(rng.integers(0, 3, N, np.uint64).astype(np.uint32))
fc2 = jax.jit(lambda k1, k2, c: ps.compact_live([k1, k2, c], c, num_keys=2))
t = timeit(fc2, keys2[0], keys2[1], cnt)
print(f"compact_live 22.9M (2key+count): {t*1e3:.1f} ms", flush=True)
