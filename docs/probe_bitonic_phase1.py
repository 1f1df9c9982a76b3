"""Phase 1: warmup dispatch + SMALL bitonic-fold correctness on-chip.
Logs to stdout (caller redirects to a file — no pipes, no buffering loss).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from kmer_counter_tpu.ops import pallas_sort as ps

T0 = time.perf_counter()


def log(msg):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


log(f"device: {jax.devices()[0]}")
t0 = time.perf_counter()
float(jnp.ones((8, 128), jnp.float32).sum())
log(f"first dispatch: {time.perf_counter() - t0:.1f}s")

rng = np.random.default_rng(0)
na, nb = ps.TILE, 3 * ps.TILE  # 4 tiles total — smallest real-tile case
a0 = np.sort(rng.integers(0, 2**28, na, np.uint64).astype(np.uint32))
a1 = rng.integers(0, 8, na, np.uint64).astype(np.uint32)
o = np.lexsort((a1, a0)); a0, a1 = a0[o], a1[o]
ac = rng.integers(1, 5, na).astype(np.uint32)
b0 = np.sort(rng.integers(0, 2**28, nb, np.uint64).astype(np.uint32))
b1 = rng.integers(0, 8, nb, np.uint64).astype(np.uint32)
o = np.lexsort((b1, b0)); b0, b1 = b0[o], b1[o]
b0[: ps.TILE // 2] = 0
b1[: ps.TILE // 2] = 0
bc = np.ones(nb, np.uint32)
bc[: ps.TILE // 4] = 0

f = jax.jit(
    lambda x0, x1, xc, y0, y1, yc: ps.merge_sorted_runs_fold_bitonic(
        [x0, x1, xc], [y0, y1, yc], 2
    )
)
log("compiling 3-op bitonic fold (4-tile correctness)...")
got = f(
    jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(ac),
    jnp.asarray(b0[::-1].copy()), jnp.asarray(b1[::-1].copy()),
    jnp.asarray(bc[::-1].copy()),
)
got = [np.asarray(jax.device_get(v)) for v in got]
log("compiled + ran")


def ref_fold_ends(keys_cols, counts):
    karr = np.stack(keys_cols, 1)
    counts = np.asarray(counts, np.uint64)
    n = len(counts)
    out = np.zeros(n, np.uint32)
    head = np.concatenate([[True], (karr[1:] != karr[:-1]).any(1)])
    idx = np.flatnonzero(head)
    totals = np.add.reduceat(counts, idx)
    ends = np.concatenate([idx[1:] - 1, [n - 1]])
    sent = (karr[idx] == 0xFFFFFFFF).all(1)
    out[ends[~sent]] = totals[~sent].astype(np.uint32)
    return out


m0, m1 = np.concatenate([a0, b0]), np.concatenate([a1, b1])
order = np.lexsort((m1, m0))
want0, want1 = m0[order], m1[order]
want_c = ref_fold_ends([want0, want1], np.concatenate([ac, bc])[order])
ok = (
    np.array_equal(got[0], want0)
    and np.array_equal(got[1], want1)
    and np.array_equal(got[2], want_c)
)
log(f"bitonic fold 4-tile correctness: {'OK' if ok else 'WRONG'}")
if not ok:
    for i, (g, w) in enumerate(
        [(got[0], want0), (got[1], want1), (got[2], want_c)]
    ):
        bad = np.flatnonzero(g != w)
        log(f"  op{i}: {len(bad)} mismatches, first at {bad[:5].tolist()}")
    raise SystemExit(1)
log("phase1 done")
