"""On-chip probe: does the 8-operand (k=101) fused merge+fold+compact
kernel fit scoped VMEM at the halved 32K tile?

Result (2026-08-21, TPU v5 lite): COMPILED+RAN in 20.9s, golden OK —
the evidence behind removing consolidate3's five-operand fused gate.
(The full 64K tile at 8 operands OOMs: 18.76M vs the 16M limit, see
_bitonic_tile.)

Run: PYTHONPATH=/root/repo python docs/probe_fused_compact_wide.py
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


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


log(f"device: {jax.devices()[0]}")
t0 = time.perf_counter()
float(jnp.ones((8, 128), jnp.float32).sum())
log(f"first dispatch: {time.perf_counter() - t0:.1f}s")

rng = np.random.default_rng(0)
TILE = ps.TILE // 2  # _bitonic_tile for 8 operands
NK = 7
na = nb = ps.TILE  # 4 halved tiles total


def sorted_cols(n):
    c0 = np.sort(rng.integers(0, 2**28, n, np.uint64).astype(np.uint32))
    rest = [
        rng.integers(0, 8, n, np.uint64).astype(np.uint32)
        for _ in range(NK - 1)
    ]
    order = np.lexsort(tuple(reversed([c0] + rest)))
    return [c[order] for c in [c0] + rest]


A = sorted_cols(na)
Ac = rng.integers(1, 5, na).astype(np.uint32)
B = sorted_cols(nb)
Bc = np.ones(nb, np.uint32)

f = jax.jit(
    lambda *ops: ps.merge_fold_compact_bitonic(
        list(ops[: NK + 1]), list(ops[NK + 1 :]), NK, tile=TILE
    )
)
log(f"compiling 8-op fused kernel at tile={TILE}...")
t0 = time.perf_counter()
out, live = f(
    *[jnp.asarray(c) for c in A],
    jnp.asarray(Ac),
    *[jnp.asarray(c[::-1].copy()) for c in B],
    jnp.asarray(Bc[::-1].copy()),
)
lv = int(jax.device_get(live))
log(f"COMPILED+RAN in {time.perf_counter() - t0:.1f}s, live={lv}")

M = [np.concatenate([a, b]) for a, b in zip(A, B)]
order = np.lexsort(tuple(reversed(M)))
Mk = np.stack([c[order] for c in M], 1)
cnt = np.concatenate([Ac, Bc]).astype(np.uint64)[order]
head = np.concatenate([[True], (Mk[1:] != Mk[:-1]).any(1)])
idx = np.flatnonzero(head)
totals = np.add.reduceat(cnt, idx)
nl = len(idx)
ok = lv == nl
g = np.stack([np.asarray(out[i])[:nl] for i in range(NK)], 1)
ok = ok and np.array_equal(g, Mk[idx])
ok = ok and np.array_equal(np.asarray(out[NK])[:nl], totals.astype(np.uint32))
log(f"golden: {'OK' if ok else 'WRONG'} (nl={nl})")
raise SystemExit(0 if ok else 1)
