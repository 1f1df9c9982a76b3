"""On-chip validation + timing: merge_sorted_runs_fold_bitonic vs the
odd-even merge_sorted_runs_fold at the consolidation shapes (round-4
item: 16 bitonic stages on w-element buffers vs 17 odd-even stages on
2w — expected ~2x the merge stage work removed — plus full 64K tiles
for 5-operand records).

Run serially (ONE TPU process), under timeout:
  timeout 550 python docs/experiments_bitonic_tpu.py
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

T0 = time.perf_counter()


def log(msg):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def timeit(f, *args, reps=5):
    # drain through a dependent scalar that covers ALL outputs (memory
    # note: draining a partial output lets work escape the window).
    out = f(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


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


# ---- correctness at 2M (bitonic fold, 2 key lanes + count) ----
na, nb = ps.TILE * 8, ps.TILE * 24
a0 = np.sort(rng.integers(0, 2**28, na, np.uint64).astype(np.uint32))
a1 = rng.integers(0, 8, na, np.uint64).astype(np.uint32)
o = np.lexsort((a1, a0)); a0, a1 = a0[o], a1[o]
ac = rng.integers(1, 5, na).astype(np.uint32)
b0 = np.sort(rng.integers(0, 2**28, nb, np.uint64).astype(np.uint32))
b1 = rng.integers(0, 8, nb, np.uint64).astype(np.uint32)
o = np.lexsort((b1, b0)); b0, b1 = b0[o], b1[o]
# dead all-zero-key rows at the ascending front (count 0), like the
# descending raw storage produces
b0[: ps.TILE // 2] = 0
b1[: ps.TILE // 2] = 0
bc = np.ones(nb, np.uint32)
bc[: ps.TILE // 4] = 0

f = jax.jit(
    lambda x0, x1, xc, y0, y1, yc: ps.merge_sorted_runs_fold_bitonic(
        [x0, x1, xc], [y0, y1, yc], 2
    )
)
log("compiling 3-op bitonic fold (2M correctness)...")
got = f(
    jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(ac),
    jnp.asarray(b0[::-1].copy()), jnp.asarray(b1[::-1].copy()),
    jnp.asarray(bc[::-1].copy()),
)
got = [np.asarray(jax.device_get(v)) for v in got]
m0, m1 = np.concatenate([a0, b0]), np.concatenate([a1, b1])
order = np.lexsort((m1, m0))
want0, want1 = m0[order], m1[order]
want_c = ref_fold_ends([want0, want1], np.concatenate([ac, bc])[order])
ok = (
    np.array_equal(got[0], want0)
    and np.array_equal(got[1], want1)
    and np.array_equal(got[2], want_c)
)
log(f"bitonic fold 2M correctness: {'OK' if ok else 'WRONG'}")
if not ok:
    for i, (g, w) in enumerate(
        [(got[0], want0), (got[1], want1), (got[2], want_c)]
    ):
        bad = np.flatnonzero(g != w)
        log(f"  op{i}: {len(bad)} mismatches, first at {bad[:5]}")
    raise SystemExit("FAILED")

# ---- timing at k=31 consolidation shape: 2 key lanes + count ----
CP, CR = 4587520, 7 * 4587520  # 36.7M rows, the cap=8x bench shape
a_keys = np.sort(rng.integers(0, 2**32, CP, np.uint64).astype(np.uint32))
a_ops = [a_keys, a_keys, rng.integers(1, 5, CP, np.uint64).astype(np.uint32)]
b_keys = np.sort(rng.integers(0, 2**32, CR, np.uint64).astype(np.uint32))
b_ones = (rng.random(CR) < 0.97).astype(np.uint32)

f_asc = jax.jit(
    lambda x0, x1, xc, y0, y1, yc: jnp.sum(
        ps.merge_sorted_runs_fold([x0, x1, xc], [y0, y1, yc], 2)[2]
    )
)
f_bit = jax.jit(
    lambda x0, x1, xc, y0, y1, yc: jnp.sum(
        ps.merge_sorted_runs_fold_bitonic([x0, x1, xc], [y0, y1, yc], 2)[2]
    )
)
args_asc = [jnp.asarray(v) for v in a_ops] + [
    jnp.asarray(b_keys), jnp.asarray(b_keys), jnp.asarray(b_ones)
]
args_bit = [jnp.asarray(v) for v in a_ops] + [
    jnp.asarray(b_keys[::-1].copy()),
    jnp.asarray(b_keys[::-1].copy()),
    jnp.asarray(b_ones[::-1].copy()),
]
log("compiling + timing odd-even fold merge @36.7M...")
t_asc = timeit(f_asc, *args_asc)
log(f"odd-even fold merge 36.7M (2key+count): {t_asc*1e3:.1f} ms")
log("compiling + timing bitonic fold merge @36.7M...")
t_bit = timeit(f_bit, *args_bit)
log(f"bitonic  fold merge 36.7M (2key+count): {t_bit*1e3:.1f} ms "
    f"({t_asc/t_bit:.2f}x)")

# cross-check the two at this scale (sums must agree)
s_asc = int(jax.device_get(f_asc(*args_asc)))
s_bit = int(jax.device_get(f_bit(*args_bit)))
log(f"fold sums agree: {'OK' if s_asc == s_bit else 'WRONG'} "
    f"({s_asc} vs {s_bit})")

# ---- 5-operand (k=55/128): bitonic at the FULL 64K tile ----
CP5, CR5 = 1048576, 3 * 1048576  # 4M rows: compile fast, VMEM-shape real
ak = np.sort(rng.integers(0, 2**32, CP5, np.uint64).astype(np.uint32))
bk = np.sort(rng.integers(0, 2**32, CR5, np.uint64).astype(np.uint32))
ac5 = rng.integers(1, 5, CP5, np.uint64).astype(np.uint32)
bo5 = np.ones(CR5, np.uint32)

f5_bit = jax.jit(
    lambda *ops: jnp.sum(
        ps.merge_sorted_runs_fold_bitonic(
            list(ops[:5]), list(ops[5:]), 4, tile=ps.TILE
        )[4]
    )
)
f5_asc = jax.jit(
    lambda *ops: jnp.sum(
        ps.merge_sorted_runs_fold(
            list(ops[:5]), list(ops[5:]), 4, tile=ps.TILE // 2
        )[4]
    )
)
args5_bit = [jnp.asarray(ak)] * 4 + [jnp.asarray(ac5)] + [
    jnp.asarray(bk[::-1].copy())
] * 4 + [jnp.asarray(bo5)]
args5_asc = [jnp.asarray(ak)] * 4 + [jnp.asarray(ac5)] + [
    jnp.asarray(bk)
] * 4 + [jnp.asarray(bo5)]
log("compiling + timing 5-op bitonic fold @4M, FULL 64K tile...")
t5b = timeit(f5_bit, *args5_bit)
log(f"5-op bitonic fold 4M @64K tile: {t5b*1e3:.1f} ms")
log("compiling + timing 5-op odd-even fold @4M, halved 32K tile...")
t5a = timeit(f5_asc, *args5_asc)
log(f"5-op odd-even fold 4M @32K tile: {t5a*1e3:.1f} ms ({t5a/t5b:.2f}x)")
s5b = int(jax.device_get(f5_bit(*args5_bit)))
s5a = int(jax.device_get(f5_asc(*args5_asc)))
log(f"5-op fold sums agree: {'OK' if s5a == s5b else 'WRONG'}")
log("done")
