"""Probe: extraction orientation A/B (round 5).

Results (TPU v5 lite, chained, fused step incl. sentinel+append):

    read-major [R,P]  k=31:  3.86ms/chunk (0.84 ns/window)
    transposed [P,R]  k=31:  3.46ms/chunk (0.75 ns/window)   -10%
    read-major [R,P]  k=55:  4.69ms/chunk
    transposed [P,R]  k=55:  8.39ms/chunk   LOSES 1.8x
    read-major [R,P]  k=101: 5.16ms/chunk
    transposed [P,R]  k=101: 6.01ms/chunk   loses

Narrow records win transposed (P pads 70->128 lanes read-major, and the
flatten relayouts); wide records lose it (many sublane-offset lane
slices) — hence the active_lanes(k) <= 2 gate in ops.pipeline.
"""

import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
T0 = time.perf_counter()
def log(m): print(f"[stepT +{time.perf_counter()-T0:5.1f}s] {m}", flush=True)
from kmer_counter_tpu.ops import table2 as t2
from kmer_counter_tpu.ops.pallas_sort import TILE
rng = np.random.default_rng(0)
dev = jax.devices()[0]

def measure(k, L, label):
    from functools import partial
    from kmer_counter_tpu.ops.pipeline import _extract_flat
    R = 65536
    P = L - k + 1
    chunk = R * P
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=2_000_000)
    st = rng.integers(0, 2_000_000 - L, size=R)
    reads = jax.device_put(jnp.asarray(genome[st[:, None] + np.arange(L)[None, :]]), dev)
    from kmer_counter_tpu.records import active_lanes
    NL = active_lanes(k)
    CR = -(-10 * chunk // TILE) * TILE

    # fused step clone with env read at trace time
    @partial(jax.jit, donate_argnums=(0,), static_argnames=())
    def step(table):
        lanes, wv = _extract_flat(reads, k, True)
        sentinel = jnp.uint32(0xFFFFFFFF)
        lanes = jnp.where(wv[None, :], lanes, sentinel)
        raw = jax.lax.dynamic_update_slice(table.raw_lanes, lanes, (jnp.int32(0), table.raw_off))
        return table._replace(raw_lanes=raw, raw_off=table.raw_off + jnp.int32(lanes.shape[1]))

    tb = jax.device_put(t2.make_table2(TILE, CR, NL), dev)
    tb = step(tb); jax.device_get(tb.raw_off)
    best = float("inf")
    for _ in range(3):
        tb = jax.device_put(t2.make_table2(TILE, CR, NL), dev)
        jax.device_get(tb.raw_off)
        t0 = time.perf_counter()
        for _ in range(8): tb = step(tb)
        jax.device_get(tb.raw_off)
        best = min(best, (time.perf_counter()-t0)/8)
    log(f"{label} k={k}: {best*1e3:.2f}ms/chunk ({best/chunk*1e9:.2f} ns/window)")

for k, L in ((31, 100), (101, 150)):
    os.environ["KMER_TPU_EXTRACT_T"] = "0"
    measure(k, L, "read-major [R,P]")
    os.environ["KMER_TPU_EXTRACT_T"] = "1"
    measure(k, L, "transposed [P,R]")
log("done")
