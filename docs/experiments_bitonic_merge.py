"""Feasibility probe: bitonic-merge building blocks in Mosaic.

Q1: do tile-preserving reshapes ([N] viewed as [a, 2, b, 128] with min/max
    over the pair axis) lower?
Q2: does pltpu.roll along the lane axis lower?
Q3: end-to-end: merge two sorted 1024-key windows via bitonic half-cleaners
    (distances 1024..1) inside one kernel, verified against np.sort.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1024  # window per side; merged = 2T = 2048 = 16 rows x 128 lanes


def _merge_block(a, b_rev):
    # b arrives pre-reversed (Mosaic lacks the `rev` primitive):
    # A ascending ++ B descending = bitonic [16, 128]
    v = jnp.concatenate([a, b_rev], axis=0)
    # half-cleaner distances: 1024, 512, ..., 1 over flattened index i = r*128 + l
    for d in (1024, 512, 256, 128):
        rows = d // 128  # exchange row r with row r+rows within blocks
        g = 2 * rows
        x = v.reshape(16 // g, 2, rows, 128)
        a_, b_ = x[:, 0], x[:, 1]
        lt = a_ < b_  # minui doesn't legalize in Mosaic; use compare+select
        lo = jnp.where(lt, a_, b_)
        hi = jnp.where(lt, b_, a_)
        v = jnp.stack([lo, hi], axis=1).reshape(16, 128)
    for d in (64, 32, 16, 8, 4, 2, 1):
        # lane-axis exchange at distance d: partner = lane ^ d via roll+mask
        rolled_fwd = pltpu.roll(v, 128 - d, 1)   # v[(l+d) % 128]
        rolled_back = pltpu.roll(v, d, 1)        # v[(l-d) % 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        upper = (lane % (2 * d)) >= d  # this lane holds the larger slot
        partner = jnp.where(upper, rolled_back, rolled_fwd)
        take_max = upper
        vmax = jnp.where(v < partner, partner, v)
        vmin = jnp.where(v < partner, v, partner)
        v = jnp.where(take_max, vmax, vmin)
    return v


def merge_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = _merge_block(a_ref[:], b_ref[:])


@jax.jit
def merge(a, b):
    return pl.pallas_call(
        merge_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


rng = np.random.default_rng(0)
a = np.sort(rng.integers(0, 2**32, T, dtype=np.uint64).astype(np.uint32))
b = np.sort(rng.integers(0, 2**32, T, dtype=np.uint64).astype(np.uint32))
t0 = time.perf_counter()
out = np.asarray(merge(jnp.asarray(a.reshape(8, 128)), jnp.asarray(b[::-1].copy().reshape(8, 128))))
print("compile+run", time.perf_counter() - t0, flush=True)
want = np.sort(np.concatenate([a, b]))
got = out.reshape(-1)
print("merge correct:", np.array_equal(got, want), flush=True)
if not np.array_equal(got, want):
    bad = np.flatnonzero(got != want)[:5]
    print("first mismatches at", bad, got[bad], want[bad])

# throughput: grid over many tiles
G = 512
A = np.sort(rng.integers(0, 2**32, (G, T), dtype=np.uint64).astype(np.uint32), axis=1)
B = np.sort(rng.integers(0, 2**32, (G, T), dtype=np.uint64).astype(np.uint32), axis=1)


def merge_kernel_g(a_ref, b_ref, o_ref):
    o_ref[0] = _merge_block(a_ref[0], b_ref[0])


@jax.jit
def merge_many(A, B):
    return pl.pallas_call(
        merge_kernel_g,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 16, 128), jnp.uint32),
    )(A.reshape(G, 8, 128), B[:, ::-1].copy().reshape(G, 8, 128))


try:
    o = merge_many(jnp.asarray(A), jnp.asarray(B))
    jax.device_get(o[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        o = merge_many(jnp.asarray(A), jnp.asarray(B))
    jax.device_get(o[0, 0, 0])
    dt = (time.perf_counter() - t0) / 10
    n = G * 2 * T
    print(f"grid merge: {dt*1e3:.2f} ms for {n} records -> {n/dt/1e6:.0f} M rec/s", flush=True)
except Exception as e:
    print("grid merge failed:", type(e).__name__, str(e)[:300], flush=True)
