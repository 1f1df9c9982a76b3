"""Mosaic capability probes for the Pallas sort (round 2).

Q1: pltpu.roll along axis 0 (sublanes) — needed for shift-pattern
    compare-exchange at distances >= 128 and window alignment rolls.
Q2: unaligned row slicing / concatenate as a fallback row-shift.
Q3: dynamic-offset DMA from an HBM (ANY) ref via make_async_copy +
    pl.ds at a runtime row offset, with PrefetchScalarGridSpec.
Q4: in-kernel odd-even merge of two sorted 64K halves ([1024, 128] u32)
    — correctness + rough timing vs jax.lax.sort.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

rng = np.random.default_rng(0)


def try_run(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {out}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
        return False


# ---- Q1: roll axis 0 ----
def q1():
    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, 0)

    x = jnp.asarray(rng.integers(0, 2**32, (16, 128), np.uint64).astype(np.uint32))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = np.roll(np.asarray(x), 3, 0)
    return "correct" if np.array_equal(np.asarray(out), want) else "WRONG VALUES"


try_run("Q1 roll axis0", q1)


# ---- Q2: unaligned row slice + concat ----
def q2():
    def kern(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.concatenate([v[3:], v[:3]], axis=0)

    x = jnp.asarray(rng.integers(0, 2**32, (16, 128), np.uint64).astype(np.uint32))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = np.roll(np.asarray(x), -3, 0)
    return "correct" if np.array_equal(np.asarray(out), want) else "WRONG VALUES"


try_run("Q2 unaligned row slice+concat", q2)


# ---- Q3: dynamic-offset DMA from HBM with scalar prefetch ----
def q3():
    ROWS = 8

    def kern(starts_ref, x_hbm, o_ref, scratch, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(starts_ref[t], ROWS), :], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:]

    N_ROWS, G = 64, 4
    x = jnp.asarray(
        rng.integers(0, 2**32, (N_ROWS, 128), np.uint64).astype(np.uint32)
    )
    starts = jnp.asarray([1, 9, 17, 33], jnp.int32)  # deliberately not x8-aligned
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, ROWS, 128), lambda t, s: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.uint32), pltpu.SemaphoreType.DMA],
    )

    def kern2(starts_ref, x_hbm, o_ref, scratch, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(starts_ref[t], ROWS), :], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scratch[:]

    out = pl.pallas_call(
        kern2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, ROWS, 128), jnp.uint32),
    )(starts, x)
    xn = np.asarray(x)
    want = np.stack([xn[s : s + ROWS] for s in [1, 9, 17, 33]])
    return "correct" if np.array_equal(np.asarray(out), want) else "WRONG VALUES"


try_run("Q3 dyn DMA + scalar prefetch", q3)


# ---- Q4: odd-even merge of two sorted 64K halves in one kernel ----
R = 512  # rows per half; half = R*128 = 65536 elements
SENT = np.uint32(0xFFFFFFFF)


def _partner_down(v, d):
    """partner[i] = v[i + d] on the flattened [rows,128] index (garbage at
    the tail, callers mask).  d < 128: lane roll + row-carry; d % 128 == 0:
    row roll."""
    rows = v.shape[0]
    if d % 128 == 0:
        return pltpu.roll(v, rows - d // 128, 0)
    assert d < 128
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    u = pltpu.roll(v, 128 - d, 1)
    u_next = pltpu.roll(u, rows - 1, 0)
    return jnp.where(lane < 128 - d, u, u_next)


def _partner_up(v, d):
    rows = v.shape[0]
    if d % 128 == 0:
        return pltpu.roll(v, d // 128, 0)
    assert d < 128
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    u = pltpu.roll(v, d, 1)
    u_prev = pltpu.roll(u, 1, 0)
    return jnp.where(lane >= d, u, u_prev)


def _flat_iota(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * 128 + lane


def _ce(v, d, lower_mask):
    """Compare-exchange at flattened distance d; lower_mask marks the
    lower index of each pair.  Single operand u32, ascending."""
    pdn = _partner_down(v, d)
    pup = _partner_up(v, d)
    i = _flat_iota(v.shape)
    n = v.shape[0] * 128
    upper_mask = jnp.logical_and(
        _shift_mask_up(lower_mask, d), i >= d
    )
    partner = jnp.where(lower_mask, pdn, jnp.where(upper_mask, pup, v))
    gt = v > partner
    lt = v < partner
    take_self = jnp.where(
        lower_mask, ~gt, jnp.where(upper_mask, ~lt, True)
    )
    return jnp.where(take_self, v, partner)


def _shift_mask_up(mask, d):
    """upper[i] = lower[i-d]."""
    return _partner_up(mask, d)


def merge_kernel(a_ref, b_ref, o_ref):
    v = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)  # [2R, 128]
    n = 2 * R * 128
    W = R * 128
    i = _flat_iota(v.shape)
    v = _ce(v, W, i < W)
    d = W // 2
    while d >= 1:
        lower = jnp.logical_and((i & d) == d, i + d < n)
        v = _ce(v, d, lower)
        d //= 2
    o_ref[:] = v


def q4():
    a = np.sort(rng.integers(0, 2**32, R * 128, np.uint64).astype(np.uint32))
    b = np.sort(rng.integers(0, 2**32, R * 128, np.uint64).astype(np.uint32))
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            merge_kernel,
            out_shape=jax.ShapeDtypeStruct((2 * R, 128), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
    )
    out = f(jnp.asarray(a.reshape(R, 128)), jnp.asarray(b.reshape(R, 128)))
    got = np.asarray(out).reshape(-1)
    want = np.sort(np.concatenate([a, b]))
    ok = np.array_equal(got, want)
    # timing: merge throughput per element
    ja, jb = jnp.asarray(a.reshape(R, 128)), jnp.asarray(b.reshape(R, 128))
    f(ja, jb).block_until_ready()
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        o = f(ja, jb)
    jax.device_get(o[0, 0])
    dt = (time.perf_counter() - t0) / reps
    n = 2 * R * 128
    return f"{'correct' if ok else 'WRONG'} {dt*1e6:.0f}us for {n} -> {n/dt/1e6:.0f}M elem/s"


try_run("Q4 odd-even merge 2x64K", q4)
