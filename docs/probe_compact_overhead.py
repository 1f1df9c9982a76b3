"""On-chip decomposition of compact_live's cost (12.5ms @ 36.7M rows,
3 ops — ~22us/tile against ~2us of DMA transfer and a few us of VPU).

Variants (argv-selected; each runs in its own process if desired):

  copy     576-step grid, blocked in/out specs, pure copy of 3 ops+live
           -> grid iteration + pipelined-DMA floor
  cumsum   copy + the 16-stage _tile_cumsum_excl on the live mask
           -> incremental cost of the doubling-roll scan
  network  copy + cumsum + the full in-tile delta-shift compaction,
           written TILE-ALIGNED (no cross-tile append, no SMEM carry,
           no manual DMA) -> compute cost without serialization
  full     compact_live as shipped -> adds the sequential SMEM offset +
           manual overlapping DMA protocol

full - network isolates the serialization the pipelined rewrite would
remove.  Timing: dependent-scalar drains, best of 3.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from kmer_counter_tpu.ops import pallas_sort as ps

T0 = time.perf_counter()
INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"
N_TILES = int(os.environ.get("PROBE_TILES", 4 if INTERPRET else 576))
TILE = ps.TILE
N = N_TILES * TILE
N_OPS = 3
REPS = 1 if INTERPRET else 3


def log(msg):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


def _blocked(n_in, n_out, body):
    tr = ps._rows(TILE)
    spec = pl.BlockSpec((tr, ps._LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)

    def kernel(*refs):
        body(refs[:n_in], refs[n_in:])

    def call(*ops):
        return pl.pallas_call(
            kernel,
            grid=(N_TILES,),
            in_specs=[spec] * n_in,
            out_specs=[spec] * n_out,
            out_shape=[
                jax.ShapeDtypeStruct((N // ps._LANES, ps._LANES), jnp.uint32)
                for _ in range(n_out)
            ],
            interpret=INTERPRET,
        )(*[v.reshape(N // ps._LANES, ps._LANES) for v in ops])

    return call


def v_copy():
    def body(ins, outs):
        for i in range(N_OPS):
            outs[i][:] = ins[i][:]

    call = _blocked(N_OPS + 1, N_OPS, body)
    return jax.jit(lambda o0, o1, o2, lv: call(o0, o1, o2, lv))


def v_cumsum():
    def body(ins, outs):
        alive = ins[N_OPS][:] != jnp.uint32(0)
        delta = ps._tile_cumsum_excl((~alive).astype(jnp.int32), TILE)
        for i in range(N_OPS):
            outs[i][:] = ins[i][:] + delta.astype(jnp.uint32)

    call = _blocked(N_OPS + 1, N_OPS, body)
    return jax.jit(lambda o0, o1, o2, lv: call(o0, o1, o2, lv))


def v_network():
    def body(ins, outs):
        i = ps._flat_iota((ps._rows(TILE), ps._LANES))
        alive = ins[N_OPS][:] != jnp.uint32(0)
        dead = ~alive
        delta = ps._tile_cumsum_excl(dead.astype(jnp.int32), TILE)
        vs = [r[:] for r in ins[:N_OPS]]
        dr = delta
        d = 1
        while d < TILE:
            s = d.bit_length() - 1
            move = alive & (((dr >> s) & 1) == 1)
            move_i = jnp.where(move, jnp.int32(1), jnp.int32(0))
            m_in = (ps._partner_down(move_i, d) != 0) & (i + d < TILE)
            vs = [jnp.where(m_in, ps._partner_down(v, d), v) for v in vs]
            dr = jnp.where(m_in, ps._partner_down(dr, d), dr)
            alive = m_in | (alive & ~move)
            d *= 2
        for k in range(N_OPS):
            outs[k][:] = jnp.where(alive, vs[k], jnp.uint32(0))

    call = _blocked(N_OPS + 1, N_OPS, body)
    return jax.jit(lambda o0, o1, o2, lv: call(o0, o1, o2, lv))


def v_full():
    return jax.jit(
        lambda o0, o1, o2, lv: ps.compact_live(
            [o0, o1, o2], lv, num_keys=2, interpret=INTERPRET
        )
    )


VARIANTS = {
    "copy": v_copy,
    "cumsum": v_cumsum,
    "network": v_network,
    "full": v_full,
}


def main():
    names = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    log(f"device: {jax.devices()[0]}  N={N} ({N_TILES} tiles) ops={N_OPS}")
    t0 = time.perf_counter()
    float(jnp.ones((8, 128), jnp.float32).sum())
    log(f"first dispatch: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(3)
    ops = [
        jnp.asarray(rng.integers(0, 2**32, N, np.uint64).astype(np.uint32))
        for _ in range(N_OPS)
    ]
    # ~3% live density, uniformly spread (the normal-cardinality regime)
    live = jnp.asarray((rng.random(N) < 0.03).astype(np.uint32))

    CHAIN = int(os.environ.get("PROBE_CHAIN", 1 if INTERPRET else 8))

    def run_chain(fn, k):
        # k async back-to-back dispatches feeding outputs into inputs:
        # the host->device round-trip through the tunnel (~25ms — it
        # swamped the unchained probe) amortizes over the chain.
        cur = ops
        for _ in range(k):
            out = fn(*[v.reshape(N) for v in cur], live)
            cur = [v.reshape(-1) for v in out[:N_OPS]]
        return int(jax.device_get(cur[0][0] + cur[1][-1]))

    for name in names:
        log(f"{name}: compiling...")
        fn = VARIANTS[name]()
        t0 = time.perf_counter()
        try:
            run_chain(fn, 1)
        except Exception as e:
            log(f"{name}: ERROR {e!r}")
            continue
        log(f"{name}: compile+first run {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run_chain(fn, CHAIN)
            times.append((time.perf_counter() - t0) / CHAIN)
        best = min(times)
        log(
            f"{name}: best {best * 1e3:.2f}ms/call x{CHAIN} "
            f"({best / N_TILES * 1e6:.1f} us/tile, {[f'{t*1e3:.1f}' for t in times]})"
        )


if __name__ == "__main__":
    main()
