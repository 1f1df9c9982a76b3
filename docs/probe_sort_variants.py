"""On-chip probe: can the raw-region sort beat 2-key lax.sort?

The raw keys-only sort is ~65% of chunk time (132.7ms @ 32.1M rows,
round 3).  Variants probed here, selected by argv so each runs in its
own process (remote compiles land in the persistent cache):

  2key       lax.sort((l0,l1), num_keys=2)           -- production today
  2key_st    same, is_stable=True                    -- stability cost
  lsd        two stable single-key passes (sort by l1 carrying l0, then
             by l0 carrying l1) == lexicographic (l0,l1)
  pass1      ONE stable single-key pass (key+payload) -- per-pass floor
  u64        pack lanes into uint64, 1-key sort, unpack

Usage: python docs/probe_sort_variants.py [variant ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

T0 = time.perf_counter()
N = int(os.environ.get("PROBE_N", 32 * 2**20))
REPS = int(os.environ.get("PROBE_REPS", 3))


def log(msg):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


@jax.jit
def v_2key(l0, l1):
    return jax.lax.sort((l0, l1), dimension=0, num_keys=2)


@jax.jit
def v_2key_st(l0, l1):
    return jax.lax.sort((l0, l1), dimension=0, num_keys=2, is_stable=True)


@jax.jit
def v_lsd(l0, l1):
    s1, s0 = jax.lax.sort((l1, l0), dimension=0, num_keys=1, is_stable=True)
    return jax.lax.sort((s0, s1), dimension=0, num_keys=1, is_stable=True)


@jax.jit
def v_pass1(l0, l1):
    return jax.lax.sort((l0, l1), dimension=0, num_keys=1, is_stable=True)


@jax.jit
def v_u64(l0, l1):
    packed = (l0.astype(jnp.uint64) << 32) | l1.astype(jnp.uint64)
    s = jax.lax.sort(packed, dimension=0)
    return (s >> 32).astype(jnp.uint32), s.astype(jnp.uint32)


VARIANTS = {
    "2key": v_2key,
    "2key_st": v_2key_st,
    "lsd": v_lsd,
    "pass1": v_pass1,
    "u64": v_u64,
}


def drain(out):
    # Dependent-scalar drain (CLAUDE.md): block_until_ready can return
    # early through the tunnel.
    return int(jax.device_get(out[0][0] + out[1][-1]))


def main():
    names = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    log(f"device: {jax.devices()[0]}  N={N}")
    t0 = time.perf_counter()
    float(jnp.ones((8, 128), jnp.float32).sum())
    log(f"first dispatch: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(7)
    h0 = rng.integers(0, 2**32, N, np.uint64).astype(np.uint32)
    h1 = rng.integers(0, 2**32, N, np.uint64).astype(np.uint32)
    l0, l1 = jnp.asarray(h0), jnp.asarray(h1)

    @jax.jit
    def check(s0, s1):
        # Device-side verification (a host fetch of 2x134MB would crawl
        # through the ~1MB/s tunnel): lexicographic non-decreasing + a
        # wraparound-sum permutation fingerprint per lane.
        asc = jnp.all(
            (s0[1:] > s0[:-1]) | ((s0[1:] == s0[:-1]) & (s1[1:] >= s1[:-1]))
        )
        return asc, jnp.sum(s0), jnp.sum(s1)

    in_sum0 = int(jax.device_get(jnp.sum(l0)))
    in_sum1 = int(jax.device_get(jnp.sum(l1)))

    for name in names:
        fn = VARIANTS[name]
        log(f"{name}: compiling...")
        t0 = time.perf_counter()
        try:
            out = fn(l0, l1)
            drain(out)
        except Exception as e:
            log(f"{name}: ERROR {e!r}")
            continue
        log(f"{name}: compile+first run {time.perf_counter() - t0:.1f}s")
        if name != "pass1":
            asc, s0, s1 = (int(x) for x in jax.device_get(check(*out)))
            ok = asc and s0 == in_sum0 and s1 == in_sum1
            log(f"{name}: correctness {'OK' if ok else 'WRONG'}")
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            drain(fn(l0, l1))
            times.append(time.perf_counter() - t0)
        best = min(times)
        log(
            f"{name}: best {best * 1e3:.1f}ms over {REPS} "
            f"({best / N * 1e9:.2f} ns/row, {[f'{t*1e3:.0f}' for t in times]})"
        )


if __name__ == "__main__":
    main()
