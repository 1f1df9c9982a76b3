"""Round-4 groundwork: the bitonic HALF-merge stage schedule, validated.

Today's merge-path kernel (pallas_sort._merge_pair_fold_call) builds a
2w-element buffer [A-window sentinel-padded | B-window sentinel-padded]
and runs Batcher's odd-even merge: log2(2w)+1 = 17 stages on 2w elements,
then keeps the lowest w.  But merge-path guarantees la + lb = w exactly,
so the output tile IS the union of the two live windows — no selection
needed, only a SORT of w elements known to be [ascending | descending]:
a BITONIC sequence.  A bitonic merge needs log2(w) = 16 stages on a
w-element buffer — ~2.1x less VPU stage work (the kernels are VPU-bound:
probe4/ROADMAP round 3).

Plan for kernel integration (docs/ROADMAP.md):
  * store the sorted raw region DESCENDING (lax.sort the bit-flipped
    lanes; identify dead rows in flip-space BEFORE unflipping — in
    descending order dead rows are all-zeros, which collides with the
    real A^k key, so liveness must come from the flip-space sentinel);
  * _diag_splits_pair gathers B probes at reversed indices
    (b_asc[i] == b_desc[nb-1-i]); the consumed asc-range [b_start,b_end)
    is the desc-space row range [nb-b_end, nb-b_start) read FORWARD;
  * in-kernel: z = where(i < la, av_aligned, bv_shifted_by_la) — the
    dynamic shift by la (0..w) composes a dynamic row roll with the
    existing 0..127 lane shift; then the 16 stages below;
  * dead zero-key rows surface at the FRONT of the merged stream with
    count 0 (compact_live removes 0-count rows anywhere, and a dead run
    adjacent to a real key-0 run adds 0 to its total — harmless).

This file validates the stage schedule + the [asc|desc] construction at
the XLA level (the compare-exchange primitive is the same one the kernels
use, so the schedule transfers verbatim).

Run: JAX_PLATFORMS=cpu python docs/experiments_bitonic_half_merge.py
"""

import os

import jax

if __name__ == "__main__":
    # The ambient sitecustomize force-selects the remote TPU backend via
    # jax.config at import time; the env var alone is not enough.
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import jax.numpy as jnp
import numpy as np


def bitonic_merge_stages(ops, num_keys: int, w: int):
    """Sort a bitonic sequence of length w ascending: stages d = w/2..1,
    CE(j, j+d) for (j & d) == 0 — the schedule the kernel will run with
    pallas_sort._ce on (rows, 128) vregs.  Here expressed with the same
    compare semantics on flat arrays for validation."""
    i = jnp.arange(w, dtype=jnp.int32)
    d = w // 2
    while d >= 1:
        lower = (i & d) == 0
        partner_dn = [jnp.roll(v, -d) for v in ops]
        partner_up = [jnp.roll(v, d) for v in ops]
        partners = [
            jnp.where(lower, dn, up) for dn, up in zip(partner_dn, partner_up)
        ]
        lt = jnp.zeros(w, dtype=bool)
        gt = jnp.zeros(w, dtype=bool)
        for kk in reversed(range(num_keys)):
            eq = ops[kk] == partners[kk]
            lt = (eq & lt) | (~eq & (ops[kk] < partners[kk]))
            gt = (eq & gt) | (~eq & (ops[kk] > partners[kk]))
        take = (lower & gt) | (~lower & lt)
        ops = [jnp.where(take, p, v) for v, p in zip(ops, partners)]
        d //= 2
    return ops


def check(rng, w, num_keys, la, vmax=2**32, dup_heavy=False):
    hi = 64 if dup_heavy else vmax
    a = [
        np.sort(rng.integers(0, hi, la, np.uint64).astype(np.uint32))
        for _ in range(1)
    ]
    # multi-key: sort jointly
    acols = [rng.integers(0, hi, la, np.uint64).astype(np.uint32) for _ in range(num_keys)]
    order = np.lexsort(tuple(reversed(acols)))
    acols = [c[order] for c in acols]
    bcols = [rng.integers(0, hi, w - la, np.uint64).astype(np.uint32) for _ in range(num_keys)]
    order = np.lexsort(tuple(reversed(bcols)))
    bcols = [c[order][::-1].copy() for c in bcols]  # descending
    ap = rng.integers(0, vmax, la, np.uint64).astype(np.uint32)[order[:la] % la] if False else rng.integers(0, vmax, la, np.uint64).astype(np.uint32)
    bp = rng.integers(0, vmax, w - la, np.uint64).astype(np.uint32)
    z = [np.concatenate([ac, bc]) for ac, bc in zip(acols, bcols)]
    zp = np.concatenate([ap, bp])
    got = bitonic_merge_stages(
        [jnp.asarray(c) for c in z] + [jnp.asarray(zp)], num_keys, w
    )
    want = jax.lax.sort(
        tuple(jnp.asarray(c) for c in z) + (jnp.asarray(zp),),
        dimension=0,
        num_keys=num_keys,
    )
    for kk in range(num_keys):
        assert np.array_equal(np.asarray(got[kk]), np.asarray(want[kk])), (
            w, num_keys, la, kk,
        )
    # payload multiset per key
    gk = np.stack([np.asarray(got[i]) for i in range(num_keys + 1)], 1)
    wk = np.stack([np.asarray(want[i]) for i in range(num_keys + 1)], 1)
    assert np.array_equal(gk[np.lexsort(gk.T[::-1])], wk[np.lexsort(wk.T[::-1])])


def main():
    rng = np.random.default_rng(0)
    for w in (1024, 65536):
        for num_keys in (1, 2):
            for la_frac in (0.0, 0.25, 0.5, 0.93, 1.0):
                la = int(w * la_frac)
                check(rng, w, num_keys, la)
                check(rng, w, num_keys, la, dup_heavy=True)
    print("bitonic half-merge schedule: all cases match lax.sort")


if __name__ == "__main__":
    main()
