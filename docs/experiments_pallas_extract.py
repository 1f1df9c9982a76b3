"""Pallas fused encode+extract kernel — a MEASURED DEAD END, kept as an
experiment (not on any production path).

On-chip: 3.6ms/chunk vs XLA's 3.2ms for ops.encode+ops.extract
(BASELINE.md round 1) — XLA is already at speed-of-light for this op, so
the production pipeline uses the pure-XLA extract.  Preserved because the
kernel documents working Mosaic patterns (log-tree pack in-kernel,
int32-only predicates) and the negative result that extraction is not
the bottleneck.

Original header:
Pallas fused encode+extract kernel — the hot per-chunk op.

Fuses the whole per-chunk record producer (ops.encode + ops.extract —
the TPU redesign of the reference's bitEncode + extractKMers kernels,
GPUHandler.cu:10-233) into one VMEM-resident pass: ASCII reads stream
HBM→VMEM once, per-window key lanes and validity are computed entirely
on the VPU, and records stream back to HBM once.

Uses the same log-tree pack as ops.extract (4 shift-or passes produce
every 16-base group at every offset) and derives reverse-complement lanes
from the same tree via the 2-bit-group bit-reversal — so even the
canonical kernel is only ~25 vector passes, keeping Mosaic compile times
sane (a naive 16-adds-per-lane unroll did not terminate).

Output is **lane-major** ``[NL+1, R, P]`` planes (flattened to
``[NL+1, R*P]`` by the wrapper); plane NL is the validity count (1/0).

Mosaic constraints honored here: all in-kernel compute is 32-bit (the
wrapper pre-casts reads to int32 and pre-pads 15 columns so the kernel
needs no pad/reshape), and predicates use int32 0/1 masks (some i1/i8
vector conversions fail to lower).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kmer_counter_tpu.records import BASES_PER_LANE, active_lanes

_PAD = BASES_PER_LANE - 1


def _rev_groups(v):
    m1 = jnp.uint32(0x33333333)
    m2 = jnp.uint32(0x0F0F0F0F)
    m3 = jnp.uint32(0x00FF00FF)
    v = ((v & m1) << 2) | ((v >> 2) & m1)
    v = ((v & m2) << 4) | ((v >> 4) & m2)
    v = ((v & m3) << 8) | ((v >> 8) & m3)
    return (v << 16) | (v >> 16)


def _extract_kernel(reads_ref, out_ref, *, k: int, canonical: bool, L: int):
    """One grid block: [BR, L+15] int32 padded reads -> [NL+1, BR, P]."""
    P = L - k + 1
    NL = active_lanes(k)

    c = reads_ref[:]
    up = jnp.where((c >= ord("a")) & (c <= ord("z")), c - 32, c)
    is_a = up == ord("A")
    is_c = up == ord("C")
    is_g = up == ord("G")
    is_t = up == ord("T")
    # int32 0/1 validity; codes as uint32
    valid_i = (
        jnp.where(is_a, 1, 0)
        + jnp.where(is_c, 1, 0)
        + jnp.where(is_g, 1, 0)
        + jnp.where(is_t, 1, 0)
    )
    codes = jnp.where(
        is_c, jnp.uint32(1), jnp.uint32(0)
    ) | jnp.where(is_g, jnp.uint32(2), jnp.uint32(0)) | jnp.where(
        valid_i == 0, jnp.uint32(3), jnp.uint32(0)
    ) | jnp.where(
        is_t, jnp.uint32(3), jnp.uint32(0)
    )

    # log-tree pack: A[:, p] = bases p..p+15 MSB-first (padding is zeros).
    A = codes
    for m in range(4):
        sh = 1 << m
        A = (A[:, : A.shape[1] - sh] << jnp.uint32(2 * sh)) | A[:, sh:]

    def fwd_lane(i):
        base0 = i * BASES_PER_LANE
        n = min(BASES_PER_LANE, k - base0)
        v = A[:, base0 : base0 + P]
        if n < BASES_PER_LANE:
            drop = jnp.uint32(2 * (BASES_PER_LANE - n))
            v = (v >> drop) << drop
        return v

    def rc_lane(i):
        n = min(BASES_PER_LANE, k - i * BASES_PER_LANE)
        if n == BASES_PER_LANE:
            off = k - BASES_PER_LANE * (i + 1)
            return _rev_groups(~A[:, off : off + P])
        return _rev_groups(~A[:, 0:P]) << jnp.uint32(2 * (BASES_PER_LANE - n))

    fwd = [fwd_lane(i) for i in range(NL)]
    if canonical:
        rc = [rc_lane(i) for i in range(NL)]
        rc_lt = jnp.zeros(fwd[0].shape, dtype=jnp.int32)
        for i in reversed(range(NL)):
            lt = jnp.where(rc[i] < fwd[i], 1, 0)
            rc_lt = jnp.where(rc[i] == fwd[i], rc_lt, lt)
        planes = [jnp.where(rc_lt == 1, rc[i], fwd[i]) for i in range(NL)]
    else:
        planes = fwd

    # sliding-window validity via log-doubling OR over the invalid mask
    inv = jnp.where(valid_i == 0, 1, 0)[:, :L]
    covered = 1
    cur = inv
    while covered < k:
        step = min(covered, k - covered)
        cur = cur[:, : cur.shape[1] - step] | cur[:, step:]
        covered += step
    counts = (1 - cur[:, :P]).astype(jnp.uint32)

    for i in range(NL):
        out_ref[i] = planes[i]
    out_ref[NL] = counts


@partial(jax.jit, static_argnames=("k", "canonical", "block_rows", "interpret"))
def extract_chunk_lanes_major(
    reads: jnp.ndarray,
    k: int,
    canonical: bool = False,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas fused extract: [R, L] uint8 -> [NL+1, R*P] uint32 records.

    Row NL is the count row (1 valid / 0 masked).  R must be a multiple of
    block_rows (callers pad; padded rows are all-invalid and masked).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = reads.shape
    P = L - k + 1
    NL = active_lanes(k)
    if R % block_rows != 0:
        raise ValueError(f"R={R} not a multiple of block_rows={block_rows}")
    grid = (R // block_rows,)
    if interpret is None:
        # CPU (tests / virtual meshes) only supports interpreter mode.
        interpret = jax.default_backend() == "cpu"
    kernel = partial(_extract_kernel, k=k, canonical=canonical, L=L)
    padded = jnp.pad(reads.astype(jnp.int32), ((0, 0), (0, _PAD)))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, L + _PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (NL + 1, block_rows, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NL + 1, R, P), jnp.uint32),
        interpret=interpret,
    )(padded)
    return out.reshape(NL + 1, R * P)
