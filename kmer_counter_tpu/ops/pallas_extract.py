"""Pallas fused encode+extract kernel — the hot per-chunk op.

Fuses the whole per-chunk record producer (ops.encode + ops.extract —
the TPU redesign of the reference's bitEncode + extractKMers kernels,
GPUHandler.cu:10-233) into one VMEM-resident pass: ASCII reads stream
HBM→VMEM once, per-window key lanes and validity are computed entirely
on the VPU with static shifted-slice sums (no gathers, no materialized
intermediates), and records stream back to HBM once.

Output is **lane-major** ``[NL+1, R*P]`` — lane i of window (r, p) at
``[i, r*P + p]``, validity count (1/0) in the last row — which keeps the
minor dimension large and tile-aligned instead of a width-NL minor dim
that TPU tiling would pad to 128.

Falls back transparently to the XLA implementation (ops.extract) when
Pallas is unavailable for the current backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kmer_counter_tpu.records import BASES_PER_LANE, lanes_per_kmer


def _extract_kernel(reads_ref, out_ref, *, k: int, canonical: bool):
    """One grid block: [BR, L] uint8 reads -> [NL+1, BR, P] uint32 planes.

    Plane i < NL holds key lane i for every window; plane NL holds the
    validity count (1/0).  The flatten to [NL+1, R*P] happens outside the
    kernel (Mosaic cannot reshape non-tile-aligned vectors in VMEM).
    """
    BR, L = reads_ref.shape
    P = L - k + 1
    NL = lanes_per_kmer(k)

    # reads arrive pre-cast to int32: Mosaic rejects some sub-32-bit
    # (i8/i1) vector conversions, so all in-kernel compute is 32-bit.
    c = reads_ref[:]
    # case-fold, classify, encode (A=0,C=1,G=2,T=3; invalid -> 3 + masked)
    up = jnp.where((c >= ord("a")) & (c <= ord("z")), c - 32, c)
    is_a = up == ord("A")
    is_c = up == ord("C")
    is_g = up == ord("G")
    is_t = up == ord("T")
    valid = is_a | is_c | is_g | is_t
    codes = (
        jnp.where(is_c, 1, 0) + jnp.where(is_g, 2, 0) + jnp.where(is_t | ~valid, 3, 0)
    ).astype(jnp.uint32)
    inv = (~valid).astype(jnp.uint32)

    # window validity: OR of the k shifted invalid columns
    win_inv = jnp.zeros((BR, P), jnp.uint32)
    for j in range(k):
        win_inv = win_inv | inv[:, j : j + P]
    counts = jnp.uint32(1) - win_inv

    def lane_sums(base_slice):
        """base_slice(i, j) -> [BR, P] code plane for lane i, base j."""
        planes = []
        for i in range(NL):
            n_bases = min(BASES_PER_LANE, k - i * BASES_PER_LANE)
            if n_bases <= 0:
                planes.append(jnp.zeros((BR, P), jnp.uint32))
                continue
            acc = jnp.zeros((BR, P), jnp.uint32)
            for j in range(n_bases):
                acc = acc + (base_slice(i, j) << jnp.uint32(30 - 2 * j))
            planes.append(acc)
        return planes

    fwd = lane_sums(
        lambda i, j: codes[:, i * BASES_PER_LANE + j : i * BASES_PER_LANE + j + P]
    )
    if canonical:
        # revcomp lane i, base j reads complement(codes) at window offset
        # k-1-(16i+j); same static-slice machinery, no flips.
        rc = lane_sums(
            lambda i, j: (
                jnp.uint32(3)
                - codes[
                    :,
                    k - 1 - i * BASES_PER_LANE - j : k - 1 - i * BASES_PER_LANE - j + P,
                ]
            )
        )
        # lanewise lexicographic min (int32 0/1 mask: Mosaic rejects some
        # i1-vector materializations)
        rc_lt = jnp.zeros((BR, P), dtype=jnp.int32)
        for i in reversed(range(NL)):
            lt = jnp.where(rc[i] < fwd[i], 1, 0)
            rc_lt = jnp.where(rc[i] == fwd[i], rc_lt, lt)
        planes = [jnp.where(rc_lt == 1, rc[i], fwd[i]) for i in range(NL)]
    else:
        planes = fwd

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
    NL = lanes_per_kmer(k)
    if R % block_rows != 0:
        raise ValueError(f"R={R} not a multiple of block_rows={block_rows}")
    grid = (R // block_rows,)
    if interpret is None:
        # CPU (tests / virtual meshes) only supports interpreter mode.
        interpret = jax.default_backend() == "cpu"
    kernel = partial(_extract_kernel, k=k, canonical=canonical)
    reads = reads.astype(jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (NL + 1, block_rows, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NL + 1, R, P), jnp.uint32),
        interpret=interpret,
    )(reads)
    return out.reshape(NL + 1, R * P)
