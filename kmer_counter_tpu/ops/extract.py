"""Windowed k-mer extraction — the TPU twin of the reference's extractKMers.

The reference kernel (GPUHandler.cu:129-233) walks each read serially,
tracking a run-length of valid bases and assembling each k-mer with
data-dependent funnel shifts over the packed words.  Neither serial walks
nor data-dependent shifts map to the TPU's vector unit, so the design here
is different:

  * Every window position of every read is computed unconditionally —
    static shapes, perfect vectorization; invalid windows are masked.
  * Each uint32 key lane (16 bases) is built as a sum of 16 *statically
    shifted slices* of the code matrix:
        lane_i(p) = sum_j codes[p + 16*i + j] << (30 - 2*j)
    which XLA fuses into pure VPU shift/add traffic — no gathers, no
    per-element control flow.
  * Window validity comes from an exclusive prefix sum over the invalid
    mask: window p is valid iff no invalid base in [p, p+k) — the vector
    form of the reference's valid-run counter (GPUHandler.cu:155-172).

Canonicalization (min(kmer, revcomp), a capability the reference lacks —
SURVEY.md §7.1) reuses the same machinery on the reverse-complemented code
matrix and takes a lanewise lexicographic min.
"""

from __future__ import annotations

import jax.numpy as jnp

from kmer_counter_tpu.records import BASES_PER_LANE, lanes_per_kmer


def _window_lanes(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """codes ``[R, L] uint32`` → per-window key lanes ``[NL, R, P] uint32``.

    P = L - k + 1 windows per read; NL = 2*ceil(k/32) lanes, MSB-first
    (lane 0 = bases 0..15 of the window in its top bits).  Tail bits past
    base k-1 are zero (the left-aligned layout of SURVEY.md §2.2).
    Lane-major layout keeps the large window axis minor, matching TPU
    tiling (a width-NL minor dim would be padded to 128 lanes).
    """
    R, L = codes.shape
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"line length {L} shorter than k={k}")
    NL = lanes_per_kmer(k)
    lanes = []
    for i in range(NL):
        base0 = i * BASES_PER_LANE
        n_bases = min(BASES_PER_LANE, k - base0)
        if n_bases <= 0:
            lanes.append(jnp.zeros((R, P), dtype=jnp.uint32))
            continue
        acc = jnp.zeros((R, P), dtype=jnp.uint32)
        for j in range(n_bases):
            off = base0 + j
            shift = 30 - 2 * j
            acc = acc + (codes[:, off : off + P] << jnp.uint32(shift))
        lanes.append(acc)
    return jnp.stack(lanes, axis=0)


def _window_valid(valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """valid ``[R, L] bool`` → window validity ``[R, P] bool``."""
    inv = (~valid).astype(jnp.int32)
    csum = jnp.cumsum(inv, axis=1)
    # invalid count in [p, p+k) = csum[p+k-1] - (csum[p-1] if p>0 else 0)
    hi = csum[:, k - 1 :]
    lo = jnp.pad(csum, ((0, 0), (1, 0)))[:, : hi.shape[1]]
    return (hi - lo) == 0


def _lex_min(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic min of two lane-major stacks ``[NL, ...]``."""
    NL = a.shape[0]
    a_lt = jnp.zeros(a.shape[1:], dtype=bool)
    for i in reversed(range(NL)):
        a_lt = jnp.where(a[i] == b[i], a_lt, a[i] < b[i])
    return jnp.where(a_lt[None], a, b)


def extract_kmer_lanes(
    codes: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    canonical: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract all k-mer windows of a chunk.

    Args:
      codes: ``[R, L] uint32`` 2-bit base codes (from ops.encode).
      valid: ``[R, L] bool`` per-base validity.
      k: k-mer length (1..128).
      canonical: if True keys are min(kmer, revcomp(kmer)).

    Returns:
      (lanes ``[NL, R, P] uint32``, window_valid ``[R, P] bool``) with
      P = L - k + 1.  k-mers never cross reads (one window set per row),
      matching the reference's per-read sections (GPUHandler.cu:438-439).
    """
    lanes = _window_lanes(codes, k)
    wvalid = _window_valid(valid, k)
    if canonical:
        # revcomp codes: complement (3 - c) and reverse the base axis.  The
        # window at position p in the original read corresponds to the
        # window at position P-1-p of the reverse-complemented read.
        rc_codes = (jnp.uint32(3) - codes)[:, ::-1]
        rc_lanes = _window_lanes(rc_codes, k)[:, :, ::-1]
        lanes = _lex_min(lanes, rc_lanes)
    return lanes, wvalid
