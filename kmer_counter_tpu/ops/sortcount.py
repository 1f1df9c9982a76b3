"""Sort + segment-reduce counting — the design the reference left dormant.

The reference's active path copies every extracted k-mer back to the host
and inserts it into a TBB concurrent hash map (KMerCounter.cpp:51-89); its
*intended* design — a Thrust device sort followed by an adjacent-duplicate
reduce — exists but is commented out (GPUHandler.cu:300-327 sortKmers,
:340-360 reduceKMers, call site :456-458).  Hash insertion does not
translate to TPU (data-dependent scatter chains), but sort-count is a
natural fit: ``jax.lax.sort`` does a multi-operand lexicographic sort over
the uint32 key lanes, and the duplicate-collapse becomes a vectorized
boundary-mask + segment-sum with fully static shapes.

Empty/invalid slots are carried as count==0 and sink to the end of the sort
via a leading "invalid" key operand, so one primitive handles both raw
window streams (counts ∈ {0,1}) and accumulated partial tables (arbitrary
counts) — which makes table consolidation (ops.table) the same op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_reduce(
    lanes: jnp.ndarray, counts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Collapse duplicate keys by sorting and summing counts.

    Args:
      lanes: ``[N, NL] uint32`` key lanes; rows with count 0 are ignored.
      counts: ``[N] uint32`` per-row counts (0 = empty slot).

    Returns:
      (unique_lanes ``[N, NL]``, unique_counts ``[N]``, num_unique scalar):
      distinct keys sorted ascending in rows [0, num_unique), zero-filled
      rows with count 0 after that.
    """
    N, NL = lanes.shape
    valid = counts > 0
    invalid_key = (~valid).astype(jnp.uint32)
    operands = (
        invalid_key,
        *(lanes[:, i] for i in range(NL)),
        counts.astype(jnp.uint32),
    )
    sorted_ops = jax.lax.sort(operands, dimension=0, num_keys=NL + 1)
    s_lanes = jnp.stack(sorted_ops[1 : NL + 1], axis=-1)
    s_counts = sorted_ops[NL + 1]
    s_valid = sorted_ops[0] == 0

    # Boundary mask: first row of each run of equal keys (valid rows only).
    prev_differs = jnp.any(s_lanes[1:] != s_lanes[:-1], axis=-1)
    boundary = jnp.concatenate([jnp.ones((1,), dtype=bool), prev_differs])
    boundary = boundary & s_valid

    seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # -1 for leading invalids
    num_unique = seg[-1] + 1 if N > 0 else jnp.int32(0)
    num_unique = jnp.maximum(num_unique, 0).astype(jnp.int32)

    seg_ids = jnp.where(s_valid, seg, N)  # invalids dropped (out of bounds)
    unique_counts = (
        jnp.zeros((N,), dtype=jnp.uint32)
        .at[seg_ids]
        .add(s_counts, mode="drop")
    )
    unique_lanes = (
        jnp.zeros((N, NL), dtype=jnp.uint32)
        .at[jnp.where(boundary, seg, N)]
        .set(s_lanes, mode="drop")
    )
    return unique_lanes, unique_counts, num_unique
