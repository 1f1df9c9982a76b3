"""Prefix-routed all-to-all merge of per-device partial count tables.

This is the on-device replacement for the reference's entire external-memory
merge subsystem — the spill writer (FileDump.cpp:51-58), the background
merge scheduler (KMerFileMergeHandler.cpp:49-100), the linear-scan k-way
merger (KMerFileMerger.cpp:49-96) and the sorted-run reader
(SortedKMerFile.cpp:57-82).  Where the reference shuttles sorted runs
through the filesystem and merges them on host threads, every record here
makes exactly one ICI/DCN hop to the device that owns its key range, and
each owner collapses its range with one sort-reduce in HBM.

Routing function: ``owner(key) = (lane0>>16) * D >> 16`` — a monotonic
range partition by the key's leading 16 bits.  Monotonicity means device
d's range table is entirely smaller than device d+1's, so the global dump
is the per-device tables concatenated in mesh order, already sorted — the
property the reference's merge tree worked so hard for on disk.

All functions here run *inside* ``shard_map`` over the 1-D ``data`` mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kmer_counter_tpu.ops.sortcount import sort_reduce


def owner_of(lane0: jnp.ndarray, num_devices: int) -> jnp.ndarray:
    """Monotonic range-partition of the uint32 lead lane into D owners."""
    return ((lane0 >> jnp.uint32(16)).astype(jnp.int32) * num_devices) >> 16


def route_merge_local(
    lanes: jnp.ndarray,
    counts: jnp.ndarray,
    axis_name: str,
    num_devices: int,
    bucket_capacity: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exchange records so each device holds exactly its key range, merged.

    Args (per-device views inside shard_map):
      lanes: [C, NL] uint32 local partial table; rows with count 0 ignored.
      counts: [C] uint32.
      axis_name: mesh axis to exchange over.
      num_devices: size of that axis (static).
      bucket_capacity: per-destination slot budget (static).  Worst case is
        C (everything owned by one device); callers trade memory for skew
        tolerance — overflow is *detected*, never silent.

    Returns:
      (range_lanes [D*cap, NL], range_counts [D*cap], num_unique, overflow)
      where overflow > 0 means bucket_capacity was exceeded somewhere
      (global max) and the merge must be retried with more slack.
    """
    C, NL = lanes.shape
    D = num_devices
    cap = bucket_capacity

    valid = counts > 0
    owner = jnp.where(valid, owner_of(lanes[:, 0], D), D)  # D = dropped

    # Group records by destination: stable sort by owner keeps keys in
    # ascending order inside each bucket (owner is monotonic in the key, so
    # this is just the existing sort order — but partial tables arrive
    # already sorted, making this cheap for XLA's stable sort).
    ops = (owner, *(lanes[:, i] for i in range(NL)), counts)
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)
    s_owner = sorted_ops[0]
    s_lanes = jnp.stack(sorted_ops[1 : NL + 1], axis=-1)
    s_counts = sorted_ops[NL + 1]

    #

    # Per-destination slot index = rank within its owner run.
    idx = jnp.arange(C, dtype=jnp.int32)
    # start of each owner's run: searchsorted on the sorted owner array
    run_start = jnp.searchsorted(s_owner, jnp.arange(D + 1, dtype=jnp.int32))
    slot = idx - run_start[jnp.clip(s_owner, 0, D)]
    per_dest = run_start[1:] - run_start[:-1]  # records per destination
    overflow_local = jnp.maximum(jnp.max(per_dest) - cap, 0)

    # Scatter into [D, cap] send buckets (out-of-range slots dropped only
    # when overflow is flagged; the caller must check `overflow`).
    send_lanes = jnp.zeros((D, cap, NL), dtype=jnp.uint32)
    send_counts = jnp.zeros((D, cap), dtype=jnp.uint32)
    dest = jnp.where((s_owner < D) & (slot < cap), s_owner, D)
    send_lanes = send_lanes.at[dest, jnp.clip(slot, 0, cap - 1)].set(
        s_lanes, mode="drop"
    )
    send_counts = send_counts.at[dest, jnp.clip(slot, 0, cap - 1)].set(
        s_counts, mode="drop"
    )

    # One collective: bucket d goes to device d; we receive D buckets.
    recv_lanes = jax.lax.all_to_all(
        send_lanes, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    recv_counts = jax.lax.all_to_all(
        send_counts, axis_name, split_axis=0, concat_axis=0, tiled=False
    )

    # Collapse the received runs: one sort-reduce over D*cap records.
    flat_lanes = recv_lanes.reshape(D * cap, NL)
    flat_counts = recv_counts.reshape(D * cap)
    out_lanes, out_counts, num_unique = sort_reduce(flat_lanes, flat_counts)

    overflow = jax.lax.pmax(overflow_local, axis_name)
    return out_lanes, out_counts, num_unique, overflow
