"""Sharded count pipeline: data-parallel counting + prefix-routed merge.

The multi-chip generalization of the single-device engine loop: reads are
row-sharded over the mesh's ``data`` axis, each device runs the same
encode→extract→sort-count step on its rows and appends into its own HBM
table shard, and the finalize step routes every record to its key-range
owner with one all_to_all (parallel.shuffle) — the reference's disk merge
tree (SURVEY.md §3.3) collapsed into a single collective.

All steps are jitted ``shard_map`` programs over a ``jax.sharding.Mesh``,
so the same code drives 1 chip, 1 host with N chips, or an N-host slice
(where jax.distributed makes the mesh span processes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from kmer_counter_tpu.ops.encode import encode_reads
from kmer_counter_tpu.ops.extract import extract_kmer_lanes
from kmer_counter_tpu.ops.sortcount import sort_reduce
from kmer_counter_tpu.parallel.mesh import DATA_AXIS
from kmer_counter_tpu.parallel.shuffle import route_merge_local


class ShardedCounter:
    """Device-sharded count table with a chunked update step.

    Host-facing contract mirrors ops.table: the host tracks a worst-case
    per-device offset bound and calls consolidate()/finalize() at the right
    times; only those calls synchronize (one small transfer each).
    """

    def __init__(
        self,
        mesh,
        k: int,
        canonical: bool,
        table_slots: int,
        reads_per_device: int,
        line_length: int,
        merge_slack: float = 4.0,
    ):
        self.mesh = mesh
        self.k = k
        self.canonical = canonical
        self.D = mesh.devices.size
        self.table_slots = table_slots  # per device
        self.reads_per_device = reads_per_device
        self.line_length = line_length
        self._merge_slack = merge_slack
        self.chunk_slots = reads_per_device * (line_length - k + 1)
        if self.chunk_slots <= 0:
            raise ValueError("line_length shorter than k")
        if self.chunk_slots > table_slots:
            raise ValueError("per-device chunk exceeds table capacity")
        from kmer_counter_tpu.records import active_lanes

        self.NL = active_lanes(k)
        # Per-destination bucket capacity for the merge all_to_all.
        self.bucket_cap = int(min(table_slots, table_slots * merge_slack / self.D))

        # Record arrays are lane-major [NL, slots]; the slot axis is the
        # sharded one.  Zeros are created *on device* with the target
        # sharding (host device_put cannot populate non-addressable shards
        # on a multi-process mesh).
        self._lanes_spec = P(None, DATA_AXIS)

        def zeros(shape, dtype, spec):
            return jax.jit(
                lambda: jnp.zeros(shape, dtype),
                out_shardings=NamedSharding(mesh, spec),
            )()

        self.lanes = zeros((self.NL, self.D * table_slots), jnp.uint32, self._lanes_spec)
        self.counts = zeros((self.D * table_slots,), jnp.uint32, P(DATA_AXIS))
        self.offsets = zeros((self.D,), jnp.int32, P(DATA_AXIS))
        self.host_bound = 0  # worst-case per-device offset

        self._step = self._build_step()
        self._consolidate = self._build_consolidate()
        self._finalize = self._build_finalize()

    # ---- jitted programs -------------------------------------------------

    def _build_step(self):
        k, canonical = self.k, self.canonical
        mesh = self.mesh

        def local_step(lanes, counts, offset, reads):
            # Raw extract + append — no per-chunk sort; duplicate-collapse
            # happens in the amortized consolidation (see ops.pipeline
            # extract_chunk for the rationale).
            codes, valid = encode_reads(reads)
            win_lanes, win_valid = extract_kmer_lanes(codes, valid, k, canonical)
            NL, R, Pw = win_lanes.shape
            c_lanes = win_lanes.reshape(NL, R * Pw)
            c_counts = win_valid.reshape(R * Pw).astype(jnp.uint32)
            lanes = jax.lax.dynamic_update_slice(
                lanes, c_lanes, (jnp.int32(0), offset[0])
            )
            counts = jax.lax.dynamic_update_slice(counts, c_counts, (offset[0],))
            return lanes, counts, offset + jnp.int32(R * Pw)

        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                P(None, DATA_AXIS),
                P(DATA_AXIS),
                P(DATA_AXIS),
                P(DATA_AXIS),
            ),
            out_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        )
        return jax.jit(fn, donate_argnums=(0, 1, 2))

    def _build_consolidate(self):
        def local_consolidate(lanes, counts, offset):
            del offset
            out_lanes, out_counts, num_unique = sort_reduce(lanes, counts)
            return out_lanes, out_counts, num_unique[None].astype(jnp.int32)

        fn = shard_map(
            local_consolidate,
            mesh=self.mesh,
            in_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        )
        return jax.jit(fn, donate_argnums=(0, 1, 2))

    def _build_finalize(self):
        D, cap = self.D, self.bucket_cap

        def local_finalize(lanes, counts, offset):
            del offset
            # Local collapse first: shrinks the routed volume.
            l, c, _ = sort_reduce(lanes, counts)
            out_lanes, out_counts, num_unique, overflow = route_merge_local(
                l, c, DATA_AXIS, D, cap
            )
            return (
                out_lanes,
                out_counts,
                num_unique[None].astype(jnp.int32),
                overflow[None].astype(jnp.int32),
            )

        fn = shard_map(
            local_finalize,
            mesh=self.mesh,
            in_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(
                P(None, DATA_AXIS),
                P(DATA_AXIS),
                P(DATA_AXIS),
                P(DATA_AXIS),
            ),
        )
        return jax.jit(fn)

    # ---- host-facing API -------------------------------------------------

    def step(self, reads: np.ndarray):
        """Process one global chunk of shape [D*reads_per_device, L]."""
        if self.host_bound + self.chunk_slots > self.table_slots:
            self.consolidate()
            if self.host_bound + self.chunk_slots > self.table_slots:
                # Cardinality outgrew the plan: double capacity (rare; the
                # reference's equivalent pressure valve was spilling sorted
                # runs to disk, SURVEY.md §3.3).
                new_slots = self.table_slots
                while self.host_bound + self.chunk_slots > new_slots:
                    new_slots *= 2
                self._grow(new_slots)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        if jax.process_count() > 1:
            # Each process passes only its devices' rows; the global array
            # is assembled block-per-process (the step is a collective that
            # every process must enter in lockstep).
            global_shape = (
                reads.shape[0] * jax.process_count(),
                reads.shape[1],
            )
            dev_reads = jax.make_array_from_process_local_data(
                sharding, reads, global_shape
            )
        else:
            dev_reads = jax.device_put(reads, sharding)
        self.lanes, self.counts, self.offsets = self._step(
            self.lanes, self.counts, self.offsets, dev_reads
        )
        self.host_bound += self.chunk_slots

    def _grow(self, new_slots: int):
        """Host-side capacity doubling of every table shard (rare)."""
        if jax.process_count() > 1:
            raise MemoryError(
                "table shard full on a multi-process mesh: raise tableSlots "
                "/ gpuMemoryLimit (dynamic growth is single-process only)"
            )
        old = self.table_slots
        lanes = np.asarray(jax.device_get(self.lanes)).reshape(
            self.NL, self.D, old
        )
        counts = np.asarray(jax.device_get(self.counts)).reshape(self.D, old)
        new_lanes = np.zeros((self.NL, self.D, new_slots), np.uint32)
        new_counts = np.zeros((self.D, new_slots), np.uint32)
        new_lanes[:, :, :old] = lanes
        new_counts[:, :old] = counts
        self.lanes = jax.device_put(
            new_lanes.reshape(self.NL, self.D * new_slots),
            NamedSharding(self.mesh, self._lanes_spec),
        )
        self.counts = jax.device_put(
            new_counts.reshape(self.D * new_slots),
            NamedSharding(self.mesh, P(DATA_AXIS)),
        )
        self.table_slots = new_slots
        self.bucket_cap = int(
            min(new_slots, new_slots * self._merge_slack / self.D)
        )
        # Shapes changed: rebuild the jitted programs.
        self._step = self._build_step()
        self._consolidate = self._build_consolidate()
        self._finalize = self._build_finalize()

    def consolidate(self):
        self.lanes, self.counts, self.offsets = self._consolidate(
            self.lanes, self.counts, self.offsets
        )
        # The post-consolidation bound must be identical on every process
        # (it gates the next collective), so take the global max.
        local = max(
            int(np.asarray(s.data)[0]) for s in self.offsets.addressable_shards
        )
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            local = int(
                np.max(
                    multihost_utils.process_allgather(np.array([local], np.int32))
                )
            )
        self.host_bound = local

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """Merge across devices; returns (sorted keys [U, NL] row-major,
        counts [U]) — host layout, ready for records.lanes_to_words.

        The result is globally sorted because the routing is monotonic in
        the key and devices are concatenated in mesh order.
        """
        lanes, counts, nuniq, overflow = self._finalize(
            self.lanes, self.counts, self.offsets
        )
        overflow = int(np.max(jax.device_get(overflow)))
        if overflow > 0:
            raise MemoryError(
                f"merge bucket overflow by {overflow} records: key-space "
                "skew exceeded merge_slack; retry with higher slack"
            )
        nuniq = np.asarray(jax.device_get(nuniq))
        lanes = np.asarray(jax.device_get(lanes))  # [NL, D * block]
        counts = np.asarray(jax.device_get(counts))
        block = self.D * self.bucket_cap
        parts_l, parts_c = [], []
        for d in range(self.D):
            u = int(nuniq[d])
            parts_l.append(lanes[:, d * block : d * block + u].T)
            parts_c.append(counts[d * block : d * block + u])
        return np.concatenate(parts_l), np.concatenate(parts_c)

    def finalize_local(self) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """Multi-host variant of finalize(): merge across the mesh, then
        return only this process's addressable range tables as
        (mesh_position, keys [U, NL] row-major, counts [U]) tuples.

        Each host writes its own ranges (the engine names them by mesh
        position); concatenating all parts in mesh-position order yields
        exactly the globally sorted table, with no cross-host gather.
        """
        lanes, counts, nuniq, overflow = self._finalize(
            self.lanes, self.counts, self.offsets
        )
        block = self.D * self.bucket_cap
        for shard in overflow.addressable_shards:
            if int(np.asarray(shard.data)[0]) > 0:
                raise MemoryError("merge bucket overflow; raise merge_slack")
        nuniq_by_pos = {}
        for shard in nuniq.addressable_shards:
            pos = shard.index[0].start or 0
            nuniq_by_pos[pos] = int(np.asarray(shard.data)[0])
        counts_by_pos = {
            (s.index[0].start or 0) // block: np.asarray(s.data)
            for s in counts.addressable_shards
        }
        lanes_by_pos = {
            (s.index[1].start or 0) // block: np.asarray(s.data)
            for s in lanes.addressable_shards
        }
        out = []
        for pos in sorted(counts_by_pos):
            u = nuniq_by_pos[pos]
            out.append(
                (pos, lanes_by_pos[pos][:, :u].T, counts_by_pos[pos][:u])
            )
        return out
