"""Multi-operand u32 sort in Pallas: Batcher odd-even networks on VMEM
tiles + merge-path passes over HBM.

Why not ``jax.lax.sort``: XLA's TPU sort moves ~230M records/s at table
sizes (measured, docs/experiments_r2_timing.py) — ~150 GB/s effective
against ~800 GB/s HBM — and it re-runs its full network regardless of
input structure.  This sort is built from one primitive, the vectorized
compare-exchange at flattened distance d (VPU ``pltpu.roll`` shifts +
selects, no scatters/gathers), arranged as:

  * **Leaf pass** (static blocks): Batcher odd-even *mergesort* of each
    TILE-element block entirely in VMEM — 136 compare-exchange stages for
    TILE=64K, all on (512,128) vregs.
  * **Merge passes** (log2(N/TILE) of them): pairs of sorted runs merge
    via *merge-path*: the output is cut into W-element tiles; an XLA-side
    vectorized binary search (tiny — one (n_tiles,) gather per step) finds
    each tile's run split; the kernel DMAs the two windows at dynamic
    element offsets (PrefetchScalarGridSpec), aligns them with VPU rolls,
    sentinel-masks dead slack, and runs a Batcher odd-even *merge*
    (log2(2W)+1 = 18 stages) in VMEM.  One read + one write of the data
    per pass — the HBM-optimal merge schedule.

The comparator is lexicographic over the first ``num_keys`` operands
(unsigned, lane 0 most significant — the record key order of
ops.sortcount); remaining operands ride as payload.  Ties keep both
elements in place (each side "keeps self" unless strictly ordered), so
equal-key payloads are never duplicated or lost; like ``jax.lax.sort``
with ``is_stable=False``, the order *among* equal keys is unspecified.

This replaces the reference's Thrust device sort (GPUHandler.cu:300-327,
its dormant sortKmers path) — same role, TPU-native network.

Design constraints honored (docs/experiments_mosaic_caps.py): 32-bit
compute only, no ``rev``/``minui`` (compare+select), ``pltpu.roll``
on both axes, tile-preserving shapes, dynamic-offset DMA from HBM with
scalar prefetch.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# np scalar, not jnp: a jnp scalar is a committed device array, which a
# Pallas kernel closure may not capture ("captures constants" trace error).
SENTINEL = np.uint32(0xFFFFFFFF)

# Elements per leaf tile / merge output tile.  512 rows x 128 lanes.
TILE = 65536
_LANES = 128


def _merge_prefetch_ok(n_ops: int, w: int) -> bool:
    """Window-prefetch gate for the merge kernels.  The second window-
    buffer set fits scoped VMEM for narrow records at the full 64K tile
    (wide records OOM there: 16.85M vs the 16M budget measured at 5
    operands, round 4), and for ANY operand count at a halved-or-smaller
    tile — the merge intermediates shrink with the tile, so the second
    window set fits again: the 8-operand x 32K kernel compiled and ran
    on-chip with prefetch, 45.3ms vs 50.4ms serialized (-10.1%) at the
    k=101 production shape (round 5, same-session A/B).
    KMER_TPU_MERGE_PREFETCH=0 forces the serialized single-buffer form."""
    if _os.environ.get("KMER_TPU_MERGE_PREFETCH", "1") != "1":
        return False
    return n_ops <= 3 or w <= TILE // 2


def _rows(n: int) -> int:
    assert n % _LANES == 0
    return n // _LANES


def _sds(shape, like):
    """uint32 ShapeDtypeStruct for a pallas_call out_shape, inheriting the
    varying-mesh-axes set of ``like``: JAX >= 0.9 requires an explicit
    ``vma`` when the kernel is traced inside shard_map with check_vma
    (every kernel here is per-device data, so outputs vary exactly like
    the inputs).  Outside shard_map, vma is the empty set and the plain
    struct is equivalent."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.uint32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


def _flat_iota(shape):
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    l = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return r * _LANES + l


def _partner_down(v, d: int):
    """partner[i] = v[i + d] on the flattened (rows, 128) index (circular
    garbage at the tail — callers' pair masks never select it)."""
    rows = v.shape[0]
    r, dl = divmod(d, _LANES)
    if dl == 0:
        return pltpu.roll(v, rows - r, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    u = pltpu.roll(v, _LANES - dl, 1)
    u_next = pltpu.roll(u, rows - r - 1, 0)
    if r:
        u = pltpu.roll(u, rows - r, 0)
    return jnp.where(lane < _LANES - dl, u, u_next)


def _partner_up(v, d: int):
    """partner[i] = v[i - d] (circular garbage at the head)."""
    rows = v.shape[0]
    r, dl = divmod(d, _LANES)
    if dl == 0:
        return pltpu.roll(v, r, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    u = pltpu.roll(v, dl, 1)
    u_prev = pltpu.roll(u, r + 1, 0)
    if r:
        u = pltpu.roll(u, r, 0)
    return jnp.where(lane >= dl, u, u_prev)


def _ce(ops: list, num_keys: int, d: int, lower, upper):
    """Vectorized compare-exchange at flattened distance d over multiple
    operands.  ``lower``/``upper`` mark the lower/upper element of each
    pair (disjoint; everything else passes through).  Ascending; ties
    keep self on both sides, so payloads move iff keys strictly order."""
    downs = [_partner_down(v, d) for v in ops]
    ups = [_partner_up(v, d) for v in ops]
    partners = [
        jnp.where(lower, dn, jnp.where(upper, up, v))
        for v, dn, up in zip(ops, downs, ups)
    ]
    # Lexicographic strict compares folded from the least significant key.
    # Boolean algebra only: a where() whose *values* are bools crashes the
    # Mosaic compiler (docs/experiments_mosaic_caps.py).
    lt = jnp.zeros(ops[0].shape, dtype=jnp.bool_)
    gt = jnp.zeros(ops[0].shape, dtype=jnp.bool_)
    for i in reversed(range(num_keys)):
        eq = ops[i] == partners[i]
        lt = (eq & lt) | (~eq & (ops[i] < partners[i]))
        gt = (eq & gt) | (~eq & (ops[i] > partners[i]))
    # Ties keep self on both sides (payloads never duplicated/lost).
    take_partner = (lower & gt) | (upper & lt)
    return [jnp.where(take_partner, p, v) for v, p in zip(ops, partners)]


def _odd_even_merge_stages(ops: list, num_keys: int, half: int, i):
    """Batcher odd-even merge of adjacent sorted ``half``-element runs
    within blocks of ``2*half`` (applied blockwise across the whole
    (rows,128) buffer — the buffer length is always a multiple of
    ``2*half``).  ``half`` is a power of two; ``i`` is the flat iota."""
    block = 2 * half
    j = i & (block - 1)  # block-local index (block is a power of two)
    # stage 1: pairs (j, j + half) for j < half — always within the block
    lower = (j & half) == 0
    ops = _ce(ops, num_keys, half, lower, ~lower)
    d = half // 2
    while d >= 1:
        # Batcher: CE(j, j+d) for j in [d, block-d) with the d bit set;
        # the matching upper side has the d bit clear and j >= d.
        lower = ((j & d) == d) & (j + d < block)
        upper = ((j & d) == 0) & (j >= d)
        ops = _ce(ops, num_keys, d, lower, upper)
        d //= 2
    return ops


def _bitonic_merge_stages(ops: list, num_keys: int, w: int, i):
    """Sort a BITONIC w-element sequence ascending: stages d = w/2 .. 1,
    CE(j, j^d) with the d-bit-clear side as lower — log2(w) stages on a
    w buffer versus Batcher's log2(2w)+1 on a 2w buffer (the half-merge
    schedule validated in docs/experiments_bitonic_half_merge.py)."""
    d = w // 2
    while d >= 1:
        lower = (i & d) == 0
        ops = _ce(ops, num_keys, d, lower, ~lower)
        d //= 2
    return ops


def _leaf_sort_body(ops: list, num_keys: int, tile: int):
    """Odd-even mergesort of every tile-element block of the buffer."""
    i = _flat_iota(ops[0].shape)
    half = 1
    while half < tile:
        ops = _odd_even_merge_stages(ops, num_keys, half, i)
        half *= 2
    return ops


# ---------------------------------------------------------------------------
# Leaf pass: sort every TILE-element block in VMEM (static grid blocks).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("num_keys", "tile", "interpret")
)
def leaf_sort(operands, num_keys: int, tile: int = TILE, interpret: bool = False):
    """Sort each tile-element block of 1D u32 arrays (length multiple of
    tile) independently, lexicographically over the first num_keys."""
    n_ops = len(operands)
    n = operands[0].shape[0]
    assert n % tile == 0, (n, tile)
    tr = _rows(tile)

    def kernel(*refs):
        ins, outs = refs[:n_ops], refs[n_ops:]
        ops = [r[:] for r in ins]
        ops = _leaf_sort_body(ops, num_keys, tile)
        for o_ref, v in zip(outs, ops):
            o_ref[:] = v

    grid = (n // tile,)
    spec = pl.BlockSpec((tr, _LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * n_ops,
        out_specs=[spec] * n_ops,
        out_shape=[
            _sds((n // _LANES, _LANES), operands[0]) for _ in range(n_ops)
        ],
        interpret=interpret,
    )(*[v.reshape(n // _LANES, _LANES) for v in operands])
    return tuple(v.reshape(n) for v in out)


# ---------------------------------------------------------------------------
# Merge pass: merge adjacent sorted runs of length L into 2L runs.
# ---------------------------------------------------------------------------


def _lex_le_gathered(a_ops, b_ops, num_keys):
    """Lexicographic a <= b over gathered key vectors."""
    lt = jnp.zeros(a_ops[0].shape, dtype=jnp.bool_)
    gt = jnp.zeros(a_ops[0].shape, dtype=jnp.bool_)
    for i in reversed(range(num_keys)):
        eq = a_ops[i] == b_ops[i]
        lt = jnp.where(eq, lt, a_ops[i] < b_ops[i])
        gt = jnp.where(eq, gt, a_ops[i] > b_ops[i])
    return ~gt


def _diag_splits(operands, num_keys: int, run: int, w: int, n: int):
    """Merge-path splits: for each W-element output tile, the absolute
    element ranges consumed from its pair's A and B runs.

    Pure XLA, vectorized over tiles; the only data access is one
    (n_tiles,)-sized gather per binary-search step — micro-scale compared
    to the pass itself.  Ties split toward A (A's equal keys are consumed
    first), making the windows deterministic.

    Returns int32 arrays (a_start, a_end, b_start, b_end), absolute.
    """
    n_tiles = n // w
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    pair = (t * w) // (2 * run)
    d0 = t * w - pair * (2 * run)  # output offset within the pair
    a_base = pair * (2 * run)
    b_base = jnp.minimum(a_base + run, n)
    len_a = jnp.clip(n - a_base, 0, run)
    len_b = jnp.clip(n - b_base, 0, run)

    lo = jnp.maximum(0, d0 - len_b)
    hi = jnp.minimum(d0, len_a)

    def gather_keys(base, idx):
        flat = base + idx
        return [jnp.take(operands[i], flat, mode="clip") for i in range(num_keys)]

    steps = max(1, int(np.ceil(np.log2(max(run, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi + 1) // 2
        # split "a = mid" valid iff A[mid-1] <= B[d0-mid]  (ties -> A first)
        ak = gather_keys(a_base, jnp.maximum(mid - 1, 0))
        bk = gather_keys(b_base, jnp.minimum(d0 - mid, jnp.maximum(len_b - 1, 0)))
        a_le_b = _lex_le_gathered(ak, bk, num_keys)
        ok = (mid <= lo) | (d0 - mid >= len_b) | a_le_b
        # mid == 0 is always valid; d0-mid beyond B means B exhausted.
        ok = ok & (mid >= lo)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)

    a_split = lo
    # Absolute consumed ranges for this tile: [a_start, a_end) x [b_start,
    # b_end) where the ends are the NEXT tile's splits (computed from the
    # same formula shifted, i.e. just roll the arrays).
    a_start = a_base + a_split
    b_start = b_base + (d0 - a_split)
    last_pair = (n_tiles * w - 1) // (2 * run)
    a_end = jnp.concatenate([a_start[1:], jnp.zeros((1,), jnp.int32)])
    b_end = jnp.concatenate([b_start[1:], jnp.zeros((1,), jnp.int32)])
    # Tiles that end their pair (or the array): consume to the run ends.
    next_pair = jnp.concatenate([pair[1:], pair[-1:] + 1])
    pair_ends = next_pair != pair
    a_end = jnp.where(pair_ends, a_base + len_a, a_end)
    b_end = jnp.where(pair_ends, b_base + len_b, b_end)
    return a_start, a_end, b_start, b_end


# Window DMA slack: windows are row-aligned (<=127-element misalignment
# absorbed by an in-VMEM roll), read one extra row, and the buffer rows are
# padded to a multiple of 8 sublanes.
_WIN_EXTRA_ROWS = 8


def _merge_pass(
    operands, num_keys: int, run: int, w: int, n: int, interpret: bool = False
):
    """One merge-path pass: adjacent sorted ``run``-element runs of n-element
    operands (n multiple of w, run multiple of w) merge into ``2*run`` runs.

    Operands must carry ``>= w + _WIN_EXTRA_ROWS*128`` elements of DMA pad
    past n (content irrelevant — windows are masked to their live ranges).
    Dead window slack becomes (SENTINEL keys, 0 payloads); see module
    docstring for the equal-max-key payload caveat.
    """
    n_ops = len(operands)
    n_pad = operands[0].shape[0]

    a_start, a_end, b_start, b_end = _diag_splits(
        tuple(v[:n] for v in operands), num_keys, run, w, n
    )
    wr = _rows(w)
    buf_rows = wr + _WIN_EXTRA_ROWS
    n_tiles = n // w

    def kernel(*refs):
        # refs: [4 prefetch scalars] + [n_ops hbm inputs] + [n_ops outputs]
        #       + [2*n_ops window scratch] + [2*n_ops DMA semaphores]
        astart_r, aend_r, bstart_r, bend_r = refs[:4]
        ins = refs[4 : 4 + n_ops]
        outs = refs[4 + n_ops : 4 + 2 * n_ops]
        bufs = refs[4 + 2 * n_ops : 4 + 4 * n_ops]
        sems = refs[4 + 4 * n_ops]
        t = pl.program_id(0)
        a_s, a_e = astart_r[t], aend_r[t]
        b_s, b_e = bstart_r[t], bend_r[t]
        a_row = a_s // _LANES
        b_row = b_s // _LANES

        copies = []
        for i in range(n_ops):
            copies.append(
                pltpu.make_async_copy(
                    ins[i].at[pl.ds(a_row, wr + 1), :],
                    bufs[2 * i].at[pl.ds(0, wr + 1), :],
                    sems.at[2 * i],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    ins[i].at[pl.ds(b_row, wr + 1), :],
                    bufs[2 * i + 1].at[pl.ds(0, wr + 1), :],
                    sems.at[2 * i + 1],
                )
            )
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        ea = a_s - a_row * _LANES
        eb = b_s - b_row * _LANES
        la = a_e - a_s
        lb = b_e - b_s
        i2 = _flat_iota((wr, _LANES))

        def window(buf, shift, live):
            v = _dyn_shift_down(buf[:], shift)[:wr]
            return v, i2 < live

        merged = []
        for i in range(n_ops):
            av, alive = window(bufs[2 * i], ea, la)
            bv, blive = window(bufs[2 * i + 1], eb, lb)
            if i < num_keys:
                av = jnp.where(alive, av, SENTINEL)
                bv = jnp.where(blive, bv, SENTINEL)
            else:
                av = jnp.where(alive, av, jnp.uint32(0))
                bv = jnp.where(blive, bv, jnp.uint32(0))
            merged.append(jnp.concatenate([av, bv], axis=0))

        i_m = _flat_iota(merged[0].shape)
        merged = _odd_even_merge_stages(merged, num_keys, w, i_m)
        for o_ref, v in zip(outs, merged):
            o_ref[:] = v[:wr]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_ops,
        out_specs=[
            pl.BlockSpec(
                (wr, _LANES), lambda t, *_refs: (t, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_ops,
        scratch_shapes=[pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * (2 * n_ops)
        + [pltpu.SemaphoreType.DMA((2 * n_ops,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((n // _LANES, _LANES), operands[0]) for _ in range(n_ops)
        ],
        interpret=interpret,
    )(
        a_start,
        a_end,
        b_start,
        b_end,
        *[v.reshape(n_pad // _LANES, _LANES) for v in operands],
    )
    # Re-attach the DMA pad for the next pass (values never read live).
    pad = n_pad - n
    return tuple(
        jnp.concatenate([v.reshape(n), jnp.zeros((pad,), jnp.uint32)])
        for v in out
    )


def _dyn_shift_down(v, shift):
    """v shifted down by a *traced* 0..127 element offset on the flattened
    (rows,128) index: out[i] = v[i + shift] (garbage at the tail)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    rows = v.shape[0]
    # lane part: roll by (128 - shift) % 128; row carry for wrapped lanes.
    u = pltpu.roll(v, (_LANES - shift) % _LANES, 1)
    u_next = pltpu.roll(u, rows - 1, 0)
    return jnp.where(lane < _LANES - shift, u, u_next)


def sort_ops(
    operands: Sequence[jnp.ndarray],
    num_keys: int,
    tile: int = TILE,
    interpret: bool = False,
) -> tuple:
    """Full sort: drop-in for ``jax.lax.sort(operands, dimension=0,
    num_keys=num_keys)`` on 1D u32 arrays whose length is a multiple of
    ``tile``.  Equal-key payload order is unspecified (like is_stable=False);
    see the module docstring for the max-key payload caveat.
    """
    operands = [v.astype(jnp.uint32) for v in operands]
    n = operands[0].shape[0]
    if n % tile != 0:
        raise ValueError(f"sort_ops requires len % {tile} == 0, got {n}")
    ops = leaf_sort(operands, num_keys, tile, interpret)
    if n == tile:
        return tuple(ops)
    pad = _rows_pad_elements(tile)
    ops = tuple(
        jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in ops
    )
    run = tile
    while run < n:
        ops = _merge_pass(ops, num_keys, run, tile, n, interpret)
        run *= 2
    return tuple(v[:n] for v in ops)


def _rows_pad_elements(w: int) -> int:
    """DMA overread pad past the live region: one window + slack rows."""
    return w + _WIN_EXTRA_ROWS * _LANES


def _diag_splits_pair(a_keys, b_keys, num_keys: int, na: int, nb: int, w: int):
    """Merge-path splits for ONE pair of sorted runs A (na elements) and
    B (nb), arbitrary static lengths, output cut into (na+nb)/w tiles.
    Returns absolute (a_start, a_end, b_start, b_end) int32 arrays, where
    b offsets are positions within B (0-based)."""
    n = na + nb
    n_tiles = n // w
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    d0 = t * w
    lo = jnp.maximum(0, d0 - nb)
    hi = jnp.minimum(d0, na)

    def gather(ops_, idx):
        return [jnp.take(ops_[i], idx, mode="clip") for i in range(num_keys)]

    steps = max(1, int(np.ceil(np.log2(max(na, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi + 1) // 2
        ak = gather(a_keys, jnp.maximum(mid - 1, 0))
        bk = gather(b_keys, jnp.clip(d0 - mid, 0, max(nb - 1, 0)))
        ok = (mid <= lo) | (d0 - mid >= nb) | _lex_le_gathered(ak, bk, num_keys)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)

    a_start = lo
    b_start = d0 - lo
    a_end = jnp.concatenate([a_start[1:], jnp.asarray([na], jnp.int32)])
    b_end = jnp.concatenate([b_start[1:], jnp.asarray([nb], jnp.int32)])
    return a_start, a_end, b_start, b_end


def _diag_splits_pair_desc(
    a_keys, b_desc_keys, num_keys: int, na: int, nb: int, w: int
):
    """_diag_splits_pair for a DESCENDING-stored B: identical merge-path
    search over the ascending view b_asc[j] = b_desc[nb-1-j] (gathers at
    reversed indices).  Returned b offsets are ASCENDING-view positions;
    the kernel converts [b_start, b_end) to the desc-space row range
    [nb-b_end, nb-b_start) read forward."""
    n = na + nb
    n_tiles = n // w
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    d0 = t * w
    lo = jnp.maximum(0, d0 - nb)
    hi = jnp.minimum(d0, na)

    def gather_a(idx):
        return [jnp.take(a_keys[i], idx, mode="clip") for i in range(num_keys)]

    def gather_b_asc(idx):
        ridx = jnp.int32(nb - 1) - idx
        return [
            jnp.take(b_desc_keys[i], ridx, mode="clip") for i in range(num_keys)
        ]

    steps = max(1, int(np.ceil(np.log2(max(na, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi + 1) // 2
        ak = gather_a(jnp.maximum(mid - 1, 0))
        bk = gather_b_asc(jnp.clip(d0 - mid, 0, max(nb - 1, 0)))
        ok = (mid <= lo) | (d0 - mid >= nb) | _lex_le_gathered(ak, bk, num_keys)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)

    a_start = lo
    b_start = d0 - lo
    a_end = jnp.concatenate([a_start[1:], jnp.asarray([na], jnp.int32)])
    b_end = jnp.concatenate([b_start[1:], jnp.asarray([nb], jnp.int32)])
    return a_start, a_end, b_start, b_end


def _next_boundary_keys_desc(a_keys, b_desc_keys, num_keys, na, nb, a_end, b_end):
    """Per output tile, the merged stream's NEXT element (the first element
    of tile t+1): lexmin of A[a_end[t]] and B_asc[b_end[t]], an exhausted
    side reading as the sentinel.  Computed XLA-side (tiny gathers) and
    prefetched, replacing the fused-fold kernel's in-kernel one-hot window
    extraction.  Returned as int32 bit-patterns (prefetch scalars are
    i32; the kernel only ever bit-compares them)."""
    a_next = [
        jnp.where(
            a_end < na,
            jnp.take(a_keys[i], jnp.minimum(a_end, max(na - 1, 0)), mode="clip"),
            SENTINEL,
        )
        for i in range(num_keys)
    ]
    b_idx = jnp.clip(jnp.int32(nb - 1) - b_end, 0, max(nb - 1, 0))
    b_next = [
        jnp.where(
            b_end < nb, jnp.take(b_desc_keys[i], b_idx, mode="clip"), SENTINEL
        )
        for i in range(num_keys)
    ]
    a_le_b = _lex_le_gathered(a_next, b_next, num_keys)
    return [
        jax.lax.bitcast_convert_type(
            jnp.where(a_le_b, a_next[i], b_next[i]), jnp.int32
        )
        for i in range(num_keys)
    ]


def merge_sorted_runs(
    a_ops: Sequence[jnp.ndarray],
    b_ops: Sequence[jnp.ndarray],
    num_keys: int,
    tile: int = TILE,
    interpret: bool = False,
) -> tuple:
    """Merge two individually sorted operand sets into one sorted set of
    length ``len(a)+len(b)`` — ONE merge-path pass (18 compare-exchange
    stages) instead of a full O(log^2) re-sort.

    This is the consolidation workhorse: ops.table2 merges the sorted
    deduped prefix with the freshly sorted raw region here, ~14x cheaper
    than the 3-operand lax.sort it replaces (118ms -> measured
    single-pass cost, docs/experiments_psort_tpu.py).

    Requirements: ``(len(a)+len(b)) % TILE == 0`` (the engine sizes both
    regions to tile multiples); all operands u32; both sets sorted
    ascending by their first num_keys operands.  Dead window slack is
    (SENTINEL keys, 0 payloads) — same equal-max-key payload caveat as
    sort_ops.
    """
    a_ops = [v.astype(jnp.uint32) for v in a_ops]
    b_ops = [v.astype(jnp.uint32) for v in b_ops]
    na, nb = a_ops[0].shape[0], b_ops[0].shape[0]
    n = na + nb
    if n % tile != 0:
        raise ValueError(f"merge_sorted_runs requires (na+nb) % {tile} == 0")
    a_start, a_end, b_start, b_end = _diag_splits_pair(
        a_ops[:num_keys], b_ops[:num_keys], num_keys, na, nb, tile
    )
    pad = _rows_pad_elements(tile)
    a_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in a_ops]
    b_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in b_ops]
    return _merge_pair_call(
        a_pad, b_pad, num_keys, n, a_start, a_end, b_start, b_end, tile, interpret
    )


def merge_sorted_runs_fold(
    a_ops: Sequence[jnp.ndarray],
    b_ops: Sequence[jnp.ndarray],
    num_keys: int,
    tile: int = TILE,
    interpret: bool = False,
) -> tuple:
    """merge_sorted_runs with the count-fold fused into the kernel.

    The LAST operand of each set is a count; the merged output carries
    each duplicate-key run's summed count on the run's LAST row and 0 on
    every other row (keys stay in place, so the result is still sorted and
    ready for compact_live with ``live = counts``).  This replaces the
    separate 23M-row XLA fold pass (_fold_counts_in_place) — and, because
    the fold sums anything, the raw region can feed plain 0/1 liveness
    instead of precomputed multiplicities, dropping the
    _raw_counts_in_place pass too (docs/ROADMAP.md round-3 item).

    Mechanism: per output tile, a 16-stage doubling cumsum of the counts
    + a 16-stage fill-from-left select-scan locate each row's preceding
    run-end; a run whose end is the tile's last row is detected against
    the NEXT merged element, extracted from the (already resident) input
    windows at their consumed offsets by one-hot reduction; the partial
    sum of a run spanning the tile edge rides an SMEM carry across the
    sequential grid.  All fold compute runs on VMEM-resident vregs — the
    kernel stays HBM-bound, so the fused fold is effectively free.

    Same requirements as merge_sorted_runs; counts use uint32 modular
    arithmetic (wraparound cancels across the carry, like ops.sortcount).
    """
    a_ops = [v.astype(jnp.uint32) for v in a_ops]
    b_ops = [v.astype(jnp.uint32) for v in b_ops]
    na, nb = a_ops[0].shape[0], b_ops[0].shape[0]
    n = na + nb
    if n % tile != 0:
        raise ValueError(f"merge_sorted_runs_fold requires (na+nb) % {tile} == 0")
    if len(a_ops) != num_keys + 1 or len(b_ops) != num_keys + 1:
        raise ValueError("operands must be num_keys key lanes + one count")
    a_start, a_end, b_start, b_end = _diag_splits_pair(
        a_ops[:num_keys], b_ops[:num_keys], num_keys, na, nb, tile
    )
    pad = _rows_pad_elements(tile)
    a_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in a_ops]
    b_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in b_ops]
    return _merge_pair_fold_call(
        a_pad, b_pad, num_keys, n, na, nb,
        a_start, a_end, b_start, b_end, tile, interpret,
    )


def merge_sorted_runs_fold_bitonic(
    a_ops: Sequence[jnp.ndarray],
    b_desc_ops: Sequence[jnp.ndarray],
    num_keys: int,
    tile: int = TILE,
    interpret: bool = False,
) -> tuple:
    """merge_sorted_runs_fold with B stored DESCENDING and a bitonic
    half-merge in the kernel (docs/ROADMAP.md round-4 item).

    Merge-path guarantees each output tile consumes exactly ``w = la+lb``
    elements, so the tile IS the union of its two windows — no selection
    needed, only a sort of w elements known to be [A-window ascending |
    B-window descending]: a BITONIC sequence.  The kernel therefore runs
    log2(w) = 16 compare-exchange stages on a w-element buffer instead of
    Batcher's log2(2w)+1 = 17 stages on 2w — ~2.1x less VPU stage work
    (the merge is VPU-bound, BASELINE.md round 3), and the halved live
    buffer footprint also lets wide records (4 key lanes + count) keep
    the full 64K tile inside the 16MB scoped-VMEM limit.

    Differences from merge_sorted_runs_fold:
      * ``b_desc_ops`` must be sorted DESCENDING by the first num_keys
        operands (table2._c3_sort_raw_desc produces this by sorting
        bit-flipped lanes); the count operand rides in the same order.
      * No window sentinel-masking is needed (la+lb = w exactly), so
        dead B rows must carry count 0 — they merge wherever their key
        says (all-zero keys at the FRONT of the stream) and fold to
        0-count rows that compact_live removes.
      * The merged stream's next-tile boundary keys are precomputed
        XLA-side and prefetched (no in-kernel window extraction).

    Same contract otherwise: returns ascending merged operands with each
    duplicate-key run's total count on the run's LAST row and 0 elsewhere.
    """
    a_ops = [v.astype(jnp.uint32) for v in a_ops]
    b_ops = [v.astype(jnp.uint32) for v in b_desc_ops]
    na, nb = a_ops[0].shape[0], b_ops[0].shape[0]
    n = na + nb
    if n % tile != 0:
        raise ValueError(
            f"merge_sorted_runs_fold_bitonic requires (na+nb) % {tile} == 0"
        )
    if len(a_ops) != num_keys + 1 or len(b_ops) != num_keys + 1:
        raise ValueError("operands must be num_keys key lanes + one count")
    a_start, a_end, b_start, b_end = _diag_splits_pair_desc(
        a_ops[:num_keys], b_ops[:num_keys], num_keys, na, nb, tile
    )
    next_keys = _next_boundary_keys_desc(
        a_ops[:num_keys], b_ops[:num_keys], num_keys, na, nb, a_end, b_end
    )
    pad = _rows_pad_elements(tile)
    a_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in a_ops]
    b_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in b_ops]
    return _merge_pair_fold_bitonic_call(
        a_pad, b_pad, num_keys, n, nb,
        a_start, a_end, b_start, b_end, next_keys, tile, interpret,
    )


def merge_fold_compact_bitonic(
    a_ops: Sequence[jnp.ndarray],
    b_desc_ops: Sequence[jnp.ndarray],
    num_keys: int,
    tile: int = TILE,
    interpret: bool = False,
) -> tuple:
    """merge_sorted_runs_fold_bitonic with the stream compaction FUSED
    into the same kernel: each tile's merged+folded rows run the
    delta-shift network in-VMEM and append at a carried global offset —
    deleting compact_live's separate read+write pass over the full
    merged table (its copy floor alone is ~6.7ms per 37.7M-row
    consolidation; docs/probe_compact_overhead.py).

    Returns ``(compacted operands tuple, live_count)``: live rows (count
    != 0, i.e. one row per distinct non-sentinel key) dense at the
    front in merged order, SENTINEL-key/0-count fill past live_count.
    Every record width is supported: full 64K tile through five
    operands (k<=64), halved tile beyond (table2._bitonic_tile) — the
    8-operand kernel fits scoped VMEM at 32K and golden-matched on-chip
    at k=101 (round 4).
    """
    a_ops = [v.astype(jnp.uint32) for v in a_ops]
    b_ops = [v.astype(jnp.uint32) for v in b_desc_ops]
    na, nb = a_ops[0].shape[0], b_ops[0].shape[0]
    n = na + nb
    if n % tile != 0:
        raise ValueError(
            f"merge_fold_compact_bitonic requires (na+nb) % {tile} == 0"
        )
    if len(a_ops) != num_keys + 1 or len(b_ops) != num_keys + 1:
        raise ValueError("operands must be num_keys key lanes + one count")
    a_start, a_end, b_start, b_end = _diag_splits_pair_desc(
        a_ops[:num_keys], b_ops[:num_keys], num_keys, na, nb, tile
    )
    next_keys = _next_boundary_keys_desc(
        a_ops[:num_keys], b_ops[:num_keys], num_keys, na, nb, a_end, b_end
    )
    pad = _rows_pad_elements(tile)
    a_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in a_ops]
    b_pad = [jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) for v in b_ops]
    out, live_count = _merge_pair_fold_compact_bitonic_call(
        a_pad, b_pad, num_keys, n, nb,
        a_start, a_end, b_start, b_end, next_keys, tile, interpret,
    )
    # Rows past the final write offset were never touched — mask them.
    idx = jnp.arange(n, dtype=jnp.int32)
    n_ops = num_keys + 1
    cleaned = []
    for k in range(n_ops):
        fill = SENTINEL if k < num_keys else np.uint32(0)
        cleaned.append(jnp.where(idx < live_count, out[k][:n], fill))
    return tuple(cleaned), live_count


def _merge_pair_fold_compact_bitonic_call(
    a_pad, b_pad, num_keys, n, nb,
    a_start, a_end, b_start, b_end, next_keys, w, interpret,
):
    """Kernel: bitonic half-merge + in-VMEM count fold + in-kernel stream
    compaction with a carried output offset.  Two independent
    double-buffer systems, both keyed on tile parity: the input window
    set (as in _merge_pair_fold_bitonic_call) and the compact staging
    set (as in compact_live's pipelined kernel)."""
    n_ops = len(a_pad)
    wr = _rows(w)
    buf_rows = wr + _WIN_EXTRA_ROWS
    n_tiles = n // w
    n_pref = 4 + num_keys
    pad_rows = wr + _WIN_EXTRA_ROWS
    out_rows = n // _LANES + pad_rows
    prefetch = _merge_prefetch_ok(n_ops, w)
    n_wbufs = 4 * n_ops if prefetch else 2 * n_ops
    fills = [SENTINEL if k < num_keys else np.uint32(0) for k in range(n_ops)]

    def kernel(*refs):
        astart_r, aend_r, bstart_r, bend_r = refs[:4]
        nk_refs = refs[4:n_pref]
        a_ins = refs[n_pref : n_pref + n_ops]
        b_ins = refs[n_pref + n_ops : n_pref + 2 * n_ops]
        outs = refs[n_pref + 2 * n_ops : n_pref + 3 * n_ops]
        live_ref = refs[n_pref + 3 * n_ops]
        base = n_pref + 3 * n_ops + 1
        wbufs = refs[base : base + n_wbufs]
        sbufs = refs[base + n_wbufs : base + n_wbufs + 2 * n_ops]
        pend = refs[base + n_wbufs + 2 * n_ops]
        carry_ref = refs[base + n_wbufs + 2 * n_ops + 1]
        pos_ref = refs[base + n_wbufs + 2 * n_ops + 2]
        wsems = refs[base + n_wbufs + 2 * n_ops + 3]
        osems = refs[base + n_wbufs + 2 * n_ops + 4]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = 0
            pos_ref[0] = 0

        # ---- input windows (same protocol as the unfused bitonic kernel)
        def make_wcopies(tt, wb_base: int, sem_row: int):
            a_row_t = astart_r[tt] // _LANES
            b_row_t = (jnp.int32(nb) - bend_r[tt]) // _LANES
            copies = []
            for i in range(n_ops):
                copies.append(
                    pltpu.make_async_copy(
                        a_ins[i].at[pl.ds(a_row_t, wr + 1), :],
                        wbufs[wb_base + 2 * i].at[pl.ds(0, wr + 1), :],
                        wsems.at[sem_row, 2 * i],
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        b_ins[i].at[pl.ds(b_row_t, wr + 1), :],
                        wbufs[wb_base + 2 * i + 1].at[pl.ds(0, wr + 1), :],
                        wsems.at[sem_row, 2 * i + 1],
                    )
                )
            return copies

        a_s, a_e = astart_r[t], aend_r[t]
        b_e = bend_r[t]
        la = a_e - a_s
        q = jnp.int32(nb) - b_e
        a_row = a_s // _LANES
        b_row = q // _LANES
        par = jax.lax.rem(t, 2)

        if not prefetch:
            wcopies = make_wcopies(t, 0, 0)
            for c in wcopies:
                c.start()
            for c in wcopies:
                c.wait()

            def wload(i):
                return wbufs[i][:]

        else:

            @pl.when(t == 0)
            def _():
                for c in make_wcopies(t, 0, 0):
                    c.start()

            @pl.when(par == 0)
            def _():
                for c in make_wcopies(t, 0, 0):
                    c.wait()

            @pl.when(par == 1)
            def _():
                for c in make_wcopies(t, 2 * n_ops, 1):
                    c.wait()

            @pl.when(t + 1 < n_tiles)
            def _():
                tn = jnp.minimum(t + 1, n_tiles - 1)

                @pl.when(par == 0)
                def _():
                    for c in make_wcopies(tn, 2 * n_ops, 1):
                        c.start()

                @pl.when(par == 1)
                def _():
                    for c in make_wcopies(tn, 0, 0):
                        c.start()

            is0 = par == 0

            # Deliberate benign race: the select reads BOTH buffer sets,
            # including the one the just-started DMA for tile t+1 is
            # concurrently writing — those lanes are discarded by the
            # jnp.where, so the result is unaffected (on-chip validated).
            # If Mosaic ever flags concurrent reads, load each set under
            # pl.when(parity) instead.
            def wload(i):
                return jnp.where(is0, wbufs[i][:], wbufs[2 * n_ops + i][:])

        # ---- bitonic half-merge + fold (identical math to the unfused
        # kernel)
        ea = a_s - a_row * _LANES
        eq = q - b_row * _LANES
        i2 = _flat_iota((wr, _LANES))
        z_ops = []
        for i in range(n_ops):
            av = _dyn_shift_down(wload(2 * i), ea)[:wr]
            bw = _dyn_shift_down(wload(2 * i + 1), eq)[:wr]
            zb = _dyn_shift_up_big(bw, la)
            z_ops.append(jnp.where(i2 < la, av, zb))

        merged = _bitonic_merge_stages(z_ops, num_keys, w, i2)
        keys = merged[:num_keys]
        counts = merged[num_keys]

        is_last = i2 == (w - 1)
        last_differs = jnp.bool_(False)
        for i in range(num_keys):
            ki = jax.lax.bitcast_convert_type(keys[i], jnp.int32)
            last_i = jnp.sum(jnp.where(is_last, ki, jnp.int32(0)))
            last_differs = last_differs | (last_i != nk_refs[i][t])

        out_counts = _fold_tile_counts(
            keys, counts, last_differs, carry_ref, w, num_keys
        )

        # ---- in-kernel compaction (compact_live's pipelined protocol)
        alive = out_counts != jnp.uint32(0)
        vs, c_t = _compact_network([*keys, out_counts], alive, w, fills)

        pos = pos_ref[0]
        out_row = pos // _LANES
        p = pos - out_row * _LANES
        lane = jax.lax.broadcasted_iota(jnp.int32, (buf_rows, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (buf_rows, _LANES), 0)
        qrow = (p + c_t) // _LANES

        def io(cur, s_cur: int, s_oth: int):
            for k in range(n_ops):
                buf = cur[k]
                buf[:wr] = vs[k]
                buf[wr:] = jnp.full(
                    (buf_rows - wr, _LANES), fills[k], jnp.uint32
                )
                shifted = _dyn_shift_up(buf[:], p)
                blended = jnp.where(
                    (row == 0) & (lane < p), pend[k, 0:1, :], shifted
                )
                buf[:] = blended
                rolled = pltpu.roll(blended, buf_rows - qrow, 0)
                pend[k, 0:1, :] = rolled[0:1, :]

            copies = [
                pltpu.make_async_copy(
                    cur[k].at[pl.ds(0, wr + 1)],
                    outs[k].at[pl.ds(out_row, wr + 1), :],
                    osems.at[s_cur, k],
                )
                for k in range(n_ops)
            ]

            @pl.when(t > 0)
            def _():
                for k in range(n_ops):
                    pltpu.make_async_copy(
                        cur[k].at[pl.ds(0, wr + 1)],
                        outs[k].at[pl.ds(out_row, wr + 1), :],
                        osems.at[s_oth, k],
                    ).wait()

            for c in copies:
                c.start()

            @pl.when(t == n_tiles - 1)
            def _():
                for c in copies:
                    c.wait()

        @pl.when(par == 0)
        def _():
            io(sbufs[:n_ops], 0, 1)

        @pl.when(par == 1)
        def _():
            io(sbufs[n_ops:], 1, 0)

        pos_ref[0] = pos + c_t
        live_ref[:] = jnp.full((8, _LANES), (pos + c_t).astype(jnp.uint32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_ops),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_ops
        + [
            pl.BlockSpec(
                (8, _LANES), lambda t, *_refs: (t, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * n_wbufs
        + [pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * (2 * n_ops)
        + [pltpu.VMEM((n_ops, 8, _LANES), jnp.uint32)]
        + [pltpu.SMEM((1,), jnp.int32)]
        + [pltpu.SMEM((1,), jnp.int32)]
        + [pltpu.SemaphoreType.DMA((2, 2 * n_ops))]
        + [pltpu.SemaphoreType.DMA((2, n_ops))],
    )
    na_rows = a_pad[0].shape[0] // _LANES
    nb_rows = b_pad[0].shape[0] // _LANES
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((out_rows, _LANES), a_pad[0]) for _ in range(n_ops)
        ]
        + [_sds((n_tiles * 8, _LANES), a_pad[0])],
        interpret=interpret,
    )(
        a_start,
        a_end,
        b_start,
        b_end,
        *next_keys,
        *[v.reshape(na_rows, _LANES) for v in a_pad],
        *[v.reshape(nb_rows, _LANES) for v in b_pad],
    )
    ops_out = tuple(
        out[k].reshape(out_rows * _LANES) for k in range(n_ops)
    )
    live_count = out[n_ops][(n_tiles - 1) * 8, 0].astype(jnp.int32)
    return ops_out, live_count


def _fold_tile_counts(keys, counts, last_differs, carry_ref, w, num_keys):
    """The fused-fold math shared by the odd-even and bitonic merge
    kernels: given one merged sorted output tile (keys, counts), a scalar
    saying whether the tile's last key differs from the merged stream's
    NEXT element, and the SMEM carry of the run spanning the tile edge,
    return the folded counts (each duplicate-key run's total on its LAST
    row, 0 elsewhere, sentinel runs dead) and update the carry."""
    i2 = _flat_iota(keys[0].shape)
    is_last = i2 == (w - 1)
    # within-tile run ends: key[i] != key[i+1]
    nxt = [_partner_down(k, 1) for k in keys]
    differs = jnp.zeros(keys[0].shape, dtype=jnp.bool_)
    for i in range(num_keys):
        differs = differs | (keys[i] != nxt[i])
    is_end = (is_last & last_differs) | (~is_last & differs)
    is_sent = jnp.ones(keys[0].shape, dtype=jnp.bool_)
    for i in range(num_keys):
        is_sent = is_sent & (keys[i] == SENTINEL)

    c_i32 = counts.astype(jnp.int32)
    incl = _tile_cumsum_excl(c_i32, w) + c_i32
    # prev_end_incl[i]: incl at the nearest end-row strictly before i
    # (0 when none) — fill-from-left of end incl values, shifted by 1.
    end_i32 = jnp.where(is_end, jnp.int32(1), jnp.int32(0))
    at_or_before_val = jnp.where(is_end, incl, jnp.int32(0))
    at_or_before_flag = end_i32
    d = 1
    while d < w:
        pv = _partner_up(at_or_before_val, d)
        pf = _partner_up(at_or_before_flag, d)
        in_range = i2 >= d
        take = in_range & (at_or_before_flag == 0) & (pf != 0)
        at_or_before_val = jnp.where(take, pv, at_or_before_val)
        at_or_before_flag = jnp.where(take, pf, at_or_before_flag)
        d *= 2
    pe_val = _partner_up(at_or_before_val, 1)
    pe_flag = _partner_up(at_or_before_flag, 1)
    first = i2 == 0
    prev_end_incl = jnp.where(
        first, jnp.int32(0), jnp.where(pe_flag != 0, pe_val, jnp.int32(0))
    )
    has_prev_end = (~first) & (pe_flag != 0)

    carry = carry_ref[0]
    total = incl - prev_end_incl + jnp.where(
        has_prev_end, jnp.int32(0), carry
    )
    out_counts = jnp.where(
        is_end & ~is_sent, total.astype(jnp.uint32), jnp.uint32(0)
    )
    # New carry: counts accumulated past the last end row (plus the old
    # carry when no run ended in this tile at all).  Extract via the
    # one-hot sum at the last element — the fill-from-left scan's value
    # there IS the last end row's incl (wraparound-safe, unlike a max).
    def at_last(v):
        return jnp.sum(jnp.where(is_last, v, jnp.int32(0)))

    incl_last = at_last(incl)
    last_end_incl = at_last(at_or_before_val)
    any_end = at_last(at_or_before_flag) != 0
    carry_ref[0] = jnp.where(
        any_end, incl_last - last_end_incl, carry + incl_last
    )
    return out_counts


def _merge_pair_fold_call(
    a_pad, b_pad, num_keys, n, na, nb,
    a_start, a_end, b_start, b_end, w, interpret,
):
    """One merge-path pass over (A, B) with in-kernel run-total fold onto
    run-end rows (see merge_sorted_runs_fold)."""
    n_ops = len(a_pad)
    wr = _rows(w)
    buf_rows = wr + _WIN_EXTRA_ROWS
    n_tiles = n // w

    def kernel(*refs):
        astart_r, aend_r, bstart_r, bend_r = refs[:4]
        a_ins = refs[4 : 4 + n_ops]
        b_ins = refs[4 + n_ops : 4 + 2 * n_ops]
        outs = refs[4 + 2 * n_ops : 4 + 3 * n_ops]
        bufs = refs[4 + 3 * n_ops : 4 + 5 * n_ops]
        carry_ref = refs[4 + 5 * n_ops]
        sems = refs[4 + 5 * n_ops + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = 0

        a_s, a_e = astart_r[t], aend_r[t]
        b_s, b_e = bstart_r[t], bend_r[t]
        a_row = a_s // _LANES
        b_row = b_s // _LANES

        copies = []
        for i in range(n_ops):
            copies.append(
                pltpu.make_async_copy(
                    a_ins[i].at[pl.ds(a_row, wr + 1), :],
                    bufs[2 * i].at[pl.ds(0, wr + 1), :],
                    sems.at[2 * i],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    b_ins[i].at[pl.ds(b_row, wr + 1), :],
                    bufs[2 * i + 1].at[pl.ds(0, wr + 1), :],
                    sems.at[2 * i + 1],
                )
            )
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        ea = a_s - a_row * _LANES
        eb = b_s - b_row * _LANES
        la = a_e - a_s
        lb = b_e - b_s
        i2 = _flat_iota((wr, _LANES))

        merged = []
        a_wins = []
        b_wins = []
        for i in range(n_ops):
            aw = _dyn_shift_down(bufs[2 * i][:], ea)
            bw = _dyn_shift_down(bufs[2 * i + 1][:], eb)
            a_wins.append(aw)
            b_wins.append(bw)
            av, bv = aw[:wr], bw[:wr]
            if i < num_keys:
                av = jnp.where(i2 < la, av, SENTINEL)
                bv = jnp.where(i2 < lb, bv, SENTINEL)
            else:
                av = jnp.where(i2 < la, av, jnp.uint32(0))
                bv = jnp.where(i2 < lb, bv, jnp.uint32(0))
            merged.append(jnp.concatenate([av, bv], axis=0))

        i_m = _flat_iota(merged[0].shape)
        merged = _odd_even_merge_stages(merged, num_keys, w, i_m)
        vs = [v[:wr] for v in merged]

        # ---- fused fold: run totals onto run-end rows ----
        keys = vs[:num_keys]
        counts = vs[num_keys]
        # The merged stream's NEXT element (tile t+1's first): the lex-min
        # of the two windows' first unconsumed elements — one-hot-extracted
        # from the already-resident (aligned) windows; an exhausted side
        # reads as the sentinel.  (Every tile consumes exactly ``w``
        # elements, so merged[w:] is all-sentinel and useless here.)
        def onehot_i32(mask, v):
            # One-hot extraction: bitcast the u32 VECTOR to i32 (Mosaic has
            # neither unsigned reductions nor scalar bitcasts), zero all
            # other slots, SUM — bit-exact, sign-safe.  The scalar stays in
            # int32 bit-space; all downstream uses are bit-compares or the
            # sign-bias-flipped order below.
            vi = jax.lax.bitcast_convert_type(v, jnp.int32)
            return jnp.sum(jnp.where(mask, vi, jnp.int32(0)))

        SENT_I32 = jnp.int32(-1)  # 0xFFFFFFFF
        i_buf = _flat_iota((buf_rows, _LANES))
        next_a = []
        next_b = []
        for i in range(num_keys):
            ka = onehot_i32(i_buf == la, a_wins[i])
            kb = onehot_i32(i_buf == lb, b_wins[i])
            next_a.append(jnp.where(a_s + la < na, ka, SENT_I32))
            next_b.append(jnp.where(b_s + lb < nb, kb, SENT_I32))

        def u32_lt_bits(xi, yi):
            # unsigned < on int32 bit-patterns via the sign-bias flip
            bias = jnp.int32(-0x80000000)
            return (xi + bias) < (yi + bias)

        # scalar lexicographic a <= b
        a_le_b = jnp.bool_(True)
        for i in reversed(range(num_keys)):
            eq = next_a[i] == next_b[i]
            a_le_b = jnp.where(eq, a_le_b, u32_lt_bits(next_a[i], next_b[i]))
        next_key = [
            jnp.where(a_le_b, next_a[i], next_b[i]) for i in range(num_keys)
        ]
        is_last = i2 == (w - 1)
        last_key = [onehot_i32(is_last, k) for k in keys]
        last_differs = jnp.bool_(False)
        for i in range(num_keys):
            last_differs = last_differs | (last_key[i] != next_key[i])

        out_counts = _fold_tile_counts(
            keys, counts, last_differs, carry_ref, w, num_keys
        )

        for i in range(num_keys):
            outs[i][:] = keys[i]
        outs[num_keys][:] = out_counts

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_ops),
        out_specs=[
            pl.BlockSpec(
                (wr, _LANES), lambda t, *_refs: (t, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_ops,
        scratch_shapes=[pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * (2 * n_ops)
        + [pltpu.SMEM((1,), jnp.int32)]
        + [pltpu.SemaphoreType.DMA((2 * n_ops,))],
    )
    na_rows = a_pad[0].shape[0] // _LANES
    nb_rows = b_pad[0].shape[0] // _LANES
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((n // _LANES, _LANES), a_pad[0]) for _ in range(n_ops)
        ],
        interpret=interpret,
    )(
        a_start,
        a_end,
        b_start,
        b_end,
        *[v.reshape(na_rows, _LANES) for v in a_pad],
        *[v.reshape(nb_rows, _LANES) for v in b_pad],
    )
    return tuple(v.reshape(n) for v in out)


def _merge_pair_fold_bitonic_call(
    a_pad, b_pad, num_keys, n, nb,
    a_start, a_end, b_start, b_end, next_keys, w, interpret,
):
    """One bitonic half-merge pass over (A ascending, B descending) with
    the in-kernel run-total fold (see merge_sorted_runs_fold_bitonic).

    Input windows are double-buffered: tile t's compute overlaps the DMA
    of tile t+1's windows (the merge-path split indices live in scalar-
    prefetch refs, so t+1's window addresses are known at tile t) — the
    kernel is per-tile-latency-bound, so hiding the 2*n_ops window copies
    behind the bitonic stages is the dominant win.
    KMER_TPU_MERGE_PREFETCH=0 restores the serialized single-buffer form.
    """
    n_ops = len(a_pad)
    wr = _rows(w)
    buf_rows = wr + _WIN_EXTRA_ROWS
    n_tiles = n // w
    n_pref = 4 + num_keys
    # Wide records (4+ key lanes, n_ops >= 5) cannot afford the second
    # window-buffer set: measured scoped-VMEM OOM at k=55 (16.85M vs the
    # 16M limit).  Narrow records (k <= 32) get the prefetch win; wide
    # ones keep the full 64K tile with serialized window loads.
    prefetch = _merge_prefetch_ok(n_ops, w)
    n_bufs = 4 * n_ops if prefetch else 2 * n_ops

    def kernel(*refs):
        astart_r, aend_r, bstart_r, bend_r = refs[:4]
        nk_refs = refs[4:n_pref]
        a_ins = refs[n_pref : n_pref + n_ops]
        b_ins = refs[n_pref + n_ops : n_pref + 2 * n_ops]
        outs = refs[n_pref + 2 * n_ops : n_pref + 3 * n_ops]
        bufs = refs[n_pref + 3 * n_ops : n_pref + 3 * n_ops + n_bufs]
        carry_ref = refs[n_pref + 3 * n_ops + n_bufs]
        sems = refs[n_pref + 3 * n_ops + n_bufs + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = 0

        def window_rows(tt):
            """(a_row, b_row) source rows of tile tt's two windows."""
            a_row = astart_r[tt] // _LANES
            q = jnp.int32(nb) - bend_r[tt]
            return a_row, q // _LANES

        def make_copies(tt, base: int, sem_row: int):
            a_row, b_row = window_rows(tt)
            copies = []
            for i in range(n_ops):
                copies.append(
                    pltpu.make_async_copy(
                        a_ins[i].at[pl.ds(a_row, wr + 1), :],
                        bufs[base + 2 * i].at[pl.ds(0, wr + 1), :],
                        sems.at[sem_row, 2 * i],
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        b_ins[i].at[pl.ds(b_row, wr + 1), :],
                        bufs[base + 2 * i + 1].at[pl.ds(0, wr + 1), :],
                        sems.at[sem_row, 2 * i + 1],
                    )
                )
            return copies

        a_s, a_e = astart_r[t], aend_r[t]
        b_s, b_e = bstart_r[t], bend_r[t]
        la = a_e - a_s
        lb = b_e - b_s
        # B's consumed asc-range [b_s, b_e) is the desc-space element range
        # [nb - b_e, nb - b_s), read FORWARD (descending values).
        q = jnp.int32(nb) - b_e
        a_row = a_s // _LANES
        b_row = q // _LANES

        if not prefetch:
            copies = make_copies(t, 0, 0)
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            def load(i):
                return bufs[i][:]

        else:
            par = jax.lax.rem(t, 2)

            # tile 0 primes its own window copies (the one unavoidable
            # stall); every other tile's copies were started one tile ago.
            @pl.when(t == 0)
            def _():
                for c in make_copies(t, 0, 0):
                    c.start()

            # wait tile t's copies (parity-selected set)
            @pl.when(par == 0)
            def _():
                for c in make_copies(t, 0, 0):
                    c.wait()

            @pl.when(par == 1)
            def _():
                for c in make_copies(t, 2 * n_ops, 1):
                    c.wait()

            # start tile t+1's copies into the other set.  Safe to refill:
            # that set was last consumed at tile t-1, and the grid is
            # sequential.
            @pl.when(t + 1 < n_tiles)
            def _():
                tn = jnp.minimum(t + 1, n_tiles - 1)

                @pl.when(par == 0)
                def _():
                    for c in make_copies(tn, 2 * n_ops, 1):
                        c.start()

                @pl.when(par == 1)
                def _():
                    for c in make_copies(tn, 0, 0):
                        c.start()

            is0 = par == 0

            # Deliberate benign race (see wload in the fused kernel): the
            # inactive buffer set may be mid-DMA; its lanes are discarded
            # by the select.
            def load(i):
                return jnp.where(is0, bufs[i][:], bufs[2 * n_ops + i][:])

        ea = a_s - a_row * _LANES
        eq = q - b_row * _LANES
        i2 = _flat_iota((wr, _LANES))

        # z[i] = A[a_s + i] for i < la, else B_desc[q + (i - la)]: one
        # w-element [ascending | descending] = bitonic buffer per operand.
        # la + lb = w exactly (merge-path), so every slot is live — no
        # sentinel masking at all.
        z_ops = []
        for i in range(n_ops):
            av = _dyn_shift_down(load(2 * i), ea)[:wr]
            bw = _dyn_shift_down(load(2 * i + 1), eq)[:wr]
            zb = _dyn_shift_up_big(bw, la)
            z_ops.append(jnp.where(i2 < la, av, zb))

        merged = _bitonic_merge_stages(z_ops, num_keys, w, i2)
        keys = merged[:num_keys]
        counts = merged[num_keys]

        # The merged stream's NEXT element is prefetched (XLA-side lexmin
        # of the two runs' first unconsumed keys, sentinel when both are
        # exhausted); the tile's last key is one-hot-extracted from the
        # resident result (Mosaic: no unsigned reductions / scalar
        # bitcasts — bitcast the vector to i32, mask + SUM).
        is_last = i2 == (w - 1)
        last_differs = jnp.bool_(False)
        for i in range(num_keys):
            ki = jax.lax.bitcast_convert_type(keys[i], jnp.int32)
            last_i = jnp.sum(jnp.where(is_last, ki, jnp.int32(0)))
            last_differs = last_differs | (last_i != nk_refs[i][t])

        out_counts = _fold_tile_counts(
            keys, counts, last_differs, carry_ref, w, num_keys
        )

        for i in range(num_keys):
            outs[i][:] = keys[i]
        outs[num_keys][:] = out_counts

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_ops),
        out_specs=[
            pl.BlockSpec(
                (wr, _LANES), lambda t, *_refs: (t, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_ops,
        scratch_shapes=[pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * n_bufs
        + [pltpu.SMEM((1,), jnp.int32)]
        + [pltpu.SemaphoreType.DMA((2, 2 * n_ops))],
    )
    na_rows = a_pad[0].shape[0] // _LANES
    nb_rows = b_pad[0].shape[0] // _LANES
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((n // _LANES, _LANES), a_pad[0]) for _ in range(n_ops)
        ],
        interpret=interpret,
    )(
        a_start,
        a_end,
        b_start,
        b_end,
        *next_keys,
        *[v.reshape(na_rows, _LANES) for v in a_pad],
        *[v.reshape(nb_rows, _LANES) for v in b_pad],
    )
    return tuple(v.reshape(n) for v in out)


def _shift_up_masked(v, d: int, i):
    """x[i] += x[i-d] for i >= d (one prefix-scan doubling stage)."""
    return v + jnp.where(i >= d, _partner_up(v, d), jnp.zeros_like(v))


def _tile_cumsum_excl(x, tile: int):
    """Exclusive prefix sum of an int32 (rows,128) buffer over its
    flattened index (whole buffer = one tile), via log2(tile) doubling
    stages of rolls + masked adds — no scatters, no lax.cumsum (which
    Mosaic does not lower inside kernels)."""
    i = _flat_iota(x.shape)
    acc = x
    d = 1
    while d < tile:
        acc = _shift_up_masked(acc, d, i)
        d *= 2
    return acc - x


def _dyn_shift_up(v, shift):
    """v shifted up by a traced 0..127 element offset: out[i] = v[i-shift]
    (garbage in the first ``shift`` elements — callers blend them)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    u = pltpu.roll(v, shift, 1)
    u_prev = pltpu.roll(u, 1, 0)
    return jnp.where(lane >= shift, u, u_prev)


import os as _os

# Traced ROW rolls (tpu.DynamicRotate on the sublane axis) are new Mosaic
# territory on this backend — every round-3 kernel only ever traced LANE
# rolls.  KMER_TPU_STATIC_ROW_ROLL=1 swaps in a bit-decomposed fallback
# (log2(rows) static rolls + scalar-masked selects) should the dynamic
# form miscompile on some toolchain.
_STATIC_ROW_ROLL = _os.environ.get("KMER_TPU_STATIC_ROW_ROLL", "0") == "1"


def _row_roll(v, r):
    """out[i_row] = v[i_row - r] for a traced r in [0, rows) (circular)."""
    rows = v.shape[0]
    if not _STATIC_ROW_ROLL:
        return pltpu.roll(v, r, 0)
    out = v
    b = 1
    while b < rows:
        rolled = pltpu.roll(out, b, 0)
        take = ((r // b) % 2) == 1
        out = jnp.where(take, rolled, out)
        b *= 2
    return out


def _dyn_shift_up_big(v, shift):
    """v shifted up by a traced 0..rows*128 element offset on the
    flattened index: out[i] = v[i - shift] — a traced ROW roll composed
    with the 0..127 lane shift (circular garbage in the first ``shift``
    elements; callers blend them)."""
    rows = v.shape[0]
    r = shift // _LANES
    dl = shift - r * _LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    u = pltpu.roll(v, dl, 1)
    # roll amounts kept in [0, rows) explicitly (shift may equal rows*128)
    u_here = _row_roll(u, jax.lax.rem(r, rows))
    u_prev = _row_roll(u, jax.lax.rem(r + 1, rows))
    return jnp.where(lane >= dl, u_here, u_prev)


def _compact_network(vs, alive, tile: int, fills):
    """In-tile delta-shift compaction shared by compact_live and the
    fused merge+fold+compact kernel: rows with ``alive`` move dense to
    the front (order preserved), dead slots take ``fills``.  ``vs`` are
    VALUE buffers (not refs).  Returns (compacted vs, live count)."""
    i = _flat_iota(vs[0].shape)
    dead = ~alive
    delta = _tile_cumsum_excl(dead.astype(jnp.int32), tile)
    c_t = tile - jnp.sum(dead.astype(jnp.int32))
    dr = delta
    d = 1
    while d < tile:
        s = d.bit_length() - 1
        move = alive & (((dr >> s) & 1) == 1)
        # roll an i32 image of the mask (Mosaic bool-vector rolls are
        # untested territory; integer rolls are probe-verified)
        move_i = jnp.where(move, jnp.int32(1), jnp.int32(0))
        m_in = (_partner_down(move_i, d) != 0) & (i + d < tile)
        vs = [jnp.where(m_in, _partner_down(v, d), v) for v in vs]
        dr = jnp.where(m_in, _partner_down(dr, d), dr)
        alive = m_in | (alive & ~move)
        d *= 2
    vs = [jnp.where(alive, v, f) for v, f in zip(vs, fills)]
    return vs, c_t


def compact_live(
    operands: Sequence[jnp.ndarray],
    live: jnp.ndarray,
    num_keys: int,
    tile: int = TILE,
    interpret: bool = False,
) -> tuple:
    """Stable stream compaction: rows with ``live != 0`` move to the front
    (order preserved); the tail is filled with SENTINEL keys / 0 payloads.

    This is the scatter-free compaction the count-table consolidation
    needs (TPU has no efficient scatter; XLA's alternative is a full
    1-key+payload sort, 118ms at 18.4M rows — docs/experiments_r2_timing).
    Mechanism: per 64K-element VMEM tile, a delta-bit-shift network moves
    each live row left by (#dead before it) in log2(tile) stages (verified
    collision-free — the remaining displacement rides along and each stage
    shifts rows whose current bit is set); tiles then append their live
    prefix at a running element offset kept in SMEM across the sequential
    grid, with the partial 128-lane row carried in VMEM and re-blended —
    the overlapping static-length DMA is safe because TPU grids execute
    in order.

    Returns compacted operands (same widths).  The caller computes
    ``live_count = sum(live != 0)`` in XLA (one cheap reduction) and must
    treat rows at/past it as dead.

    The output DMA is double-buffered (two staging-buffer/semaphore sets
    alternating by tile parity): tile t's shift-network compute overlaps
    tile t-1's output copy, and the wait that orders the overlapping
    writes happens just before tile t STARTS its own copy instead of
    right after t-1 issued its — kernels here are per-tile-latency-bound
    (probe: ~22us/tile against ~2us of DMA payload), so hiding the copy
    behind compute is the dominant win.  Buffer-reuse safety: tile t+2
    refills tile t's buffer set, but tile t+1 already waited out tile t's
    copy before starting its own, and the grid is sequential.
    KMER_TPU_COMPACT_PIPE=0 restores the serialized single-buffer kernel.
    """
    operands = [v.astype(jnp.uint32) for v in operands]
    n = operands[0].shape[0]
    if n % tile != 0:
        raise ValueError(f"compact_live requires len % {tile} == 0, got {n}")
    n_ops = len(operands)
    tr = _rows(tile)
    buf_rows = tr + _WIN_EXTRA_ROWS
    pad_rows = tr + _WIN_EXTRA_ROWS  # dyn-offset write slack past n
    out_rows = n // _LANES + pad_rows
    n_tiles = n // tile
    pipelined = _os.environ.get("KMER_TPU_COMPACT_PIPE", "1") == "1"

    def _tile_compact(ins):
        """In-tile delta-shift compaction: live rows dense at the front.
        Returns (vs, c_t) — compacted operand buffers (dead slots filled
        with SENTINEL keys / 0 payloads) and the tile's live count."""
        alive = ins[n_ops][:] != jnp.uint32(0)
        return _compact_network([r[:] for r in ins[:n_ops]], alive, tile, _fills)

    _fills = [
        SENTINEL if k < num_keys else np.uint32(0) for k in range(n_ops)
    ]

    def kernel_serial(*refs):
        ins = refs[: n_ops + 1]  # operands + live flags
        outs = refs[n_ops + 1 : 2 * n_ops + 1]
        pos_ref = refs[2 * n_ops + 1]
        shift_bufs = refs[2 * n_ops + 2 : 3 * n_ops + 2]
        pend = refs[3 * n_ops + 2]
        sems = refs[3 * n_ops + 3]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            pos_ref[0] = 0

        vs, c_t = _tile_compact(ins)

        pos = pos_ref[0]
        out_row = pos // _LANES
        p = pos - out_row * _LANES
        lane = jax.lax.broadcasted_iota(jnp.int32, (buf_rows, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (buf_rows, _LANES), 0)
        copies = []
        for k in range(n_ops):
            buf = shift_bufs[k]
            buf[:tr] = vs[k]
            buf[tr:] = jnp.full((buf_rows - tr, _LANES), _fills[k], jnp.uint32)
            shifted = _dyn_shift_up(buf[:], p)
            # blend the carried partial row into row 0's first p lanes
            blended = jnp.where(
                (row == 0) & (lane < p), pend[k, 0:1, :], shifted
            )
            buf[:] = blended
            copies.append(
                pltpu.make_async_copy(
                    buf.at[pl.ds(0, tr + 1)],
                    outs[k].at[pl.ds(out_row, tr + 1), :],
                    sems.at[0, k],
                )
            )
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        # carry the new partial row: row (p + c_t)//128 of the written block
        q = (p + c_t) // _LANES
        for k in range(n_ops):
            rolled = pltpu.roll(shift_bufs[k][:], buf_rows - q, 0)
            pend[k, 0:1, :] = rolled[0:1, :]
        pos_ref[0] = pos + c_t

    def kernel_pipe(*refs):
        ins = refs[: n_ops + 1]  # operands + live flags
        outs = refs[n_ops + 1 : 2 * n_ops + 1]
        pos_ref = refs[2 * n_ops + 1]
        shift_bufs = refs[2 * n_ops + 2 : 4 * n_ops + 2]  # 2 sets
        pend = refs[4 * n_ops + 2]
        sems = refs[4 * n_ops + 3]  # (2, n_ops)
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            pos_ref[0] = 0

        vs, c_t = _tile_compact(ins)

        pos = pos_ref[0]
        out_row = pos // _LANES
        p = pos - out_row * _LANES
        lane = jax.lax.broadcasted_iota(jnp.int32, (buf_rows, _LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (buf_rows, _LANES), 0)
        q = (p + c_t) // _LANES

        def io(cur, s_cur: int, s_oth: int):
            """Stage into the parity-s_cur buffer set and issue the copy
            (cur: this parity's staging bufs; s_cur/s_oth: semaphore rows
            of this and the other parity)."""
            for k in range(n_ops):
                buf = cur[k]
                buf[:tr] = vs[k]
                buf[tr:] = jnp.full(
                    (buf_rows - tr, _LANES), _fills[k], jnp.uint32
                )
                shifted = _dyn_shift_up(buf[:], p)
                blended = jnp.where(
                    (row == 0) & (lane < p), pend[k, 0:1, :], shifted
                )
                buf[:] = blended
                # carry the new partial row (from the register value —
                # identical to the buffer content just stored)
                rolled = pltpu.roll(blended, buf_rows - q, 0)
                pend[k, 0:1, :] = rolled[0:1, :]

            copies = [
                pltpu.make_async_copy(
                    cur[k].at[pl.ds(0, tr + 1)],
                    outs[k].at[pl.ds(out_row, tr + 1), :],
                    sems.at[s_cur, k],
                )
                for k in range(n_ops)
            ]

            # Overlapping writes must land in grid order: the previous
            # tile's copy (other parity, same byte size — the descriptor
            # below is a size-equivalent stand-in) completes before this
            # one starts.  This wait also guarantees tile t's buffers are
            # free before t+2 refills them.
            @pl.when(t > 0)
            def _():
                for k in range(n_ops):
                    pltpu.make_async_copy(
                        cur[k].at[pl.ds(0, tr + 1)],
                        outs[k].at[pl.ds(out_row, tr + 1), :],
                        sems.at[s_oth, k],
                    ).wait()

            for c in copies:
                c.start()

            # drain the final tile's copy before the kernel retires
            @pl.when(t == n_tiles - 1)
            def _():
                for c in copies:
                    c.wait()

        par = jax.lax.rem(t, 2)

        @pl.when(par == 0)
        def _():
            io(shift_bufs[:n_ops], 0, 1)

        @pl.when(par == 1)
        def _():
            io(shift_bufs[n_ops:], 1, 0)

        pos_ref[0] = pos + c_t

    kernel = kernel_pipe if pipelined else kernel_serial
    n_bufs = 2 * n_ops if pipelined else n_ops
    grid = (n_tiles,)
    in_spec = pl.BlockSpec(
        (tr, _LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * (n_ops + 1),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_ops,
        out_shape=[
            _sds((out_rows, _LANES), operands[0]) for _ in range(n_ops)
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)]
        + [pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * n_bufs
        + [pltpu.VMEM((n_ops, 8, _LANES), jnp.uint32)]
        + [pltpu.SemaphoreType.DMA((2, n_ops))],
        interpret=interpret,
    )(
        *[v.reshape(n // _LANES, _LANES) for v in operands],
        live.astype(jnp.uint32).reshape(n // _LANES, _LANES),
    )
    # Rows past the final write offset were never touched: the caller must
    # mask at/past the live count — slice to n and overwrite the tail.
    live_count = jnp.sum((live != 0).astype(jnp.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    cleaned = []
    for k in range(n_ops):
        fill = SENTINEL if k < num_keys else np.uint32(0)
        cleaned.append(
            jnp.where(idx < live_count, out[k].reshape(out_rows * _LANES)[:n], fill)
        )
    return tuple(cleaned)


def _merge_pair_call(
    a_pad, b_pad, num_keys, n, a_start, a_end, b_start, b_end, w, interpret
):
    """Shared kernel body for one merge-path pass over two separate
    operand arrays (A and B live in distinct HBM buffers).

    Window DMAs are double-buffered exactly as in the bitonic fold kernel
    (tile t+1's copies start during tile t's merge stages; split indices
    are scalar-prefetched).  KMER_TPU_MERGE_PREFETCH=0 restores the
    serialized single-buffer form."""
    n_ops = len(a_pad)
    wr = _rows(w)
    buf_rows = wr + _WIN_EXTRA_ROWS
    n_tiles = n // w
    na_rows = a_pad[0].shape[0] // _LANES
    nb_rows = b_pad[0].shape[0] // _LANES
    # see _merge_pair_fold_bitonic_call: no second buffer set for wide
    # records (scoped-VMEM OOM at 5 operands)
    prefetch = _merge_prefetch_ok(n_ops, w)
    n_bufs = 4 * n_ops if prefetch else 2 * n_ops

    def kernel(*refs):
        astart_r, aend_r, bstart_r, bend_r = refs[:4]
        a_ins = refs[4 : 4 + n_ops]
        b_ins = refs[4 + n_ops : 4 + 2 * n_ops]
        outs = refs[4 + 2 * n_ops : 4 + 3 * n_ops]
        bufs = refs[4 + 3 * n_ops : 4 + 3 * n_ops + n_bufs]
        sems = refs[4 + 3 * n_ops + n_bufs]
        t = pl.program_id(0)

        def make_copies(tt, base: int, sem_row: int):
            a_row_t = astart_r[tt] // _LANES
            b_row_t = bstart_r[tt] // _LANES
            copies = []
            for i in range(n_ops):
                copies.append(
                    pltpu.make_async_copy(
                        a_ins[i].at[pl.ds(a_row_t, wr + 1), :],
                        bufs[base + 2 * i].at[pl.ds(0, wr + 1), :],
                        sems.at[sem_row, 2 * i],
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        b_ins[i].at[pl.ds(b_row_t, wr + 1), :],
                        bufs[base + 2 * i + 1].at[pl.ds(0, wr + 1), :],
                        sems.at[sem_row, 2 * i + 1],
                    )
                )
            return copies

        a_s, a_e = astart_r[t], aend_r[t]
        b_s, b_e = bstart_r[t], bend_r[t]
        a_row = a_s // _LANES
        b_row = b_s // _LANES

        if not prefetch:
            copies = make_copies(t, 0, 0)
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            def load(i):
                return bufs[i][:]

        else:
            par = jax.lax.rem(t, 2)

            @pl.when(t == 0)
            def _():
                for c in make_copies(t, 0, 0):
                    c.start()

            @pl.when(par == 0)
            def _():
                for c in make_copies(t, 0, 0):
                    c.wait()

            @pl.when(par == 1)
            def _():
                for c in make_copies(t, 2 * n_ops, 1):
                    c.wait()

            @pl.when(t + 1 < n_tiles)
            def _():
                tn = jnp.minimum(t + 1, n_tiles - 1)

                @pl.when(par == 0)
                def _():
                    for c in make_copies(tn, 2 * n_ops, 1):
                        c.start()

                @pl.when(par == 1)
                def _():
                    for c in make_copies(tn, 0, 0):
                        c.start()

            is0 = par == 0

            # Deliberate benign race (see wload in the fused kernel): the
            # inactive buffer set may be mid-DMA; its lanes are discarded
            # by the select.
            def load(i):
                return jnp.where(is0, bufs[i][:], bufs[2 * n_ops + i][:])

        ea = a_s - a_row * _LANES
        eb = b_s - b_row * _LANES
        la = a_e - a_s
        lb = b_e - b_s
        i2 = _flat_iota((wr, _LANES))

        merged = []
        for i in range(n_ops):
            av = _dyn_shift_down(load(2 * i), ea)[:wr]
            bv = _dyn_shift_down(load(2 * i + 1), eb)[:wr]
            if i < num_keys:
                av = jnp.where(i2 < la, av, SENTINEL)
                bv = jnp.where(i2 < lb, bv, SENTINEL)
            else:
                av = jnp.where(i2 < la, av, jnp.uint32(0))
                bv = jnp.where(i2 < lb, bv, jnp.uint32(0))
            merged.append(jnp.concatenate([av, bv], axis=0))

        i_m = _flat_iota(merged[0].shape)
        merged = _odd_even_merge_stages(merged, num_keys, w, i_m)
        for o_ref, v in zip(outs, merged):
            o_ref[:] = v[:wr]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_ops),
        out_specs=[
            pl.BlockSpec(
                (wr, _LANES), lambda t, *_refs: (t, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_ops,
        scratch_shapes=[pltpu.VMEM((buf_rows, _LANES), jnp.uint32)] * n_bufs
        + [pltpu.SemaphoreType.DMA((2, 2 * n_ops))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((n // _LANES, _LANES), a_pad[0]) for _ in range(n_ops)
        ],
        interpret=interpret,
    )(
        a_start,
        a_end,
        b_start,
        b_end,
        *[v.reshape(na_rows, _LANES) for v in a_pad],
        *[v.reshape(nb_rows, _LANES) for v in b_pad],
    )
    return tuple(v.reshape(n) for v in out)
