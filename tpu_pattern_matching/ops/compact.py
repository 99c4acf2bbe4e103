"""Match compaction and sorting.

TPU-native replacement for the reference's three-kernel pipeline:

- prefix sum over per-chunk counts: the Apple-style recursive Blelloch scan
  (ocl_prefix_sum.c:389-498 + prefixsum.cl) becomes a single ``jnp.cumsum`` —
  XLA:TPU lowers this natively; the reference's canonical tree ships this
  path latently broken (it loads an empty ``scan_kernel.cl``,
  ocl_prefix_sum.c:71-77).
- stream compaction: the scatter of column-major match slots to
  prefix-sum offsets (compactarray.cl:40-68) becomes one vectorized
  ``.at[idx].set(..., mode="drop")`` scatter into a fixed-capacity array.
- sorting: the NVIDIA-sample bitonic sorter the reference never wired in
  (ocl_bitonic_sort.c references clconf fields that don't exist — SURVEY.md
  section 2.1) becomes ``jax.lax.sort`` over (offset, value) operands.

All shapes are static (``capacity`` slots), keeping the whole pipeline
jit-compatible; ``reported`` says how many leading slots are live.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tpu_pattern_matching.ops.match_xla import ScanResult
from tpu_pattern_matching.ops.table import DeviceTable


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CompactMatches:
    """Dense (lane, pos, state, gid, rep_pid) tuples for one batch.

    ``total`` is the exact event count (including per-lane slot overflow);
    ``reported`` is the number of live entries (<= capacity). Entries beyond
    ``reported`` are zero-filled. ``pos`` is the match END offset within the
    lane's own span; absolute stream/file offsets are ``base_off[lane] + pos``
    computed host-side in 64-bit (device arrays stay int32 — JAX default).
    """

    total: jax.Array  # scalar int32
    reported: jax.Array  # scalar int32
    lane: jax.Array  # [K] int32
    pos: jax.Array  # [K] int32
    state: jax.Array  # [K] int32
    gid: jax.Array  # [K] int32
    rep_pid: jax.Array  # [K] int32


@functools.partial(jax.jit, static_argnames=("capacity",))
def _compact_jit(counts, slot_state, slot_pos, state_gid, group_rep, *, capacity):
    C, R = slot_state.shape
    rep = jnp.minimum(counts, R)
    # exclusive prefix sum over reported per-lane counts (the
    # ocl_prefix_sum role)
    starts = jnp.cumsum(rep) - rep
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (C, R), 1)
    dst = starts[:, None] + r_iota
    live = r_iota < rep[:, None]
    dst = jnp.where(live & (dst < capacity), dst, capacity)  # drop overflow
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (C, R), 0)

    out_lane = jnp.zeros((capacity,), jnp.int32).at[dst.ravel()].set(
        lane_ids.ravel(), mode="drop"
    )
    out_pos = jnp.zeros((capacity,), jnp.int32).at[dst.ravel()].set(
        slot_pos.ravel(), mode="drop"
    )
    out_state = jnp.zeros((capacity,), jnp.int32).at[dst.ravel()].set(
        slot_state.ravel(), mode="drop"
    )
    reported = jnp.minimum(jnp.sum(rep), capacity)
    total = jnp.sum(counts)
    gid = jnp.where(out_state > 0, jnp.take(state_gid, out_state, mode="clip"), -1)
    rep_pid = jnp.where(gid >= 0, jnp.take(group_rep, gid, mode="clip"), -1)
    return total, reported, out_lane, out_pos, out_state, gid, rep_pid


def compact_matches(
    table: DeviceTable,
    result: ScanResult,
    capacity: int | None = None,
) -> CompactMatches:
    """Compact per-lane slots into dense match tuples (device-side)."""
    C, R = result.slot_state.shape
    if capacity is None:
        capacity = C * R
    total, reported, lane, pos, state, gid, rep_pid = _compact_jit(
        result.counts,
        result.slot_state,
        result.slot_pos,
        table.state_gid,
        table.group_rep,
        capacity=capacity,
    )
    return CompactMatches(
        total=total,
        reported=reported,
        lane=lane,
        pos=pos,
        state=state,
        gid=gid,
        rep_pid=rep_pid,
    )


@functools.partial(jax.jit, static_argnames=("chunk_len",))
def _sort_jit(reported, lane, pos, state, gid, rep_pid, *, chunk_len):
    K = lane.shape[0]
    # key = within-batch absolute position; dead slots pushed to the end
    key = lane * chunk_len + pos
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0).squeeze(-1)
    key = jnp.where(slot_iota < reported, key, jnp.iinfo(jnp.int32).max)
    key, lane, pos, state, gid, rep_pid = jax.lax.sort(
        (key, lane, pos, state, gid, rep_pid), num_keys=1
    )
    return lane, pos, state, gid, rep_pid


def sort_matches(m: CompactMatches, chunk_len: int) -> CompactMatches:
    """Order compacted matches by within-batch position (BitonicSort role)."""
    lane, pos, state, gid, rep_pid = _sort_jit(
        m.reported, m.lane, m.pos, m.state, m.gid, m.rep_pid, chunk_len=chunk_len
    )
    return CompactMatches(
        total=m.total,
        reported=m.reported,
        lane=lane,
        pos=pos,
        state=state,
        gid=gid,
        rep_pid=rep_pid,
    )


def per_group_counts(table: DeviceTable, m: CompactMatches) -> jax.Array:
    """Per-match-group event counts [G] (device-side, psum-able).

    Exact when no lane overflowed its result slots; the sentiment/count
    workload (BASELINE config 5) reduces this across the mesh with psum and
    expands groups to per-pattern scores host-side.
    """

    @jax.jit
    def _f(gid, reported):
        K = gid.shape[0]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0).squeeze(-1)
        live = (slot_iota < reported) & (gid >= 0)
        return (
            jnp.zeros((table.num_groups,), jnp.int32)
            .at[jnp.where(live, gid, table.num_groups)]
            .add(live.astype(jnp.int32), mode="drop")
        )

    return _f(m.gid, m.reported)
