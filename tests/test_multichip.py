"""Multi-chip sharding tests on the simulated 8-device CPU mesh.

Validates: lane-sharded scan produces identical results to single-device,
and per-group count reduction is globally correct (the psum workload)."""

import io

import jax
import numpy as np
import pytest

from tpu_pattern_matching.core.dfa import compile_patterns
from tpu_pattern_matching.core.oracle import match_python
from tpu_pattern_matching.ops.table import DeviceTable
from tpu_pattern_matching.parallel.mesh import MeshContext, make_mesh, make_sharded_scan_step
from tpu_pattern_matching.runtime.buffers import DataBuffer, StreamState
from tpu_pattern_matching.runtime.session import MatchSession
from tests.fixtures import planted_binary


@pytest.fixture(scope="module")
def mesh_ctx():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (simulated CPU mesh)")
    return MeshContext(make_mesh())


def test_sharded_scan_matches_oracle(mesh_ctx):
    patterns = [b"\xde\xad\xbe\xef", b"needle!", b"abc"]
    data, _ = planted_binary(21, 1 << 14, patterns, 30)
    table = compile_patterns(patterns)

    C, B = 64, 256  # 64 lanes over 8 devices
    halo = table.max_pat_len - 1
    buf = DataBuffer(C, B, halo)
    buf.add_stream(io.BytesIO(data), StreamState(file_id=0))
    batch = buf.to_batch()

    dev = DeviceTable.put(table, mesh_ctx.replicated)
    step = make_sharded_scan_step(
        mesh_ctx, dev, halo=halo, max_results=16, num_groups=table.num_groups
    )
    data_sh = jax.device_put(batch.data, mesh_ctx.lane_sharded)
    counts, slot_state, slot_pos, gcounts = step(
        dev.table_flat, dev.state_gid, data_sh, batch.start_t, batch.end_t
    )

    # decode to (end_offset, pid) and compare to oracle
    counts = np.asarray(counts)
    slot_state = np.asarray(slot_state)
    slot_pos = np.asarray(slot_pos)
    groups = table.groups_as_lists()
    sgid = table.state_gid
    got = []
    for ln in range(C):
        for r in range(min(counts[ln], 16)):
            st = slot_state[ln, r]
            off = int(batch.base_off[ln]) + int(slot_pos[ln, r])
            for pid in groups[sgid[st]]:
                got.append((off, pid))
    assert sorted(got) == sorted(match_python(patterns, data))

    # group counts: total events == number of matching positions
    ev = match_python(patterns, data)
    assert int(np.asarray(gcounts).sum()) == len({off for off, _ in ev})


def test_sharded_equals_unsharded(mesh_ctx):
    patterns = [b"ab", b"bc"]
    data = b"abcabc" * 100
    table = compile_patterns(patterns)
    sess = MatchSession(table, max_chunks=16, chunk_len=64, engine="dense")
    expect = sess.find(data)

    dev = DeviceTable.put(table, mesh_ctx.replicated)
    halo = table.max_pat_len - 1
    buf = DataBuffer(16, 64, halo)
    buf.add_stream(io.BytesIO(data), StreamState(file_id=0))
    batch = buf.to_batch()
    step = make_sharded_scan_step(
        mesh_ctx, dev, halo=halo, max_results=16, num_groups=table.num_groups
    )
    counts, slot_state, slot_pos, _ = step(
        dev.table_flat,
        dev.state_gid,
        jax.device_put(batch.data, mesh_ctx.lane_sharded),
        batch.start_t,
        batch.end_t,
    )
    groups = table.groups_as_lists()
    got = []
    for ln in range(16):
        for r in range(min(int(counts[ln]), 16)):
            st = int(np.asarray(slot_state)[ln, r])
            off = int(batch.base_off[ln]) + int(np.asarray(slot_pos)[ln, r])
            for pid in groups[table.state_gid[st]]:
                got.append((off, pid))
    assert sorted(got) == expect
