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


def test_sharded_bloom_equals_unsharded():
    # the flagship bloom engine under shard_map: survivor bitmap and total
    # must be identical to the single-device probe
    import jax
    import numpy as np

    from tpu_pattern_matching.core.dfa import compile_patterns
    from tpu_pattern_matching.ops.bloom import BloomFilterTable, _hits_jit
    from tpu_pattern_matching.parallel.mesh import (
        MeshContext,
        make_mesh,
        make_sharded_bloom_step,
    )

    rng = np.random.RandomState(3)
    pats = [bytes(rng.randint(0, 256, size=8).astype(np.uint8))
            for _ in range(16)]
    table = compile_patterns(pats)
    bft = BloomFilterTable.from_table(table)

    n_dev = 8
    lanes = 128 * n_dev  # multiple of the 128-lane tile per shard
    T = 256
    data = rng.randint(0, 256, size=(lanes, T)).astype(np.uint8)
    for ln in (0, 200, 1023):  # plant occurrences
        data[ln, 100:108] = np.frombuffer(pats[ln % 16], np.uint8)
    bounds = np.stack([np.zeros(lanes, np.int32),
                       np.full(lanes, T, np.int32)])

    total1, bits1 = _hits_jit(
        jax.device_put(data), jax.device_put(bounds),
        jax.device_put(bft.words), cfg=bft.cfg, interpret=True,
    )

    ctx = MeshContext(make_mesh(jax.devices()[:n_dev]))
    bloom = bft.put(ctx.replicated)
    step = make_sharded_bloom_step(ctx, bloom)
    totalN, bitsN = step(
        bloom.words,
        jax.device_put(data, ctx.lane_sharded),
        jax.device_put(bounds, ctx.lane_sharded2d),
    )
    assert int(totalN[0]) == int(total1[0]) > 0
    np.testing.assert_array_equal(np.asarray(bitsN), np.asarray(bits1))
