"""Pattern-set sharding tests (parallel/pshard.py) on the CPU mesh.

Validates the model-parallel axis: S per-shard filters under one common
config must produce the SAME union survivor bitmap, event set, and
per-pattern counts as the single-filter engine — single-device (S probes
in one jit) and on the ("pat", "data") 2D mesh."""

import io

import jax
import numpy as np
import pytest

from tpu_pattern_matching.core.dfa import compile_patterns
from tpu_pattern_matching.core.oracle import match_python
from tpu_pattern_matching.parallel.pshard import (
    Mesh2DContext,
    ShardedBloom,
    global_pattern_counts,
    make_pattern_sharded_count_step,
    pad_shard_tables,
    shard_pattern_ids,
)
from tpu_pattern_matching.runtime.buffers import StreamState
from tpu_pattern_matching.runtime.session import MatchSession
from tests.fixtures import planted_binary


def _patterns(n=24, seed=7):
    rng = np.random.RandomState(seed)
    # mixed lengths (6..12) so the longest-first deal is exercised and
    # q/w choices are constrained by the global minimum
    return [
        bytes(rng.randint(0, 256, size=rng.randint(6, 13)).astype(np.uint8))
        for _ in range(n)
    ]


def _oracle_set(patterns, data):
    return {(off, pid) for off, pid in match_python(patterns, data)}


def _event_set(events):
    got = set()
    for ev in events:
        for off, pid in ev.expand():
            got.add((off, pid))
    return got


def test_shard_pattern_ids_balanced():
    lens = [3, 9, 5, 7, 4, 8, 6, 10]
    parts = shard_pattern_ids(lens, 3)
    assert sorted(np.concatenate(parts).tolist()) == list(range(8))
    # globally shortest pattern (len 3, id 0) is dealt last: shard (N-1)%S
    assert 0 in parts[(len(lens) - 1) % 3]
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


def test_sharded_build_common_config_and_coverage():
    pats = _patterns()
    sb = ShardedBloom.build([list(p) for p in pats], 4)
    assert sb.words.shape[0] == 4
    assert sb.n_shards == 4
    # every pattern in exactly one shard
    assert sorted(np.concatenate(sb.parts).tolist()) == list(range(len(pats)))
    # shard filters differ (different grams) under one config
    assert not np.array_equal(sb.words[0], sb.words[1])


def test_sharded_session_matches_oracle_single_device():
    pats = _patterns()
    data, _ = planted_binary(11, 1 << 14, pats, 40)
    table = compile_patterns(pats)

    sess1 = MatchSession(table, max_chunks=128, chunk_len=256,
                         engine="bloom")
    sessS = MatchSession(table, max_chunks=128, chunk_len=256,
                         engine="bloom", pat_shards=4)
    assert sessS.pat_shards == 4
    want = _oracle_set(pats, data)
    got1 = set(sess1.find(data))
    gotS = set(sessS.find(data))
    assert got1 == want
    assert gotS == want


def test_sharded_union_bitmap_superset_of_single():
    # the union bitmap must cover every TRUE gram position: compare
    # event sets batch-by-batch through scan/decode
    pats = _patterns(n=12, seed=3)
    data, _ = planted_binary(5, 1 << 13, pats, 25)
    table = compile_patterns(pats)
    sess = MatchSession(table, max_chunks=64, chunk_len=256,
                        engine="bloom", pat_shards=3)
    buf = sess.new_buffer()
    buf.add_stream(io.BytesIO(data), StreamState(file_id=0))
    bm = sess.scan_and_decode(buf.to_batch())
    assert _event_set(bm.events) == _oracle_set(pats, data)


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device simulated CPU mesh")
    return jax.devices()[:8]


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_session_2d_mesh_matches_oracle(devices8, n_shards):
    pats = _patterns()
    data, _ = planted_binary(13, 1 << 14, pats, 40)
    table = compile_patterns(pats)
    from tpu_pattern_matching.parallel.mesh import make_mesh

    mesh = make_mesh(devices8)
    sess = MatchSession(table, max_chunks=1024, chunk_len=128,
                        engine="bloom", mesh=mesh, pat_shards=n_shards)
    # lane alignment: data_size * 128 lanes
    assert sess.max_chunks % ((8 // n_shards) * 128) == 0
    got = set(sess.find(data))
    assert got == _oracle_set(pats, data)


def test_sharded_2d_mesh_bitmap_equals_single_device(devices8):
    # the union bitmap from the ("pat","data") mesh must be bit-identical
    # to the single-device S-probe union
    pats = _patterns(n=16, seed=21)
    table = compile_patterns(pats)
    sb = ShardedBloom.from_table(table, 2)

    rng = np.random.RandomState(4)
    lanes, T = 128 * 4, 256
    data = rng.randint(0, 256, size=(lanes, T)).astype(np.uint8)
    for ln in (0, 100, 300):
        p = pats[ln % len(pats)]
        data[ln, 50 : 50 + len(p)] = np.frombuffer(p, np.uint8)
    bounds = np.stack([np.zeros(lanes, np.int32),
                       np.full(lanes, T, np.int32)])

    dev1 = sb.put()
    h1 = dev1.hits(jax.device_put(data), jax.device_put(bounds))

    ctx2 = Mesh2DContext.build(devices8, 2)  # 2 pat x 4 data
    from tpu_pattern_matching.parallel.pshard import (
        make_pattern_sharded_bloom_step,
    )

    devM = sb.put(ctx2.pat_sharded)
    step = make_pattern_sharded_bloom_step(ctx2, devM)
    totalM, bitsM = step(
        devM.words,
        jax.device_put(data, ctx2.lane_sharded),
        jax.device_put(bounds, ctx2.lane_sharded2d),
    )
    assert int(np.asarray(totalM)[0]) == int(np.asarray(h1.meta)[0]) > 0
    np.testing.assert_array_equal(np.asarray(bitsM), np.asarray(h1.bits))


def test_pattern_sharded_count_step(devices8):
    # the all-device count path with the TABLE sharded over "pat":
    # global per-pattern counts must equal the oracle's
    pats = [b" alpha ", b" beta ", b" gamma ", b" delta "]
    words = (b" alpha  beta  alpha  gamma " * 30) + b" delta  beta "
    table = compile_patterns(pats)
    sb = ShardedBloom.from_table(table, 2)
    shard_tables = [
        compile_patterns([pats[i] for i in part]) for part in sb.parts
    ]

    ctx2 = Mesh2DContext.build(devices8, 2)
    dev = sb.put(ctx2.pat_sharded)
    sess = MatchSession(table, max_chunks=512, chunk_len=64,
                        engine="bloom", bloom_table=sb)
    step = make_pattern_sharded_count_step(
        ctx2, dev, shard_tables, halo=sess.halo, k_cand=512, k_ev=512
    )
    flat, gids, _lmax, _gmax = pad_shard_tables(shard_tables)

    buf = sess.new_buffer()
    buf.add_stream(io.BytesIO(words), StreamState(file_id=0))
    b = buf.to_batch()
    gcounts, n_ev, flags = step(
        dev.words,
        jax.device_put(flat, ctx2.pat_sharded),
        jax.device_put(gids, ctx2.pat_sharded),
        jax.device_put(b.data, ctx2.lane_sharded),
        jax.device_put(np.stack([b.start_t, b.end_t]),
                       ctx2.lane_sharded2d),
    )
    assert not np.asarray(flags).any()
    pc = global_pattern_counts(sb, shard_tables, gcounts)
    want = np.zeros(len(pats), np.int64)
    for _off, pid in match_python(pats, words):
        want[pid] += 1
    np.testing.assert_array_equal(pc, want)
    assert int(np.asarray(n_ev).sum()) == int(want.sum())


def test_sharded_bloom_save_load_roundtrip(tmp_path):
    pats = _patterns(n=10, seed=9)
    table = compile_patterns(pats)
    sb = ShardedBloom.from_table(table, 3)
    path = str(tmp_path / "psb.npz")
    sb.save(path)
    sb2 = ShardedBloom.load(path)
    assert sb2.cfg == sb.cfg
    np.testing.assert_array_equal(sb2.words, sb.words)
    assert [p.tolist() for p in sb2.parts] == [p.tolist() for p in sb.parts]
    assert sb2.n_grams == sb.n_grams

    # a flat dump must be rejected with a clear error
    from tpu_pattern_matching.ops.bloom import BloomFilterTable

    flat = BloomFilterTable.from_table(table)
    fpath = str(tmp_path / "flat.npz")
    flat.save(fpath)
    with pytest.raises(ValueError, match="flat filter"):
        ShardedBloom.load(fpath)


def test_pat_shards_validation():
    pats = _patterns(n=6)
    table = compile_patterns(pats)
    with pytest.raises(ValueError, match="dense"):
        MatchSession(table, engine="dense", pat_shards=2)
    with pytest.raises(ValueError, match="shards"):
        ShardedBloom.from_table(table, 7)  # 7 shards, 6 patterns
    sb = ShardedBloom.from_table(table, 2)
    with pytest.raises(ValueError, match="precompiled"):
        MatchSession(table, engine="bloom", bloom_table=sb, pat_shards=3)
    # pat_shards inferred from a precompiled sharded filter
    sess = MatchSession(table, engine="bloom", bloom_table=sb)
    assert sess.pat_shards == 2


def test_pat_shards_with_device_verify():
    # composition: the union bitmap feeds the device verify stage (which
    # walks the GLOBAL table) — events must stay oracle-exact
    pats = _patterns(n=12, seed=31)
    data, _ = planted_binary(17, 1 << 13, pats, 25)
    table = compile_patterns(pats)
    sess = MatchSession(table, max_chunks=64, chunk_len=256,
                        engine="bloom", pat_shards=3, verify="device")
    assert set(sess.find(data)) == _oracle_set(pats, data)


def test_pattern_sharded_count_step_refined(devices8):
    # per-shard exact-gram refinement on the pat-sharded count path:
    # each device erases union candidates outside ITS shard's gram set;
    # per-pattern counts stay oracle-exact and flags stay clean even
    # with a small per-shard walk capacity
    pats = [b" alpha ", b" beta ", b" gamma ", b" delta "]
    words = (b" alpha  beta  alpha  gamma " * 30) + b" delta  beta "
    table = compile_patterns(pats)
    sb = ShardedBloom.from_table(table, 2)
    assert sb.shard_gram_keys is not None
    shard_tables = [
        compile_patterns([pats[i] for i in part]) for part in sb.parts
    ]
    ctx2 = Mesh2DContext.build(devices8, 2)
    dev = sb.put(ctx2.pat_sharded)
    sess = MatchSession(table, max_chunks=512, chunk_len=64,
                        engine="bloom", bloom_table=sb)
    step = make_pattern_sharded_count_step(
        ctx2, dev, shard_tables, halo=sess.halo, k_cand=512, k_ev=512,
        shard_gram_keys=sb.shard_gram_keys, k_walk=256,
    )
    flat, gids, _lmax, _gmax = pad_shard_tables(shard_tables)
    buf = sess.new_buffer()
    buf.add_stream(io.BytesIO(words), StreamState(file_id=0))
    b = buf.to_batch()
    gcounts, n_ev, flags = step(
        dev.words,
        jax.device_put(flat, ctx2.pat_sharded),
        jax.device_put(gids, ctx2.pat_sharded),
        jax.device_put(b.data, ctx2.lane_sharded),
        jax.device_put(np.stack([b.start_t, b.end_t]),
                       ctx2.lane_sharded2d),
    )
    assert not np.asarray(flags).any()
    pc = global_pattern_counts(sb, shard_tables, gcounts)
    want = np.zeros(len(pats), np.int64)
    for _off, pid in match_python(pats, words):
        want[pid] += 1
    np.testing.assert_array_equal(pc, want)


def test_sharded_save_load_keeps_gram_keys(tmp_path):
    pats = _patterns(n=10, seed=9)
    table = compile_patterns(pats)
    sb = ShardedBloom.from_table(table, 3)
    path = str(tmp_path / "psb_keys.npz")
    sb.save(path)
    sb2 = ShardedBloom.load(path)
    assert len(sb2.shard_gram_keys) == 3
    for a, b in zip(sb.shard_gram_keys, sb2.shard_gram_keys):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(sb.gram_keys, sb2.gram_keys)
