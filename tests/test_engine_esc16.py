"""esc16 escape-engine conformance: the escape-encoded int16 fast path must
produce bit-identical results to the dense signed-table walk, including on
automatons larger than 2**15 states where escape cells mark deep (not just
final) transitions."""

import numpy as np
import pytest

from tpu_pattern_matching.core.dfa import AhoCorasick, compile_patterns
from tpu_pattern_matching.core.oracle import match_python
from tpu_pattern_matching.ops.match_xla import scan_batch
from tpu_pattern_matching.ops.table import DeviceTable
from tpu_pattern_matching.runtime.session import MatchSession


def oracle(patterns, data):
    return sorted(match_python(patterns, data))


def _scan_both(table, data, start_t, end_t, halo, max_results=16):
    dense = DeviceTable.put(table)
    esc = DeviceTable.put(table, esc16=True)
    assert dense.table_esc16 is None
    assert esc.table_esc16.dtype == np.int16
    out = []
    for dev in (dense, esc):
        r = scan_batch(dev, data, start_t, end_t, halo=halo,
                       max_results=max_results)
        out.append(
            (np.asarray(r.counts), np.asarray(r.slot_state),
             np.asarray(r.slot_pos))
        )
    return out


def _assert_equal(a, b):
    for x, y, name in zip(a, b, ("counts", "slot_state", "slot_pos")):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_esc16_encoding_cells():
    # deep table: force state ids past 2**15 so escape marks deep targets
    rng = np.random.RandomState(0)
    pats = [bytes(rng.randint(0, 256, size=10).astype(np.uint8))
            for _ in range(4000)]
    table = compile_patterns(pats)
    assert table.num_states > 2**15  # the regime esc16 exists for
    dev = DeviceTable.put(table, esc16=True)
    esc = np.asarray(dev.table_esc16)
    flat = np.asarray(dev.table_flat).astype(np.int64)
    expect = np.where((flat >= 0) & (flat < 2**15), flat, -1)
    np.testing.assert_array_equal(esc.astype(np.int64), expect)


def test_esc16_matches_dense_deep_table():
    rng = np.random.RandomState(1)
    pats = [bytes(rng.randint(0, 256, size=10).astype(np.uint8))
            for _ in range(4000)]
    table = compile_patterns(pats)
    assert table.num_states > 2**15
    C, B = 8, 64
    halo = 16  # multiple of the 8-wide unroll; >= max_pat_len - 1
    data = rng.randint(0, 256, size=(C, halo + B)).astype(np.uint8)
    # plant occurrences: mid-lane, at a block boundary (t = halo + 8 is the
    # end of an unroll block), and straddling into the halo of lane 3
    data[0, halo + 20 : halo + 30] = np.frombuffer(pats[7], np.uint8)
    data[1, halo - 2 : halo + 8] = np.frombuffer(pats[99], np.uint8)
    data[3, halo + B - 10 :] = np.frombuffer(pats[2024], np.uint8)
    start_t = np.full(C, halo, np.int32)
    start_t[1] = halo - 2  # lane 1 carries 2 bytes of history for the plant
    end_t = np.full(C, halo + B, np.int32)
    dense, esc = _scan_both(table, data, start_t, end_t, halo)
    _assert_equal(dense, esc)
    assert dense[0].sum() >= 3  # the planted matches were seen at all


def test_esc16_matches_dense_shallow_finals():
    # short patterns => finals are shallow states; escape must still fire
    pats = [b"ab", b"b", b"abc", b"xy"]
    table = compile_patterns(pats)
    C, B, halo = 4, 32, 8
    rng = np.random.RandomState(2)
    # match-dense input: every block escapes => slow path exercised heavily
    data = rng.choice(
        np.frombuffer(b"abxyz", np.uint8), size=(C, halo + B)
    ).astype(np.uint8)
    start_t = np.full(C, halo, np.int32)
    end_t = np.full(C, halo + B, np.int32)
    dense, esc = _scan_both(table, data, start_t, end_t, halo, max_results=64)
    _assert_equal(dense, esc)
    assert dense[0].sum() > 0


def test_esc16_session_parity_vs_oracle():
    # end-to-end through MatchSession on both engines, exact oracle parity
    rng = np.random.RandomState(3)
    pats = [bytes(rng.randint(0, 4, size=3).astype(np.uint8) + ord("a"))
            for _ in range(50)]
    pats = list(dict.fromkeys(pats))
    data = bytes(rng.choice(np.frombuffer(b"abcdxyz", np.uint8),
                            size=4096).astype(np.uint8))
    want = oracle(pats, data)
    for engine in ("dense", "esc16"):
        sess = MatchSession(compile_patterns(pats), max_chunks=8,
                            chunk_len=64, max_results=64, engine=engine)
        assert sess.find(data) == want, engine


def test_esc16_carry_across_escape_blocks():
    # a long pattern walks deep states across MANY consecutive unroll
    # blocks; every block along the chain escapes and the slow path must
    # carry exact deep states block-to-block
    pat = bytes(range(1, 41))  # 40 bytes: 5 full unroll blocks deep
    filler = [bytes([200 + i, 201, 202]) for i in range(20)]
    pats = [pat] + filler
    table = compile_patterns(pats)
    C, B = 2, 80
    halo = 40  # pad_halo(39, ...) -> 40
    data = np.zeros((C, halo + B), np.uint8)
    data[0, halo + 5 : halo + 45] = np.frombuffer(pat, np.uint8)
    # straddle: starts in lane 0's tail, ends in lane 1's span
    data[0, halo + B - 20 :] = np.frombuffer(pat[:20], np.uint8)
    data[1, halo - 20 : halo] = np.frombuffer(pat[:20], np.uint8)
    data[1, halo : halo + 20] = np.frombuffer(pat[20:], np.uint8)
    start_t = np.array([halo, halo - 20], np.int32)
    end_t = np.full(C, halo + B, np.int32)
    dense, esc = _scan_both(table, data, start_t, end_t, halo)
    _assert_equal(dense, esc)
    assert dense[0].tolist() == [1, 1]


def test_esc16_ushort_alphabet():
    ac = AhoCorasick(alphabet_size=2048)
    seqs = [(40, 1500, 1500), (1000, 999), (7, 7, 7, 7)]
    for s in seqs:
        ac.add_pattern(s)
    table = ac.compile()
    C, B, halo = 2, 16, 8
    lane0 = [3, 40, 1500, 1500, 9, 1000, 999, 7, 7, 7, 7, 7, 0, 0, 0, 0]
    data = np.zeros((C, halo + B), np.int32)
    data[0, halo : halo + 16] = lane0
    start_t = np.full(C, halo, np.int32)
    end_t = np.full(C, halo + B, np.int32)
    dense, esc = _scan_both(table, data, start_t, end_t, halo)
    _assert_equal(dense, esc)
    # 40,1500,1500 + 1000,999 + 7777 twice + ... oracle the counts
    assert dense[0][0] >= 4


def test_dense_engine_still_selectable_via_cli_flag():
    from tpu_pattern_matching.cli import build_argparser

    args = build_argparser().parse_args(["-f", "x", "--engine", "esc16"])
    assert args.engine == "esc16"
    args = build_argparser().parse_args(["-f", "x"])
    assert args.engine == "auto"
