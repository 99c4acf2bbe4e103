"""Bloom engine conformance: the Pallas q-gram filter + exact host verify
must reproduce the CPU oracle's exact (end_offset, pattern_index) events —
the same contract the dense engine meets. Runs in Pallas interpret mode on
the CPU mesh (tests/conftest.py)."""

import io

import numpy as np
import pytest

from tpu_pattern_matching.core.dfa import AhoCorasick, compile_patterns
from tpu_pattern_matching.core.oracle import match_python
from tpu_pattern_matching.ops.bloom import BloomFilterTable
from tpu_pattern_matching.runtime.session import MatchSession
from tests.fixtures import planted_binary, random_words_corpus


def oracle(patterns, data):
    return sorted(match_python(patterns, data))


def bloom_session(pats, **kw):
    kw.setdefault("engine", "bloom")
    return MatchSession(compile_patterns(pats), **kw)


def test_auto_engine_platform_aligned():
    # auto = bloom only on TPU platforms (ADVICE round 1: on CPU the Pallas
    # probe runs in interpret mode — correct but orders of magnitude
    # slower); this suite runs on the CPU mesh, so auto must pick dense
    from tpu_pattern_matching.engine import on_tpu

    sess = MatchSession(compile_patterns([b"abcd"]), max_chunks=2,
                        chunk_len=64)
    if on_tpu():
        assert sess.engine == "bloom"
        assert sess.dev is None  # no DFA table shipped to the device
    else:
        assert sess.engine == "dense"
    # forcing bloom always works regardless of platform
    forced = MatchSession(compile_patterns([b"abcd"]), max_chunks=2,
                          chunk_len=64, engine="bloom")
    assert forced.engine == "bloom" and forced.dev is None


def test_simple_words():
    pats = [b"he", b"she", b"his", b"hers"]
    sess = bloom_session(pats, max_chunks=4, chunk_len=64)
    data = b"ushers and his, she sells hershey"
    assert sess.find(data) == oracle(pats, data)


def test_wide_stride_selected_for_small_sets():
    bft = BloomFilterTable.build([b"0123456789ab"] * 3)
    assert bft.cfg.q <= bft.cfg.stride <= 12 - bft.cfg.q + 1
    assert bft.cfg.stride > 1  # cheap per-byte probing for tiny sets
    assert bft.fp_est <= 1e-3


def test_gram_load_limited_for_large_sets():
    # big sets must limit the bloom's gram load: either the stride
    # (grams/pattern) shrinks, or the chooser switches to winnowing-sampled
    # mode (~1 fingerprint gram per pattern — the round-2 10k+ winner)
    rng = np.random.RandomState(0)
    pats = [bytes(rng.randint(0, 256, size=12).astype(np.uint8))
            for _ in range(10_000)]
    small = BloomFilterTable.build(pats[:100])
    big = BloomFilterTable.build(pats)
    # per-BYTE candidate rate must stay inside the chooser's rate cap
    # (<= 4e-3: a soft verify surcharge replaced the hard 1e-3 target in
    # round 2 — measured faster to spend a little verify headroom)
    if big.cfg.sampled:
        assert big.n_grams <= 10_000 + 100  # ~1 fingerprint per pattern
        assert big.fp_est * 2 / (big.cfg.w + 1) <= 4e-3
    else:
        assert big.cfg.stride <= small.cfg.stride
        assert big.n_grams <= 10_000 * big.cfg.stride
        assert big.fp_est / big.cfg.stride <= 4e-3


def test_narrow_stride_end_to_end():
    rng = np.random.RandomState(1)
    pats = list({bytes(rng.randint(0, 256, size=8).astype(np.uint8))
                 for _ in range(400)})
    sess = bloom_session(pats, max_chunks=4, chunk_len=128)
    cfg = sess.bloom_table.cfg
    assert cfg.q <= cfg.stride <= 8 - cfg.q + 1
    data = bytearray(rng.randint(0, 256, size=1024).astype(np.uint8))
    for pos in (0, 100, 250, 1016):
        data[pos : pos + 8] = pats[pos % len(pats)]
    data = bytes(data)
    assert sess.find(data) == oracle(pats, data)


def test_match_at_chunk_boundaries():
    pats = [b"abcde"]
    data = b"".join(b"xxx" + b"abcde" for _ in range(20))
    sess = bloom_session(pats, max_chunks=8, chunk_len=8)
    assert sess.find(data) == oracle(pats, data)


def test_match_straddles_batch_boundary():
    pats = [b"abcdefgh", b"12345"]
    data = b"zz" + b"abcdefgh" + b"q" * 9 + b"12345" + b"abcdefgh" * 3
    sess = bloom_session(pats, max_chunks=2, chunk_len=8)
    assert sess.find(data) == oracle(pats, data)


def test_no_false_match_from_padding():
    pats = [b"ab\x00\x00"]
    sess = bloom_session(pats, max_chunks=4, chunk_len=8)
    assert sess.find(b"xxxxxxab") == []
    data2 = b"xxab\x00\x00yy"
    assert sess.find(data2) == oracle(pats, data2)


def test_no_false_match_from_missing_history():
    pats = [b"\x00\x00ab"]
    sess = bloom_session(pats, max_chunks=4, chunk_len=4)
    assert sess.find(b"abzzzz") == []
    data2 = b"q\x00\x00abzz"
    assert sess.find(data2) == oracle(pats, data2)


def test_overlapping_and_repeated():
    pats = [b"aa", b"aaa"]
    data = b"a" * 50
    sess = bloom_session(pats, max_chunks=4, chunk_len=8)
    assert sess.find(data) == oracle(pats, data)


def test_single_byte_patterns():
    pats = [b"x", b"yz"]
    data = b"wxyzxxzy"
    sess = bloom_session(pats, max_chunks=2, chunk_len=8)
    assert sess.find(data) == oracle(pats, data)


def test_co_terminating_patterns_grouped():
    pats = [b"hers", b"ers", b"rs"]
    sess = bloom_session(pats, max_chunks=2, chunk_len=32)
    data = b"ushers"
    got = list(sess.scan_stream(io.BytesIO(data)))
    events = [ev for bm in got for ev in bm.events]
    assert len(events) == 1  # one event carries all co-terminating pids
    assert events[0].pattern_indices == [0, 1, 2]
    assert events[0].end_offset == 5


def test_match_storm_bitmap_complete():
    # every position matches: the bitmap has no capacity cap to overflow
    pats = [b"ab"]
    data = b"ab" * 200
    sess = bloom_session(pats, max_chunks=2, chunk_len=64)
    assert sess.find(data) == oracle(pats, data)


def test_nocase_bloom():
    ac = AhoCorasick(nocase=True)
    ac.add_pattern(b"Needle")
    ac.add_pattern(b"HAYstack")
    table = ac.compile()
    sess = MatchSession(table, max_chunks=4, chunk_len=32, engine="bloom")
    data = b"a nEEdLe in the HaySTACK, needle"
    got = sess.find(data)
    folded = bytes(c + 32 if 65 <= c <= 90 else c for c in data)
    want = oracle([b"needle", b"haystack"], folded)
    assert got == want
    assert len(got) == 3


def test_planted_binary_multi_batch():
    pats = [b"\xde\xad\xbe\xef", b"needle!", b"\x01\x02\x03\x04\x05\x06"]
    data, _ = planted_binary(13, 1 << 15, pats, 60)
    sess = bloom_session(pats, max_chunks=16, chunk_len=256)
    assert sess.find(data) == oracle(pats, data)


def test_word_corpus_parity():
    pats, data = random_words_corpus(seed=5)
    sess = bloom_session(pats, max_chunks=8, chunk_len=128)
    assert sess.find(data) == oracle(pats, data)


def test_text_mode_lines():
    pats = [b"good", b"bad"]
    sess = bloom_session(pats, max_chunks=4, chunk_len=16)
    data = b"this is good\nbad line\ngoodbad\n"
    got = sess.find(data, text_mode=True)
    assert got == oracle(pats, data)


def test_fp_estimate_reported():
    bft = BloomFilterTable.build([b"0123456789ab"] * 10)
    assert 0.0 <= bft.fp_est < 1e-3


def test_long_pattern_exceeds_chunk():
    pat = bytes(range(32, 80))  # 48 bytes, chunk_len 16
    pats = [pat]
    data = b"z" * 10 + pat + b"y" * 20 + pat
    sess = bloom_session(pats, max_chunks=4, chunk_len=16)
    assert sess.find(data) == oracle(pats, data)


def test_bloom_table_save_load(tmp_path):
    bft = BloomFilterTable.build([b"alpha_bravo!", b"charlie_echo"])
    p = str(tmp_path / "bloom.npz")
    bft.save(p)
    back = BloomFilterTable.load(p)
    assert back.cfg == bft.cfg
    np.testing.assert_array_equal(back.words, bft.words)
    assert back.max_pat_len == bft.max_pat_len
    assert back.n_grams == bft.n_grams


def test_vectorized_window_merge_matches_scalar():
    # merged_windows (NumPy interval merge) must equal windows_for per lane
    from tpu_pattern_matching.runtime.verify import Verifier

    rng = np.random.RandomState(11)
    v = Verifier([b"abcdefgh"], q=3, max_pat_len=8)
    C, T, N = 6, 200, 300
    start_t = rng.randint(0, 10, size=C).astype(np.int64)
    end_t = rng.randint(100, T, size=C).astype(np.int64)
    lanes = rng.randint(0, C, size=N)
    rows = rng.randint(0, T, size=N)
    m_lane, m_w0, m_w1 = v.merged_windows(lanes, rows, start_t, end_t)
    got = sorted(zip(m_lane.tolist(), m_w0.tolist(), m_w1.tolist()))
    want = []
    for ln in range(C):
        rs = [int(r) for l, r in zip(lanes, rows) if l == ln]
        for w0, w1 in v.windows_for(rs, int(start_t[ln]), int(end_t[ln])):
            want.append((ln, w0, w1))
    assert got == sorted(want)


def test_length_one_patterns_all_engines():
    # lmin=1 pins the chooser to q=1 stride=1 (and w=1 sampled, where
    # every position is trivially selected); both engines must stay exact
    from tpu_pattern_matching.core.oracle import match_python

    pats = [b"x", b"\x00", b"ab"]
    data = b"x" + b"\x00" * 3 + b"zabx" * 10
    want = sorted(match_python(pats, data))
    for eng in ("dense", "bloom"):
        sess = MatchSession(compile_patterns(pats), max_chunks=4,
                            chunk_len=16, engine=eng)
        assert sess.find(data) == want, eng


def test_long_pattern_exceeds_chunk_all_engines():
    # a 1024-byte pattern across 256-byte chunks: the halo covers
    # max_pat_len-1 so the match (spanning 5 lanes) must still report once
    import numpy as np

    from tpu_pattern_matching.core.oracle import match_python

    rng = np.random.RandomState(0)
    pats = [bytes(rng.randint(0, 256, size=1024).astype(np.uint8)), b"zz"]
    data = b"a" * 100 + pats[0] + b"zz" + b"b" * 50
    want = sorted(match_python(pats, data))
    for eng in ("dense", "bloom"):
        sess = MatchSession(compile_patterns(pats), max_chunks=8,
                            chunk_len=256, engine=eng)
        assert sess.find(data) == want, eng


def test_refine_overflow_grows_k_ref_and_stays_exact():
    # Match-dense input past the refine-capacity bucket: the probe passes
    # the UNREFINED bitmap through (host absorbs, lossless) and the
    # session grows k_ref for subsequent batches (session.py decode path).
    pats = [b"abcd"]
    sess = bloom_session(pats, max_chunks=4, chunk_len=64)
    assert sess._bloom.exact_meta is not None  # refinement attached
    sess._bloom.k_ref = 8  # force a tiny bucket
    data = b"abcd" * 64  # 64 true occurrences >> 8
    assert sess.find(data) == oracle(pats, data)
    assert sess._bloom.k_ref >= 64  # grew past the flood


def test_refined_probe_erases_fp_before_host():
    # On clean random data the refined total must be ~the true-gram count
    # (usually 0), never the bloom-fp survivor count: the host decode is
    # skipped entirely. Exactness on planted matches is unchanged.
    rng = np.random.RandomState(5)
    pats = [bytes(rng.randint(0, 256, size=12).astype(np.uint8))
            for _ in range(50)]
    data = bytearray(rng.randint(0, 256, size=4096).astype(np.uint8))
    data[100:112] = pats[7]
    data[2000:2012] = pats[3]
    data = bytes(data)
    sess = bloom_session(pats, max_chunks=4, chunk_len=1024)
    assert sess._bloom.exact_meta is not None
    assert sess.find(data) == oracle(pats, data)
