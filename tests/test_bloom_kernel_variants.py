"""Kernel-variant conformance: every probe code path (fullwidth vs
blockwise, unrolled vs fori units, single vs multiple bank-group kernels,
lane-tile remainders) must produce the bit-identical survivor bitmap of an
independent NumPy model of the hash/bank math."""

import dataclasses

import numpy as np
import pytest

from tpu_pattern_matching.ops.bloom import (
    MASK32,
    BloomConfig,
    BloomFilterTable,
    _hash_fields_np,
    _hits_jit,
)


def np_probe_model(data, bounds, words, cfg):
    """Independent bitmap model (pure NumPy, no kernel code reuse)."""
    C, T = data.shape
    s, q = cfg.stride, cfg.q
    tt = cfg.tile_rows
    Tp = -(-T // tt) * tt
    Cp = -(-C // 128) * 128
    d = np.zeros((Cp, Tp), np.uint64)
    d[:C, :T] = data
    if cfg.fold_case:
        m = (d >= 65) & (d <= 90)
        d[m] += 32
    start_t = np.zeros(Cp, np.int64)
    end_t = np.zeros(Cp, np.int64)
    start_t[:C] = bounds[0]
    end_t[:C] = bounds[1]
    R = Tp // s
    hits = np.zeros((R, Cp), bool)
    for r in range(R):
        row = r * s
        m1 = np.zeros(Cp, np.uint64)
        m2 = np.zeros(Cp, np.uint64)
        for i in range(q):
            m1 = (m1 + d[:, row + i] * np.uint64(cfg.mix1[i])) & np.uint64(
                MASK32
            )
            m2 = (m2 + d[:, row + i] * np.uint64(cfg.mix2[i])) & np.uint64(
                MASK32
            )
        ok = np.ones(Cp, bool)
        for b in range(cfg.kbanks):
            vi, w7, bit = _hash_fields_np(m1, m2, np.uint64(b), cfg.v)
            w = words.view(np.uint32)[
                b, vi.astype(np.int64), w7.astype(np.int64)
            ]
            ok &= ((w >> bit.astype(np.uint32)) & 1).astype(bool)
        ok &= (row + q <= end_t) & (end_t > start_t)
        hits[r] = ok
    # pack like the kernel: per tile, gt/32 words; word w bit b covers
    # row index (tile*gt + local*32 + b)
    Rp = -(-R // (cfg.gt)) * cfg.gt  # kernel emits gt rows per tile
    hp = np.zeros((Rp, Cp), bool)
    hp[:R] = hits
    W = Rp // 32
    out = np.zeros((W, Cp), np.uint32)
    wpt = cfg.gt // 32
    for w in range(W):
        tile, local = divmod(w, wpt)
        rows = [(tile * cfg.gt) + local * 32 + b for b in range(32)]
        acc = np.zeros(Cp, np.uint32)
        for b, rr in enumerate(rows):
            if rr < Rp:
                acc |= hp[rr].astype(np.uint32) << np.uint32(b)
        out[w] = acc
    return out.view(np.int32)


def make_cfg(**kw):
    rng = np.random.RandomState(0)
    q = kw.pop("q")
    return BloomConfig(
        q=q,
        mix1=tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=q)),
        mix2=tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=q)),
        **kw,
    )


VARIANTS = [
    # fullwidth, unrolled, single group
    dict(q=4, stride=4, kbanks=4, v=4, blockwise=False),
    # blockwise
    dict(q=4, stride=4, kbanks=4, v=4, blockwise=True),
    # multi-group AND (kbanks > 8)
    dict(q=4, stride=4, kbanks=11, v=2, blockwise=False),
    # fori path: force past the unroll budget (8 banks * 16v * 8 blocks)
    dict(q=3, stride=3, kbanks=8, v=16, blockwise=False, ct=1024),
    # non-pow2 stride
    dict(q=5, stride=7, kbanks=3, v=2, blockwise=False),
    # blockwise + multi-group + fold_case
    dict(q=2, stride=2, kbanks=10, v=2, blockwise=True, fold_case=True),
]


@pytest.mark.parametrize(
    "kw", VARIANTS, ids=[f"v{i}" for i in range(len(VARIANTS))]
)
def test_kernel_variant_matches_model(kw):
    cfg = make_cfg(**kw)
    rng = np.random.RandomState(1)
    words = rng.randint(
        -(2**31), 2**31, size=(cfg.kbanks, cfg.v, 128)
    ).astype(np.int32)
    C, T = 200, 3 * cfg.tile_rows - 17  # ragged lanes AND rows
    data = rng.randint(0, 256, size=(C, T)).astype(np.uint8)
    bounds = np.stack(
        [
            rng.randint(0, 5, size=C).astype(np.int32),
            rng.randint(T - 5, T + 1, size=C).astype(np.int32),
        ]
    )
    bounds[1, 7] = bounds[0, 7]  # an empty lane
    total, bits = _hits_jit(data, bounds, words, cfg=cfg, interpret=True)
    want = np_probe_model(data, bounds, words, cfg)
    got = np.asarray(bits)
    np.testing.assert_array_equal(got, want)
    assert int(total[0]) == int(
        np.unpackbits(want.view(np.uint8)).sum()
    )


def test_lane_tile_remainder_geometry():
    # 1280 padded lanes with ct=1024: the tile width must drop to a divisor
    # (256), not crash — regression test for the ct divisibility bug
    cfg = make_cfg(q=4, stride=4, kbanks=2, v=1, blockwise=False)
    rng = np.random.RandomState(2)
    words = rng.randint(-(2**31), 2**31, size=(2, 1, 128)).astype(np.int32)
    C, T = 1200, cfg.tile_rows
    data = rng.randint(0, 256, size=(C, T)).astype(np.uint8)
    bounds = np.stack(
        [np.zeros(C, np.int32), np.full(C, T, np.int32)]
    )
    total, bits = _hits_jit(data, bounds, words, cfg=cfg, interpret=True)
    want = np_probe_model(data, bounds, words, cfg)
    np.testing.assert_array_equal(np.asarray(bits), want)


def test_packed_data_path_matches_byte_path():
    # The uint32-packed probe (stride % 4 == 0: byte phase static per gram
    # offset) must produce the identical bitmap — including fold_case,
    # non-pow2 strides, unaligned time dims, and truncated lane spans.
    from tpu_pattern_matching.ops.bloom import BloomFilterTable

    rng = np.random.RandomState(11)
    for s, fold in ((4, False), (8, True), (12, False)):
        q = min(4, s)
        pats = [
            bytes(rng.randint(0, 256, size=q + s + 3).astype(np.uint8))
            for _ in range(40)
        ]
        bft = BloomFilterTable.build(
            pats, force=("strided", q, s, 3, 2), fold_case=fold
        )
        cfg = bft.cfg
        C, T = 4, cfg.tile_rows * 2 + 7
        data = rng.randint(0, 256, size=(C, T)).astype(np.uint8)
        data[1, 5 : 5 + len(pats[0])] = np.frombuffer(pats[0], np.uint8)
        bounds = np.stack(
            [
                np.asarray([0, 2, 0, T], np.int32),
                np.asarray([T, T, 0, T], np.int32),
            ]
        )
        t0, b0 = _hits_jit(
            data, bounds, bft.words, cfg=cfg, interpret=True, packed=False
        )
        t1, b1 = _hits_jit(
            data, bounds, bft.words, cfg=cfg, interpret=True, packed=True
        )
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        assert int(t0[0]) == int(t1[0])
