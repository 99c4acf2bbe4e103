"""Pallas q-gram bloom-filter scan engine — the TPU hot path.

WHY THIS EXISTS (see BENCH_NOTES.md "measurement artifact"): XLA:TPU lowers
``gather`` to a serialized per-element lookup (~5-13 ns/element regardless of
table size), so the classic one-transition-per-byte DFA walk
(``ops/match_xla.py``, the analogue of the reference's ahomatch.cl hot loop)
is capped at ~75 MB/s/chip. The only vectorized lookup primitive Mosaic
exposes is ``tpu.dynamic_gather`` (via ``jnp.take_along_axis`` inside a
Pallas kernel): a 128-entry-per-lane LUT, one op per vreg. This engine
restructures multi-pattern matching around that primitive:

1. **Filter (device, Pallas)**: hash the q-byte window at every stride-s
   position of every lane (dense VPU integer ops) and probe k independent
   blocked bloom banks. Each bank is V "units" of 128 int32 words = 4096
   bits; hash bits select the unit (V-way vectorized select), a one-op
   dynamic_gather selects the word, shifts select the bit. A position
   survives only if ALL k banks hit; the false-positive rate is the product
   of the banks' bit densities (computed exactly at build time).
2. **Pack (device, in-kernel)**: survivor rows are masked against lane
   bounds and bit-packed, so the device->host result is a complete bitmap
   32*stride times smaller than the input (no capacity cap, no overflow
   mode), plus a popcount total fetched first (zero-match batches cost one
   4-byte transfer, mirroring the dense engine's 2-transfer decode).
3. **Verify (host)**: candidates expand to windows, merge per lane, and are
   scanned by the native C++ Aho-Corasick oracle (``core/oracle_native``)
   for exact ``(end_offset, pattern_set)`` events. False positives die
   here; every true match is provably covered (below).

Coverage guarantee: grams are inserted at offsets 0..s-1 of every pattern
(strided mode). An occurrence of a pattern with length L >= s+q-1 spans gram
positions g0..g0+L-q; any s consecutive integers contain a multiple of s, so
some tested position t* (tested <=> t* % s == 0) falls in [g0, g0+s-1], and
the input gram there equals the pattern's gram at offset t*-g0 <= s-1 —
which is in the bloom. q = floor((Lmin+1)/2) <= s, so a gram window never
crosses a stride group, which makes kernel tiles exactly disjoint (no halo
inside the kernel; the per-lane stream halo is the session's business).
The builder searches (q, stride, kbanks, v) jointly: stride trades probe
cost per byte against bloom load (stride grams per pattern), and the score
includes the TRUE-gram hit rate — a filter on 1-grams of a 10k-pattern set
would pass every byte no matter how empty the bloom is.

This replaces the role of ahomatch.cl:50-77 (the per-byte DFA walk) with a
design native to the TPU's VPU: one to two orders of magnitude over the
XLA DFA walk's ~75 MB/s ceiling, scaling with pattern-set size and filter
configuration. Current measured figures live in BENCH_NOTES.md (single
source — the round-closing tables), with the measurement protocol each
number was taken under.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

MASK32 = 0xFFFFFFFF
MAX_BANKS_PER_KERNEL = 8  # more banks per kernel collapse VMEM (BENCH_NOTES)
REFINE_HEADROOM = 2.0  # k_ref capacity = headroom x modeled candidate rate
# x batch positions (runtime/session.py). The refinement stage's cost is
# linear in the CAPACITY bucket (~137 ns/slot, exp_verify_ab round 3), so
# headroom is a real per-batch tax; overflow is graceful (the unrefined
# bitmap passes through and the host absorbs it), so modest headroom +
# the {1,1.5}x2^k next_cap ladder is the right trade.
GT = 64  # stride-groups (tested rows) per tile; 64*s rows is always %8==0
MAX_LANE_TILE = 1024  # lane-block width per kernel tile


def probe_cost_units(q: int, k: int, v: int, *, s: int = 1, w: int = 0
                     ) -> float:
    """Model element-ops per input byte for a probe config — the chooser's
    probe-cost currency, and the unit the calibrator (ops/costmodel.py)
    prices in ns on the attached chip.

    hash (2.5/symbol) + k banks of (index math + v gathers&selects);
    strided amortizes over the stride, sampled pays every position plus
    ~3 ops per window step for the winnowing min chains. Empirical
    penalties (exp_bloom_ab/tune + bench A/B): non-pow2 strides relayout
    the window reshape (~1.6x); bank groups past MAX_BANKS_PER_KERNEL run
    as extra ANDed kernels (~1.5x each); past the unroll budget the fori
    unit loop costs ~1.3x. Cross-mode calibration from interleaved A/B on
    v5e (round 2): at 10k x 12B, strided q4s4k8v16 measured 6.15 GB/s vs
    sampled q5w8k7v4 6.64 GB/s, while the sampled model's own 10k->100k
    scaling was accurate (predicted 11x, measured 11.7x) — strided's
    stride amortization is optimistic (the [GT, s, width] window reshape
    relayout isn't free even at pow2 strides), hence its 1.3x factor."""
    if w:
        c = 2.5 * q + 3.0 * w + k * (4 + 5 * v)
    else:
        c = (2.5 * q + k * (4 + 5 * v)) / s
        if s not in (1, 2, 4, 8, 16):
            c *= 1.6
        c *= 1.3
    groups = -(-k // MAX_BANKS_PER_KERNEL)
    c *= 1 + 0.5 * (groups - 1)
    if min(k, MAX_BANKS_PER_KERNEL) * v * 8 > 1024:
        c *= 1.3
    return c


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    """Static shape/hash parameters (hashable: used as a jit static arg).

    Two sampling modes select which gram positions are tested:

    - **strided** (``sampled=False``): positions at multiples of ``stride``;
      grams inserted at pattern offsets 0..stride-1 (bloom load =
      stride x patterns).
    - **sampled/winnowing** (``sampled=True``): every position is hashed;
      a position is tested iff it is the rightmost-argmin of some
      ``w``-window of the selection hash (Schleimer et al. winnowing).
      The builder inserts only each pattern's per-window rightargmin grams
      (~1 gram/pattern when pattern length ~= lmin), cutting bloom load
      ~stride-fold — the enabler for 100k+ pattern sets, where strided
      mode's bloom capacity (k*v gather chains) is the wall.
    """

    q: int  # gram length (symbols)
    stride: int  # tested-position stride; q <= stride (strided mode; 1 when sampled)
    kbanks: int  # independent bloom banks (ALL must hit)
    v: int  # 4096-bit units per bank
    mix1: tuple[int, ...]  # per-symbol odd multipliers, hash 1
    mix2: tuple[int, ...]  # per-symbol odd multipliers, hash 2
    fold_case: bool = False  # ASCII-fold input symbols before hashing
    gt: int = GT  # tested rows per tile; multiple of 32
    ct: int = MAX_LANE_TILE  # lane-tile width; multiple of 128
    blockwise: bool = False  # probe one 128-lane block at a time (bounded
    # VMEM live set) vs full-width ops (larger vector ops; measured better
    # for the large-k*v configs under interleaved A/B, exp_bloom_ab.py)
    sampled: bool = False  # winnowing selection instead of strided
    w: int = 0  # winnowing window (gram positions); w <= lmin - q + 1

    @property
    def bits(self) -> int:
        return self.kbanks * self.v * 4096

    @property
    def tile_rows(self) -> int:
        return self.gt * self.stride


def _hash_fields_np(m1, m2, b, v):
    """Host model of the device hash (uint64 arrays masked to 32 bits)."""
    h = (m1 + b * m2) & MASK32
    h = h ^ (h >> np.uint64(13))
    vi = (h >> np.uint64(17)) & np.uint64(v - 1)
    w7 = (h >> np.uint64(10)) & np.uint64(127)
    bit = (h >> np.uint64(5)) & np.uint64(31)
    return vi, w7, bit


def _grams_of(symbols: Sequence[int], q: int, offsets) -> list[tuple]:
    s = list(symbols)
    return [tuple(s[o : o + q]) for o in offsets if o + q <= len(s)]


def _sel_hash_np(m1: np.ndarray) -> np.ndarray:
    """Host model of the device selection hash (31-bit, so INT32_MAX can
    serve as the out-of-bounds sentinel on device)."""
    h = (m1 ^ (m1 >> np.uint64(13))) & np.uint64(MASK32)
    return h & np.uint64(0x7FFFFFFF)


def _gram_m1(symbols: Sequence[int], q: int, mix1) -> np.ndarray:
    """m1 hash of every gram of one pattern (uint64 array, 32-bit wrapped)."""
    s = np.asarray(list(symbols), np.uint64)
    m = len(s) - q + 1
    if m <= 0:
        return np.zeros(0, np.uint64)
    out = np.zeros(m, np.uint64)
    for i in range(q):
        out = (out + s[i : i + m] * np.uint64(mix1[i])) & np.uint64(MASK32)
    return out


def _winnow_offsets(h: np.ndarray, w: int) -> list[int]:
    """Gram offsets selected by winnowing: the rightmost-argmin of every
    w-window (Schleimer et al.; rightmost tie rule matches the device's
    a+b >= w-1 characterization in the sampled kernel)."""
    m = len(h)
    sel = set()
    for u in range(0, m - w + 1):
        win = h[u : u + w]
        sel.add(u + (w - 1 - int(np.argmin(win[::-1]))))
    return sorted(sel)


def _winnow_grams(pats: list[list[int]], q: int, w: int, mix1) -> set:
    """Winnowing fingerprint gram set over a whole pattern list,
    vectorized per length group (the per-pattern Python loop is minutes at
    100k patterns; this is milliseconds)."""
    from numpy.lib.stride_tricks import sliding_window_view

    by_len: dict[int, list[list[int]]] = {}
    for p in pats:
        by_len.setdefault(len(p), []).append(p)
    mix = np.asarray(mix1[:q], np.uint64)
    grams: set = set()
    for L, group in by_len.items():
        arr = np.asarray(group, np.uint64)  # [N, L]
        M = L - q + 1
        if M < w:
            # coverage needs a full w-window of gram positions inside
            # every pattern (w <= Lmin - q + 1, enforced by the chooser)
            raise ValueError(f"pattern length {L} too short for q={q} w={w}")
        m1 = np.zeros((len(group), M), np.uint64)
        for i in range(q):
            m1 = (m1 + arr[:, i : i + M] * mix[i]) & np.uint64(MASK32)
        h = _sel_hash_np(m1)  # [N, M]
        win = sliding_window_view(h, w, axis=1)  # [N, M-w+1, w]
        # rightmost argmin = (w-1) - argmin of the reversed window
        ridx = (w - 1) - np.argmin(win[:, :, ::-1], axis=2)  # [N, M-w+1]
        offs = ridx + np.arange(M - w + 1)[None, :]
        barr = arr.astype(np.uint16)
        for r in range(len(group)):
            row = barr[r]
            for o in set(offs[r].tolist()):
                grams.add(tuple(int(x) for x in row[o : o + q]))
    return grams


@dataclasses.dataclass
class BloomFilterTable:
    """Host-side compiled filter: bloom words + config + diagnostics."""

    words: np.ndarray  # [kbanks, v, 128] int32 (bit-packed)
    cfg: BloomConfig
    max_pat_len: int
    n_grams: int
    fp_est: float  # expected false-positive rate per tested position
    gram_keys: np.ndarray | None = None  # sorted uint64 packed gram keys
    # (the EXACT inserted set, ops/exact_gram.pack_grams layout at
    # ``gram_bits`` per symbol) — feeds the exact-membership refinement
    # stage; None when q*bits > 64 or for loads of pre-refinement dumps
    # (refinement silently unavailable)
    alphabet_size: int = 256  # symbol universe (2048 for the ushort mode)

    @property
    def gram_bits(self) -> int:
        """Symbol width of the gram_keys packing (8 byte / 11 ushort)."""
        return (self.alphabet_size - 1).bit_length()

    @staticmethod
    def from_table(table, **kw) -> "BloomFilterTable":
        """Build from a compiled :class:`core.dfa.DfaTable` (byte or ushort
        alphabet; byte patterns are already case-folded when
        table.nocase)."""
        return BloomFilterTable.build(
            [p.symbols for p in table.patterns],
            alphabet_size=table.alphabet_size,
            fold_case=getattr(table, "nocase", False),
            **kw,
        )

    @staticmethod
    def build(
        patterns: Sequence[Sequence[int] | bytes],
        fp_target: float = 1e-3,
        max_v: int = 16,
        max_k: int = 16,
        max_stride: int = 16,
        seed: int = 0x5EED,
        fold_case: bool = False,
        alphabet_size: int = 256,
        mode: str = "auto",
        force: tuple | None = None,  # ("strided", q, s, k, v) or
        # ("sampled", q, w, k, v): bypass the chooser (A/B experiments
        # validating the cost model against the chip, exp_verify_ab.py)
        objective: str = "refined",
        verify_ns_per_cand: float | None = None,  # host verify cost per
        # candidate; None reads the calibrated constants
        # (ops/costmodel.get_cost_constants — v5e default 700: ~600-780
        # ns/candidate incl. bitmap unpack + window merge, exp_verify_ab
        # round 3; the device verify stage is ~1.1 us/slot)
        rate_scale: float = 1.0,  # candidate-rate multiplier for verify
        # pricing and eligibility: the sharded build (parallel/pshard.py)
        # passes S, because the verifier walks the UNION of S shard
        # bitmaps — per-shard fp sums over shards while probe cost per
        # CHIP stays per-shard on a ("pat","data") mesh. Without this the
        # probe objective's cap admits configs whose union candidate
        # flood no verifier absorbs (measured: 8 x v16 shards at 300k =
        # 2.4e-2 candidates/byte, BENCH_NOTES round 3)
    ) -> "BloomFilterTable":
        """Compile the filter, choosing (mode, q, stride/w, kbanks, v).

        Two sampling modes compete in the search (``mode="auto"``; force
        with "strided"/"sampled"):

        **strided** — coverage needs grams at pattern offsets 0..stride-1
        for ANY stride <= Lmin-q+1; the kernel's window trick needs
        q <= stride. Larger stride costs fewer probes per byte but loads
        the bloom with stride grams per pattern (worse fp).

        **sampled (winnowing)** — every position hashes, a position is
        tested iff it is the rightmost-argmin of some w-window; the bloom
        holds only each pattern's per-window rightargmin grams (~1 per
        pattern at L ~= Lmin). ~stride-x more probe work per byte, but
        bloom load drops ~stride-fold — past ~30k patterns (where strided
        k*v hits the 128-words-per-gather ceiling) this is the only way to
        keep the candidate rate down (BENCH_NOTES.md round-1 plan).

        kbanks beyond MAX_BANKS_PER_KERNEL split across ANDed kernel
        invocations, so large pattern sets can buy fp headroom with extra
        probe passes.

        ``objective`` picks what the search minimizes:

        - "refined" (default) — the PIPELINED per-byte cost of the
          pipeline sessions actually run: the device pays probe +
          on-device exact-gram refinement (fixed top_k + a headroom-scaled
          per-slot marginal), the host pays only the true-gram residue.
          A config whose grams cannot pack into one uint64 key
          (q*bits > 64 — never hit by byte alphabets, q > 5 for the
          ushort/2048 alphabet) runs unrefined, so it is priced with the
          "joint" formula instead. Constants chip-calibrated
          (exp_verify_ab/exp_refine_stages, round 3 post-top_k): the
          refined pick's device-only exactness measured 3.56 GB/s vs the
          joint pick's 3.33 at the official point, and its refined host
          pipeline 3.68 vs 3.53.
        - "joint" — max(probe_ns, rate x verify_ns_per_cand): the
          UNREFINED host-verify pipeline (probe and host verify overlap in
          scan_stream, the slower stage is the throughput). The peak
          single-chip mode when a spare host core exists and the bitmap
          D2H is cheap.
        - "probe" — legacy probe-cost objective with a soft verify
          surcharge (the round-2 rule; kept for probe-only benchmarking
          continuity, bench.py primary metric).

        If no config meets the eligibility rate cap, the lowest-rate one
        wins — correctness never depends on fp, only verify cost does.
        """
        if fold_case and alphabet_size != 256:
            raise ValueError("fold_case requires the byte alphabet")
        if mode not in ("auto", "strided", "sampled"):
            raise ValueError(f"unknown mode {mode!r}")
        pats = [list(p) for p in patterns]
        if not pats:
            raise ValueError("no patterns")
        sym_bits = (alphabet_size - 1).bit_length()
        lmin = min(len(p) for p in pats)
        lmax = max(len(p) for p in pats)
        q_max = max(1, min(6, (lmin + 1) // 2))

        rng = np.random.RandomState(seed)
        # fixed-size draw (q never exceeds 8): the mix streams must not
        # depend on lmin, so pattern SUBSETS built with the same seed get
        # identical mixes — the sharded build (parallel/pshard.py) relies
        # on one config probing every shard's filter
        mix1_full = tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=8))
        mix2_full = tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=8))

        def n_est(q, s):
            return sum(min(s, len(p) - q + 1) for p in pats)

        _fingerprints: dict[tuple[int, int], int] = {}

        def n_sampled(q, w):
            # exact winnowing fingerprint count (the real insertion set)
            if (q, w) not in _fingerprints:
                _fingerprints[(q, w)] = len(
                    _winnow_grams(pats, q, w, mix1_full)
                )
            return _fingerprints[(q, w)]

        def candidate_rate(q, n, k, v, *, s=1, w=0):
            # expected candidates per input byte on uniform data: true gram
            # occurrences (the filter cannot reject a gram that IS in the
            # set — this is what kills tiny q for large sets) + bloom fp.
            # Strided: amortized over the stride. Sampled: only selected
            # positions (density ~2/(w+1)) can become candidates.
            universe = float(alphabet_size) ** q
            distinct = universe * -np.expm1(-n / universe)
            true_rate = distinct / universe
            fp = float((1.0 - np.exp(-n / (v * 4096.0))) ** k)
            if w:
                return (min(1.0, true_rate) + fp) * 2.0 / (w + 1)
            return (min(1.0, true_rate) + fp) / s

        def true_rate_of(q, n, *, s=1, w=0):
            # the component of candidate_rate the exact-gram refinement
            # CANNOT erase: grams literally in the inserted set
            universe = float(alphabet_size) ** q
            tr = min(1.0, universe * -np.expm1(-n / universe) / universe)
            return tr * 2.0 / (w + 1) if w else tr / s

        probe_cost = probe_cost_units

        best = None  # (objective, q, s, w, k, v) meeting the rate cap
        fallback = None  # (rate, cost, q, s, w, k, v) best-effort

        # Priced hardware (ops/costmodel.py): env/cache-file calibration
        # with the round-3 v5e A/B numbers as fallback. The meanings:
        # PROBE_NS_PER_UNIT — ns/byte per probe_cost_units unit (v5e:
        # q4s4k6v16 measured 0.1295 ns/byte at 167 units -> 0.00078).
        # Exact-gram refinement pricing (objective="refined"): the
        # refinement runs ON DEVICE in the probe's jit, so its cost adds
        # to the device side while the host sees only true-gram
        # candidates: a fixed stage-1 top_k term per byte (1/stride the
        # words on strided bitmaps) + a per-CAPACITY-SLOT marginal
        # (stage-2 compaction + q gram gathers + dmax exact probes +
        # scatter-back, all linear in k_ref). Slots are sized
        # REFINE_HEADROOM x modeled rate (runtime/session.py uses the
        # same constant), so the per-candidate price is headroom-scaled.
        # VERIFY_NS_PER_CAND — host native-walker cost per candidate.
        from tpu_pattern_matching.ops.costmodel import get_cost_constants

        _cc = get_cost_constants(alphabet_size)
        PROBE_NS_PER_UNIT = _cc.probe_ns_per_unit
        REFINE_NS_PER_SLOT = _cc.refine_ns_per_slot
        REFINE_FIXED_NS_PER_BYTE = _cc.refine_fixed_ns_per_byte
        if verify_ns_per_cand is None:
            verify_ns_per_cand = _cc.verify_ns_per_cand

        # Legacy probe-objective surcharge (round-2 rule, kept for
        # objective="probe"): a soft verify tax + throughput-coupled cap.
        VERIFY_UNITS = 1800.0

        # a config can run refined iff its grams pack into one uint64 key
        # (ops/exact_gram.pack_grams): q*bits <= 64 — always true for byte
        # alphabets at q <= 8, and for the ushort alphabet at q <= 5
        def refinable(q):
            return q * sym_bits <= 64

        def rate_cap(cost):
            if objective == "refined":
                # the device-side refine stage absorbs floods the host
                # never sees; cap only what the compaction capacity
                # (k_ref <= MAX_DEVICE_CAND per ~16 MiB batch) can hold
                return max(fp_target, 5e-3)
            if objective == "joint":
                # eligibility only guards against candidate floods the
                # decode path cannot absorb; the objective itself prices
                # verify correctly
                return max(fp_target, 1e-2)
            return max(fp_target, min(4e-3, 2e-5 * cost))

        def consider(rate, true_rate, cost, q, s, w, k, v):
            nonlocal best, fallback
            rate = rate * rate_scale  # union rate over pattern shards
            true_rate = true_rate * rate_scale
            if rate <= rate_cap(cost):
                if objective == "refined" and refinable(q):
                    # device: probe + on-device exact-gram refinement of
                    # ALL candidates; host: native walk of the TRUE-gram
                    # residue only (bloom fp never crosses the D2H)
                    dev_ns = (
                        cost * PROBE_NS_PER_UNIT
                        + REFINE_FIXED_NS_PER_BYTE / s
                        + rate * REFINE_HEADROOM * REFINE_NS_PER_SLOT
                    )
                    host_ns = true_rate * verify_ns_per_cand
                    obj = max(dev_ns, host_ns) + 0.05 * (dev_ns + host_ns)
                elif objective in ("joint", "refined"):
                    # unrefinable config under the refined objective
                    # (q*bits > 64): the session runs it UNREFINED, so
                    # price the host-verify pipeline it will actually get
                    probe_ns = cost * PROBE_NS_PER_UNIT
                    ver_ns = rate * verify_ns_per_cand
                    # probe (device) and verify (host/device stage)
                    # overlap in the pipeline: the slower stage IS the
                    # throughput; the small sum term breaks ties toward
                    # less total work
                    obj = max(probe_ns, ver_ns) + 0.05 * (probe_ns + ver_ns)
                else:
                    obj = cost + rate * VERIFY_UNITS
                if best is None or obj < best[0]:
                    best = (obj, q, s, w, k, v)
                return True
            if fallback is None or rate < fallback[0] or (
                rate == fallback[0] and cost < fallback[1]
            ):
                fallback = (rate, cost, q, s, w, k, v)
            return False

        # the legacy probe objective is monotone in v (more filter only
        # costs), so its v loop breaks at first eligibility; the joint/
        # refined objectives are NOT (more filter can pay for itself in
        # verify savings) — scan every v
        scan_all_v = objective in ("joint", "refined")

        if force is not None:
            mode = "none"  # skip the search entirely: a forced config
            # must not pay the chooser's per-(q,w) winnowing passes
            # (minutes at 100k+ patterns — the sharded build forces
            # S-1 of its S shard filters, parallel/pshard.py)
        if mode in ("auto", "strided"):
            for q in range(1, q_max + 1):
                for s in range(q, min(max_stride, lmin - q + 1) + 1):
                    n = n_est(q, s)
                    tr = true_rate_of(q, n, s=s)
                    for k in range(2, max_k + 1):
                        v = 1
                        while v <= max_v:
                            rate = candidate_rate(q, n, k, v, s=s)
                            c = probe_cost(q, k, v, s=s)
                            if consider(rate, tr, c, q, s, 0, k, v) and (
                                not scan_all_v
                            ):
                                break
                            v *= 2
        if mode in ("auto", "sampled"):
            # sampled mode exists for huge pattern sets, where bloom
            # capacity is the wall — let its v range stretch far past the
            # strided default (the unit fori_loop path bounds VMEM; the
            # words array tops out at k16 x v256 x 128 x 4B = 8 MB). The
            # round-3 300k point showed why: at v<=32 the filter holds
            # 286k fingerprints at fp 0.15/position — a 3.8e-2/byte
            # candidate flood no verifier absorbs; v=64-256 restores
            # usable fp at 300k-1M patterns.
            max_v_s = max(max_v, 256)
            for q in range(1, min(8, lmin) + 1):
                w_full = lmin - q + 1
                for w in sorted({min(w_full, x) for x in (4, 8, 16)}):
                    if w < 1:
                        continue
                    n = n_sampled(q, w)
                    tr = true_rate_of(q, n, w=w)
                    for k in range(2, max_k + 1):
                        v = 1
                        while v <= max_v_s:
                            rate = candidate_rate(q, n, k, v, w=w)
                            c = probe_cost(q, k, v, w=w)
                            if consider(rate, tr, c, q, 1, w, k, v) and (
                                not scan_all_v
                            ):
                                break
                            v *= 2
        if force is not None:
            fmode, q, sw, k, v = force
            s, w = (sw, 0) if fmode == "strided" else (1, sw)
            if fmode == "strided" and not (q <= s <= lmin - q + 1):
                raise ValueError(f"forced stride violates q<=s<=Lmin-q+1: {force}")
            if fmode == "sampled" and not (1 <= sw <= lmin - q + 1):
                raise ValueError(f"forced w violates 1<=w<=Lmin-q+1: {force}")
        elif best is not None:
            _, q, s, w, k, v = best
        else:
            _, _, q, s, w, k, v = fallback
        stride = s
        mix1 = mix1_full[:q]
        mix2 = mix2_full[:q]
        if w:
            grams = _winnow_grams(pats, q, w, mix1)
        else:
            grams = set()
            for p in pats:
                grams.update(_grams_of(p, q, range(stride)))
        n = len(grams)

        cfg = BloomConfig(q=q, stride=stride, kbanks=k, v=v,
                          mix1=mix1, mix2=mix2, fold_case=fold_case,
                          sampled=bool(w), w=w,
                          # sampled tiles amortize hash+selection over more
                          # rows: gt=128 measured +3-12% over 64 on v5e
                          gt=128 if w else GT)

        words = np.zeros((k, v, 128), np.uint32)
        if grams:
            g = np.asarray(sorted(grams), np.uint64).reshape(n, q)
            m1 = np.zeros(n, np.uint64)
            m2 = np.zeros(n, np.uint64)
            for i in range(q):
                m1 = (m1 + g[:, i] * np.uint64(mix1[i])) & np.uint64(MASK32)
                m2 = (m2 + g[:, i] * np.uint64(mix2[i])) & np.uint64(MASK32)
            for b in range(k):
                vi, w7, bit = _hash_fields_np(m1, m2, np.uint64(b), v)
                np.bitwise_or.at(
                    words[b],
                    (vi.astype(np.int64), w7.astype(np.int64)),
                    np.uint32(1) << bit.astype(np.uint32),
                )
        dens = [
            float(np.unpackbits(words[b].view(np.uint8)).mean())
            for b in range(k)
        ]
        from tpu_pattern_matching.utils.debug import dprint

        dprint(
            1,
            "bloom build: mode=%s q=%d stride=%d w=%d k=%d v=%d grams=%d "
            "fp_est=%.3g",
            "sampled" if w else "strided", q, stride, w, k, v, n,
            float(np.prod(dens)),
        )
        if q * sym_bits <= 64:
            from .exact_gram import pack_grams

            gram_keys = pack_grams(grams, q, sym_bits)
        else:
            gram_keys = None
        return BloomFilterTable(
            words=words.view(np.int32),
            cfg=cfg,
            max_pat_len=lmax,
            n_grams=n,
            fp_est=float(np.prod(dens)),
            gram_keys=gram_keys,
            alphabet_size=alphabet_size,
        )

    def expected_cand_rate(self) -> float:
        """Modeled candidates per input byte: true-gram occurrences on
        uniform data (the filter cannot erase a gram that IS in the set)
        plus the measured-density bloom fp, de-amortized by the sampling
        mode — the chooser's candidate_rate at the CHOSEN config, exposed
        for capacity sizing (the refined-probe k_ref bucket)."""
        cfg = self.cfg
        true = self.n_grams / float(self.alphabet_size) ** cfg.q
        per_pos = min(1.0, true) + self.fp_est
        if cfg.sampled:
            return per_pos * 2.0 / (cfg.w + 1)
        return per_pos / cfg.stride

    def put(self, sharding=None) -> "DeviceBloom":
        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jax.device_put
        )
        return DeviceBloom(words=put(self.words), cfg=self.cfg,
                           max_pat_len=self.max_pat_len)

    # -- serialization (compiled-filter dump, like DfaTable.save/load) ------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            words=self.words,
            cfg=np.array(
                [self.cfg.q, self.cfg.stride, self.cfg.kbanks, self.cfg.v,
                 int(self.cfg.fold_case), self.cfg.gt, self.cfg.ct,
                 int(self.cfg.blockwise), int(self.cfg.sampled),
                 self.cfg.w],
                dtype=np.int64,
            ),
            mix1=np.asarray(self.cfg.mix1, np.int64),
            mix2=np.asarray(self.cfg.mix2, np.int64),
            max_pat_len=np.int64(self.max_pat_len),
            n_grams=np.int64(self.n_grams),
            fp_est=np.float64(self.fp_est),
            alphabet_size=np.int64(self.alphabet_size),
            **(
                {"gram_keys": self.gram_keys}
                if self.gram_keys is not None
                else {}
            ),
        )

    @staticmethod
    def load(path: str) -> "BloomFilterTable":
        z = np.load(path)
        c = z["cfg"]
        cfg = BloomConfig(
            q=int(c[0]), stride=int(c[1]), kbanks=int(c[2]), v=int(c[3]),
            mix1=tuple(int(x) for x in z["mix1"]),
            mix2=tuple(int(x) for x in z["mix2"]),
            fold_case=bool(c[4]), gt=int(c[5]), ct=int(c[6]),
            blockwise=bool(c[7]),
            sampled=bool(c[8]) if len(c) > 8 else False,
            w=int(c[9]) if len(c) > 9 else 0,
        )
        return BloomFilterTable(
            words=z["words"],
            cfg=cfg,
            max_pat_len=int(z["max_pat_len"]),
            n_grams=int(z["n_grams"]),
            fp_est=float(z["fp_est"]),
            gram_keys=z["gram_keys"] if "gram_keys" in z.files else None,
            alphabet_size=(
                int(z["alphabet_size"])
                if "alphabet_size" in z.files
                else 256  # older dumps lack the field; 256 only
                # OVERestimates the true-gram rate for an old ushort dump
                # (larger capacity buckets — safe), and such dumps carry
                # no gram_keys so refinement stays off anyway
            ),
        )


# --------------------------------------------------------------- the kernel


def _make_probe_kernel(
    cfg: BloomConfig, ct: int, bank0: int, nbanks: int, packed: bool = False
):
    """Kernel body specialized for static (cfg, lane-tile width, bank group).

    Per tile: hash gt stride-groups x ct lanes, probe banks
    [bank0, bank0+nbanks), mask rows against the lane bounds, and bit-pack
    the gt survivor rows into gt/32 int32 words per lane — the
    device->host result is a bitmap 32*stride times smaller than the
    input. Configs with kbanks > MAX_BANKS_PER_KERNEL are split across
    several kernel invocations whose bitmaps AND together (the per-kernel
    VMEM live set collapses throughput past ~8x16 gather chains).

    ``cfg.blockwise`` picks the lane granularity of the shared block body:
    one full-width pass (larger vector ops; Mosaic hoists the independent
    unit gathers, so the live set grows with k*v) vs one 128-lane block at
    a time (bounded live set).

    ``packed``: the data tile is uint32 words of 4 little-endian symbol
    bytes, [GT*s/4, width] (exists only for stride % 4 == 0, where gram
    offset qi always lands at byte phase qi % 4 of word row
    g*(s/4) + qi//4 — the byte extraction is a static shift+mask, no
    relayout). The prep transpose then moves 4x fewer elements; measured
    share of the per-batch prep in the probe metric:
    benchmarks/exp_transpose_share.py.
    """
    q, s, v = cfg.q, cfg.stride, cfg.v
    GT = cfg.gt
    words_per_tile = GT // 32
    banks = range(bank0, bank0 + nbanks)
    # fully-unrolled bodies compile fastest-running code, but past ~1024
    # gather ops Mosaic's remote compile takes 10+ minutes; fall back to a
    # fori_loop over units beyond the budget
    unroll_units = nbanks * v * (ct // 128) <= 1024
    assert not packed or s % 4 == 0, (packed, s)

    def kernel(data_ref, bounds_ref, bloom_ref, out_ref):
        from jax.experimental import pallas as pl

        tile_i = pl.program_id(0)

        def probe_block(sl, width):
            """hit bits for lanes data_ref[:, sl] (width % 128 == 0)."""
            if packed:
                # [GT*s/4, width] packed words (int32 view: shifts below
                # mask to a byte, so sign never leaks)
                dw = data_ref[:, sl].astype(jnp.int32)
                resh32 = dw.reshape(GT, s // 4, width)

                def sym(qi):
                    b = (
                        jax.lax.shift_right_logical(
                            resh32[:, qi // 4, :], jnp.int32(8 * (qi % 4))
                        )
                        & 255
                    )
                    if cfg.fold_case:
                        b = jnp.where((b >= 65) & (b <= 90), b + 32, b)
                    return b

            else:
                d = data_ref[:, sl].astype(jnp.int32)  # [GT*s, width]
                if cfg.fold_case:
                    d = jnp.where((d >= 65) & (d <= 90), d + 32, d)
                resh = d.reshape(GT, s, width)

                def sym(qi):
                    return resh[:, qi, :]

            m1 = jnp.zeros((GT, width), jnp.int32)
            m2 = jnp.zeros((GT, width), jnp.int32)
            for qi in range(q):
                bi = sym(qi)
                m1 = m1 + bi * jnp.int32(cfg.mix1[qi])
                m2 = m2 + bi * jnp.int32(cfg.mix2[qi])
            hit = jnp.ones((GT, width), jnp.bool_)
            for b in banks:
                h = m1 + jnp.int32(b) * m2
                h = h ^ jax.lax.shift_right_logical(h, 13)
                vi = jax.lax.shift_right_logical(h, 17) & (v - 1)
                w7 = jax.lax.shift_right_logical(h, 10) & 127
                bit = jax.lax.shift_right_logical(h, 5) & 31
                bi_ = b - bank0

                # (dynamic_slice on values is unimplemented in Mosaic;
                # dynamic Ref indexing via pl.ds is the supported form)
                def unit_gather(u, w7=w7, bi_=bi_, static=False):
                    t = jnp.broadcast_to(
                        bloom_ref[bi_, u, :][None, :]
                        if static
                        else bloom_ref[bi_, pl.ds(u, 1), :],
                        (GT, 128),
                    )
                    parts = [
                        jnp.take_along_axis(
                            t, w7[:, lb * 128 : (lb + 1) * 128], axis=1
                        )
                        for lb in range(width // 128)
                    ]
                    return (
                        parts[0]
                        if len(parts) == 1
                        else jnp.concatenate(parts, axis=1)
                    )

                if unroll_units:
                    word = unit_gather(0, static=True)
                    for u in range(1, v):
                        word = jnp.where(
                            vi == u, unit_gather(u, static=True), word
                        )
                else:
                    word = jax.lax.fori_loop(
                        0,
                        v,
                        lambda u, w: jnp.where(vi == u, unit_gather(u), w),
                        jnp.zeros((GT, width), jnp.int32),
                    )
                hit = hit & (
                    (jax.lax.shift_right_logical(word, bit) & 1) == 1
                )
            # mask: a candidate gram must lie inside the lane's valid span
            # (rows >= end_t - q + 1 can't start a gram of a match; empty
            # and padding lanes have start_t == end_t)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (GT, width), 0)
            rows = (tile_i * GT + g_iota) * s
            start_t = bounds_ref[0, sl][None, :]
            end_t = bounds_ref[1, sl][None, :]
            hit = hit & (rows + q <= end_t) & (end_t > start_t)
            # bit-pack GT rows -> GT/32 words per lane
            hi = hit.astype(jnp.int32).reshape(words_per_tile, 32, width)
            acc = jnp.zeros((words_per_tile, width), jnp.int32)
            for b in range(32):
                acc = acc | jax.lax.shift_left(hi[:, b, :], jnp.int32(b))
            return acc

        if cfg.blockwise:
            for lb in range(ct // 128):
                sl = slice(lb * 128, (lb + 1) * 128)
                out_ref[0, :, sl] = probe_block(sl, 128)
        else:
            out_ref[0] = probe_block(slice(0, ct), ct)

    return kernel


def _make_sampled_kernel(cfg: BloomConfig, ct: int, bank0: int, nbanks: int):
    """Winnowing-sampled probe kernel (cfg.sampled): every row hashes; a
    row is tested iff it is the rightmost-argmin of some w-window of the
    selection hash.

    Device selection rule: position p is selected iff a + b >= w - 1,
    where a = #consecutive predecessors with h >= h[p] and b =
    #consecutive successors with h > h[p] — exactly "p is the
    rightmost-argmin of at least one w-window", matching the builder's
    per-window fingerprint insertion (_winnow_offsets). Out-of-span
    positions get h = INT32_MAX (they can only make neighbors MORE
    selected, never suppress a guaranteed fingerprint — windows fully
    inside an occurrence are unaffected).

    Cross-tile context (the previous w-1 and next w+q-2 rows) comes from
    passing the padded data array three times with block indices i, i+1,
    i+2 — Pallas blocks are non-overlapping per spec, so the overlap is
    expressed as three aligned views.
    """
    q, v, w = cfg.q, cfg.v, cfg.w
    tt = cfg.gt  # tile rows == tested rows (stride 1)
    ctx_l = w - 1
    ctx_r = w + q - 2
    P = tt + 2 * (w - 1)  # positions needing a selection hash
    words_per_tile = tt // 32
    banks = range(bank0, bank0 + nbanks)
    unroll_units = nbanks * v * (ct // 128) <= 1024
    assert ctx_l <= tt and ctx_r <= tt, (w, q, tt)

    def kernel(prev_ref, cur_ref, next_ref, bounds_ref, bloom_ref, out_ref):
        from jax.experimental import pallas as pl

        tile_i = pl.program_id(0)

        def probe_block(sl, width):
            def load(ref):
                d = ref[:, sl].astype(jnp.int32)
                if cfg.fold_case:
                    d = jnp.where((d >= 65) & (d <= 90), d + 32, d)
                return d

            cur = load(cur_ref)
            parts = []
            if ctx_l:
                parts.append(load(prev_ref)[tt - ctx_l :])
            parts.append(cur)
            if ctx_r:
                parts.append(load(next_ref)[:ctx_r])
            ext = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            m1 = jnp.zeros((P, width), jnp.int32)
            m2 = jnp.zeros((P, width), jnp.int32)
            for qi in range(q):
                sub = ext[qi : qi + P, :]
                m1 = m1 + sub * jnp.int32(cfg.mix1[qi])
                m2 = m2 + sub * jnp.int32(cfg.mix2[qi])
            # selection hash (31-bit so INT32_MAX is a clean +inf sentinel)
            hs = (m1 ^ jax.lax.shift_right_logical(m1, 13)) & jnp.int32(
                0x7FFFFFFF
            )
            p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, width), 0)
            rows_all = tile_i * tt + p_iota - ctx_l
            start_t = bounds_ref[0, sl][None, :]
            end_t = bounds_ref[1, sl][None, :]
            valid_all = (
                (rows_all >= start_t)
                & (rows_all + q <= end_t)
                & (end_t > start_t)
            )
            hm = jnp.where(valid_all, hs, jnp.int32(0x7FFFFFFF))
            hC = hm[ctx_l : ctx_l + tt]
            # b >= k (cumulative): successors strictly greater
            ones = jnp.ones((tt, width), jnp.bool_)
            Rk = [ones]
            r = ones
            for kk in range(1, w):
                r = r & (hm[ctx_l + kk : ctx_l + kk + tt] > hC)
                Rk.append(r)
            sel = Rk[w - 1]
            # a >= j (cumulative): predecessors greater-or-equal
            lacc = ones
            for j in range(1, w):
                lacc = lacc & (hm[ctx_l - j : ctx_l - j + tt] >= hC)
                sel = sel | (lacc & Rk[w - 1 - j])
            hit = sel & valid_all[ctx_l : ctx_l + tt]
            m1c = m1[ctx_l : ctx_l + tt]
            m2c = m2[ctx_l : ctx_l + tt]
            for b in banks:
                h = m1c + jnp.int32(b) * m2c
                h = h ^ jax.lax.shift_right_logical(h, 13)
                vi = jax.lax.shift_right_logical(h, 17) & (v - 1)
                w7 = jax.lax.shift_right_logical(h, 10) & 127
                bit = jax.lax.shift_right_logical(h, 5) & 31
                bi_ = b - bank0

                def unit_gather(u, w7=w7, bi_=bi_, static=False):
                    t = jnp.broadcast_to(
                        bloom_ref[bi_, u, :][None, :]
                        if static
                        else bloom_ref[bi_, pl.ds(u, 1), :],
                        (tt, 128),
                    )
                    parts = [
                        jnp.take_along_axis(
                            t, w7[:, lb * 128 : (lb + 1) * 128], axis=1
                        )
                        for lb in range(width // 128)
                    ]
                    return (
                        parts[0]
                        if len(parts) == 1
                        else jnp.concatenate(parts, axis=1)
                    )

                if unroll_units:
                    word = unit_gather(0, static=True)
                    for u in range(1, v):
                        word = jnp.where(
                            vi == u, unit_gather(u, static=True), word
                        )
                else:
                    word = jax.lax.fori_loop(
                        0,
                        v,
                        lambda u, wd: jnp.where(vi == u, unit_gather(u), wd),
                        jnp.zeros((tt, width), jnp.int32),
                    )
                hit = hit & (
                    (jax.lax.shift_right_logical(word, bit) & 1) == 1
                )
            hi = hit.astype(jnp.int32).reshape(words_per_tile, 32, width)
            acc = jnp.zeros((words_per_tile, width), jnp.int32)
            for b in range(32):
                acc = acc | jax.lax.shift_left(hi[:, b, :], jnp.int32(b))
            return acc

        if cfg.blockwise:
            for lb in range(ct // 128):
                sl = slice(lb * 128, (lb + 1) * 128)
                out_ref[0, :, sl] = probe_block(sl, 128)
        else:
            out_ref[0] = probe_block(slice(0, ct), ct)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _probe_bits_jit(data_tm, bounds, words, *, cfg: BloomConfig, interpret):
    """bits[w, c] bit b set <=> the gram starting at row ((w*32+b)*stride)
    of lane c survives all banks and the lane mask. data_tm: [T, C]
    time-major, T % tile_rows == 0, C % 128 == 0. Bank groups of at most
    MAX_BANKS_PER_KERNEL run as separate kernels whose bitmaps AND.

    A 32-bit ``data_tm`` is the PACKED layout: each row holds 4
    little-endian symbol bytes, shape [T/4, C] (strided mode with
    stride % 4 == 0 only — _hits_jit packs when eligible)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packed = data_tm.dtype.itemsize == 4
    T, C = data_tm.shape
    if packed:
        assert not cfg.sampled and cfg.stride % 4 == 0, cfg
        T = T * 4  # symbol rows
    GT = cfg.gt
    tt = cfg.tile_rows
    assert T % tt == 0, (T, tt)
    tiles_t = T // tt
    # largest lane-tile width <= cfg.ct that divides C (C % 128 == 0 always
    # holds after the caller's lane padding, so ct = 128 is the floor) —
    # e.g. C = 1280 lanes gets ct = 256, not a crash on 1280 % 1024 != 0
    ct = min(C, cfg.ct)
    while C % ct:
        ct -= 128
    assert C % ct == 0 and ct % 128 == 0, (C, ct)
    tiles_c = C // ct
    wpt = GT // 32
    compiler_params = pltpu.CompilerParams(
        # high-v configs keep ~k*v live [GT, ct] i32 intermediates;
        # the default 16 MB scoped-vmem cap is far below the chip's
        vmem_limit_bytes=96 * 1024 * 1024,
    )
    if cfg.sampled:
        # overlapping tile context (prev w-1 / next w+q-2 rows) as three
        # aligned views of the tile-padded array
        data_p = jnp.pad(data_tm, ((tt, tt), (0, 0)))
        operands = (data_p, data_p, data_p, bounds)
        in_specs = [
            pl.BlockSpec((tt, ct), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, ct), lambda i, j: (i + 1, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, ct), lambda i, j: (i + 2, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        make_kernel = _make_sampled_kernel
    else:
        operands = (data_tm, bounds)
        in_specs = [
            pl.BlockSpec((tt // 4 if packed else tt, ct),
                         lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        make_kernel = functools.partial(_make_probe_kernel, packed=packed)
    bits = None
    for bank0 in range(0, cfg.kbanks, MAX_BANKS_PER_KERNEL):
        nbanks = min(MAX_BANKS_PER_KERNEL, cfg.kbanks - bank0)
        group = pl.pallas_call(
            make_kernel(cfg, ct, bank0, nbanks),
            out_shape=jax.ShapeDtypeStruct((tiles_t, wpt, C), jnp.int32),
            grid=(tiles_t, tiles_c),
            compiler_params=compiler_params,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, wpt, ct), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(*operands, words[bank0 : bank0 + nbanks])
        bits = group if bits is None else (bits & group)
    return bits.reshape(tiles_t * wpt, C)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BloomHits:
    """Survivor bitmap for one batch.

    ``total`` (meta[0]) is the exact survivor count; ``bits[w, c]`` bit b is
    the gram starting at row (w*32+b)*stride of lane c. The bitmap is
    complete — no capacity cap, no overflow mode; the host fetches it only
    when total > 0 (two transfers per batch, like the dense engine).

    ``data``/``bounds`` are the device-resident batch arrays the probe
    scanned, kept so a device-side verify stage (ops/verify_device.py) can
    walk candidate windows without re-uploading; None on the host-verify
    path."""

    meta: jax.Array  # [1] int32: total
    bits: jax.Array  # [W, C] int32
    data: jax.Array | None = None  # [C, T] symbols (device)
    bounds: jax.Array | None = None  # [2, C] (device)


PACKED_AUTO = False  # _hits_jit's auto data-path policy: flip to True
# once the packed prep measures faster on the chip (the A/B lives in
# benchmarks/exp_transpose_share.py; packed correctness is unit-tested
# either way)


def _packed_eligible(cfg, dtype) -> bool:
    return (not cfg.sampled) and cfg.stride % 4 == 0 and dtype == jnp.uint8


def _prep_time_major(data, cfg, packed: bool):
    """Pad + (optionally uint32-pack) + transpose one lane-major batch.

    The barrier keeps the relayout a single separate pass (fusing it into
    the probe halves throughput — README design notes). Packed mode views
    each 4 little-endian symbols as one uint32, moving 4x fewer elements
    through the transpose; element order (bitcast element 0 = low byte) is
    asserted by tests/test_verify_device.py and on silicon by
    tests/test_tpu_hardware.py."""
    C, T = data.shape
    tt = cfg.tile_rows
    Tp = ((T + tt - 1) // tt) * tt
    Cp = ((C + 127) // 128) * 128
    padded = jnp.pad(data, ((0, Cp - C), (0, Tp - T)))
    if packed:
        assert _packed_eligible(cfg, data.dtype), (cfg, data.dtype)
        padded = jax.lax.bitcast_convert_type(
            padded.reshape(Cp, Tp // 4, 4), jnp.uint32
        )
    return jax.lax.optimization_barrier(padded.T), Cp


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "packed"))
def _hits_jit(data, bounds, words, *, cfg, interpret, packed=None):
    """Fused pad + transpose + probe + popcount: lane-major data in.

    ``packed=None`` follows the PACKED_AUTO policy; True/False force the
    uint32-packed / byte data path (A/B:
    benchmarks/exp_transpose_share.py)."""
    if packed is None:
        packed = PACKED_AUTO and _packed_eligible(cfg, data.dtype)
    data_tm, Cp = _prep_time_major(data, cfg, packed)
    C = data.shape[0]
    bounds = jnp.pad(bounds, ((0, 0), (0, Cp - C)))  # pad lanes: start==end
    bits = _probe_bits_jit(data_tm, bounds, words, cfg=cfg,
                           interpret=interpret)
    total = jnp.sum(jax.lax.population_count(bits))
    from tpu_pattern_matching.utils.debug import kernel_debug

    kernel_debug("bloom batch: {} survivor grams", total)  # TPM_DEBUG>=2
    return total.reshape(1), bits


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret", "exact_meta", "k_ref", "packed"),
)
def _hits_refined_jit(
    data, bounds, words, exact_lo, exact_hi, *,
    cfg, interpret, exact_meta, k_ref, packed=None,
):
    """Probe + exact-gram refinement in one jit: the emitted bitmap keeps
    only candidates whose gram is LITERALLY in the inserted set.

    The bloom fp component never reaches the host: survivors compact
    (verify_device.bitmap_to_candidates), check against the exact table
    (ops/exact_gram.py, ~dmax+q gathers per slot), and the survivors
    scatter back into a fresh bitmap (distinct candidates hit distinct
    (word, bit), so scatter-add IS bitwise or). meta[0] is the refined
    total — on clean traffic usually 0, so the host skips the bitmap
    fetch entirely. If candidates exceed the k_ref capacity bucket the
    ORIGINAL bitmap and total pass through unchanged (the host verifier
    absorbs the flood — graceful, never lossy; match-saturated input is
    its regime anyway). Erasing non-member grams preserves exactness by
    the candidate-subset argument (ops/verify_device.py docstring)."""
    if packed is None:
        packed = PACKED_AUTO and _packed_eligible(cfg, data.dtype)
    data_tm, Cp = _prep_time_major(data, cfg, packed)
    C, T = data.shape
    boundsp = jnp.pad(bounds, ((0, 0), (0, Cp - C)))
    bits = _probe_bits_jit(data_tm, boundsp, words, cfg=cfg,
                           interpret=interpret)
    total0 = jnp.sum(jax.lax.population_count(bits))

    from .exact_gram import DeviceExact, exact_member
    from .verify_device import bitmap_to_candidates

    n_cand, lane, row, over = bitmap_to_candidates(bits, cfg.stride, k_ref)
    dx = DeviceExact.from_meta(exact_lo, exact_hi, cfg.q, True, exact_meta)
    slotv = (
        jax.lax.broadcasted_iota(jnp.int32, (k_ref, 1), 0).squeeze(-1)
        < n_cand
    )
    base = jnp.minimum(lane, C - 1) * T + jnp.minimum(row, T - 1)
    keep = exact_member(dx, data.reshape(-1), base, slotv)
    W, Cb = bits.shape
    bitrow = row // cfg.stride  # row = (word*32 + bit) * stride
    w_i = jax.lax.shift_right_logical(bitrow, 5)
    b_i = bitrow & 31
    flat = jnp.where(keep, w_i * Cb + jnp.minimum(lane, Cb - 1), W * Cb)
    ref = (
        jnp.zeros((W * Cb,), jnp.int32)
        .at[flat]
        .add(jax.lax.shift_left(jnp.int32(1), b_i), mode="drop")
        .reshape(W, Cb)
    )
    total = jnp.where(over, total0, jnp.sum(keep.astype(jnp.int32)))
    bits_out = jnp.where(over, bits, ref)
    from tpu_pattern_matching.utils.debug import kernel_debug

    kernel_debug(
        "bloom batch: {} survivors, {} after exact-gram refinement",
        total0, total,
    )  # TPM_DEBUG>=2
    return total.reshape(1), bits_out


@dataclasses.dataclass
class DeviceBloom:
    words: jax.Array  # [k, v, 128] int32
    cfg: BloomConfig
    max_pat_len: int
    exact_lo: jax.Array | None = None  # exact-gram refinement planes
    exact_hi: jax.Array | None = None
    exact_meta: tuple | None = None
    k_ref: int = 0  # refinement candidate-capacity bucket

    @staticmethod
    def _interpret() -> bool:
        # Mosaic needs a real TPU; interpret mode keeps the engine testable
        # on the CPU mesh (slow, small shapes only)
        return jax.default_backend() == "cpu"

    def attach_exact(
        self, gram_keys, k_ref: int, sharding=None, bits: int = 8
    ) -> None:
        """Enable exact-gram refinement on this probe: candidates whose
        gram is not in ``gram_keys`` (the builder's inserted set) never
        reach the host. ``k_ref`` is the static candidate-capacity bucket
        (size from BloomFilterTable.expected_cand_rate x batch bytes —
        overflow passes the unrefined bitmap through, graceful).
        ``bits`` is the gram_keys symbol width
        (BloomFilterTable.gram_bits)."""
        from .exact_gram import table_from_keys

        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jax.device_put
        )
        xt = table_from_keys(gram_keys, self.cfg.q, bits=bits)
        self.exact_lo = put(xt.lo.view(np.int32))
        self.exact_hi = put(xt.hi.view(np.int32)) if xt.use_hi else None
        self.exact_meta = xt.device_meta(self.cfg.fold_case)
        self.k_ref = int(k_ref)

    def hits(self, data, bounds) -> BloomHits:
        """data: [C, T] lane-major symbols; bounds: [2, C] start_t/end_t."""
        if self.exact_meta is not None:
            meta, bits = _hits_refined_jit(
                data, bounds, self.words, self.exact_lo, self.exact_hi,
                cfg=self.cfg, interpret=self._interpret(),
                exact_meta=self.exact_meta, k_ref=self.k_ref,
            )
            return BloomHits(meta=meta, bits=bits)
        meta, bits = _hits_jit(
            data, bounds, self.words, cfg=self.cfg,
            interpret=self._interpret(),
        )
        return BloomHits(meta=meta, bits=bits)

    def probe_total(self, data, start_t, end_t, halo: int = 0):
        """Benchmark hook: total survivors (forces the full probe)."""
        meta, _ = _hits_jit(
            data,
            jnp.stack([start_t, end_t]),
            self.words,
            cfg=self.cfg,
            interpret=self._interpret(),
        )
        return meta[0]


def unpack_hit_rows(bits: np.ndarray, stride: int):
    """Host-side bitmap expansion: [W, C] int32 -> (rows, lanes) arrays of
    candidate gram start rows (already in row units, halo included).

    Native ctz loop when the oracle library is buildable (the NumPy
    expansion measured ~9.5 ms of the ~21 ms per-batch decode budget at
    40k candidates — host decode shares one core with the feeder here);
    NumPy fallback is proportional to NONZERO words, not the bitmap."""
    u = bits.view(np.uint32) if bits.dtype == np.int32 else bits
    try:
        from tpu_pattern_matching.core.oracle_native import unpack_bitmap

        return unpack_bitmap(u, stride)
    except Exception:
        pass
    wi, ci = np.nonzero(u)
    if len(wi) == 0:
        z = np.zeros(0, np.int64)
        return z, z
    vals = u[wi, ci]
    planes = (vals[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    k, bit = np.nonzero(planes)
    rows = (wi[k].astype(np.int64) * 32 + bit) * stride
    return rows, ci[k].astype(np.int64)
