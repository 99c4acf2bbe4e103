"""Packet-metadata (ushort-alphabet) matching mode.

The AC_ushorts variant (SURVEY.md section 2.2): instead of byte strings, the
automaton matches *sequences of packet metadata* (e.g. payload lengths) for
encrypted-traffic inspection. Signatures: ``"40,32,287,...; 22; attack name"``
(AC_ushorts/README:14-24); inputs are per-flow files named by 5-tuple whose
content is a comma-separated int sequence (AC_ushorts/README:27-31).

The same generic DFA builder and scan engine are reused with
``alphabet_size=2048`` (AC_ushorts/iacsmx.h:43) and uint16 lanes; values >=
alphabet are clamped to ``alphabet-1`` (the reference indexes its table out
of bounds for such values — UB we do not reproduce).
"""

from __future__ import annotations

import sys

import numpy as np

from tpu_pattern_matching.core.dfa import (
    ALPHABET_USHORT,
    AhoCorasick,
    DfaTable,
)
from tpu_pattern_matching.core.patterns import load_signature_file, parse_flow_line
from tpu_pattern_matching.ops.compact import compact_matches
from tpu_pattern_matching.ops.match_xla import scan_batch
from tpu_pattern_matching.ops.table import DeviceTable
from tpu_pattern_matching.runtime.files import expand_paths
from tpu_pattern_matching.runtime.stats import RunStats
from tpu_pattern_matching.utils.common import cdiv, now_us


def compile_signatures(path: str, max_tokens: int = 16) -> DfaTable:
    parsed = load_signature_file(path, max_tokens=max_tokens)
    if not parsed:
        raise ValueError(f"no signatures in {path}")
    ac = AhoCorasick(ALPHABET_USHORT)
    for p in parsed:
        seq = tuple(min(v, ALPHABET_USHORT - 1) for v in p.data)
        ac.add_pattern(seq, iid=p.iid, label=p.label)
    return ac.compile()


def lanes_from_sequences(
    seqs: list[tuple[int, np.ndarray]],
    chunk_len: int,
    halo: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile per-flow token sequences into uint16 lanes with prefix halos.

    Returns (data [C, halo+B] uint16, start_t, end_t, file_ids, base_off).
    """
    B, H = chunk_len, halo
    C = sum(max(1, cdiv(len(s), B)) for _, s in seqs)
    data = np.zeros((C, H + B), np.uint16)
    start_t = np.full(C, H, np.int32)
    end_t = np.full(C, H, np.int32)
    file_ids = np.full(C, -1, np.int32)
    base_off = np.zeros(C, np.int64)
    lane = 0
    for fid, s in seqs:
        off = 0
        while off < len(s) or (off == 0 and len(s) == 0):
            part = s[off : off + B]
            hist = s[max(0, off - H) : off]
            data[lane, H - len(hist) : H] = hist
            data[lane, H : H + len(part)] = part
            start_t[lane] = H - len(hist)
            end_t[lane] = H + len(part)
            file_ids[lane] = fid
            base_off[lane] = off
            lane += 1
            off += B
            if len(s) == 0:
                break
    return data, start_t, end_t, file_ids, base_off


def run_ushort_grep(args) -> int:
    """Drive the metadata-sequence grep (the AC_ushorts ocl_aho_grep path).

    ``--engine auto/bloom`` probes the alphabet-2048 bloom filter and
    verifies candidates with the symbol-width-generic native walker;
    ``--engine dense/esc16`` walks the DFA on device (exact counts there)."""
    engine = getattr(args, "engine", "auto")
    use_bloom = engine in ("auto", "bloom")
    table = compile_signatures(args.pat_path, max_tokens=16)
    groups = table.groups_as_lists()
    dev = None if use_bloom else DeviceTable.put(
        table, esc16=engine == "esc16"
    )

    filenames = expand_paths(args.data_path)
    if not filenames:
        print("ERROR: Could not open input file(s) for reading.", file=sys.stderr)
        return 2

    stats = RunStats(
        files=len(filenames),
        automaton_states=table.num_states,
        automaton_bytes=table.nbytes,
    )
    rd_bytes = 0  # raw text bytes (the reference tracks both, SURVEY 2.2)
    start = now_us()

    from tpu_pattern_matching.utils.common import pad_halo

    B = max(16, args.chunk_size // 2)  # tokens per lane
    halo = pad_halo(table.max_pat_len - 1, B)
    seqs = []
    for fid, fname in enumerate(filenames):
        with open(fname, "r", errors="replace") as f:
            txt = f.read()
        rd_bytes += len(txt)
        vals = parse_flow_line(txt)
        vals = np.asarray(
            [min(v, ALPHABET_USHORT - 1) for v in vals], np.uint16
        )
        seqs.append((fid, vals))
        stats.bytes += 2 * len(vals)

    data, start_t, end_t, file_ids, base_off = lanes_from_sequences(seqs, B, halo)
    stats.rounds = 1
    events = []  # (lane, end_row_abs_off, pattern_indices)
    if use_bloom:
        from tpu_pattern_matching.ops.bloom import (
            BloomFilterTable,
            unpack_hit_rows,
        )
        from tpu_pattern_matching.runtime.verify import Verifier

        bft = BloomFilterTable.from_table(table)
        hits = bft.put().hits(data, np.stack([start_t, end_t]))
        total = int(np.asarray(hits.meta)[0])
        if total:
            rows, lanes_ = unpack_hit_rows(
                np.asarray(hits.bits), bft.cfg.stride
            )
        else:
            rows = lanes_ = np.zeros(0, np.int64)
        verifier = Verifier(
            [p.symbols for p in table.patterns],
            alphabet_size=table.alphabet_size,
            q=bft.cfg.q,
            max_pat_len=table.max_pat_len,
            dense_table=table,
        )
        grouped: dict[tuple[int, int], set[int]] = {}
        for ln, e, pid in verifier.verify_batch(
            data, lanes_, rows, halo, start_t, end_t
        ):
            grouped.setdefault((ln, e), set()).add(pid)
        for (ln, e), pids in sorted(grouped.items()):
            off = int(base_off[ln]) + e - halo
            events.append((ln, off, sorted(pids)))
        stats.matches_total = len(events)
        stats.matches_reported = len(events)
    else:
        res = scan_batch(
            dev, data, start_t, end_t, halo=halo,
            max_results=args.max_results,
        )
        comp = compact_matches(dev, res)
        meta = np.asarray(comp.meta)
        stats.matches_total = int(meta[0])
        reported = int(meta[1])
        stats.matches_reported = reported
        if reported:
            lane, pos, _state, gid, _rep = np.asarray(comp.packed)
            for k in range(reported):
                ln = int(lane[k])
                off = int(base_off[ln]) + int(pos[k])
                events.append((ln, off, groups[int(gid[k])]))
    if args.verbose:
        for ln, off, pids in events:
            fname = filenames[int(file_ids[ln])]
            for pidx in pids:
                pat = table.patterns[pidx]
                print(
                    f"Pattern {pat.iid} ('{pat.label}') found in file "
                    f"'{fname}' at sequence offset {off - pat.n + 1} "
                    f"[end: {off}]"
                )
    stats.wall_us = now_us() - start
    print(stats.render())
    if getattr(args, "json_stats", False):
        print(stats.to_json())
    return 0
