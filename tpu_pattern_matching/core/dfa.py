"""Aho-Corasick DFA compiler.

Builds a dense deterministic automaton from a set of fixed patterns and emits
a device-friendly transition table. This is the TPU-native counterpart of the
reference's acsmx.c state-machine compiler (trie insert acsmx.c:319-349, BFS
failure links acsmx.c:355-438, NFA->DFA closure acsmx.c:444-486, serialization
acsmx.c:600-671) and of the ushort-alphabet variant AC_ushorts/iacsmx.c.

Design decisions vs the reference (SURVEY.md section 7):

- **Single signed table.** The reference serializes ``[S, 2*256]`` int32 —
  cell ``[s][c]`` = next state negated if final, cell ``[s][256+c]`` = pattern
  index (acsmx.c:640-658). We keep the sign-bit final encoding but drop the
  second 256-wide row: the device scan only needs the *state* at a match; the
  (tiny, per-state) match metadata is resolved after compaction. This halves
  table memory and gather bandwidth — the scan's bottleneck on TPU.
- **Match groups.** Each final state gets a dense "match group" id. A group
  carries the full set of pattern indices ending at that state (own patterns
  plus the failure-chain closure). The device reports the next-state on match;
  group expansion to ``(pattern, iid)`` happens host-side (or via one small
  device gather for per-pattern count reductions). This is strictly more
  capable than the reference, which reports only ``match_list->index`` — the
  head of the per-state list (acsmx.c:645-651) — and silently drops
  co-terminating patterns.
- **Generic alphabet.** ``alphabet_size=256`` for bytes, ``2048`` for the
  packet-metadata ushort mode (AC_ushorts/iacsmx.h:43 I_ALPHABET_SIZE).
- **npz serialization.** Restores the compiled-automaton dump the reference
  removed (acsmx.h:29-30 "removed dumping to file for current version").
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import numpy as np

ALPHABET_BYTE = 256
ALPHABET_USHORT = 2048


@dataclasses.dataclass
class Pattern:
    """One compiled pattern.

    Mirrors the reference's acsm_pattern_t (acsmx.h:51-63): ``index`` is the
    dense insertion index used in device results, ``iid`` is the user-facing
    pattern id (the categorical id from the pattern file, or the line number).
    """

    symbols: tuple[int, ...]
    iid: int
    index: int
    label: str = ""

    @property
    def n(self) -> int:
        return len(self.symbols)

    def as_bytes(self) -> bytes:
        return bytes(self.symbols)


@dataclasses.dataclass
class DfaTable:
    """Dense compiled automaton, ready for device upload.

    ``goto_signed[s, c]`` is the next state after reading symbol ``c`` in
    state ``s``; it is negated iff the next state is final (a match ends
    there). State 0 is the root and is never final, so the sign is unambiguous.

    ``state_gid[s]`` is -1 for non-final states, else a dense group id.
    ``group_offsets``/``group_pids`` form a ragged list: group ``g`` matches
    pattern indices ``group_pids[group_offsets[g]:group_offsets[g+1]]``.
    ``group_rep[g]`` is the smallest pattern index in the group (the
    deterministic representative used for single-id reporting).
    """

    goto_signed: np.ndarray  # [S, A] int32 (or int16 when S < 2**15)
    state_gid: np.ndarray  # [S] int32
    group_state: np.ndarray  # [G] int32
    group_offsets: np.ndarray  # [G+1] int32
    group_pids: np.ndarray  # [sum group sizes] int32
    group_rep: np.ndarray  # [G] int32
    alphabet_size: int
    max_pat_len: int
    patterns: list[Pattern]

    @property
    def num_states(self) -> int:
        return self.goto_signed.shape[0]

    @property
    def num_groups(self) -> int:
        return self.group_state.shape[0]

    @property
    def num_patterns(self) -> int:
        return len(self.patterns)

    @property
    def nbytes(self) -> int:
        """Size of the device transition table (reference acsm_get_size)."""
        return self.goto_signed.nbytes

    def groups_as_lists(self) -> list[list[int]]:
        return [
            self.group_pids[self.group_offsets[g] : self.group_offsets[g + 1]].tolist()
            for g in range(self.num_groups)
        ]

    # -- serialization (restores the feature removed at acsmx.h:29-30) ------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            goto_signed=self.goto_signed,
            state_gid=self.state_gid,
            group_state=self.group_state,
            group_offsets=self.group_offsets,
            group_pids=self.group_pids,
            group_rep=self.group_rep,
            alphabet_size=np.int64(self.alphabet_size),
            max_pat_len=np.int64(self.max_pat_len),
            pat_symbols=np.array([p.symbols for p in self.patterns], dtype=object),
            pat_iids=np.array([p.iid for p in self.patterns], dtype=np.int64),
            pat_labels=np.array([p.label for p in self.patterns], dtype=object),
            allow_pickle=True,
        )

    @staticmethod
    def load(path: str) -> "DfaTable":
        z = np.load(path, allow_pickle=True)
        patterns = [
            Pattern(tuple(sym), int(iid), i, str(label))
            for i, (sym, iid, label) in enumerate(
                zip(z["pat_symbols"], z["pat_iids"], z["pat_labels"])
            )
        ]
        return DfaTable(
            goto_signed=z["goto_signed"],
            state_gid=z["state_gid"],
            group_state=z["group_state"],
            group_offsets=z["group_offsets"],
            group_pids=z["group_pids"],
            group_rep=z["group_rep"],
            alphabet_size=int(z["alphabet_size"]),
            max_pat_len=int(z["max_pat_len"]),
            patterns=patterns,
        )


class AhoCorasick:
    """Aho-Corasick automaton builder.

    Usage mirrors the reference API surface (acsmx.h:96-196):
    ``add_pattern`` then ``compile()`` -> :class:`DfaTable`.
    """

    def __init__(self, alphabet_size: int = ALPHABET_BYTE):
        if alphabet_size < 2:
            raise ValueError("alphabet_size must be >= 2")
        self.alphabet_size = alphabet_size
        self.patterns: list[Pattern] = []

    def add_pattern(
        self,
        pattern: bytes | Sequence[int],
        iid: int | None = None,
        label: str = "",
    ) -> Pattern:
        """Add one pattern (reference acsm_add_pattern, acsmx.c:514-546).

        ``pattern`` is raw bytes for the byte alphabet or a sequence of ints
        for wider alphabets. ``iid`` defaults to the insertion index.
        """
        symbols = tuple(int(x) for x in pattern)
        if not symbols:
            raise ValueError("empty pattern")
        for s in symbols:
            if not (0 <= s < self.alphabet_size):
                raise ValueError(
                    f"symbol {s} out of range for alphabet {self.alphabet_size}"
                )
        index = len(self.patterns)
        if not label:
            if all(s < 256 for s in symbols):
                label = repr(bytes(symbols))[2:-1]
            else:
                label = ",".join(str(s) for s in symbols)
        p = Pattern(
            symbols=symbols,
            iid=index if iid is None else int(iid),
            index=index,
            label=label,
        )
        self.patterns.append(p)
        return p

    def add_patterns(self, patterns: Iterable[bytes | Sequence[int]]) -> None:
        for p in patterns:
            self.add_pattern(p)

    def compile(self) -> DfaTable:
        """Trie insert -> BFS failure links -> dense DFA closure.

        Equivalent construction to acsm_compile (acsmx.c:552-594) +
        acsm_gen_state_table (acsmx.c:600-658), but the dense closure is
        vectorized per BFS level with NumPy instead of a per-state scalar
        loop, and the output is the compact signed-table encoding described
        in the module docstring.
        """
        if not self.patterns:
            raise ValueError("no patterns added")
        A = self.alphabet_size

        # --- trie (sparse children) ---------------------------------------
        children: list[dict[int, int]] = [{}]
        out_own: dict[int, list[int]] = {}
        for p in self.patterns:
            s = 0
            for c in p.symbols:
                nxt = children[s].get(c)
                if nxt is None:
                    children.append({})
                    nxt = len(children) - 1
                    children[s][c] = nxt
                s = nxt
            out_own.setdefault(s, []).append(p.index)

        S = len(children)
        fail = np.zeros(S, dtype=np.int64)
        depth = np.zeros(S, dtype=np.int64)

        # --- BFS failure links over trie edges ----------------------------
        # matchset[s] = own patterns + matchset[fail[s]] (fail state is
        # processed before s in BFS order).
        matchsets: dict[int, list[int]] = {}
        order: list[int] = []
        queue: list[int] = []
        for c, t in children[0].items():
            fail[t] = 0
            depth[t] = 1
            queue.append(t)
        head = 0
        while head < len(queue):
            s = queue[head]
            head += 1
            order.append(s)
            own = out_own.get(s, [])
            inherited = matchsets.get(int(fail[s]), [])
            if own or inherited:
                matchsets[s] = sorted(set(own) | set(inherited))
            for c, t in children[s].items():
                f = int(fail[s])
                while c not in children[f] and f != 0:
                    f = int(fail[f])
                nxt = children[f].get(c, 0)
                fail[t] = nxt if nxt != t else 0
                depth[t] = depth[s] + 1
                queue.append(t)

        # --- dense closure, vectorized per BFS level ----------------------
        # goto[s] = goto[fail[s]] overlaid with s's own trie children
        # (identical result to the reference's convert_NFA_to_DFA,
        # acsmx.c:444-486, row copy + child overwrite per state).
        goto = np.zeros((S, A), dtype=np.int64)
        for c, t in children[0].items():
            goto[0, c] = t
        if order:
            order_arr = np.asarray(order, dtype=np.int64)
            level_of = depth[order_arr]
            max_depth = int(level_of.max())
            # pre-group child edges by source depth
            edges_by_level: dict[int, tuple[list[int], list[int], list[int]]] = {}
            for s in order:
                if children[s]:
                    lv = int(depth[s])
                    src, sym, dst = edges_by_level.setdefault(lv, ([], [], []))
                    for c, t in children[s].items():
                        src.append(s)
                        sym.append(c)
                        dst.append(t)
            for lv in range(1, max_depth + 1):
                states_lv = order_arr[level_of == lv]
                goto[states_lv] = goto[fail[states_lv]]
                if lv in edges_by_level:
                    src, sym, dst = edges_by_level[lv]
                    goto[np.asarray(src), np.asarray(sym)] = np.asarray(dst)

        # --- match groups ---------------------------------------------------
        final_states = sorted(matchsets.keys())
        state_gid = np.full(S, -1, dtype=np.int32)
        group_state = np.asarray(final_states, dtype=np.int32)
        for g, s in enumerate(final_states):
            state_gid[s] = g
        sizes = [len(matchsets[s]) for s in final_states]
        group_offsets = np.zeros(len(final_states) + 1, dtype=np.int32)
        np.cumsum(sizes, out=group_offsets[1:])
        group_pids = np.asarray(
            [p for s in final_states for p in matchsets[s]], dtype=np.int32
        )
        group_rep = np.asarray(
            [matchsets[s][0] for s in final_states], dtype=np.int32
        )

        # --- signed encoding -------------------------------------------------
        is_final = state_gid >= 0
        goto_signed = np.where(is_final[goto], -goto, goto)
        dtype = np.int16 if S < 2**15 else np.int32
        goto_signed = goto_signed.astype(dtype)

        return DfaTable(
            goto_signed=goto_signed,
            state_gid=state_gid,
            group_state=group_state,
            group_offsets=group_offsets,
            group_pids=group_pids,
            group_rep=group_rep,
            alphabet_size=A,
            max_pat_len=max(p.n for p in self.patterns),
            patterns=list(self.patterns),
        )


def compile_patterns(
    patterns: Iterable[bytes | Sequence[int]],
    alphabet_size: int = ALPHABET_BYTE,
) -> DfaTable:
    """Convenience: build and compile in one call."""
    ac = AhoCorasick(alphabet_size)
    ac.add_patterns(patterns)
    return ac.compile()
