"""Deterministic test corpora generators.

Plays the role of the reference's tests/random_text.py (word-soup corpus with
planted patterns, ~1 planted per 50 lines) and test.sh (urandom binaries),
re-implemented from the described behavior.
"""

from __future__ import annotations

import random
import string


def random_words_corpus(
    seed: int = 1234,
    n_lines: int = 400,
    words_per_line: int = 12,
    n_patterns: int = 8,
    plant_every: int = 50,
) -> tuple[list[bytes], bytes]:
    """Word-soup text with patterns planted on ~1/plant_every lines.

    Returns (patterns, corpus_bytes).
    """
    rng = random.Random(seed)

    def word() -> str:
        return "".join(
            rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 10))
        )

    patterns = [word() + str(i) for i in range(n_patterns)]
    lines = []
    for ln in range(n_lines):
        ws = [word() for _ in range(words_per_line)]
        if ln % plant_every == plant_every - 1:
            ws[rng.randrange(len(ws))] = rng.choice(patterns)
        lines.append(" ".join(ws))
    corpus = ("\n".join(lines) + "\n").encode()
    return [p.encode() for p in patterns], corpus


def random_binary(seed: int, size: int) -> bytes:
    rng = random.Random(seed)
    return rng.randbytes(size)


def random_hex_signatures(
    seed: int, n: int, min_len: int = 8, max_len: int = 64
) -> list[str]:
    """ClamAV-style printable-hex signature lines (clamav_sample_sigs shape)."""
    rng = random.Random(seed)
    sigs = []
    for _ in range(n):
        ln = rng.randint(min_len, max_len)
        sigs.append("".join(rng.choice("0123456789abcdef") for _ in range(2 * ln)))
    return sigs


def planted_binary(
    seed: int, size: int, patterns: list[bytes], n_plants: int
) -> tuple[bytes, list[tuple[int, int]]]:
    """Random binary with known pattern plants; returns (data, [(pos, pat_i)]).

    Plants never overlap each other (positions chosen in disjoint slots).
    """
    rng = random.Random(seed)
    data = bytearray(rng.randbytes(size))
    maxlen = max(len(p) for p in patterns)
    slots = list(range(0, size - maxlen, maxlen * 2))
    rng.shuffle(slots)
    plants = []
    for k in range(min(n_plants, len(slots))):
        pi = rng.randrange(len(patterns))
        pos = slots[k]
        data[pos : pos + len(patterns[pi])] = patterns[pi]
        plants.append((pos, pi))
    return bytes(data), sorted(plants)
