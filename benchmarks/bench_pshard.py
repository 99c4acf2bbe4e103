"""Pattern-sharding A/B at scale: one saturated filter vs S shard filters.

Usage: python benchmarks/bench_pshard.py [n_patterns] [n_shards]

Measures three interleaved arms on the real chip (honest K-loop protocol,
same-process round-robin — BENCH_NOTES.md measurement rules):

- ``single``:  the scale-curve arm — ONE filter over all N patterns at
  the probe-objective chooser pick (what the 100k/300k/1M curve reports).
- ``sharded``: S per-shard filters probed in ONE jit with on-device OR
  (parallel/pshard.py) — the single-chip capacity mode.
- ``one_shard``: shard 0's filter alone — exactly the per-chip work of an
  S-chip ("pat", "data") mesh row, so its rate IS the projected
  throughput of S-way pattern-sharded hardware on the same batch (each
  chip probes its shard concurrently; the all_gather+OR of W x C x 4B
  bitmaps rides ICI and is not reproducible through the one-chip tunnel).

Prints one JSON line with all three rates and the survivor totals.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main(n_patterns: int = 300_000, n_shards: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import devices_with_retry

    devices_with_retry()

    from tpu_pattern_matching.ops.bloom import (
        BloomFilterTable,
        DeviceBloom,
        _hits_jit,
    )
    from tpu_pattern_matching.parallel.pshard import (
        ShardedBloom,
        _sharded_hits_jit,
    )
    from tpu_pattern_matching.utils.common import pad_halo

    rng = np.random.RandomState(42)
    pats = [bytes(rng.randint(0, 256, size=12).astype(np.uint8))
            for _ in range(n_patterns)]

    t0 = time.time()
    single = BloomFilterTable.build(pats, objective="probe")
    single_build_s = time.time() - t0
    t0 = time.time()
    sharded = ShardedBloom.build(pats, n_shards, objective="probe")
    sharded_build_s = time.time() - t0

    C, B0 = 4096, 4096
    halo = pad_halo(12 - 1, B0)
    interpret = DeviceBloom._interpret()
    drng = np.random.RandomState(7)

    def make_arm(words_dev, cfg, probe):
        B = B0 + (-(halo + B0)) % cfg.tile_rows
        data = jax.device_put(
            drng.randint(0, 256, size=(C, halo + B)).astype(np.uint8)
        )
        bounds = jax.device_put(
            np.stack([np.full(C, halo, np.int32),
                      np.full(C, halo + B, np.int32)])
        )

        @functools.partial(jax.jit, static_argnames=("K",))
        def repeat(data, bounds, *, K):
            def body(acc, _):
                b2 = bounds.at[0, 0].add(acc & 1)
                total, _bits = probe(data, b2)
                return acc + total[0], None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32), None, length=K
            )
            return acc

        def run(K):
            return int(repeat(data, bounds, K=K))

        return run, C * B

    words1 = jax.device_put(single.words)
    run1, size1 = make_arm(
        words1, single.cfg,
        lambda d, b: _hits_jit(d, b, words1, cfg=single.cfg,
                               interpret=interpret),
    )
    wordsS = jax.device_put(sharded.words)
    runS, sizeS = make_arm(
        wordsS, sharded.cfg,
        lambda d, b: _sharded_hits_jit(
            d, b, wordsS, cfg=sharded.cfg, n_shards=n_shards,
            interpret=interpret,
        ),
    )
    words0 = jax.device_put(np.ascontiguousarray(sharded.words[0]))
    run0, size0 = make_arm(
        words0, sharded.cfg,
        lambda d, b: _hits_jit(d, b, words0, cfg=sharded.cfg,
                               interpret=interpret),
    )

    arms = {"single": (run1, size1), "sharded": (runS, sizeS),
            "one_shard": (run0, size0)}
    K_LO, K_HI = 1, 5
    surv = {}
    for name, (run, _s) in arms.items():
        surv[name] = run(K_LO)  # compile + survivor total at K=1
        run(K_HI)

    best = {name: {K_LO: float("inf"), K_HI: float("inf")}
            for name in arms}
    for _round in range(5):  # interleaved: contention hits all arms alike
        for name, (run, _s) in arms.items():
            for K in (K_LO, K_HI):
                t0 = time.perf_counter()
                run(K)
                best[name][K] = min(
                    best[name][K], time.perf_counter() - t0
                )

    out = {
        "metric": "pshard_ab",
        "n_patterns": n_patterns,
        "n_shards": n_shards,
        "single_cfg": _cfgtag(single.cfg),
        "sharded_cfg": _cfgtag(sharded.cfg),
        "single_fp_est": single.fp_est,
        "shard_fp_est": sharded.fp_est[0],
        "single_build_s": round(single_build_s, 1),
        "sharded_build_s": round(sharded_build_s, 1),
    }
    for name, (_run, size) in arms.items():
        per = (best[name][K_HI] - best[name][K_LO]) / (K_HI - K_LO)
        out[f"{name}_bytes_per_s"] = size / per
        out[f"{name}_survivors_per_byte"] = surv[name] / size
    print(json.dumps(out))


def _cfgtag(cfg) -> str:
    return (("sampled" if cfg.sampled else "strided")
            + f"_q{cfg.q}s{cfg.stride}w{cfg.w}k{cfg.kbanks}v{cfg.v}")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 300_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
