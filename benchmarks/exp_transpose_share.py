"""How much of the probe's per-batch cost is the pad+transpose prep?

The official probe metric (bench.py) times ``_hits_jit`` = pad + T +
pallas probe + popcount on a lane-major [C, halo+B] uint8 batch. The
pallas kernels consume TIME-major data, so every batch pays one on-device
uint8 relayout before any matching happens. This experiment splits that
cost with three interleaved arms (honest K-loop, BENCH_NOTES protocol):

- ``full``     — _hits_jit exactly as bench.py times it
- ``probe_tm`` — _probe_bits_jit + popcount on a PRE-transposed device
                 array: the probe with zero prep
- ``prep``     — pad + transpose alone (optimization-barriered, consumed
                 by a trivial reduction): direct corroboration of
                 full - probe_tm

If full - probe_tm is material, a word-packed data path (host sends the
same bytes viewed uint32, kernels unpack with static shifts) is worth
building: a [C, T/4] int32 transpose moves 4x fewer elements.

Usage: python benchmarks/exp_transpose_share.py [n_patterns] [objective]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main(n_patterns: int = 10_000, objective: str = "probe") -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_workload, devices_with_retry

    devices_with_retry()

    from tpu_pattern_matching.ops.bloom import (
        BloomFilterTable,
        DeviceBloom,
        _hits_jit,
        _probe_bits_jit,
    )
    from tpu_pattern_matching.utils.common import pad_halo

    table = build_workload(n_patterns)
    bft = BloomFilterTable.from_table(table, objective=objective)
    cfg = bft.cfg
    C, B0 = 4096, 4096
    halo = pad_halo(table.max_pat_len - 1, B0)
    B = B0 + (-(halo + B0)) % cfg.tile_rows
    T = halo + B
    size = C * B
    interpret = DeviceBloom._interpret()

    rng = np.random.RandomState(7)
    data_np = rng.randint(0, 256, size=(C, T)).astype(np.uint8)
    data = jax.device_put(data_np)
    bounds_np = np.stack(
        [np.full(C, halo, np.int32), np.full(C, T, np.int32)]
    )
    bounds = jax.device_put(bounds_np)
    words = jax.device_put(bft.words)

    # pre-transposed operands for the probe_tm arm (the same pad math
    # _hits_jit does)
    tt = cfg.tile_rows
    Tp = ((T + tt - 1) // tt) * tt
    Cp = ((C + 127) // 128) * 128
    data_tm = jax.device_put(
        np.pad(data_np, ((0, Cp - C), (0, Tp - T))).T.copy()
    )
    bounds_p = jax.device_put(
        np.pad(bounds_np, ((0, 0), (0, Cp - C)))
    )

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_full(data, bounds, *, K):
        def body(acc, _):
            b2 = bounds.at[0, 0].add(acc & 1)
            total, _bits = _hits_jit(
                data, b2, words, cfg=cfg, interpret=interpret
            )
            return acc + total[0], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    packed_ok = (not cfg.sampled) and cfg.stride % 4 == 0

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_full_packed(data, bounds, *, K):
        def body(acc, _):
            b2 = bounds.at[0, 0].add(acc & 1)
            total, _bits = _hits_jit(
                data, b2, words, cfg=cfg, interpret=interpret, packed=True
            )
            return acc + total[0], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_prep_packed(data, *, K):
        def body(acc, _):
            d2 = data.at[0, 0].set((acc & 1).astype(jnp.uint8))
            d32 = jax.lax.bitcast_convert_type(
                jnp.pad(d2, ((0, Cp - C), (0, Tp - T))).reshape(
                    Cp, Tp // 4, 4
                ),
                jnp.uint32,
            )
            tm = jax.lax.optimization_barrier(d32.T)
            return acc + tm[0, :].astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_probe_tm(data_tm, bounds_p, *, K):
        def body(acc, _):
            b2 = bounds_p.at[0, 0].add(acc & 1)
            bits = _probe_bits_jit(
                data_tm, b2, words, cfg=cfg, interpret=interpret
            )
            return acc + jnp.sum(jax.lax.population_count(bits)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    @functools.partial(jax.jit, static_argnames=("K",))
    def run_prep(data, *, K):
        def body(acc, _):
            d2 = data.at[0, 0].set((acc & 1).astype(jnp.uint8))
            tm = jax.lax.optimization_barrier(
                jnp.pad(d2, ((0, Cp - C), (0, Tp - T))).T
            )
            return acc + tm[0, :].astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    arms = {
        "full": lambda K: int(run_full(data, bounds, K=K)),
        "probe_tm": lambda K: int(run_probe_tm(data_tm, bounds_p, K=K)),
        "prep": lambda K: int(run_prep(data, K=K)),
    }
    if packed_ok:
        arms["full_packed"] = lambda K: int(run_full_packed(data, bounds, K=K))
        arms["prep_packed"] = lambda K: int(run_prep_packed(data, K=K))
    K_LO, K_HI = 1, 9
    for run in arms.values():
        run(K_LO)
        run(K_HI)

    best = {name: {K_LO: float("inf"), K_HI: float("inf")} for name in arms}
    for _round in range(5):
        for name, run in arms.items():
            for K in (K_LO, K_HI):
                t0 = time.perf_counter()
                run(K)
                best[name][K] = min(best[name][K], time.perf_counter() - t0)

    out = {
        "metric": "transpose_share",
        "n_patterns": n_patterns,
        "objective": objective,
        "cfg": ("sampled" if cfg.sampled else "strided")
        + f"_q{cfg.q}s{cfg.stride}w{cfg.w}k{cfg.kbanks}v{cfg.v}",
        "batch_bytes": size,
    }
    for name in arms:
        per = (best[name][K_HI] - best[name][K_LO]) / (K_HI - K_LO)
        out[f"{name}_s_per_batch"] = per
        out[f"{name}_bytes_per_s"] = size / per
    out["prep_share_of_full"] = 1.0 - (
        out["probe_tm_s_per_batch"] / out["full_s_per_batch"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10_000,
        sys.argv[2] if len(sys.argv) > 2 else "probe",
    )
