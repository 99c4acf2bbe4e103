"""100k-pattern throughput: the winnowing-sampled bloom config on real TPU.

Same honest protocol as bench.py (K scans inside one jit, t(K_hi)-t(K_lo)).
The strided mode cannot hold 4x100k grams at a usable fp (k*v ceiling);
sampled mode is the 100k enabler (VERDICT round-1 item 3b).
"""
import functools
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_patterns=100_000):
    import jax
    import jax.numpy as jnp

    from bench import devices_with_retry
    devices_with_retry()

    from tpu_pattern_matching.core.dfa import compile_patterns
    from tpu_pattern_matching.engine import best_scan_total_fn

    rng = np.random.RandomState(42)
    pats = [bytes(rng.randint(0, 256, size=12).astype(np.uint8))
            for _ in range(n_patterns)]
    from tpu_pattern_matching.ops.bloom import BloomFilterTable

    t0 = time.time()
    table = compile_patterns(pats)
    bft = BloomFilterTable.from_table(table)  # built ONCE, reused below
    scan_total, halo = best_scan_total_fn(
        table, 4096, 4096, engine="bloom", bloom_table=bft
    )
    build_s = time.time() - t0
    cfg = bft.cfg
    C, B = 4096, 4096
    B += (-(halo + B)) % cfg.tile_rows

    data = jax.device_put(rng.randint(0, 256, size=(C, halo + B)).astype(np.uint8))
    start_t = jax.device_put(np.full(C, halo, np.int32))
    end_t = jax.device_put(np.full(C, halo + B, np.int32))

    @functools.partial(jax.jit, static_argnames=("K",))
    def repeat(data, start_t, end_t, *, K):
        def body(acc, _):
            s = start_t + (acc & 1)
            return acc + scan_total(data, s, end_t), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    def run(K):
        return int(repeat(data, start_t, end_t, K=K))

    K_LO, K_HI = 1, 9
    survivors = run(K_LO)
    run(K_HI)

    def best_time(K, n=5):
        best = float("inf")
        for _ in range(n):
            t = time.perf_counter()
            run(K)
            best = min(best, time.perf_counter() - t)
        return best

    per_scan = (best_time(K_HI) - best_time(K_LO)) / (K_HI - K_LO)
    print(json.dumps({
        "metric": f"scan_bytes_per_s_per_chip_{n_patterns//1000}k_patterns",
        "value": C * B / per_scan,
        "unit": "bytes/s",
        "config": {"mode": "sampled" if cfg.sampled else "strided",
                   "q": cfg.q, "w": cfg.w, "stride": cfg.stride,
                   "k": cfg.kbanks, "v": cfg.v, "grams": bft.n_grams,
                   "fp_est": bft.fp_est},
        "survivor_rate_per_byte": survivors / (C * B),
        "build_s": round(build_s, 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
