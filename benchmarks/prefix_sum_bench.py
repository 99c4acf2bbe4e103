"""Prefix-scan throughput benchmark (reference prefixsum_test.c:74-93).

The reference's standalone scan benchmark is stale against its own databuf
struct (SURVEY §2.1); this one works: times `jnp.cumsum` over N int32 counts
(the compaction pipeline's scan input) and prints Mbit/s like the original.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    x = np.random.RandomState(0).randint(0, 16, size=args.count).astype(np.int32)
    xd = jax.device_put(x)
    f = jax.jit(lambda v: jnp.cumsum(v))
    jax.block_until_ready(f(xd))  # warm-up (prefixsum_test.c does the same)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(f(xd))
    dt = (time.perf_counter() - t0) / iters
    bits = args.count * 32
    print(
        json.dumps(
            {
                "metric": "prefix_sum_mbit_per_s",
                "count": args.count,
                "value": bits / dt / 1e6,
                "unit": "Mbit/s",
            }
        )
    )
    # correctness vs host scan (databuf_test verifies the same way,
    # databuf.c:974-981)
    assert np.array_equal(np.asarray(f(xd)), np.cumsum(x, dtype=np.int32))


if __name__ == "__main__":
    main()
