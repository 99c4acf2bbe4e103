"""Sweep bloom (q, stride, k, v) configs on the real chip — honest timing.

Measures the full _hits_jit path (pad+transpose+probe+popcount) at the
official 10k-pattern workload shape; used to calibrate the build-time cost
model in ops/bloom.py.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_pattern_matching.ops.bloom import (
    BloomConfig,
    BloomFilterTable,
    _hits_jit,
)


def timed_config(cfg_args, data, start_t, end_t, payload):
    rng = np.random.RandomState(0)
    q = cfg_args["q"]
    cfg = BloomConfig(
        q=q,
        stride=cfg_args["s"],
        kbanks=cfg_args["k"],
        v=cfg_args["v"],
        mix1=tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=q)),
        mix2=tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=q)),
    )
    words = jnp.asarray(
        rng.randint(0, 2**31, size=(cfg.kbanks, cfg.v, 128)).astype(np.int32)
    )

    @functools.partial(jax.jit, static_argnames=("K",))
    def rep(data, start_t, end_t, words, *, K):
        def body(acc, _):
            s = start_t + (acc & 1)
            meta, _ = _hits_jit(data, jnp.stack([s, end_t]), words,
                                cfg=cfg, interpret=False)
            return acc + meta[0], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    def t(K, n=4):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            int(rep(data, start_t, end_t, words, K=K))
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        int(rep(data, start_t, end_t, words, K=1))
        int(rep(data, start_t, end_t, words, K=9))
        per = (t(9) - t(1)) / 8
        return payload / per / 1e9
    except Exception as e:
        return f"FAIL {str(e)[:80]}"


def main():
    C, B = 4096, 4096
    halo = 16
    rng = np.random.RandomState(7)
    data = jax.device_put(
        rng.randint(0, 256, size=(C, halo + B)).astype(np.uint8)
    )
    start_t = jax.device_put(np.full(C, halo, np.int32))
    end_t = jax.device_put(np.full(C, halo + B, np.int32))
    payload = C * B

    grid = [
        dict(q=4, s=4, k=8, v=16),   # current chooser pick
        dict(q=4, s=4, k=8, v=8),
        dict(q=4, s=4, k=4, v=16),
        dict(q=4, s=4, k=6, v=16),
        dict(q=6, s=7, k=6, v=4),    # the prototype config
        dict(q=6, s=7, k=8, v=16),
        dict(q=5, s=6, k=8, v=16),
        dict(q=6, s=7, k=8, v=8),
        dict(q=4, s=4, k=2, v=1),    # floor: hash + minimal probe
        dict(q=6, s=7, k=2, v=1),
        dict(q=6, s=7, k=8, v=32),
        dict(q=4, s=4, k=8, v=32),
    ]
    for g in grid:
        r = timed_config(g, data, start_t, end_t, payload)
        r = f"{r:7.2f} GB/s" if isinstance(r, float) else r
        print(f"q={g['q']} s={g['s']} k={g['k']} v={g['v']:3d}: {r}")


if __name__ == "__main__":
    main()
