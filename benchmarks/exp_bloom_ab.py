"""Definitive A/B: blockwise vs fullwidth kernel x configs, ONE process,
round-robin interleaved, many rounds — immune to slow chip-contention
drift. Reports best and median per variant."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_pattern_matching.ops.bloom import BloomConfig, _hits_jit


def make_cfg(q, s, k, v, blockwise):
    rng = np.random.RandomState(0)
    return BloomConfig(
        q=q, stride=s, kbanks=k, v=v,
        mix1=tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=q)),
        mix2=tuple(int(x) | 1 for x in rng.randint(1, 2**31, size=q)),
        blockwise=blockwise,
    )


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

    variants = {}
    for bw in (True, False):
        tag = "blk" if bw else "full"
        variants[f"q4s4k8v16 {tag}"] = make_cfg(4, 4, 8, 16, bw)
        variants[f"q4s4k6v8  {tag}"] = make_cfg(4, 4, 6, 8, bw)
        variants[f"q4s8k8v8  {tag}"] = make_cfg(4, 8, 8, 8, bw)

    fns = {}
    for name, cfg in variants.items():
        words = jax.device_put(
            np.random.RandomState(1)
            .randint(0, 2**31, size=(cfg.kbanks, cfg.v, 128))
            .astype(np.int32)
        )

        @functools.partial(jax.jit, static_argnames=("K",))
        def rep(data, start_t, end_t, words, *, K, cfg=cfg):
            def body(acc, _):
                s = start_t + (acc & 1)
                meta, _ = _hits_jit(data, jnp.stack([s, end_t]), words,
                                    cfg=cfg, interpret=False)
                return acc + meta[0], None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                  length=K)
            return acc

        try:
            int(rep(data, start_t, end_t, words, K=1))
            int(rep(data, start_t, end_t, words, K=9))
            fns[name] = (rep, words)
            print(f"compiled {name}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:90]}", flush=True)

    times = {k: [] for k in fns}
    for _ in range(10):
        for name, (rep, words) in fns.items():
            t0 = time.perf_counter()
            int(rep(data, start_t, end_t, words, K=1))
            t1 = time.perf_counter()
            int(rep(data, start_t, end_t, words, K=9))
            t9 = time.perf_counter() - t1
            times[name].append((t9 - (t1 - t0)) / 8)
    for name, ts in times.items():
        ts = sorted(ts)
        best, med = ts[0], ts[len(ts) // 2]
        print(f"{name}: best {payload/best/1e9:7.2f}  med "
              f"{payload/med/1e9:7.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
