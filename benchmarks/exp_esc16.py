"""Perf experiment: isolate esc16 fast-path cost on the real chip.

Trials are interleaved round-robin across variants so chip/tunnel contention
hits every variant equally; report best and median per variant.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_workload
from tpu_pattern_matching.ops.table import DeviceTable
from tpu_pattern_matching.ops.match_xla import scan_batch
from tpu_pattern_matching.utils.common import pad_halo


@functools.partial(jax.jit, static_argnames=("alphabet_size", "mode"))
def walk_only(table16, data, start_t, end_t, *, alphabet_size, mode):
    data_tm = jax.lax.optimization_barrier(data.T)
    T, C = data_tm.shape
    block = 8

    def body(carry, xs):
        st, esc = carry
        blk, t0 = xs
        for k in range(block):
            t = t0 + k
            idx = st * alphabet_size + blk[k].astype(jnp.int32)
            if mode == "clip":
                raw = jnp.take(table16, idx, mode="clip").astype(jnp.int32)
            else:
                raw = jnp.take(table16, idx).astype(jnp.int32)
            valid = (t >= start_t) & (t < end_t)
            esc = esc | ((raw < 0) & valid)
            st = jnp.where(valid, raw, st)
        return (st, esc), None

    xs_blocks = data_tm.reshape(T // block, block, C)
    ts0 = jax.lax.broadcasted_iota(jnp.int32, (T // block, 1), 0).squeeze(-1) * block
    (st, esc), _ = jax.lax.scan(
        body, (jnp.zeros((C,), jnp.int32), jnp.zeros((C,), jnp.bool_)), (xs_blocks, ts0)
    )
    return st, esc


def main():
    table = build_workload()
    C, B = 2048, 4096
    halo = pad_halo(table.max_pat_len - 1, B)
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, size=(C, halo + B)).astype(np.uint8)
    start_t = jax.device_put(np.full(C, halo, np.int32))
    end_t = jax.device_put(np.full(C, halo + B, np.int32))
    data_dev = jax.device_put(data)
    payload = C * B

    dense = DeviceTable.put(table, esc16=False)
    esc = DeviceTable.put(table, esc16=True)
    A = table.alphabet_size

    variants = {
        "walk16 only (clip)": lambda: jax.block_until_ready(
            walk_only(esc.table_esc16, data_dev, start_t, end_t,
                      alphabet_size=A, mode="clip")[0]
        ),
        "esc16 full engine": lambda: jax.block_until_ready(
            scan_batch(esc, data_dev, start_t, end_t, halo=halo,
                       max_results=16).counts
        ),
        "dense full engine": lambda: jax.block_until_ready(
            scan_batch(dense, data_dev, start_t, end_t, halo=halo,
                       max_results=16).counts
        ),
    }

    # compile + warm each
    for fn in variants.values():
        for _ in range(8):
            fn()

    times = {k: [] for k in variants}
    ROUNDS = 20
    for _ in range(ROUNDS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            fn()
            times[k].append((time.perf_counter() - t0) / 2)

    for k, ts in times.items():
        ts = sorted(ts)
        best, med = ts[0], ts[len(ts) // 2]
        print(f"{k:28s} best {payload/best/1e9:7.1f} GB/s   med {payload/med/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
