"""Prototype: Pallas bloom-probe kernel — Mosaic support + honest perf.

Checks, in order:
1. take_along_axis axis=1 with a sublane-tiled [G,128] table compiles and
   matches a NumPy model (both TPU-compiled and interpret mode).
2. int32 multiply / shift / and mix compiles.
3. honest throughput of a full k-bank probe pass at stride s.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

G, C = 40, 512  # strided rows per tile x lanes (C mult of 128)
KBANKS = 6
V = 4  # vregs (128-word units) per bank
Q = 6

rng = np.random.RandomState(0)
# bloom words: [KBANKS, V, 128] int32
BLOOM = rng.randint(0, 2**31, size=(KBANKS, V, 128)).astype(np.int32)
MIX1 = rng.randint(1, 2**31, size=Q).astype(np.int32) | 1
MIX2 = rng.randint(1, 2**31, size=Q).astype(np.int32) | 1


def np_probe(window_bytes):  # [G, C, Q] -> hit [G, C]
    w = window_bytes.astype(np.int64)
    m1 = np.zeros(w.shape[:2], np.int64)
    m2 = np.zeros(w.shape[:2], np.int64)
    for k in range(Q):
        m1 = (m1 + w[..., k] * MIX1[k]) & 0xFFFFFFFF
        m2 = (m2 + w[..., k] * MIX2[k]) & 0xFFFFFFFF
    hit = np.ones(w.shape[:2], bool)
    for b in range(KBANKS):
        h = (m1 + b * m2) & 0xFFFFFFFF
        h ^= h >> 13
        v = (h >> 17) & (V - 1)
        w7 = (h >> 10) & 127
        bit = (h >> 5) & 31
        words = BLOOM[b, v, w7]
        hit &= ((words >> bit) & 1).astype(bool)
    return hit


def kernel(data_ref, bloom_ref, out_ref):
    # data_ref: [G*S + Q, C] uint8 tile rows; S = stride
    S = 7
    blk = data_ref[:]
    d = blk.astype(jnp.int32)
    resh = d[: G * S].reshape(G, S, C)
    m1 = jnp.zeros((G, C), jnp.int32)
    m2 = jnp.zeros((G, C), jnp.int32)
    for k in range(Q):
        bk = resh[:, k, :]
        m1 = m1 + bk * jnp.int32(MIX1[k])
        m2 = m2 + bk * jnp.int32(MIX2[k])
    hit = jnp.ones((G, C), jnp.bool_)
    for b in range(KBANKS):
        h = m1 + jnp.int32(b) * m2
        h = h ^ jax.lax.shift_right_logical(h, 13)
        v = jax.lax.shift_right_logical(h, 17) & (V - 1)
        w7 = jax.lax.shift_right_logical(h, 10) & 127
        bit = jax.lax.shift_right_logical(h, 5) & 31
        word = jnp.zeros((G, C), jnp.int32)
        for vi in range(V):
            # tiled table: every sublane row = the same 128 words
            t = jnp.broadcast_to(bloom_ref[b, vi, :][None, :], (G, 128))
            if C == 128:
                g = jnp.take_along_axis(t, w7, axis=1)
            else:
                # lane-block loop: gather within each 128-lane block
                parts = []
                for lb in range(C // 128):
                    idx = w7[:, lb * 128 : (lb + 1) * 128]
                    parts.append(jnp.take_along_axis(t, idx, axis=1))
                g = jnp.concatenate(parts, axis=1)
            word = jnp.where(v == vi, g, word)
        hit = hit & (
            (jax.lax.shift_right_logical(word, bit) & 1) == 1
        )
    out_ref[:] = hit.astype(jnp.int8)


S = 7


def run_probe(data, interpret=False):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, C), jnp.int8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(data, jnp.asarray(BLOOM))


def main():
    data = rng.randint(0, 256, size=(G * S + Q, C)).astype(np.uint8)
    # NumPy model
    win = np.stack(
        [data[: G * S].reshape(G, S, C)[:, k, :] for k in range(Q)], axis=-1
    )
    want = np_probe(win)
    try:
        out = np.asarray(run_probe(jnp.asarray(data)))
        print("pallas compiled probe: ok =", np.array_equal(out.astype(bool), want),
              " hits:", out.sum(), "/", want.sum())
    except Exception as e:
        print("pallas probe FAILED:", str(e)[:400])
        return

    # honest throughput: full-scale kernel with grid over tiles
    GT, CT = 64, 1024   # tile: 64 strided rows x 1024 lanes
    TILES = 128
    TT = GT * S
    PADR = 8  # block row padding: (TT+PADR) % 8 == 0, covers the Q-1 window tail
    total_rows = TILES * TT

    def big_kernel(data_ref, bloom_ref, out_ref):
        blk = data_ref[:]
        d = blk.astype(jnp.int32)
        resh = d[:TT].reshape(GT, S, CT)
        m1 = jnp.zeros((GT, CT), jnp.int32)
        m2 = jnp.zeros((GT, CT), jnp.int32)
        for k in range(Q):
            bk = resh[:, k, :]
            m1 = m1 + bk * jnp.int32(MIX1[k])
            m2 = m2 + bk * jnp.int32(MIX2[k])
        hit = jnp.ones((GT, CT), jnp.bool_)
        for b in range(KBANKS):
            h = m1 + jnp.int32(b) * m2
            h = h ^ jax.lax.shift_right_logical(h, 13)
            v = jax.lax.shift_right_logical(h, 17) & (V - 1)
            w7 = jax.lax.shift_right_logical(h, 10) & 127
            bit = jax.lax.shift_right_logical(h, 5) & 31
            word = jnp.zeros((GT, CT), jnp.int32)
            for vi in range(V):
                t = jnp.broadcast_to(bloom_ref[b, vi, :][None, :], (GT, 128))
                parts = []
                for lb in range(CT // 128):
                    idx = w7[:, lb * 128 : (lb + 1) * 128]
                    parts.append(jnp.take_along_axis(t, idx, axis=1))
                g = jnp.concatenate(parts, axis=1)
                word = jnp.where(v == vi, g, word)
            hit = hit & ((jax.lax.shift_right_logical(word, bit) & 1) == 1)
        out_ref[0] = hit.astype(jnp.int8)

    @jax.jit
    def big(data, bloom):
        return pl.pallas_call(
            big_kernel,
            out_shape=jax.ShapeDtypeStruct((TILES, GT, CT), jnp.int8),
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((TT + PADR, CT), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, GT, CT), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(data, bloom)

    # NOTE: BlockSpec (TT+Q) rows per tile over a (TILES*(TT+Q)) array — we
    # just feed disjoint tiles incl. the window tail inside each tile for
    # the perf test (overlap handling comes in the real engine).
    big_data = rng.randint(0, 256, size=(TILES * (TT + PADR), CT)).astype(np.uint8)
    bloom_dev = jnp.asarray(BLOOM)
    data_dev = jnp.asarray(big_data)

    @functools.partial(jax.jit, static_argnames=("K",))
    def rep(data, bloom, *, K):
        def body(acc, _):
            # thread the carry through the (tiny) bloom table so XLA cannot
            # hoist the loop-invariant kernel out of the scan
            o = big(data, bloom ^ (acc & 1))
            return acc + jnp.sum(o.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    def t(K, n=5):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            int(rep(data_dev, bloom_dev, K=K))
            best = min(best, time.perf_counter() - t0)
        return best

    int(rep(data_dev, bloom_dev, K=1)); int(rep(data_dev, bloom_dev, K=9))
    per = (t(9) - t(1)) / 8
    payload = total_rows * CT
    print(f"bloom probe k={KBANKS} V={V} stride={S}: {per*1e3:.2f} ms per "
          f"{payload>>20} MiB -> {payload/per/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
