"""Benchmark: input bytes/s/chip at 10k patterns (the BASELINE north-star).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "bytes/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.json "published": {}); its
protocol is bytes*8/wall Mbps on urandom corpora with ClamAV-style hex
signatures (SURVEY.md section 6). ``vs_baseline`` is therefore reported
against a nominal 1 GB/s/chip north-star denominator.

Workload: 10,000 random hex signatures truncated to 12 bytes (the reference's
recommended ``-m 12`` for large ClamAV sets, README:71-83) scanned over
random binary.

MEASUREMENT HONESTY (see BENCH_NOTES.md "measurement artifact"): on the
axon-tunneled backend ``jax.block_until_ready`` does NOT wait for device
execution, so wall-clock around a dispatch measures enqueue rate. This
benchmark therefore runs the scan K times inside ONE jitted computation
(``lax.scan``), forces a host sync by fetching the scalar total, and
differences t(K_hi) - t(K_lo) to cancel fixed dispatch/transfer overhead.
The harness was validated against a 4096^3 bf16 matmul (166 Tflop/s ≈ v5e
peak) and an elementwise pass (540 GB/s HBM r+w).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def build_workload(n_patterns: int = 10_000, pat_len: int = 12, seed: int = 42):
    from tpu_pattern_matching.core.dfa import compile_patterns

    rng = np.random.RandomState(seed)
    pats = [bytes(rng.randint(0, 256, size=pat_len).astype(np.uint8))
            for _ in range(n_patterns)]
    return compile_patterns(pats)


def devices_with_retry(attempts: int = 4, wait_s: float = 15.0):
    """The tunnel's backend registration is transiently flaky."""
    import jax

    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError:
            if i == attempts - 1:
                raise
            time.sleep(wait_s)


def main() -> None:
    import jax
    import jax.numpy as jnp

    devices_with_retry()

    from tpu_pattern_matching.engine import best_scan_total_fn

    table = build_workload()
    C, B = 4096, 4096  # ~16 MiB payload per scan
    scan_total, halo = best_scan_total_fn(table, C, B)
    # align halo+B to the engine's row tiling so the device scans no
    # zero-padded rows (every row is real payload)
    try:
        from tpu_pattern_matching.ops.bloom import BloomFilterTable

        tt = BloomFilterTable.from_table(table).cfg.tile_rows
        B += (-(halo + B)) % tt
    except Exception:
        pass

    rng = np.random.RandomState(7)
    data = jax.device_put(
        rng.randint(0, 256, size=(C, halo + B)).astype(np.uint8)
    )
    start_t = jax.device_put(np.full(C, halo, np.int32))
    end_t = jax.device_put(np.full(C, halo + B, np.int32))

    @functools.partial(jax.jit, static_argnames=("K",))
    def repeat(data, start_t, end_t, *, K):
        def body(acc, _):
            # thread the carry through an operand so XLA cannot hoist the
            # loop-invariant scan out of the loop (it will: verified)
            s = start_t + (acc & 1)
            return acc + scan_total(data, s, end_t), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return acc

    def run(K):
        return int(repeat(data, start_t, end_t, K=K))

    K_LO, K_HI = 1, 9
    run(K_LO)
    run(K_HI)  # compile both

    def best_time(K, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            run(K)
            best = min(best, time.perf_counter() - t0)
        return best

    per_scan = (best_time(K_HI) - best_time(K_LO)) / (K_HI - K_LO)
    value = C * B / per_scan
    print(
        json.dumps(
            {
                "metric": "scan_bytes_per_s_per_chip_10k_patterns",
                "value": value,
                "unit": "bytes/s",
                "vs_baseline": value / 1e9,
                # the reference publishes no numbers (BASELINE.json
                # "published": {}); the denominator is a nominal target,
                # labeled here so the ratio is not mistaken for a measured
                # reference figure
                "baseline_denominator": "nominal 1e9 bytes/s/chip (reference publishes no benchmark numbers)",
            }
        )
    )


if __name__ == "__main__":
    main()
