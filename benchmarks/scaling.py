"""Scaling-efficiency benchmark: bytes/s at 1..N devices.

BASELINE target: >=80% linear bytes/s scaling 1 -> N. On real multi-chip
hardware this measures true ICI scaling; in this environment (one physical
chip) it runs on the simulated N-device CPU mesh by default
(``--platform cpu``), which validates the sharded program and the scaling
HARNESS rather than silicon. The data-parallel scan has no cross-device
communication in its hot loop (table replicated, lanes independent, one [G]
psum per batch), so near-linear scaling is structural.
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
    ap.add_argument("--platform", default="cpu", choices=["cpu", "native"])
    ap.add_argument("--max-devices", type=int, default=8)
    ap.add_argument("--lanes-per-device", type=int, default=256)
    ap.add_argument("--chunk-len", type=int, default=1024)
    ap.add_argument("--patterns", type=int, default=1000)
    ap.add_argument("--engine", default="bloom", choices=["bloom", "dense"])
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.max_devices}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from tpu_pattern_matching.core.dfa import compile_patterns
    from tpu_pattern_matching.ops.bloom import BloomFilterTable
    from tpu_pattern_matching.ops.table import DeviceTable
    from tpu_pattern_matching.parallel.mesh import (
        MeshContext,
        make_mesh,
        make_sharded_bloom_step,
        make_sharded_scan_step,
    )
    from tpu_pattern_matching.utils.common import pad_halo

    rng = np.random.RandomState(0)
    pats = [
        bytes(rng.randint(0, 256, size=12).astype(np.uint8))
        for _ in range(args.patterns)
    ]
    table = compile_patterns(pats)
    B = args.chunk_len
    halo = pad_halo(table.max_pat_len - 1, B)

    results = []
    n = 1
    while n <= min(args.max_devices, len(jax.devices())):
        C = args.lanes_per_device * n
        data = rng.randint(0, 256, size=(C, halo + B)).astype(np.uint8)
        start_t = np.full(C, halo, np.int32)
        end_t = np.full(C, halo + B, np.int32)
        ctx = MeshContext(make_mesh(jax.devices()[:n]))
        if args.engine == "bloom":
            bft = BloomFilterTable.from_table(table)
            bloom = bft.put(ctx.replicated)
            bstep = make_sharded_bloom_step(ctx, bloom)
            dsh = jax.device_put(data, ctx.lane_sharded)
            bsh = jax.device_put(
                np.stack([start_t, end_t]), ctx.lane_sharded2d
            )
            run = lambda: bstep(bloom.words, dsh, bsh)
        else:
            dev = DeviceTable.put(table, ctx.replicated)
            step = make_sharded_scan_step(
                ctx, dev, halo=halo, max_results=16,
                num_groups=table.num_groups,
            )
            dsh = jax.device_put(data, ctx.lane_sharded)
            run = lambda: step(dev.table_flat, dev.state_gid, dsh,
                               start_t, end_t)
        jax.block_until_ready(run())
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        results.append({"devices": n, "bytes_per_s": C * B / dt})
        n *= 2

    base = results[0]["bytes_per_s"]
    for r in results:
        r["efficiency"] = r["bytes_per_s"] / (base * r["devices"])
    print(json.dumps({"metric": "scaling", "platform": args.platform,
                      "engine": args.engine, "results": results}))


if __name__ == "__main__":
    main()
