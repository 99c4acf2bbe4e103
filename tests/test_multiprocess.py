"""True multi-PROCESS distributed test: 2 processes x 2 CPU devices run the
sharded bloom step over a 4-device global mesh via jax.distributed — the
DCN-path analogue the reference never had (its only multi-device story is
independent pthreads, SURVEY.md section 2.5). Validates that the engine's
mesh program works when devices span processes, not just within one."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.getcwd())
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_pattern_matching.core.dfa import compile_patterns
    from tpu_pattern_matching.ops.bloom import BloomFilterTable
    from tpu_pattern_matching.parallel.mesh import (
        MeshContext, make_mesh, make_sharded_bloom_step,
    )

    rng = np.random.RandomState(3)
    pats = [bytes(rng.randint(0, 256, size=8).astype(np.uint8))
            for _ in range(16)]
    table = compile_patterns(pats)
    bft = BloomFilterTable.from_table(table)

    n_global = jax.device_count()
    assert n_global == 4, n_global
    lanes = 128 * n_global
    T = 256
    data = rng.randint(0, 256, size=(lanes, T)).astype(np.uint8)
    data[5, 100:108] = np.frombuffer(pats[0], np.uint8)  # plant
    bounds = np.stack(
        [np.zeros(lanes, np.int32), np.full(lanes, T, np.int32)]
    )

    ctx = MeshContext(make_mesh(jax.devices()))
    bloom = bft.put(ctx.replicated)
    step = make_sharded_bloom_step(ctx, bloom)

    def shard_global(arr, spec):
        sharding = NamedSharding(ctx.mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    total, bits = step(
        bloom.words,
        shard_global(data, P("data")),
        shard_global(bounds, P(None, "data")),
    )
    jax.block_until_ready((total, bits))
    t = int(np.asarray(jax.device_get(total))[0])
    assert t >= 1, t  # the planted gram survives on every process's view

    # ---- the PRODUCT path across processes: MatchSession(mesh=) ----
    # every process feeds the same global batch; scan shards it over the
    # 4-device/2-process mesh; decode sees a non-fully-addressable bitmap
    # and verifies only this host's lane columns; group counts are then
    # psum-reduced across processes (BASELINE config 5 shape).
    import io
    from tpu_pattern_matching.core.oracle import match_python
    from tpu_pattern_matching.parallel.mesh import allreduce_host_counts
    from tpu_pattern_matching.runtime.buffers import StreamState
    from tpu_pattern_matching.runtime.session import MatchSession

    rng2 = np.random.RandomState(17)  # identical payload on every process
    payload = bytearray(rng2.randint(0, 256, size=512 * 64).astype(np.uint8))
    for pos in (100, 9000, 30000):
        payload[pos : pos + 8] = pats[pos % 16]
    payload = bytes(payload)
    sess = MatchSession(table, max_chunks=512, chunk_len=64,
                        engine="bloom", mesh=ctx)
    buf = sess.new_buffer()
    buf.add_stream(io.BytesIO(payload), StreamState(file_id=0))
    batch = buf.to_batch()
    bm = sess.decode(batch, sess.scan(batch))  # local-shard events only
    counts = allreduce_host_counts(sess.event_group_counts(bm))
    # events are unique (lane, end) sites; compare against distinct match
    # end offsets from the oracle
    want = len({off for off, _ in match_python(pats, payload)})
    got = int(counts.sum())
    assert got == want, (got, want)
    print(f"proc {pid} OK total={t} session_events={got}", flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("TPM_TEST_TPU"), reason="multi-process sim is CPU-only"
)
def test_two_process_sharded_bloom():
    import socket

    with socket.socket() as sock:  # a free port: collisions hang the init
        sock.bind(("localhost", 0))
        port = str(sock.getsockname()[1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=root,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append((p.returncode, out.decode()))
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
