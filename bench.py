"""Headline benchmark: decoded syndromes/s/chip, [[144,12,12]] BP.

Workload definition (fixed so rounds are comparable): code-capacity channel
at p = 0.01, sum-product BP with max_iter = 50 and chunked early exit,
batch decoding on a single chip. Baseline = the BASELINE.json north star of
1e6 decoded syndromes/s/chip (the reference publishes no throughput numbers —
SURVEY.md §6).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

BASELINE_SYNDROMES_PER_S = 1.0e6


def main():
    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.decoders import BPConfig, BPDecoder

    code = get_code("[[144, 12, 12]]")
    H = code.Hx
    p = 0.01
    batch = int(__import__("os").environ.get("BENCH_BATCH", 16384))
    reps = int(__import__("os").environ.get("BENCH_REPS", 20))

    backend = __import__("os").environ.get("BENCH_BACKEND", "pallas")
    if backend == "pallas":
        dec = BPDecoder(H, BPConfig(max_iter=50, backend="pallas", batch_tile=512))
    else:
        dec = BPDecoder(H, BPConfig(max_iter=50, chunk_size=10))
    prior = jnp.full((code.n,), float(np.log((1 - p) / p)), jnp.float32)

    # pre-generate distinct syndrome batches on device (sampling excluded
    # from the timed region; the timed op is decoding)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(8):
        errors = (rng.random((batch, code.n)) < p).astype(np.int8)
        batches.append(jnp.asarray((errors @ H.T) % 2))
    batches = [jax.device_put(b) for b in batches]

    # warmup / compile
    warm = dec(batches[0], prior)
    jax.block_until_ready(warm)
    assert bool(warm.converged.mean() > 0.9), "decoder sanity check failed"

    # timed region: pipelined dispatches, wait on every output
    t0 = time.perf_counter()
    outs = [dec(batches[i % len(batches)], prior) for i in range(reps)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    value = batch * reps / dt
    print(
        json.dumps(
            {
                "metric": "decoded_syndromes_per_s_per_chip_144_bp50",
                "value": round(value, 1),
                "unit": "syndromes/s",
                "vs_baseline": round(value / BASELINE_SYNDROMES_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
