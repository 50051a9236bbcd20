"""Headline benchmark: decoded syndromes/s/chip, [[144,12,12]] BP.

Workload: code-capacity channel at p = 0.01, sum-product BP with
max_iter = 50, single chip, Pallas fused kernel. Baseline = the
BASELINE.json north star of 1e6 decoded syndromes/s/chip (the reference
publishes no throughput numbers — SURVEY.md §6).

Methodology note: the remote-TPU link's completion signaling makes
``block_until_ready``-only timing unreliable, so each timed dispatch decodes
one large batch and the timer stops only after a scalar reduction of the
outputs is read back to the host.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
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
    batch = int(os.environ.get("BENCH_BATCH", 262144))
    reps = int(os.environ.get("BENCH_REPS", 4))
    backend = os.environ.get("BENCH_BACKEND", "pallas")

    if backend == "pallas":
        dec = BPDecoder(H, BPConfig(max_iter=50, backend="pallas", batch_tile=256))
    else:
        dec = BPDecoder(H, BPConfig(max_iter=50, chunk_size=10))
    prior = jnp.full((code.n,), float(np.log((1 - p) / p)), jnp.float32)

    @jax.jit
    def step(acc, s):
        res = dec.decode_fn(s, prior)
        # scalar digest chained on device; the final readback forces every
        # rep to have completed (single round trip for the whole run)
        return (
            acc
            + res.converged.sum().astype(jnp.int32)
            + res.iterations.sum().astype(jnp.int32)
        )

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(2):
        errors = (rng.random((batch, code.n)) < p).astype(np.int8)
        batches.append(jax.device_put(jnp.asarray((errors @ H.T) % 2)))

    acc = step(jnp.int32(0), batches[0])  # warmup/compile
    assert int(acc) > 0.9 * batch, "decoder sanity check failed"

    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for i in range(reps):
        acc = step(acc, batches[i % 2])
    digest = int(acc)  # single readback inside the timed region
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
