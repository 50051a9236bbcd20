"""Diagnose why bf16-MXU operands don't speed up the fused BP kernel.

Hypotheses for the measured ~1.0x (results/bench_bf16_mxu.json) against
the roofline's 2.5-3x estimate (docs/bp_roofline.md):
  (a) at bt=128 the one-hot matmuls are too narrow to be MXU-throughput
      bound (fixed pass latency dominates) -> bf16 should win at bt=1024;
  (b) the kernel is actually VPU-bound by the sum-product transcendentals
      (tanh + log-domain leave-one-out + arctanh) -> min-sum (no
      transcendentals) should run much faster than sum-product at equal
      dtype, and bf16 should win there if (a) is false.

Fixed-iteration (early_exit=False) BP(50), p=0.01, [[144,12,12]].
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import qldpc_tpu

qldpc_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from qldpc_tpu.codes import get_code
from qldpc_tpu.ops.bp_pallas import PallasBPKernel
from qldpc_tpu.ops.tanner import TannerGraph


def measure(method, mm_dtype, bt, batch=262144, reps=3, p=0.01):
    code = get_code("[[144, 12, 12]]")
    H = code.Hx
    g = TannerGraph.from_H(H)
    kernel = PallasBPKernel(
        g, max_iter=50, method=method, batch_tile=bt, early_exit=False,
        mm_dtype=mm_dtype,
    )
    prior = np.full((code.n,), float(np.log((1 - p) / p)), np.float32)

    @jax.jit
    def step(acc, s):
        values, conv, iters = kernel(s, jnp.asarray(prior))
        return acc + conv.sum().astype(jnp.int32) + iters.sum().astype(jnp.int32)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(reps + 1):
        errors = (rng.random((batch, code.n)) < p).astype(np.int8)
        batches.append(jax.device_put(jnp.asarray(((errors @ H.T) % 2).astype(np.int8))))
    compiled = step.lower(
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((batch, H.shape[0]), jnp.int8),
    ).compile()
    int(compiled(jnp.int32(0), batches[-1]))
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for r in range(reps):
        acc = compiled(acc, batches[r])
    int(acc)
    return batch * reps / (time.perf_counter() - t0)


def main():
    out = {}
    for bt in (128, 1024):
        for method in ("sum-product", "min-sum"):
            for mm in ("float32", "bfloat16"):
                key = f"{method}_{mm}_bt{bt}"
                v = measure(method, mm, bt)
                out[key] = round(v, 1)
                print(f"{key}: {v:,.0f} syndromes/s", flush=True)
    Path("results/probe_mxu_bound.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
