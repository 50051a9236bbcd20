"""Measure the bf16-MXU fused BP kernel vs f32 (round-4 VERDICT item 4).

Workload = the bench.py headline: [[144,12,12]] code capacity, BP(50),
batch 262144, bt=128. Reports both the raw fixed-iteration kernel figure
(the roofline subject: f32 measured 3.06M syndromes/s = 84% of the f32-MXU
ceiling, docs/bp_roofline.md) and the production early-exit figure, for
each mm_dtype. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bf16_mxu.py \
      [--out results/bench_bf16_mxu.json]
"""

import argparse
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
from qldpc_tpu.decoders import BPConfig, BPDecoder
from qldpc_tpu.decoders.bp import BPResult
from qldpc_tpu.ops.bp_pallas import PallasBPKernel


def measure(mm_dtype, fixed, batch, reps, p=0.01, bt=128):
    code = get_code("[[144, 12, 12]]")
    H = code.Hx
    dec = BPDecoder(
        H, BPConfig(max_iter=50, backend="pallas", batch_tile=bt,
                    mm_dtype=mm_dtype)
    )
    if fixed:
        kernel = PallasBPKernel(
            dec.graph, max_iter=50, batch_tile=bt, early_exit=False,
            mm_dtype=mm_dtype,
        )

        def decode_fn(s, prior_):
            values, conv, iters = kernel(s, prior_)
            return BPResult(
                hard=(values < 0).astype(jnp.int8), converged=conv,
                llrs=values, iterations=iters,
            )
    else:
        decode_fn = dec.decode_fn
    prior = np.full((code.n,), float(np.log((1 - p) / p)), np.float32)

    @jax.jit
    def step(acc, s):
        res = decode_fn(s, jnp.asarray(prior))
        return (
            acc
            + res.converged.sum().astype(jnp.int32)
            + res.iterations.sum().astype(jnp.int32)
        )

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(reps + 1):
        errors = (rng.random((batch, code.n)) < p).astype(np.int8)
        syn = ((errors @ H.T) % 2).astype(np.int8)
        batches.append(jax.device_put(jnp.asarray(syn)))
    compiled = step.lower(
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((batch, H.shape[0]), jnp.int8),
    ).compile()
    digest = int(compiled(jnp.int32(0), batches[-1]))
    assert digest > 0.9 * batch, "decoder sanity check failed"

    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for r in range(reps):
        acc = compiled(acc, batches[r])
    int(acc)
    dt = time.perf_counter() - t0
    return batch * reps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/bench_bf16_mxu.json")
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=4)
    a = ap.parse_args()

    rows = {}
    for fixed in (True, False):
        for mm in ("float32", "bfloat16"):
            key = ("fixed50" if fixed else "early_exit") + "_" + mm
            v = measure(mm, fixed, a.batch, a.reps)
            rows[key] = round(v, 1)
            print(f"{key}: {v:,.0f} syndromes/s", flush=True)
    rows["speedup_fixed50"] = round(
        rows["fixed50_bfloat16"] / rows["fixed50_float32"], 3
    )
    rows["speedup_early_exit"] = round(
        rows["early_exit_bfloat16"] / rows["early_exit_float32"], 3
    )
    out = {
        "workload": "[[144,12,12]] code capacity BP(50) p=0.01, "
                    f"batch {a.batch}, bt=128",
        "device": str(jax.devices()[0]),
        **rows,
    }
    Path(a.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
