"""Measure Pallas BP throughput across batch-tile sizes and workloads.

Produces the measurement table behind ``BPConfig(batch_tile=0)`` (auto):
for each (code, p, batch_tile) it times the fused kernel on one large batch
with the chained-digest methodology of bench.py (single readback per run,
all configs inside one process so shared-TPU noise cancels).

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/autotune_tile.py \
        --out results/autotune_tile.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import qldpc_tpu

qldpc_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig, BPDecoder


def measure(code_name: str, p: float, bt: int, batch: int, reps: int,
            max_iter: int = 50) -> float:
    code = get_code(code_name)
    H = code.Hx
    dec = BPDecoder(H, BPConfig(max_iter=max_iter, backend="pallas",
                                batch_tile=bt))
    prior = jnp.full((code.n,), float(np.log((1 - p) / p)), jnp.float32)

    @jax.jit
    def step(acc, s):
        res = dec.decode_fn(s, prior)
        return (acc + res.converged.sum().astype(jnp.int32)
                + res.iterations.sum().astype(jnp.int32))

    rng = np.random.default_rng(0)
    errors = (rng.random((batch, code.n)) < p).astype(np.int8)
    syn = jax.device_put(jnp.asarray((errors @ H.T) % 2))

    acc = step(jnp.int32(0), syn)  # warmup/compile
    int(acc)
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(reps):
        acc = step(acc, syn)
    int(acc)  # single readback
    return batch * reps / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/autotune_tile.json")
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--codes", nargs="+",
                    default=["[[144, 12, 12]]", "[[72, 12, 6]]"])
    ap.add_argument("--rates", nargs="+", type=float,
                    default=[0.01, 0.03, 0.05])
    ap.add_argument("--tiles", nargs="+", type=int,
                    default=[128, 256, 512, 1024])
    args = ap.parse_args()

    rows = []
    for code_name in args.codes:
        for p in args.rates:
            for bt in args.tiles:
                t0 = time.time()
                rate = measure(code_name, p, bt, args.batch, args.reps)
                rows.append({"code": code_name, "p": p, "batch_tile": bt,
                             "syndromes_per_s": round(rate, 1),
                             "wall_s": round(time.time() - t0, 1)})
                print(json.dumps(rows[-1]), flush=True)

    with open(args.out, "w") as f:
        json.dump({"batch": args.batch, "reps": args.reps, "rows": rows}, f,
                  indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
