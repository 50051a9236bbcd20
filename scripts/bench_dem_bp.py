"""Measure DEM-scale BP throughput: streamed Pallas kernel vs XLA slot path.

The round-2 verdict's item 1 workload: the [[72,12,6]] circuit-level DEM
(432 x 15765), BP(50), fixed batch. Writes results/bench_dem_bp.json.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_dem_bp.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--p", type=float, default=0.003)
    ap.add_argument("--out", default="results/bench_dem_bp.json")
    args = ap.parse_args()

    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.decoders.bp import BPConfig, BPDecoder
    from qldpc_tpu.noise.circuit import parametric_memory_dem

    code = get_code("[[72, 12, 6]]")
    dem = parametric_memory_dem(code).at(args.p)
    H = dem.H
    B, mi = args.batch, args.max_iter
    prior = jnp.asarray(dem.llrs, jnp.float32)
    rng = np.random.default_rng(0)
    mech = (rng.random((B, H.shape[1])) < dem.priors[None, :]).astype(np.int8)
    syn = jnp.asarray((mech @ H.T) % 2)

    results = {
        "workload": f"[[72,12,6]] circuit DEM {H.shape[0]}x{H.shape[1]}, "
        f"BP({mi}) fixed, B={B}, p={args.p}",
        "device": str(jax.devices()[0]),
    }

    def timed(dec):
        def g(acc, s):
            r = dec.decode_fn(s, prior)
            return acc + r.converged.sum().astype(jnp.float32)
        f = jax.jit(g)
        float(f(jnp.float32(0), syn))
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(args.reps):
            acc = f(acc, syn)
        float(acc)
        dt = (time.perf_counter() - t0) / args.reps
        return B / dt

    for backend in ("pallas", "xla"):
        for method in ("sum-product", "min-sum"):
            v = timed(
                BPDecoder(H, BPConfig(max_iter=mi, method=method, backend=backend))
            )
            key = f"{backend}_{method}_syndromes_per_s"
            results[key] = round(v, 1)
            print(f"{key}: {v:.1f}", flush=True)

    results["speedup_sum_product"] = round(
        results["pallas_sum-product_syndromes_per_s"]
        / results["xla_sum-product_syndromes_per_s"],
        2,
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
