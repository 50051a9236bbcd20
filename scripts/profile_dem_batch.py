"""Why is the streamed DEM BP kernel slower per sample at B=2048/4096?

Round-3 left the anomaly unexplained (ROADMAP "Batch scaling of the DEM
kernel"; round-3 VERDICT item 5): B=1024 is measured-best, 2048/4096 are
~25% slower per sample. This script times the streamed pipeline's phases in
isolation on the [[72,12,6]] circuit DEM at B in {1024, 2048, 4096}:

  gather   the batch-minor XLA row gather  vs[vos, :]  (slot space)
  check    the Pallas check kernel on pre-gathered operands
  var      the per-degree var-side gather+fold (XLA)
  step     one full _step (all of the above chained)

Each phase runs as a jitted lax.scan of ITERS trips with a chained digest
and single readback (bench.py timing pattern). Per-sample normalization
identifies which phase loses efficiency with lane count.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dem_batch.py
       [--batches 1024,2048,4096] [--iters 25] [--out results/dem_batch_profile.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,2048,4096")
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="results/dem_batch_profile.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.noise.circuit import parametric_memory_dem
    from qldpc_tpu.ops.dem_bp_pallas import DEMPallasBPKernel
    from qldpc_tpu.ops.tanner import TannerGraph

    code = get_code("[[72, 12, 6]]")
    dem = parametric_memory_dem(code).at(0.003)
    H = dem.H
    m, n = H.shape
    graph = TannerGraph.from_H(H)
    kern = DEMPallasBPKernel(graph, max_iter=args.iters,
                             interpret=args.cpu)
    S_pad, n_pad = kern._S_pad, kern._n_pad
    vos, mask = kern._vos, kern._mask
    rng = np.random.default_rng(0)
    results = {"dem": [m, n], "S_pad": S_pad, "iters": args.iters}

    def timed_scan(make_step, init, iters=args.iters, reps=args.reps):
        @jax.jit
        def run(x0):
            def sc(c, _):
                return make_step(c), None
            c, _ = jax.lax.scan(sc, x0, None, length=iters)
            return jax.tree.map(
                lambda a: jnp.sum(a.astype(jnp.float32)), c
            )

        out = run(init)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(init))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters

    for B in [int(b) for b in args.batches.split(",") if b]:
        vals = jnp.asarray(
            rng.standard_normal((n_pad, B)).astype(np.float32)
        )
        R = jnp.zeros((S_pad, B), jnp.float32)
        syn_T = jnp.zeros((kern._m_pad, B), jnp.float32)
        row = {}

        # 1. slot gather alone (digest keeps it live; the +1 rotation stops
        # the compiler hoisting the gather out of the scan)
        def g_step(c):
            return jnp.roll(c, 1, axis=0) + jnp.sum(
                c[vos, :], axis=0, keepdims=True
            ) * 1e-9

        row["gather_ms"] = timed_scan(g_step, vals) * 1e3

        # 2. check kernel alone on static pre-gathered operands
        vg0 = vals[vos, :]
        prog = kern._check_prog(B)

        def c_step(c):
            vg, R = c
            r_new, s_hat = prog(vg, R, 1.0 - 2.0 * syn_T, mask)
            return vg + s_hat.sum() * 1e-12, r_new

        row["check_ms"] = timed_scan(c_step, (vg0, R)) * 1e3

        # 3. var-side gather+fold alone
        def v_step(c):
            out = kern._var_sum(c, B)
            return c.at[: kern._n, :].add(out * 1e-9)

        row["var_ms"] = timed_scan(v_step, jnp.asarray(
            rng.standard_normal((S_pad, B)).astype(np.float32)
        )) * 1e3

        # 4. full step
        pri = vals

        def f_step(c):
            return kern._step(c, syn_T, pri, B)

        carry0 = (
            vals, R, jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32), jnp.zeros((), jnp.int32),
        )
        row["step_ms"] = timed_scan(f_step, carry0) * 1e3

        for k, v in row.items():
            row[k] = round(v, 3)
        row["step_us_per_sample"] = round(row["step_ms"] * 1e3 / B, 3)
        results[f"B{B}"] = row
        print(f"B={B}: {row}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
