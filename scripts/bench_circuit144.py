"""Phase benchmark for [[144,12,12]]-scale circuit-level decoding on TPU.

Round-3 status quo: ~26 trials/s at B=512 (docs/circuit_ler.md) — the OSD
XLA transform path dominated (~10 HBM passes over the 382 MB T state per
column step). This script measures the round-4 levers in isolation:

  * factored T-free OSD-0 (ops/osd_factored.py) vs the XLA transform path
  * streamed-BP check_chunk and stream_dtype (bf16) on the 553k-slot DEM
  * engine end-to-end trials/s at B in {512, 1024}

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_circuit144.py
       [--code "[[144, 12, 12]]"] [--p 0.002] [--skip-xla-osd] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="[[144, 12, 12]]")
    ap.add_argument("--p", type=float, default=0.002)
    ap.add_argument("--batches", default="512,1024")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bp-iters", type=int, default=50)
    ap.add_argument("--check-chunks", default="8,16")
    ap.add_argument("--skip-xla-osd", action="store_true")
    ap.add_argument("--skip-bp", action="store_true")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.decoders.bp import BPConfig, BPDecoder
    from qldpc_tpu.decoders.osd import OSDConfig, OSDDecoder
    from qldpc_tpu.noise.circuit import parametric_memory_dem

    code = get_code(args.code)
    pdem = parametric_memory_dem(code, basis="z", rounds=code.distance)
    dem = pdem.at(args.p)
    H, priors, llr0 = dem.H, dem.priors, dem.llrs
    m, n = H.shape
    print(f"{args.code} DEM {m}x{n}, E={int(np.asarray(H).sum())}, p={args.p}",
          flush=True)

    results: dict = {"code": args.code, "p": args.p, "dem": [m, n]}
    rng = np.random.default_rng(0)

    def timed(fn, reps=args.reps):
        out = fn()  # warm (compile)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for B in [int(b) for b in args.batches.split(",") if b]:
        mech = (rng.random((B, n)) < np.asarray(priors)).astype(np.int8)
        syn = jnp.asarray((mech @ np.asarray(H).T) % 2, jnp.int8)
        prior_v = jnp.asarray(llr0, jnp.float32)

        row = {}
        from qldpc_tpu.ops.dem_bp_pallas import DEMPallasBPKernel
        from qldpc_tpu.ops.tanner import TannerGraph

        graph = TannerGraph.from_H(H)
        chunks = [int(c) for c in args.check_chunks.split(",") if c]
        if not args.skip_bp:
            for sd in ("float32", "bfloat16"):
                for ck in chunks:
                    key = f"bp{args.bp_iters}_{sd[:4]}_ck{ck}_B{B}"
                    try:
                        kern = DEMPallasBPKernel(
                            graph, max_iter=args.bp_iters, check_chunk=ck,
                            stream_dtype=sd,
                        )
                        f = jax.jit(lambda s, pr, k=kern: k(s, pr))
                        t = timed(lambda: f(syn, prior_v))
                        row[key] = t
                        print(f"  {key}: {t*1e3:.0f} ms "
                              f"({B/t:.0f} samp/s)", flush=True)
                    except Exception as e:
                        row[key + "_error"] = str(e)[:160]
                        print(f"  {key}: FAILED {str(e)[:120]}", flush=True)
            # post-BP state for OSD timing (f32 kernel, default chunk)
            kern = DEMPallasBPKernel(graph, max_iter=args.bp_iters)
            values, conv, iters = jax.jit(lambda s, pr: kern(s, pr))(
                syn, prior_v
            )
            hard = (values < 0).astype(jnp.int8)
            bp_out = (values, hard)
            print(f"  BP conv rate: {np.asarray(conv).mean():.3f}")
        else:
            values = jnp.broadcast_to(prior_v, (B, n)).astype(jnp.float32)
            hard = jnp.zeros((B, n), jnp.int8)
            bp_out = (values, hard)

        values, hard = bp_out
        osd_f = OSDDecoder(H, OSDConfig(order=0, backend="factored"))
        t = timed(lambda: osd_f(syn, values, hard))
        row[f"osd0_factored_B{B}"] = t
        print(f"  osd0_factored_B{B}: {t*1e3:.0f} ms ({B/t:.0f} samp/s)",
              flush=True)

        if not args.skip_xla_osd:
            osd_x = OSDDecoder(H, OSDConfig(order=0, backend="lanes"))
            t = timed(lambda: osd_x(syn, values, hard), reps=1)
            row[f"osd0_xla_B{B}"] = t
            print(f"  osd0_xla_B{B}: {t*1e3:.0f} ms ({B/t:.0f} samp/s)",
                  flush=True)

        # decision parity factored vs XLA on this real workload
        if not args.skip_xla_osd:
            a = np.asarray(osd_f(syn, values, hard))
            b = np.asarray(osd_x(syn, values, hard))
            row[f"osd_parity_B{B}"] = bool(np.array_equal(a, b))
            print(f"  parity factored==xla: {row[f'osd_parity_B{B}']}")

        results[f"B{B}"] = row
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)

    if not args.skip_e2e:
        from qldpc_tpu.mc import DEMEngine, DEMEngineConfig

        for B in [int(b) for b in args.batches.split(",") if b]:
            for sd in ("float32", "bfloat16"):
                try:
                    eng = DEMEngine(
                        pdem,
                        DEMEngineConfig(
                            bp=BPConfig(max_iter=args.bp_iters,
                                        backend="pallas", stream_dtype=sd),
                            osd=OSDConfig(order=0),
                            batch_size=B,
                        ),
                        name=args.code,
                    )
                    # warm the EXACT (program, shape): run_rate compiles per
                    # fused-batch count nb, so the warm call must use the
                    # same shot count as the timed one (CLAUDE.md trap)
                    shots = 4 * B
                    eng.run_rate(args.p, shots, seed=1)
                    t0 = time.perf_counter()
                    eng.run_rate(args.p, shots, seed=2)
                    dt = time.perf_counter() - t0
                    results[f"e2e_B{B}_{sd[:4]}_trials_per_s"] = shots / dt
                    print(f"  e2e B={B} {sd}: {shots/dt:.0f} trials/s",
                          flush=True)
                except Exception as e:  # OOM etc — keep the other cells
                    results[f"e2e_B{B}_{sd[:4]}_error"] = str(e)[:200]
                    print(f"  e2e B={B} {sd}: FAILED {str(e)[:120]}",
                          flush=True)
                if args.out:
                    with open(args.out, "w") as f:
                        json.dump(results, f, indent=1)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
