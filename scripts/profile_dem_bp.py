"""Per-stage TPU profile of DEM-scale BP (VERDICT round-2 item 1).

Times the [[72,12,6]] circuit-DEM (432 x 15765, dc_max ~316) BP iteration
and its stages in isolation on the real chip:

  full        one complete _step (check update + var update + syndrome)
  check       check update only (tanh/min-sum + segment reduce + scatter)
  var         variable update only (R -> values gather-sum -> Q gather)
  syndrome    hard-decision syndrome parity only

Each stage runs as a jitted lax.scan of ITERS steps with a chained digest
and one readback (the bench.py timing pattern). Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dem_bp.py \
        [--batch 1024] [--iters 25] [--method sum-product]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--method", default="sum-product")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.decoders.bp import BPConfig, BPDecoder, _Carry
    from qldpc_tpu.noise.circuit import parametric_memory_dem

    code = get_code("[[72, 12, 6]]")
    pdem = parametric_memory_dem(code)
    p = 0.003
    dem = pdem.at(p)
    H = dem.H
    m, n = H.shape
    B = args.batch
    print(f"DEM {m}x{n}, nnz={int(H.sum())}, batch={B}, iters={args.iters}, "
          f"method={args.method}")

    dec = BPDecoder(H, BPConfig(max_iter=args.iters, method=args.method))
    g = dec.graph
    S = g.m * g.dc_max if dec._slot_layout else g.num_edges

    rng = np.random.default_rng(0)
    mech = (rng.random((B, n)) < dem.priors[None, :]).astype(np.int8)
    syn = jnp.asarray((mech @ H.T) % 2, jnp.int32)
    priors = jnp.asarray(dem.llrs, jnp.float32)
    priors_b = jnp.broadcast_to(priors, (B, n))
    ssign = (1 - 2 * syn).astype(jnp.float32)
    Q0 = priors_b[:, dec._var_edge.shape and dec._var_of_edge] \
        if False else priors_b[:, dec._var_of_edge]

    def timed(name, fn, *xs):
        # chained-digest timing with a final scalar readback (bench.py
        # pattern — block_until_ready alone is unreliable over the remote
        # link)
        f = jax.jit(lambda acc, *a: acc + fn(*a).astype(jnp.float32))
        float(f(jnp.float32(0), *xs))  # compile + settle
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(args.reps):
            acc = f(acc, *xs)
        float(acc)
        dt = (time.perf_counter() - t0) / args.reps
        per_iter = dt / args.iters
        print(f"{name:10s} {dt*1e3:9.2f} ms  ({per_iter*1e3:7.3f} ms/iter, "
              f"{B/dt:10.1f} syndromes/s at {args.iters} iters)")
        return dt

    # ---- full step scan --------------------------------------------------
    def full(Q):
        carry = _Carry(
            Q=Q, Q_old=Q, values=priors_b,
            hard=jnp.zeros((B, n), jnp.int8),
            converged=jnp.zeros((B,), bool),
            iters=jnp.full((B,), args.iters - 1, jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )
        def stepf(c, _):
            return dec._step(c, syn, ssign, priors_b), None
        carry, _ = jax.lax.scan(stepf, carry, None, length=args.iters)
        return carry.values.sum() + carry.converged.sum()

    # ---- check update only ----------------------------------------------
    def check_only(Q):
        def stepf(q, _):
            R = dec._check_messages(q, ssign)
            return R * 0.999, None  # keep the loop-carried dependency
        q, _ = jax.lax.scan(stepf, Q, None, length=args.iters)
        return q.sum()

    # ---- var update only --------------------------------------------------
    def var_only(R):
        def stepf(r, _):
            rv = dec._gather_var(r, phantom=jnp.asarray(0.0, jnp.float32))
            values = jnp.sum(rv, axis=-1) + priors_b
            q_new = values[:, dec._var_of_edge] - r
            return q_new, None
        r, _ = jax.lax.scan(stepf, R, None, length=args.iters)
        return r.sum()

    # ---- syndrome check only ----------------------------------------------
    def syn_only(values):
        def stepf(v, _):
            hard = (v < 0).astype(jnp.int8)
            hg = dec._gather_check(
                hard[:, dec._var_of_edge].astype(jnp.int32),
                phantom=jnp.asarray(0),
            )
            s_hat = jnp.sum(hg, axis=-1) % 2
            ok = jnp.all(s_hat == syn, axis=-1)
            return v + ok[:, None].astype(jnp.float32), None
        v, _ = jax.lax.scan(stepf, values, None, length=args.iters)
        return v.sum()

    results = {}
    results["full"] = timed("full", full, Q0)
    results["check"] = timed("check", check_only, Q0)
    results["var"] = timed("var", var_only, Q0)
    results["syndrome"] = timed("syndrome", syn_only, priors_b)

    per_iter_bytes = 4 * S  # one slot-space array, f32, per sample
    print(f"\nslot space S = {S} ({per_iter_bytes/1e3:.0f} kB/sample/pass); "
          f"full-step traffic at N passes = N x {B*per_iter_bytes/1e9:.2f} GB/iter")
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
