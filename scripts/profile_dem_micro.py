"""Microbenchmarks calibrating the DEM BP stage profile on TPU.

What does one pass over the (B, S) slot array actually cost, and how much
do gathers and transcendentals add? Pairs with scripts/profile_dem_bp.py.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.decoders.bp import BPConfig, BPDecoder
    from qldpc_tpu.noise.circuit import parametric_memory_dem

    code = get_code("[[72, 12, 6]]")
    dem = parametric_memory_dem(code).at(0.003)
    H = dem.H
    m, n = H.shape
    B = args.batch

    dec = BPDecoder(H, BPConfig(max_iter=args.iters))
    g = dec.graph
    S = g.m * g.dc_max
    dc = g.dc_max
    print(f"B={B} S={S} n={n} m={m} dc={dc}; one (B,S) f32 pass = "
          f"{B*S*4/1e9:.3f} GB")

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((B, S)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    def timed(name, fn, *xs):
        # chained-digest timing (bench.py pattern): the remote link's
        # completion signaling makes block_until_ready-only timing
        # unreliable — the timer stops after a scalar READBACK whose value
        # depends on every rep.
        f = jax.jit(lambda acc, *a: acc + fn(*a).astype(jnp.float32))
        acc = f(jnp.float32(0), *xs)
        float(acc)  # compile + settle
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(args.reps):
            acc = f(acc, *xs)
        float(acc)
        dt = (time.perf_counter() - t0) / args.reps / args.iters
        gbps = B * S * 4 * 2 / dt / 1e9  # read+write of one slot array
        print(f"{name:28s} {dt*1e3:8.3f} ms/iter  (~{gbps:6.1f} GB/s rw-equiv)")
        return dt

    def scan(fn, x0):
        def run(x):
            y, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, None,
                                length=args.iters)
            return y.sum()
        return run

    # pure elementwise passes over (B, S)
    timed("mul-add (1 pass)", scan(lambda x: x * 1.0001 + 0.001, X), X)
    timed("tanh", scan(lambda x: jnp.tanh(x * 0.5) + x * 1e-6, X), X)
    timed("log-abs", scan(lambda x: jnp.log(jnp.maximum(jnp.abs(x), 1e-15)) + x * 1e-6, X), X)
    timed("exp", scan(lambda x: jnp.exp(-jnp.abs(x)) + x * 1e-6, X), X)

    # segment reduce (B, m, dc) -> (B, m) + broadcast back
    def segred(x):
        t = x.reshape(B, m, dc)
        tot = jnp.sum(t, axis=-1, keepdims=True)
        return (t - tot).reshape(B, S)
    timed("segment sum+bcast", scan(segred, X), X)

    # min-sum style two-minima
    def two_min(x):
        t = x.reshape(B, m, dc)
        aq = jnp.abs(t)
        min1 = jnp.min(aq, axis=-1, keepdims=True)
        first = jax.nn.one_hot(jnp.argmin(aq, axis=-1), dc, dtype=bool)
        min2 = jnp.min(jnp.where(first, jnp.inf, aq), axis=-1, keepdims=True)
        mags = jnp.where(aq == min1, min2, min1)
        return (mags * jnp.sign(t)).reshape(B, S)
    timed("two-minima (min-sum core)", scan(two_min, X), X)

    # gathers
    var_of_slot = dec._var_of_edge  # (S,) var index per slot
    def gath_vs(v):
        return v[:, var_of_slot] * 1.0001
    def run_gather(v):
        def body(c, _):
            w = gath_vs(c[:, :n] if c.shape[1] != n else c)
            return jnp.pad(w[:, :n], ((0, 0), (0, 0))) * 0 + c + w[:, :n] * 1e-9, None
        y, _ = jax.lax.scan(body, V, None, length=args.iters)
        return y.sum()
    timed("gather n->S (values[vos])", run_gather, V)

    var_edge = dec._var_edge  # (n, dv) slot ids
    def gath_ve(x):
        pad = jnp.zeros((B, 1), jnp.float32)
        xe = jnp.concatenate([x, pad], axis=1)
        rv = xe[:, var_edge]  # (B, n, dv)
        s = jnp.sum(rv, axis=-1)  # (B, n)
        return x + jnp.pad(s, ((0, 0), (0, S - n)))[:, :S] * 1e-9
    timed("gather S->(n,dv)+sum", scan(gath_ve, X), X)

    # min-sum full check update via decoder internals
    dec_ms = BPDecoder(H, BPConfig(max_iter=args.iters, method="min-sum"))
    syn_sign = jnp.ones((B, m), jnp.float32)
    def check_ms(q):
        return dec_ms._check_messages(q, syn_sign) * 0.999
    timed("min-sum check update", scan(check_ms, X), X)
    def check_sp(q):
        return dec._check_messages(q, syn_sign) * 0.999
    timed("sum-product check update", scan(check_sp, X), X)


if __name__ == "__main__":
    main()
