"""Per-stage engine profile: where do end-to-end MC cycles go?

Times jitted prefixes of the engine pipeline (sample -> BP -> OSD ->
classify) at a large batch in one process, chained-digest methodology.
"""

import json
import time

import numpy as np

import qldpc_tpu

qldpc_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig, OSDConfig
from qldpc_tpu.mc import EngineConfig, MonteCarloEngine


def timed(fn, key, p, reps=4):
    acc = fn(key, jnp.float32(p))  # warmup/compile
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    outs = [fn(jax.random.fold_in(key, i), jnp.float32(p)) for i in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    B = 262144
    p = 0.01
    code = get_code("[[144, 12, 12]]")
    eng = MonteCarloEngine(
        code,
        EngineConfig(
            bp=BPConfig(max_iter=50, backend="pallas", batch_tile=128),
            osd=OSDConfig(order=0, backend="pallas"),
            batch_size=B,
        ),
    )
    base0 = jnp.uint32(0)

    @jax.jit
    def stage_sample(key, pp):
        errors, syn, priors = eng._sample(key, base0, pp)
        return errors.sum(dtype=jnp.int32) + syn.sum(dtype=jnp.int32)

    @jax.jit
    def stage_bp(key, pp):
        _, syn, priors = eng._sample(key, base0, pp)
        r = eng._bp.decode_fn(syn, priors)
        return r.converged.sum().astype(jnp.int32) + r.iterations.sum()

    @jax.jit
    def stage_bp_osd(key, pp):
        _, syn, priors = eng._sample(key, base0, pp)
        bp_res = eng._bp.decode_fn(syn, priors)
        conv = bp_res.converged
        n_fail = jnp.sum((~conv).astype(jnp.int32))
        k = 4096

        def osd_at():
            sel = jnp.argsort(conv, stable=True)[:k]
            sol = eng._osd._decode(syn[sel], bp_res.llrs[sel], bp_res.hard[sel])
            return bp_res.hard.at[sel].set(
                jnp.where(conv[sel][:, None], bp_res.hard[sel], sol)
            )

        final = jax.lax.cond(n_fail == 0, lambda: bp_res.hard, osd_at)
        return final.sum(dtype=jnp.int32)

    @jax.jit
    def stage_full(key, pp):
        c = eng._local_step_nosharding(key, pp)
        return c.trials + c.logical_errors + c.sum_iterations

    # expose an unsharded local step for profiling
    def _local_nosh(key, pp):
        errors, syn, priors = eng._sample(key, base0, pp)
        bp_res = eng._decode_with_rescue(syn, priors, None)
        conv = bp_res.converged
        n_fail = jnp.sum((~conv).astype(jnp.int32))
        k = max(1, int(round(B * eng.config.osd_fraction)))
        k = min(k, B)

        def osd_at(kk):
            sel = jnp.argsort(conv, stable=True)[:kk]
            sol = eng._osd._decode(syn[sel], bp_res.llrs[sel], bp_res.hard[sel])
            return bp_res.hard.at[sel].set(
                jnp.where(conv[sel][:, None], bp_res.hard[sel], sol)
            )

        tiers = sorted({int(t) for t in eng.config.osd_tiers if 0 < t < k})
        run = lambda: osd_at(k)
        for t in reversed(tiers):
            run = lambda t=t, nxt=run: jax.lax.cond(
                n_fail <= t, lambda: osd_at(t), nxt
            )
        final = jax.lax.cond(n_fail == 0, lambda: bp_res.hard, run)
        valid = jnp.ones((B,), bool)
        cnt = eng._classify(errors, final, syn, bp_res, valid)
        return cnt

    eng._local_step_nosharding = _local_nosh

    key = jax.random.key(0)
    rows = {}
    for name, fn in [
        ("sample", stage_sample),
        ("sample+bp", stage_bp),
        ("sample+bp+osd", stage_bp_osd),
        ("full_local_step", stage_full),
    ]:
        dt = timed(fn, key, p)
        rows[name] = round(dt * 1e3, 2)
        print(f"{name:18s} {dt*1e3:8.2f} ms  ({B/dt/1e6:.2f}M samples/s)",
              flush=True)

    with open("results/profile_engine.json", "w") as f:
        json.dump({"batch": B, "p": p, "ms_per_batch": rows}, f, indent=1)


if __name__ == "__main__":
    main()
