"""Measure Pallas layered vs flooding BP throughput on real TPU.

One process (shared-TPU noise cancels), chained-digest timing as bench.py.
"""

import json
import time

import numpy as np

import qldpc_tpu

qldpc_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig, BPDecoder


def measure(p, schedule, bt, batch=262144, reps=2, max_iter=50):
    code = get_code("[[144, 12, 12]]")
    H = code.Hx
    dec = BPDecoder(H, BPConfig(max_iter=max_iter, backend="pallas",
                                schedule=schedule, batch_tile=bt))
    prior = jnp.full((code.n,), float(np.log((1 - p) / p)), jnp.float32)

    @jax.jit
    def step(acc, s):
        res = dec.decode_fn(s, prior)
        return (acc + res.converged.sum().astype(jnp.int32)
                + res.iterations.sum().astype(jnp.int32))

    rng = np.random.default_rng(0)
    errors = (rng.random((batch, code.n)) < p).astype(np.int8)
    syn = jax.device_put(jnp.asarray((errors @ H.T) % 2))
    acc = step(jnp.int32(0), syn)
    conv = int(acc)
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(reps):
        acc = step(acc, syn)
    int(acc)
    return batch * reps / (time.perf_counter() - t0)


rows = []
for p in (0.01, 0.03, 0.05):
    for schedule, bt in (("flooding", 128), ("layered", 128), ("layered", 256),
                         ("layered", 1024)):
        t0 = time.time()
        r = measure(p, schedule, bt)
        rows.append({"p": p, "schedule": schedule, "bt": bt,
                     "syndromes_per_s": round(r, 1),
                     "wall_s": round(time.time() - t0, 1)})
        print(json.dumps(rows[-1]), flush=True)

with open("results/bench_layered.json", "w") as f:
    json.dump(rows, f, indent=1)
print("wrote results/bench_layered.json")
