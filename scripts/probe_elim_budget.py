"""Locate the [[144]] factored-eliminator regression (375 -> 855 ms).

bench_circuit144_r4.json measured osd0_factored_B512 = 375 ms (commit
d72dca1); bad93e8 ("rank-sized column budget") then raised the column
budget from the 2048 default to rank+512 = 2239, which the 1024-multiple
s_max rounding inflates to 3072 (+50% over 2048) — and the very next
measurement read 855 ms with no further kernel change. This probe times
the raw eliminator at [[144]] DEM scale across column budgets to confirm
the attribution and find the operating point that keeps the measured
b-exit safety margin (rank + ~150) without the 2.3x cost.
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
from qldpc_tpu.noise.circuit import parametric_memory_dem
from qldpc_tpu.ops.osd_factored import FactoredEliminator


def main():
    B = 512
    p = 0.002
    code = get_code("[[144, 12, 12]]")
    pdem = parametric_memory_dem(code, basis="z", rounds=code.distance)
    H = (np.asarray(pdem.H) % 2).astype(np.uint8)
    m, n = H.shape
    from qldpc_tpu import native

    rank = int(native.rank(H))
    print(f"DEM {m}x{n}, rank {rank}", flush=True)

    rng = np.random.default_rng(0)
    errors = (rng.random((B, n)) < p).astype(np.uint8)
    resid = ((errors @ H.T) % 2).astype(np.uint32).T  # (m, B)
    llrs = rng.normal(size=(B, n)).astype(np.float32)
    order = np.argsort(np.abs(llrs), axis=1, kind="stable").astype(np.int32)
    order_d = jax.device_put(jnp.asarray(order))
    resid_d = jax.device_put(jnp.asarray(resid))

    out = {"dem": [m, n], "rank": rank, "B": B}
    for label, mc in [
        ("mc2048_r4fast", 2048),
        ("rank+150", rank + 150),
        ("rank+512_current", rank + 512),
    ]:
        fe = FactoredEliminator(H, h_rank=rank, max_cols=mc)
        call = jax.jit(lambda o, r, fe=fe: fe(o, r))
        res = call(order_d, resid_d)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(3):
            res = call(order_d, resid_d)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / 3
        ov = int(np.asarray(res[3]).sum())
        out[label] = {
            "ms": round(dt * 1000, 1), "s_max": fe.s_max, "K": fe.K,
            "nb": fe.nb, "sp": fe.sp, "sp4": fe.sp4, "cwp": fe.cwp,
            "overflow_lanes": ov,
        }
        print(label, out[label], flush=True)
    Path("results/probe_elim_budget.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
