"""Headline benchmark: decoded syndromes/s/chip, [[144,12,12]] BP.

Workload: code-capacity channel at p = 0.01, sum-product BP with
max_iter = 50, single chip, Pallas fused kernel. Baseline = the
BASELINE.json north star of 1e6 decoded syndromes/s/chip (the reference
publishes no throughput numbers — SURVEY.md §6).

Methodology note: the remote-TPU link's completion signaling makes
``block_until_ready``-only timing unreliable, so each timed dispatch decodes
one large batch and the timer stops only after a scalar reduction of the
outputs is read back to the host.

Robustness notes (round-5 redesign after the round-4 deadline miss):

* The dominant variable cost on this link is NOT compilation: the FIRST
  device synchronization of a process pays the remote-TPU claim handshake,
  measured at 40-355 s in this environment (it is pool-state dependent —
  a process started right after another claimed finishes the same sync in
  <1 s). Warm XLA compiles are ~0.5 s via the persistent cache
  (``~/.cache/qldpc_tpu_xla``); cold compiles are 2-12 min, so
  ``scripts/prewarm_bench.py`` keeps the exact (program, shape) cached.
* The primary therefore (a) kicks off an async device op FIRST so the
  claim overlaps all host-side setup, (b) keeps every decoder index table
  host-side numpy so jit lowering never blocks on a device fetch (that
  coupling is what turned round-4 lowering into a 44-355 s phase), and
  (c) prints per-phase timestamps on stderr for post-mortems.
* The parent runs the primary under ``BENCH_DEADLINE`` (default 900 s).
  The claim can take arbitrarily long: it queues behind whichever
  process currently holds the shared chip (measured this round: 0.3 s
  right after another local process released, 44-355 s in quiet windows,
  and unbounded while a long study holds the device) — so the deadline
  buys claim-wait at zero marginal cost (the fallback number is already
  in hand ~90 s in), bounded only by the driver's patience.
  while a cheap CPU-backend fallback measurement runs CONCURRENTLY in a
  second process, so a deadline miss costs ~0 extra wall: whichever
  number exists at the deadline is printed. A primary that crashes early
  (the remote compile helper intermittently dies with HTTP 500) is
  restarted once if enough budget remains.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

BASELINE_SYNDROMES_PER_S = 1.0e6
_T0 = time.time()


def _mark(msg: str) -> None:
    print(f"[bench {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _measure(
    backend: str,
    batch: int,
    reps: int,
    force_cpu: bool = False,
    fixed_iterations: bool = False,
) -> float:
    import qldpc_tpu

    qldpc_tpu.enable_compilation_cache()
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # Kick the remote-TPU claim handshake NOW (async): the first device
    # sync of a process costs 40-355 s on this link, and everything below
    # until the warmup call is pure host work that can overlap it.
    claim = jax.device_put(np.zeros((8,), np.float32))
    _mark("claim kicked (async)")

    from qldpc_tpu.codes import get_code
    from qldpc_tpu.decoders import BPConfig, BPDecoder

    code = get_code("[[144, 12, 12]]")
    H = code.Hx
    p = 0.01

    mm_dtype = os.environ.get("BENCH_MM_DTYPE", "float32")
    if backend == "pallas":
        # bt=128 is the measured-best tile at p=0.01 (results/autotune_tile.json:
        # small tiles let the whole-tile early exit fire sooner at low p)
        dec = BPDecoder(
            H,
            BPConfig(
                max_iter=50, backend="pallas", batch_tile=128,
                mm_dtype=mm_dtype,
            ),
        )
        if fixed_iterations:
            # raw-kernel figure: whole-tile early exit disabled, every lane
            # pays all 50 iterations (per-lane freeze still applies, so
            # outputs are identical) — decomposes the headline into
            # "workload throughput" vs "kernel throughput"
            from qldpc_tpu.decoders.bp import BPResult
            from qldpc_tpu.ops.bp_pallas import PallasBPKernel

            kernel = PallasBPKernel(
                dec.graph, max_iter=50, batch_tile=128, early_exit=False,
                mm_dtype=mm_dtype,
            )

            def decode_fn(s, prior_):
                values, conv, iters = kernel(s, prior_)
                return BPResult(
                    hard=(values < 0).astype(jnp.int8),
                    converged=conv,
                    llrs=values,
                    iterations=iters,
                )
        else:
            decode_fn = dec.decode_fn
    else:
        cfg = BPConfig(max_iter=50) if fixed_iterations else BPConfig(
            max_iter=50, chunk_size=10
        )
        dec = BPDecoder(H, cfg)
        decode_fn = dec.decode_fn
    # prior stays host-side numpy-derived so lowering embeds it without
    # touching the device (see module docstring).
    prior = np.full((code.n,), float(np.log((1 - p) / p)), np.float32)
    _mark("decoder constructed")

    @jax.jit
    def step(acc, s):
        res = decode_fn(s, jnp.asarray(prior))
        # scalar digest chained on device; the final readback forces every
        # rep to have completed (single round trip for the whole run)
        return (
            acc
            + res.converged.sum().astype(jnp.int32)
            + res.iterations.sum().astype(jnp.int32)
        )

    # fresh syndromes per rep: every timed dispatch decodes a distinct
    # batch, so the early-exit pattern cannot repeat across reps
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(reps + 1):
        errors = (rng.random((batch, code.n)) < p).astype(np.int8)
        syn = ((errors @ H.T) % 2).astype(np.int8)
        batches.append(jax.device_put(jnp.asarray(syn)))
    _mark("syndromes queued to device")

    lowered = step.lower(
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((batch, H.shape[0]), jnp.int8),
    )
    _mark("lowered (host-side)")
    compiled = lowered.compile()
    _mark("compiled")

    acc = compiled(jnp.int32(0), batches[-1])  # warmup (its own batch)
    ok = int(acc)  # blocks: claim + transfers + first dispatch complete here
    _mark(f"warmup run done (digest {ok})")
    assert ok > 0.9 * batch, "decoder sanity check failed"
    del claim

    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for r in range(reps):
        acc = compiled(acc, batches[r])
    int(acc)  # single readback inside the timed region
    dt = time.perf_counter() - t0
    _mark(f"timed region: {dt:.3f}s for {reps}x{batch}")
    return batch * reps / dt


def _emit_line(value: float, suffix: str = "") -> str:
    return json.dumps(
        {
            "metric": "decoded_syndromes_per_s_per_chip_144_bp50" + suffix,
            "value": round(value, 1),
            "unit": "syndromes/s",
            "vs_baseline": round(value / BASELINE_SYNDROMES_PER_S, 4),
        }
    )


class _Child:
    """A bench child process whose stdout JSON lines are collected live."""

    def __init__(self, argv, name):
        self.name = name
        self.line = None
        self.proc = subprocess.Popen(
            argv,
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            env=os.environ,
        )
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self):
        for line in self.proc.stdout:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                self.line = line
                _mark(f"{self.name} produced a result line")

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()


def main() -> None:
    if "--primary" in sys.argv:
        value = _measure(
            backend=os.environ.get("BENCH_BACKEND", "pallas"),
            batch=int(os.environ.get("BENCH_BATCH", 262144)),
            reps=int(os.environ.get("BENCH_REPS", 4)),
            fixed_iterations=bool(os.environ.get("BENCH_FIXED_ITER")),
        )
        suffix = "_fixed50" if os.environ.get("BENCH_FIXED_ITER") else ""
        if os.environ.get("BENCH_MM_DTYPE") == "bfloat16":
            suffix += "_bf16"
        print(_emit_line(value, suffix), flush=True)
        return

    if "--fallback-inline" in sys.argv or os.environ.get("BENCH_FORCE_FALLBACK"):
        value = _measure(backend="xla", batch=2048, reps=2, force_cpu=True)
        print(_emit_line(value, "_cpu_fallback"), flush=True)
        return

    deadline = float(os.environ.get("BENCH_DEADLINE", 900))
    me = os.path.abspath(__file__)
    primary = _Child([sys.executable, me, "--primary"], "primary")
    fallback = _Child([sys.executable, me, "--fallback-inline"], "fallback")

    retried = False
    t_end = _T0 + deadline
    while time.time() < t_end:
        if primary.line is not None:
            break
        if primary.proc.poll() is not None and primary.line is None:
            # primary crashed (remote compile helper HTTP 500 etc.)
            if not retried and t_end - time.time() > 120:
                _mark("primary crashed; restarting once")
                primary = _Child([sys.executable, me, "--primary"], "primary")
                retried = True
            else:
                _mark("primary crashed; no budget to retry")
                break
        time.sleep(0.5)

    if primary.line is not None:
        print(primary.line, flush=True)
        fallback.kill()
        return
    _mark("primary missed the deadline; using fallback")
    primary.kill()
    # fallback runs concurrently from t=0 and takes ~60-90 s; normally its
    # line already exists by now. Give it a short grace period otherwise.
    t_grace = time.time() + 90
    while fallback.line is None and time.time() < t_grace:
        if fallback.proc.poll() is not None and fallback.line is None:
            break
        time.sleep(0.5)
    if fallback.line is not None:
        print(fallback.line, flush=True)
        return
    # last resort: measure inline on CPU so the driver always gets a line
    value = _measure(backend="xla", batch=2048, reps=2, force_cpu=True)
    print(_emit_line(value, "_cpu_fallback"), flush=True)


if __name__ == "__main__":
    main()
